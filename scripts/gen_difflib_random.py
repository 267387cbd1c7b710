#!/usr/bin/env python3
"""Random differential fixture for the difflib port: seeded random string
pairs through CPython's SequenceMatcher (isjunk=None, autojunk=True) —
ratio AND full opcodes. Lengths straddle the autojunk threshold
(len(b) > 199 in CODE POINTS), repeated chars force the popular-element
removal, non-BMP chars diverge any UTF-16-indexed port.

TSV (escapes \\\\ \\t \\n \\r):
  R\t<case>\t<a>\t<b>\t<ratio!r>\t<op;op;...>  op = tag,i1,i2,j1,j2

Usage: python3 scripts/gen_difflib_random.py <out.tsv> [cases] [seed]
"""
import random, sys
from difflib import SequenceMatcher
from pathlib import Path

ALPH = list("abcdeあいうえお漢字12 ") + ["\U00020bb7", "\U0001f600"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_str(rng):
    n = rng.choice([0, 3, 12, 40, 120, 195, 198, 199, 200, 201, 210, 280])
    k = rng.random()
    if k < 0.25:
        # popularity-heavy: tiny alphabet so autojunk removes elements
        return "".join(rng.choice("abあ") for _ in range(n))
    if k < 0.4:
        base = rng.choice(ALPH)
        return base * n
    return "".join(rng.choice(ALPH) for _ in range(n))


def mutate(s, rng):
    out = list(s)
    for _ in range(rng.randint(0, max(1, len(out) // 4))):
        if not out:
            break
        i = rng.randrange(len(out))
        k = rng.random()
        if k < 0.4:
            del out[i]
        elif k < 0.7:
            out[i] = rng.choice(ALPH)
        else:
            out.insert(i, rng.choice(ALPH))
    return "".join(out)


def main(out_path, cases=500, seed=112358):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        a = rand_str(rng)
        b = mutate(a, rng) if rng.random() < 0.6 else rand_str(rng)
        if rng.random() < 0.5:
            a, b = b, a
        m = SequenceMatcher(None, a, b)
        ops = ";".join(f"{t},{i1},{i2},{j1},{j2}" for t, i1, i2, j1, j2 in m.get_opcodes())
        rows.append(f"R\t{c}\t{esc(a)}\t{esc(b)}\t{m.ratio()!r}\t{ops}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

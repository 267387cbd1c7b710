#!/usr/bin/env python3
"""Random differential fixture for CJK display width: seeded random texts
through the REFERENCE's _display_width (src/cli/normalize_headings.py:17)
— unicodedata.east_asian_width with F/W/A counted as 2 columns, incl. the
AMBIGUOUS class (±, §, Greek/Cyrillic, circled digits) that naive range
tables miss.

TSV: X\t<case>\t<text>\t<width>
Usage: python3 scripts/gen_width_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.cli.normalize_headings import _display_width

POOL = list("abZ 09日本語カナ漢ＡＢ１２±§Ωβд①⑳♪√‐") + \
    ["\u1100", "\uffe6", "\U00020bb7", "\u00a7", "\u2460", "\u0391", "\u2026"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def main(out_path, cases=300, seed=360360):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        t = "".join(rng.choice(POOL) for _ in range(rng.randint(0, 25)))
        rows.append(f"X\t{c}\t{esc(t)}\t{_display_width(t)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

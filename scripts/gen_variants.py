#!/usr/bin/env python3
"""Adversarial VARIANT books for the parity sweeps: mutates generator
books along the axes that exposed python-semantics divergences in round 2
(full-width digits, exotic whitespace, non-BMP code points), so the
campaign is reproducible from the repo (round 2 generated these inline).

Usage: python3 scripts/gen_variants.py <src_dir> <out_dir> <n> [axis]
axis in {fullwidth, whitespace, nonbmp, all} (default all: round-robin).
Reads <src_dir>/doc_i.md, writes <out_dir>/doc_i.md (same index space so
the SweepCheck/XmlSweep/GroupedSweep/MdSweep mains work unchanged).
"""
import random, sys
from pathlib import Path

FW = {c: chr(ord(c) - ord('0') + ord('０')) for c in '0123456789'}


def fullwidth(line, rng):
    # flip ~half the ascii digits to full-width (python \d / int() parse them)
    return ''.join(FW[c] if c in FW and rng.random() < 0.5 else c for c in line)


WS = ['　', ' ', ' ', '\t']


def whitespace(line, rng):
    out = []
    for c in line:
        if c == ' ' and rng.random() < 0.4:
            out.append(rng.choice(WS))
        else:
            out.append(c)
    # sprinkle trailing exotic whitespace
    if line.strip() and rng.random() < 0.3:
        out.append(rng.choice(WS))
    return ''.join(out)


NONBMP = ['\U00020bb7', '\U0001f600', '\U0001f4d6', '\U00010348']


def nonbmp(line, rng):
    out = []
    for c in line:
        out.append(c)
        if c.isalpha() and rng.random() < 0.08:
            out.append(rng.choice(NONBMP))
    return ''.join(out)


AXES = {'fullwidth': fullwidth, 'whitespace': whitespace, 'nonbmp': nonbmp}


def main():
    src, out, n = Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3])
    axis = sys.argv[4] if len(sys.argv) > 4 else 'all'
    out.mkdir(parents=True, exist_ok=True)
    names = sorted(AXES)
    for i in range(n):
        rng = random.Random(9000 + i)
        fn = AXES[names[i % len(names)] if axis == 'all' else axis]
        lines = (src / f"doc_{i}.md").read_text(encoding='utf-8').split('\n')
        mutated = [fn(l, rng) for l in lines]
        (out / f"doc_{i}.md").write_text('\n'.join(mutated), encoding='utf-8')
    print(f"{n} variant books ({axis}) -> {out}")


if __name__ == '__main__':
    main()

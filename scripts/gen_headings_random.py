#!/usr/bin/env python3
"""Random differential fixture for the heading analyzer: seeded random
heading lists through the REFERENCE's analyze_headings +
detect_running_head + apply_read_aloud_rules
(src/book_converter/analyzer.py) — dash-variant normalization merging,
most-frequent-level tie-break, dynamic running-head threshold, and every
static exclusion pattern (page-number, decoration, section-label,
reference, footnote).

TSV (escapes \\\\ \\t \\n \\r):
  A\t<case>\t<n_pages>\t<threshold>
  H\t<case>\t<level>\t<text>
  P\t<case>\t<idx>\t<text>\t<level>\t<read_aloud>      (processed, in order)
  Y\t<case>\t<norm>\t<level>\t<count>\t<levels ,>\t<running>  (sorted by norm)

Usage: python3 scripts/gen_headings_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.models import Heading
from src.book_converter.analyzer import (
    analyze_headings, detect_running_head, apply_read_aloud_rules)

FW = str.maketrans("0123456789", "０１２３４５６７８９")
DASHES = ["-", "―", "—", "–", "‐", "−", "ー", "－"]
BASES = ["実践ガイド", "Design Patterns", "はじめに", "第1章 概要", "データ分析", "API"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_text(rng):
    k = rng.random()
    base = rng.choice(BASES)
    n = str(rng.randint(1, 99))
    if rng.random() < 0.3:
        n = n.translate(FW)
    if k < 0.3:
        # running-head candidate with dash variants (normalization merge)
        return f"{base} {rng.choice(DASHES)} 技術評論"
    if k < 0.4:
        return f"{base} {rng.choice(['―', '—'])} {n} / {rng.randint(1, 99)}"  # page-number pat
    if k < 0.46:
        return rng.choice(["◆◆◆", "■□■", "●", "◆x◆"])  # decoration (last one shouldn't match)
    if k < 0.52:
        return f"Section {rng.randint(1, 9)}.{rng.randint(1, 9)}" + rng.choice(["", " extra"])
    if k < 0.56:
        return rng.choice(["Webサイト", "Webサイト ", "webサイト"])
    if k < 0.62:
        return f"注{n}.{rng.randint(1, 9)}" + rng.choice(["", " 補足"])
    if k < 0.72:
        return f"{base}{rng.choice(DASHES)}{n}"
    return "".join(rng.choice("ab技評12 ―—.") for _ in range(rng.randint(1, 18)))


def main(out_path, cases=200, seed=24680):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        n_pages = rng.randint(1, 30)
        threshold = rng.choice([0.5, 0.5, 0.3, 0.8])
        pool = [rand_text(rng) for _ in range(rng.randint(1, 6))]
        headings = []
        for _ in range(rng.randint(1, 25)):
            headings.append(Heading(level=rng.choice([1, 1, 2, 3]),
                                    text=rng.choice(pool) if rng.random() < 0.7
                                    else rand_text(rng)))
        analyses = analyze_headings(headings)
        analyses = detect_running_head(analyses, n_pages, threshold)
        processed = apply_read_aloud_rules(headings, analyses)
        rows.append(f"A\t{c}\t{n_pages}\t{threshold}")
        for h in headings:
            rows.append(f"H\t{c}\t{h.level}\t{esc(h.text)}")
        for i, p in enumerate(processed):
            rows.append(f"P\t{c}\t{i}\t{esc(p.text)}\t{p.level}\t{int(p.read_aloud)}")
        for a in sorted(analyses, key=lambda a: a.text):
            rows.append(f"Y\t{c}\t{esc(a.text)}\t{a.level}\t{a.count}\t"
                        f"{','.join(str(l) for l in a.levels)}\t{int(a.is_running_head)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

#!/usr/bin/env python3
"""Random differential fixture for paragraph assembly: seeded random line
blocks through the REFERENCE's parse_paragraph, parse_paragraph_lines,
split_paragraphs and merge_continuation_paragraphs
(src/book_converter/parser/paragraph.py) — the ""-join + continuation
semantics that diverge easily when ported.

TSV (escapes \\\\ \\t \\n \\r):
  B\t<case>\t<line>                 (block line, in order)
  P\t<case>\t<has>\t<text>\t<read_aloud>     (parse_paragraph of the block)
  L\t<case>\t<has>\t<text>\t<read_aloud>     (parse_paragraph_lines of the block)
  S\t<case>\t<idx>\t<text>\t<read_aloud>     (split_paragraphs of joined text)
  M\t<case>\t<idx>\t<text>\t<read_aloud>     (merge_continuation of the splits)

Usage: python3 scripts/gen_paragraphs_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.parser.paragraph import (
    parse_paragraph, parse_paragraph_lines, split_paragraphs,
    merge_continuation_paragraphs)

PIECES = ["これは文章です。", "続きの文", "However, the design", "は以下の通り。",
          "。", "、まだ続く", "End.", "ですます調だ。", "「引用", "」とした。",
          "wrap-", "around", "１２３", "…"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_block(rng):
    lines = []
    for _ in range(rng.randint(1, 7)):
        k = rng.random()
        if k < 0.15:
            lines.append("")
        elif k < 0.25:
            lines.append(rng.choice([" ", "　", "\t"]))
        else:
            lines.append("".join(rng.choice(PIECES)
                                 for _ in range(rng.randint(1, 4))))
    return lines


def main(out_path, cases=300, seed=11111):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        block = rand_block(rng)
        for bl in block:
            rows.append(f"B\t{c}\t{esc(bl)}")
        p = parse_paragraph(block)
        rows.append(f"P\t{c}\t{int(p is not None)}\t{esc(p.text) if p else ''}\t"
                    f"{int(p.read_aloud) if p else ''}")
        pl = parse_paragraph_lines(block)
        rows.append(f"L\t{c}\t{int(pl is not None)}\t{esc(pl.text) if pl else ''}\t"
                    f"{int(pl.read_aloud) if pl else ''}")
        splits = split_paragraphs("\n".join(block))
        for i, sp in enumerate(splits):
            rows.append(f"S\t{c}\t{i}\t{esc(sp.text)}\t{int(sp.read_aloud)}")
        merged = merge_continuation_paragraphs(splits)
        for i, mp in enumerate(merged):
            rows.append(f"M\t{c}\t{i}\t{esc(mp.text)}\t{int(mp.read_aloud)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

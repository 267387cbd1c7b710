#!/usr/bin/env python3
"""Random differential fixture for the page-marker recognizers: seeded
random marker-ish lines through the REFERENCE's extract_page_number and
parse_page_metadata (src/book_converter/parser/page.py:78,135) — the
highest regex-quirk-density surface (4 marker patterns, \\d = Unicode Nd,
int() of full-width digits, str.strip semantics).

TSV the TextSpec replays (escapes \\\\ \\t \\n \\r):
  L\t<case>\t<line>
  R\t<case>\t<number>\t<source_file>\t<has_meta>[\t<text>\t<type>\t<section>\t<cur>\t<tot>]

Usage: python3 scripts/gen_markers_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.parser.page import extract_page_number, parse_page_metadata

FW = str.maketrans("0123456789", "０１２３４５６７８９")
SECTIONS = ["はじめに", "第1節", "第２節", "概要", "Design", "", "A節B", "まとめ "]
FILES = ["page_0001.png", "scan 12.jpeg", "ページ_３.txt", "x", "a/b.png", "no-digits",
         "page_００７.png", " spaced .png "]
WS = [" ", "  ", "\t", "　", ""]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_num(rng):
    n = str(rng.randint(0, 9999))
    k = rng.random()
    if k < 0.3:
        return n.translate(FW)            # full-width
    if k < 0.4:
        return "0" * rng.randint(1, 3) + n  # zero-padded
    if k < 0.45:
        return n[:1] + n[1:].translate(FW)  # mixed width
    return n


def rand_line(rng):
    k = rng.random()
    w = lambda: rng.choice(WS)
    if k < 0.22:
        return f"---{w()}Page {rand_num(rng)} ({rng.choice(FILES)}){w()}---"
    if k < 0.40:
        return f"---{w()}ページ{w()}{rand_num(rng)}{w()}---"
    if k < 0.52:
        return f"---{w()}page:{w()}{rng.choice(FILES)}{w()}---"
    if k < 0.62:
        return f"---{w()}{rng.choice(FILES)}{w()}---"
    if k < 0.78:
        sec = rng.choice(SECTIONS)
        cur, tot = rand_num(rng), rand_num(rng)
        return f"{w()}{sec}{w()}{cur} /{w()}{tot}{w()}"
    if k < 0.86:  # broken/partial markers
        return rng.choice(["--- Page ---", "-- Page 3 --", "--- Page3(x.png) ---",
                           "--- ぺージ 3 ---", "---", "Page 5 (a.png)",
                           f"--- Page {rand_num(rng)} (", "1 / ", "/ 3", "4 / 5 / 6"])
    return "".join(rng.choice("ab本文12 /()-―") for _ in range(rng.randint(0, 25)))


def main(out_path, cases=400, seed=555):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        line = rand_line(rng)
        num, src = extract_page_number(line)
        meta = parse_page_metadata(line.strip())
        rows.append(f"L\t{c}\t{esc(line)}")
        if meta is None:
            rows.append(f"R\t{c}\t{esc(num)}\t{esc(src)}\t0")
        else:
            rows.append(f"R\t{c}\t{esc(num)}\t{esc(src)}\t1\t{esc(meta.text)}\t"
                        f"{meta.meta_type}\t{esc(meta.section_name)}\t{meta.current}\t{meta.total}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

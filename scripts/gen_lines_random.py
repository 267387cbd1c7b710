#!/usr/bin/env python3
"""Random differential fixture for the remaining line recognizers:
seeded random lines through the REFERENCE's parse_toc_marker,
parse_content_marker, parse_heading_with_warning, is_list_line,
parse_figure_comment, parse_figure_placeholder — plus random TOC blocks
through parse_toc_lines (merge/normalize/split/entry parsing).

TSV (escapes \\\\ \\t \\n \\r):
  L\t<case>\t<line>
  R\t<case>\t<tocm>\t<contm>\t<h?>\t<hlvl>\t<htext>\t<w?>\t<warn>\t<list?>\t<ltype>\t<lcontent>\t<figc?>\t<figc>\t<figp?>\t<figp>
  T\t<case>\t<line>                            (toc block line, in order)
  E\t<case>\t<text>\t<level>\t<number>\t<page> (expected entries, in order)

Usage: python3 scripts/gen_lines_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.parser.toc import (
    parse_toc_marker, parse_content_marker, parse_toc_lines)
from src.book_converter.parser.heading import parse_heading_with_warning
from src.book_converter.parser.utils import is_list_line
from src.book_converter.parser.figure import parse_figure_comment, parse_figure_placeholder

FW = str.maketrans("0123456789", "０１２３４５６７８９")
TITLES = ["はじめに", "Design Guide", "まとめと考察", "データ", "API リファレンス"]
LEADERS = ["…………", "・・・・", "....", "──", " ", "    ", "⋯⋯"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def num(rng, dots=1):
    s = ".".join(str(rng.randint(1, 30)) for _ in range(dots))
    return s.translate(FW) if rng.random() < 0.3 else s


def rand_line(rng):
    k = rng.random()
    ws = rng.choice(["", " ", "  ", "\t", "　"])
    t = rng.choice(TITLES)
    if k < 0.1:
        return f"<!--{ws}{rng.choice(['', '/'])}{ws}{rng.choice(['toc', 'TOC', 'Toc', 'tOc'])}{ws}-->"
    if k < 0.2:
        return f"<!--{ws}{rng.choice(['', '/'])}{ws}{rng.choice(['content', 'CONTENT', 'skip', 'Skip'])}{ws}-->"
    if k < 0.32:
        return "#" * rng.randint(1, 8) + rng.choice(["", " ", "  ", "\t"]) + rng.choice([t, "", f"{num(rng, 2)} {t}"])
    if k < 0.4:
        return ws + rng.choice(["●", "•", "・", "-", "*", "◎", "○"]) + rng.choice(["", " "]) + rng.choice([t, ""])
    if k < 0.5:
        return ws + rng.choice([f"{num(rng)}. {t}", f"({rng.randint(1, 9)}) {t}", f"③ {t}",
                                f"{num(rng)}．{t}", f"{rng.randint(1, 9)}） {t}", f"{num(rng)})"])
    if k < 0.6:
        return f"<!--{ws}{rng.choice(['FIGURE', 'figure', 'Figure'])}:{ws}{rng.choice(['a/b.png', 'img 2.jpg', '', '図.png'])}{ws}-->"
    if k < 0.7:
        return rng.choice([f"[図{num(rng)}]", f"x [写真 {num(rng)}] y", "[表]", "[イラスト abc]",
                           "[グラフ", "[チャート①]", f"[{t}]"])
    if k < 0.8:  # broken variants
        return rng.choice(["<!-- toc->", "<!--/ toc -->", "#", "## ", "<!-- figure path -->",
                           " # not heading", "1.", "●", "<!-- skipx -->"])
    return "".join(rng.choice("ab図表#・12<!-> ") for _ in range(rng.randint(0, 16)))


def toc_block(rng):
    lines = []
    for _ in range(rng.randint(2, 8)):
        k = rng.random()
        t = rng.choice(TITLES)
        if k < 0.3:
            lines.append(f"{num(rng, rng.randint(1, 3))} {t} {rng.choice(LEADERS)} {num(rng)}")
        elif k < 0.45:
            lines.append(f"第{num(rng)}章 {t} {rng.choice(LEADERS)} {num(rng)}")
        elif k < 0.6:  # split across two lines (merge path)
            lines.append(f"{num(rng, 2)} {t}")
            lines.append(f"{rng.choice(LEADERS)} {num(rng)}")
        elif k < 0.7:
            lines.append(f"{t} {num(rng)}")
        elif k < 0.8:
            lines.append("")
        else:
            lines.append(t)
    return lines


def main(out_path, cases=300, seed=13579):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        line = rand_line(rng)
        tm = parse_toc_marker(line)
        cm = parse_content_marker(line)
        h, warn = parse_heading_with_warning(line)
        li, lt, lc = is_list_line(line)
        fc = parse_figure_comment(line)
        fp = parse_figure_placeholder(line)
        rows.append(f"L\t{c}\t{esc(line)}")
        rows.append("\t".join([
            "R", str(c), tm.value if tm else "", cm.value if cm else "",
            str(int(h is not None)), str(h.level) if h else "",
            esc(h.text) if h else "", str(int(warn is not None)), esc(warn or ""),
            str(int(li)), lt, esc(lc),
            str(int(fc is not None)), esc(fc or ""),
            str(int(fp is not None)), esc(fp["marker"] if fp else "")]))
        block = toc_block(rng)
        entries = parse_toc_lines(block)
        for bl in block:
            rows.append(f"T\t{c}\t{esc(bl)}")
        for e in entries:
            rows.append(f"E\t{c}\t{esc(e.text)}\t{e.level}\t{esc(e.number)}\t{esc(e.page)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

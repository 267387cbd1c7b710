#!/usr/bin/env python3
"""Random differential fixture for heading-text normalization: seeded
random texts through the REFERENCE's normalize_number_format,
normalize_spaces and is_special_marker
(src/book_converter/parser/heading_normalizer.py) — full-width digits
and dots, exotic Unicode Nd digits (the \\d separator pattern matches
them), separator joins vs text hyphens, iterative space collapsing.

TSV (escapes \\\\ \\t \\n \\r):
  X\t<case>\t<input>\t<number_format>\t<spaces>\t<special 0/1>

Usage: python3 scripts/gen_normalize_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.parser.heading_normalizer import (
    normalize_number_format, normalize_spaces, is_special_marker)

FW = str.maketrans("0123456789", "０１２３４５６７８９")
AR = str.maketrans("0123456789", "٠١٢٣٤٥٦٧٨٩")  # Arabic-Indic Nd


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def num(rng):
    s = str(rng.randint(0, 99))
    k = rng.random()
    if k < 0.3:
        return s.translate(FW)
    if k < 0.4:
        return s.translate(AR)
    return s


def rand_text(rng):
    k = rng.random()
    seps = ["-", "・", ".", "．"]
    if k < 0.25:
        return f"{num(rng)}{rng.choice(seps)}{num(rng)}{rng.choice(seps)}{num(rng)} タイトル"
    if k < 0.4:
        return f"第{rng.choice([' ', '  ', ''])}{num(rng)}{rng.choice([' ', '  ', ''])}{rng.choice(['章', '節', '回'])} 概要"
    if k < 0.55:
        return f"{num(rng)}.{rng.choice([' ', '  ', '   '])}{num(rng)}.{rng.choice([' ', ''])}{num(rng)} x"
    if k < 0.65:
        return rng.choice(["SRE-based design", "UTF-8 と CP932", "A-1 と 2-3", "wi-fi 3-4-5"])
    if k < 0.75:
        return rng.choice(["■重要", "◆ ノート", " ■先頭空白", "※注意", "●", "テキスト■"])
    return "".join(rng.choice("ab第章節 .-・．１2٣ ■◆") for _ in range(rng.randint(0, 20)))


def main(out_path, cases=400, seed=99999):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        t = rand_text(rng)
        rows.append(f"X\t{c}\t{esc(t)}\t{esc(normalize_number_format(t))}\t"
                    f"{esc(normalize_spaces(t))}\t{int(is_special_marker(t))}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

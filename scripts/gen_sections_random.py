#!/usr/bin/env python3
"""Random differential fixture for section-number extraction: seeded
random texts/configs through the REFERENCE's extract_section_from_heading,
extract_section_from_page_metadata, parse_section_number and _find_toc_key
(src/book_converter/page_grouper/{section,hierarchy}.py) — full-width
digits, lstrip('0') ascii-only quirk, re.escape'd keywords, IGNORECASE,
emphasis front-matter veto, zero-pad TOC lookup.

TSV (escapes \\\\ \\t \\n \\r):
  S\t<case>\t<cfg>\t<text>\t<h_has>\t<h_val>\t<m_has>\t<m_val>
  N\t<case>\t<input>\t<has>\t<number>\t<parts ,-joined>\t<level>
  K\t<case>\t<number>\t<keys ,-joined>\t<has>\t<key>
cfg = ';'-joined level:kw|kw entries, empty = no config.

Usage: python3 scripts/gen_sections_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.models import HeaderLevelConfig
from src.book_converter.page_grouper.section import (
    extract_section_from_heading, extract_section_from_page_metadata,
    parse_section_number)
from src.book_converter.page_grouper.hierarchy import _find_toc_key

FW = str.maketrans("0123456789", "０１２３４５６７８９")
KEYWORDS = ["chapter", "Episode", "COLUMN", "第", "c++", "ep.", "回", "part(a)"]
TITLES = ["はじめに", "Design Overview", "まとめ", "データ 分析", ""]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_num(rng, dots=True):
    parts = [str(rng.randint(0, 99)) for _ in range(rng.randint(1, 3) if dots else 1)]
    s = ".".join(parts)
    k = rng.random()
    if k < 0.25:
        s = s.translate(FW)
    elif k < 0.35:
        s = "0" * rng.randint(1, 2) + s
    elif k < 0.4:
        s = "０" + s  # full-width zero pad: lstrip('0') must NOT strip it
    return s


def rand_text(rng):
    k = rng.random()
    num = rand_num(rng)
    title = rng.choice(TITLES)
    if k < 0.12: return f"{num} {title}"
    if k < 0.2: return f"{num}\t\n {title}"          # ws normalization
    if k < 0.28: return f"第{rand_num(rng, dots=False)}章 {title}"
    if k < 0.36: return f"{rng.choice(['Section','chapter','EPISODE','Part'])} {num} {title}"
    if k < 0.46: return f"{rng.choice(KEYWORDS)}{rng.choice(['', ' ', '  '])}{rand_num(rng, dots=False)} {title}"
    if k < 0.52: return f"{rng.randint(1, 9)} / {rng.randint(1, 9)}"  # page-format veto
    if k < 0.56: return f"<emphasis>{title}</emphasis> {num}"
    if k < 0.62: return f"{rng.randint(1, 20)} {rng.randint(1, 20)} {title}"  # digit lookahead
    if k < 0.7: return f"{title} {num}"               # number not at start
    return "".join(rng.choice("ab第章 .1２/") for _ in range(rng.randint(0, 14)))


def rand_cfg(rng):
    if rng.random() < 0.45:
        return "", None
    entries = []
    for lvl in rng.sample([1, 2, 3, 4, 5], rng.randint(1, 2)):
        kws = rng.sample(KEYWORDS, rng.randint(1, 2))
        entries.append((lvl, kws))
    entries.sort()
    spec = ";".join(f"{l}:{'|'.join(k)}" for l, k in entries)
    args = {f"level{l}": "|".join(k) for l, k in entries}
    return spec, HeaderLevelConfig.from_cli_args(**args)


def main(out_path, cases=300, seed=8888):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        spec, cfg = rand_cfg(rng)
        text = rand_text(rng)
        h = extract_section_from_heading(text, cfg)
        m = extract_section_from_page_metadata(text, cfg)
        rows.append(f"S\t{c}\t{esc(spec)}\t{esc(text)}\t{int(h is not None)}\t"
                    f"{esc(h or '')}\t{int(m is not None)}\t{esc(m or '')}")
        sn_in = rng.choice([rand_num(rng), "1..2", "1.", ".5", "", "1.2.3.4",
                            "00", "０１", "1.０２", "a.1"])
        sn = parse_section_number(sn_in)
        if sn is None:
            rows.append(f"N\t{c}\t{esc(sn_in)}\t0\t\t\t")
        else:
            rows.append(f"N\t{c}\t{esc(sn_in)}\t1\t{esc(sn.raw)}\t"
                        f"{','.join(str(p) for p in sn.parts)}\t{sn.level}")
        keys = set()
        base = str(rng.randint(1, 9))
        for _ in range(rng.randint(0, 4)):
            keys.add(rng.choice([base, f"{base}.0", f"{base}.0.0", f"{base}.{rng.randint(1,3)}",
                                 str(rng.randint(10, 20))]))
        num = rng.choice([base, f"{base}.1", str(rng.randint(1, 20))])
        k = _find_toc_key(num, {k: None for k in keys})
        rows.append(f"K\t{c}\t{num}\t{','.join(sorted(keys))}\t{int(k is not None)}\t{k or ''}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

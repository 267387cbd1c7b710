#!/usr/bin/env python3
"""Random differential fixture for the TOC matcher: seeded random
(toc entries, body headings) through the REFERENCE's match_toc_to_body
(src/book_converter/heading_matcher.py:55) — 2-pass exact+fuzzy with
number verification and the sequential cursor (incl. its i=j quirk).

TSV the MatcherSpec replays (escapes \\\\ \\t \\n \\r):
  T\t<case>\t<threshold>\t<text>\t<level>\t<number>\t<page>
  H\t<case>\t<text>\t<level>\t<line_number>
  R\t<case>\t<toc_number>\t<toc_text>\t<match_type>\t<similarity!r>\t<line_number>

Usage: python3 scripts/gen_matcher_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.models import TocEntry, Heading
from src.book_converter.heading_matcher import match_toc_to_body

WORDS = ["はじめに", "概要", "設計", "実装", "Overview", "Design", "データ",
         "まとめ", "応用", "API", "第一部", "付録", "ｱﾍﾟﾝﾃﾞｨｸｽ", "終章"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def mutate(text, rng):
    out = list(text)
    for _ in range(rng.randint(1, max(1, len(out) // 6))):
        i = rng.randrange(len(out))
        k = rng.random()
        if k < 0.4 and len(out) > 2:
            del out[i]
        elif k < 0.7:
            out[i] = rng.choice("abcxyz誤字脱")
        else:
            out.insert(i, rng.choice("abcxyz誤字脱"))
    return "".join(out)


def main(out_path, cases=250, seed=77777):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        n = rng.randint(1, 9)
        toc = []
        for t in range(n):
            num = rng.choice([f"{t+1}", f"{t+1}.{rng.randint(1,4)}",
                              f"0{t+1}", "", f"{t+1}.{rng.randint(1,3)}.{rng.randint(1,3)}"])
            text = " ".join(rng.sample(WORDS, rng.randint(1, 3)))
            toc.append(TocEntry(text=text, level=rng.randint(1, 3), number=num,
                                page=str(rng.randint(1, 300))))
        headings = []
        line = rng.randint(1, 5)
        for e in toc:
            r = rng.random()
            if r < 0.15:
                continue  # missing
            if r < 0.45:
                htext = e.text  # exact title
            elif r < 0.65 and e.number:
                htext = f"{e.number} {e.text}"  # number-prefixed exact
            elif r < 0.85:
                htext = mutate(e.text, rng)  # fuzzy
            else:
                htext = f"{rng.randint(1, 20)} {mutate(e.text, rng)}"  # maybe-wrong number
            headings.append(Heading(level=rng.randint(1, 3), text=htext, line_number=line))
            line += rng.randint(1, 12)
            if rng.random() < 0.2:  # noise heading between entries
                headings.append(Heading(level=rng.randint(1, 3),
                                        text=rng.choice(WORDS) + "ノイズ", line_number=line))
                line += rng.randint(1, 8)
        if len(headings) > 2 and rng.random() < 0.3:
            # break monotonicity: swap two adjacent headings' positions
            i = rng.randrange(len(headings) - 1)
            headings[i], headings[i + 1] = headings[i + 1], headings[i]
        threshold = rng.choice([0.8, 0.8, 0.6])
        res = match_toc_to_body(toc, headings, similarity_threshold=threshold)
        rows.append(f"T\t{c}\t{threshold}\t" +
                    "\t".join(f"{esc(e.text)}\t{e.level}\t{esc(e.number)}\t{e.page}"
                              for e in toc))
        for h in headings:
            rows.append(f"H\t{c}\t{esc(h.text)}\t{h.level}\t{h.line_number}")
        for m in res:
            rows.append(f"R\t{c}\t{esc(m.toc_entry.number)}\t{esc(m.toc_entry.text)}\t"
                        f"{m.match_type.value}\t{m.similarity!r}\t{m.line_number}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

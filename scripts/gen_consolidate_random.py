#!/usr/bin/env python3
"""Random differential fixture for the consolidate sink: seeded random
(page name, rover text, headings) books run through the REFERENCE's
consolidate_rover_output (real hashdir round-trip, so filesystem/json
quirks are in play: newline translation on read, filename sorting,
duplicate-name overwrite, empty-name '.txt' stem).

Writes a TSV the ConsolidateSpec replays:
  P\t<case>\t<name>\t<text>\t<h1>\t<h2>...   (one per page, in save order)
  T\t<case>\t<book.txt bytes>
  M\t<case>\t<book.md bytes>
Escapes: \\\\ \\t \\n \\r.

Usage: python3 scripts/gen_consolidate_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types, tempfile
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
pil = types.ModuleType('PIL'); pil.Image = types.ModuleType('PIL.Image')
sys.modules['PIL'] = pil; sys.modules['PIL.Image'] = pil.Image

from src.rover.output import ROVEROutput
from src.consolidate import consolidate_rover_output

NAME_CHARS = list("abcXYZ019._- !()") + ["０", "１", "第", "章", "　", "\U0001f600", "\ufffd"]
TEXT_CHARS = list("abc XYZ 見出し 本文 123  \t") + ["\n", "\r", "\r\n", "　", "\U00020bb7", "**"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_name(rng):
    if rng.random() < 0.04:
        return ""  # empty name -> file ".txt" -> stem ".txt"
    n = "".join(rng.choice(NAME_CHARS) for _ in range(rng.randint(1, 10)))
    return n.replace("/", "_")  # '/' would nest a dir the glob can't see


def rand_text(rng):
    return "".join(rng.choice(TEXT_CHARS) for _ in range(rng.randint(0, 120)))


def main(out_path, cases=250, seed=20260816):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        pages = []
        for _ in range(rng.randint(1, 6)):
            name, text = rand_name(rng), rand_text(rng)
            # headings: stripped lines of the text (post-translation view),
            # plus noise entries and occasional \r variants
            lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
            hs = [l.strip() for l in lines if l.strip() and rng.random() < 0.5]
            if rng.random() < 0.3:
                hs.append("no-match-" + str(rng.randint(0, 9)))
            if rng.random() < 0.1:
                hs.append("x\ry")
            if rng.random() < 0.25 and pages:
                name = pages[rng.randrange(len(pages))][0]  # duplicate name
            pages.append((name, text, hs))
        with tempfile.TemporaryDirectory() as d:
            out = ROVEROutput(Path(d) / "ocr_output")
            for name, text, hs in pages:
                out.save_rover(name, text)
                out.save_headings(name, hs)
            txt_p, md_p = consolidate_rover_output(d)
            txt = Path(txt_p).read_text(encoding="utf-8")
            md = Path(md_p).read_text(encoding="utf-8")
        for name, text, hs in pages:
            rows.append("\t".join(["P", str(c), esc(name), esc(text)] + [esc(h) for h in hs]))
        rows.append(f"T\t{c}\t{esc(txt)}")
        rows.append(f"M\t{c}\t{esc(md)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

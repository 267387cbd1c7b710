#!/usr/bin/env python3
"""Golden generator for the consolidate sink (book.txt / book.md).

Runs the REFERENCE implementation (/root/reference, public repo):
derives per-page ROVER inputs from a markdown book via the reference
parser (the same derivation graft.sink.Consolidate.roverPages uses),
writes them into a real hashdir layout (ocr_output/rover/*.txt +
headings.json via ROVEROutput), then runs consolidate_rover_output and
captures the book.txt / book.md bytes.

Usage: python3 scripts/gen_consolidate_golden.py <book.md> <out_prefix>
Writes <out_prefix>.book.txt and <out_prefix>.book.md
"""
import sys, types, tempfile
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
# src.rover's package __init__ imports the OCR engine runners, which need
# PIL (absent in this sandbox); stub it — consolidate never touches images
pil = types.ModuleType('PIL'); pil.Image = types.ModuleType('PIL.Image')
sys.modules['PIL'] = pil
sys.modules['PIL.Image'] = pil.Image

from src.book_converter.parser.page import parse_pages_with_errors
from src.book_converter.models import Heading, Paragraph, List as ListEl
from src.rover.output import ROVEROutput
from src.consolidate import consolidate_rover_output


def rover_inputs(pages):
    """Same derivation as graft.sink.Consolidate.roverPages."""
    for p in pages:
        name = Path(p.source_file).stem if p.source_file else f"page_{p.number}"
        lines, headings = [], []
        for e in p.content.elements:
            if isinstance(e, Heading):
                lines.append(e.text)
                headings.append(e.text)
            elif isinstance(e, Paragraph):
                lines.append(e.text)
            elif isinstance(e, ListEl):
                lines.append("\n".join(e.items))
        yield name, "\n".join(lines), headings


def main(md_path, out_prefix):
    pages, _errors, _toc = parse_pages_with_errors(Path(md_path))
    with tempfile.TemporaryDirectory() as d:
        out = ROVEROutput(Path(d) / "ocr_output")
        for name, text, hs in rover_inputs(pages):
            out.save_rover(name, text)
            out.save_headings(name, hs)
        try:
            txt_path, md_file = consolidate_rover_output(d)
        except FileNotFoundError:
            # zero-page book: the reference raises (consolidate.py:34,48);
            # record the raise kind so sweeps can assert parity
            Path(out_prefix + ".book.raise").write_text(
                "FileNotFoundError", encoding="utf-8")
            print(f"golden -> {out_prefix}.book.raise (reference raises)")
            return
        Path(out_prefix + ".book.txt").write_text(
            Path(txt_path).read_text(encoding="utf-8"), encoding="utf-8")
        Path(out_prefix + ".book.md").write_text(
            Path(md_file).read_text(encoding="utf-8"), encoding="utf-8")
    print(f"golden -> {out_prefix}.book.txt / .book.md")


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])

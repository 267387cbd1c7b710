#!/usr/bin/env python3
"""XML golden generator: RUNS the reference's convert_book on each dumped
book, producing the sweep inputs XmlSweep / GroupedSweep expect:
  doc_i.ref.xml      (plain book.xml bytes)
  doc_i.grouped.xml  (--group-pages bytes, when it succeeds)
  grouped_status.txt (one line per book: OK | RAISED:<ExceptionName>)

Round 2 generated these inline; this commits the workflow.
Usage: python3 scripts/gen_xml_golden.py <dir> <n>
"""
import sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.cli import convert_book


def main(d, n):
    d = Path(d)
    statuses = []
    for i in range(n):
        md = d / f"doc_{i}.md"
        try:
            convert_book(md, d / f"doc_{i}.ref.xml")
        except Exception as e:
            print(f"doc_{i} PLAIN RAISED {type(e).__name__}: {e}", file=sys.stderr)
        try:
            convert_book(md, d / f"doc_{i}.grouped.xml", group_pages=True)
            statuses.append("OK")
        except Exception as e:
            statuses.append("RAISED:" + type(e).__name__)
    (d / "grouped_status.txt").write_text("\n".join(statuses) + "\n", encoding="utf-8")
    ok = sum(1 for s in statuses if s == "OK")
    print(f"{n} books: grouped OK={ok} raised={n - ok}")


if __name__ == '__main__':
    main(sys.argv[1], int(sys.argv[2]))

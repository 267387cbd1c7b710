#!/usr/bin/env python3
"""Threshold-parity golden: runs the reference convert_book on
fixtures/runhead_book.md at --running-head-threshold 0.3 AND the default
0.5, committing both XML outputs. The book has a level-1 heading on 4 of
10 pages, so max(10*0.3, 2)=3 <= 4 < 5 = max(10*0.5, 2): the heading is a
running head only at 0.3 — the two goldens MUST differ (the spec asserts
it), proving the threshold parameter is live end-to-end.
Usage: python3 scripts/gen_threshold_golden.py
"""
import sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')

from src.book_converter.cli import convert_book

FIX = Path(__file__).resolve().parent.parent / 'src/test/resources/fixtures'

for ratio, tag in [(0.3, 'th03'), (0.5, 'th05')]:
    out = FIX / f'runhead_book.{tag}.ref.xml'
    convert_book(FIX / 'runhead_book.md', out, running_head_threshold=ratio)
    print(tag, len(out.read_bytes()), 'bytes')

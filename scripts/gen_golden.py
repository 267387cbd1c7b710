#!/usr/bin/env python3
"""Golden-fixture generator: runs the REFERENCE implementation
(/root/reference, public repo) on a markdown book and dumps the expected
output span sequence in this repo's span model (TSV).

Usage: python3 scripts/gen_golden.py <book.md> <out.tsv>

The span emission order mirrors graft.pipeline.Extract:
  toc entries, then per page: page span, content elements (headings with
  read-aloud rules applied), figures, page metadata — the reference's live
  transform_page order (src/book_converter/transformer.py:307-338).
"""
import sys, types

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake

sys.path.insert(0, '/root/reference')
from pathlib import Path
from src.book_converter.parser.page import parse_pages_with_errors
from src.book_converter.analyzer import analyze_headings, detect_running_head, apply_read_aloud_rules
from src.book_converter.models import Heading, Paragraph, List as ListEl


def esc(s):
    return s.replace('\\', '\\\\').replace('\t', '\\t').replace('\n', '\\n')


def main(md_path, out_path):
    pages, errors, toc = parse_pages_with_errors(Path(md_path))
    all_headings = []
    for p in pages:
        for e in p.content.elements:
            if isinstance(e, Heading):
                all_headings.append(e)
    analyses = analyze_headings(all_headings)
    analyses = detect_running_head(analyses, len(pages))
    processed = apply_read_aloud_rules(all_headings, analyses)
    hmap = {id(o): pr for o, pr in zip(all_headings, processed)}

    rows = []

    def emit(kind, text, media, page_no, level, ra, attrs):
        rows.append((len(rows), kind, text, media, page_no, level, ra, attrs))

    if toc is not None:
        for e in toc.entries:
            emit('toc', e.text, '', e.page, e.level, True,
                 f'number={e.number}' if e.number else '')
    for p in pages:
        emit('page', p.number, '', p.number, 0, False, f'sourceFile={p.source_file}')
        # live path emits the pageAnnouncement first inside each <page>
        # (transformer.py:318-321, text "Nページ", readAloud always false)
        if p.announcement is not None:
            emit('announcement', p.announcement.text, '', p.number, 0, False,
                 f'format={p.announcement.format}')
        for el in p.content.elements:
            if isinstance(el, Heading):
                el = hmap[id(el)]
                emit('heading', el.text, '', p.number, el.level, el.read_aloud, '')
            elif isinstance(el, Paragraph):
                emit('paragraph', el.text, '', p.number, 0, el.read_aloud, '')
            elif isinstance(el, ListEl):
                emit('list', '\n'.join(el.items), '', p.number, 0, el.read_aloud,
                     f'listType={el.list_type}')
        for f in p.figures:
            emit('figure', f.caption, f.path, p.number, 0, False, '')
        if p.metadata is not None:
            emit('pagemeta', p.metadata.text, '', p.number, 0, False,
                 f'metaType={p.metadata.meta_type}')

    with open(out_path, 'w', encoding='utf-8') as f:
        f.write('# offset\tkind\ttext\tmedia_ref\tpage_no\tlevel\tread_aloud\tattrs\n')
        for (o, k, t, m, pn, lv, ra, at) in rows:
            f.write(f'{o}\t{k}\t{esc(t)}\t{esc(m)}\t{pn}\t{lv}\t{str(ra).lower()}\t{esc(at)}\n')
    # errors sidecar
    with open(out_path.replace('.tsv', '.errors.tsv'), 'w', encoding='utf-8') as f:
        for e in errors:
            f.write(f'{e.error_type}\t{esc(e.message)}\t{e.page_number}\t{e.line_number}\n')
    print(f'{len(rows)} spans, {len(errors)} errors -> {out_path}')


if __name__ == '__main__':
    main(sys.argv[1], sys.argv[2])

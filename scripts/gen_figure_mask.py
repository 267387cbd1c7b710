#!/usr/bin/env python3
"""Reference-differential fixture for the figure-mask geometry: seeded
random (page dims, region list) cases through the REFERENCE's
mask_figures + mask_figure_regions (src/utils.py:71-129) and
create_text_mask (src/ocr_ensemble/voting.py:103-140), with a faked PIL
that tracks the ACTUAL pixel set touched:

  - ImageDraw.rectangle fills INCLUSIVE corners, clipped to the canvas,
    and raises on inverted corners (Pillow semantics)
  - crop((l,t,r,b)) has size (r-l, b-t) (pads out-of-bounds);
    paste(img, (x,y)) marks [x, x+w) x [y, y+h) clipped to the canvas

so the fixture pins the exact masked / visible pixel counts the
reference's canvases would measure (the raster fill itself is the
engine's stubbed codec boundary).

TSV:
  C\t<case>\t<w>\t<h>
  I\t<case>\t<type>\t<x1>\t<y1>\t<x2>\t<y2>          (input regions, in order)
  F\t<case>\t<n_figures>\t<masked_px>                 (mask_figures)
  M\t<case>\t<n_drawn>\t<masked_px>                   (mask_figure_regions)
  T\t<case>\t<visible_px>                             (create_text_mask)

Usage: python3 scripts/gen_figure_mask.py <out.tsv> [cases] [seed]
"""
import random
import sys
import types


class FakeImage:
    def __init__(self, size, pixels=None):
        self.size = size
        self.pixels = set() if pixels is None else pixels

    def copy(self):
        return FakeImage(self.size, set(self.pixels))

    def crop(self, box):
        l, t, r, b = box
        return FakeImage((r - l, b - t))

    def paste(self, img, pos):
        x, y = pos
        w, h = self.size
        iw, ih = img.size
        for px in range(max(0, x), min(w, x + iw)):
            for py in range(max(0, y), min(h, y + ih)):
                self.pixels.add((px, py))


class FakeDraw:
    def __init__(self, img):
        self.img = img

    def rectangle(self, box, fill=None):
        x1, y1, x2, y2 = box
        if x2 < x1 or y2 < y1:
            raise ValueError('inverted rectangle corners')
        w, h = self.img.size
        for px in range(max(0, x1), min(w, x2 + 1)):
            for py in range(max(0, y1), min(h, y2 + 1)):
                self.img.pixels.add((px, py))


def _new(mode, size, color=None):
    return FakeImage(size)


pil = types.ModuleType('PIL')
img_mod = types.ModuleType('PIL.Image')
img_mod.Image = FakeImage
img_mod.new = _new
draw_mod = types.ModuleType('PIL.ImageDraw')
draw_mod.Draw = FakeDraw
draw_mod.ImageDraw = FakeDraw
font_mod = types.ModuleType('PIL.ImageFont')
pil.Image = img_mod
pil.ImageDraw = draw_mod
pil.ImageFont = font_mod
sys.modules['PIL'] = pil
sys.modules['PIL.Image'] = img_mod
sys.modules['PIL.ImageDraw'] = draw_mod
sys.modules['PIL.ImageFont'] = font_mod

fake = types.ModuleType('src')
fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
# bypass src/ocr_ensemble/__init__.py (imports the live OCR engines)
ens = types.ModuleType('src.ocr_ensemble')
ens.__path__ = ['/root/reference/src/ocr_ensemble']
sys.modules['src.ocr_ensemble'] = ens
sys.path.insert(0, '/root/reference')

from src.utils import mask_figures, mask_figure_regions  # noqa: E402
from src.ocr_ensemble.voting import create_text_mask  # noqa: E402

TYPES = ['TEXT', 'TITLE', 'CAPTION', 'FOOTNOTE', 'FIGURE', 'FIGURE',
         'TABLE', 'FORMULA', 'ABANDON']


def main(out_path, cases=300, seed=31337):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        # small canvases keep the pixel sets cheap; coords deliberately
        # overshoot the canvas (and go negative) to pin the clip behavior
        w = rng.randint(8, 120)
        h = rng.randint(8, 120)
        n = rng.randint(0, 10)
        regions = []
        for _ in range(n):
            x1 = rng.randint(-20, w + 10)
            y1 = rng.randint(-20, h + 10)
            regions.append({
                'type': rng.choice(TYPES),
                'bbox': [x1, y1, x1 + rng.randint(0, w), y1 + rng.randint(0, h)],
            })
        rows.append('C\t%d\t%d\t%d' % (c, w, h))
        for r in regions:
            rows.append('I\t%d\t%s\t%d\t%d\t%d\t%d' % (
                c, r['type'], *r['bbox']))

        img = FakeImage((w, h))
        fig_masked = mask_figures(img, regions)
        n_fig = sum(1 for r in regions if r.get('type') == 'FIGURE')
        rows.append('F\t%d\t%d\t%d' % (c, n_fig, len(fig_masked.pixels)))

        figures = [{'bbox': r['bbox']} for r in regions if r['type'] == 'FIGURE']
        layout = {'page_0001.png': {'figures': figures}}
        region_masked = mask_figure_regions(img, 'page_0001.png', layout)
        n_drawn = 0
        for r in figures:
            x1, y1, x2, y2 = r['bbox']
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(w, x2), min(h, y2)
            if x1 < x2 and y1 < y2:
                n_drawn += 1
        rows.append('M\t%d\t%d\t%d' % (c, n_drawn, len(region_masked.pixels)))

        text_masked = create_text_mask(img, regions)
        rows.append('T\t%d\t%d' % (c, len(text_masked.pixels)))

    with open(out_path, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    print('wrote %d cases -> %s' % (cases, out_path))


if __name__ == '__main__':
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 300,
         int(sys.argv[3]) if len(sys.argv) > 3 else 31337)

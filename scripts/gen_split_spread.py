#!/usr/bin/env python3
"""Reference-differential fixture for the split-spread trim/crop geometry:
seeded random (dims, TrimConfig, overlap, mode) cases through the
REFERENCE's apply_global_trim + split_spread
(src/preprocessing/split_spread.py) with a faked PIL whose crop algebra
is PIL's (crop((l,t,r,b)) -> size (r-l, b-t), origin composition
(ox+l, oy+t)). The pixels are the engine's stubbed codec boundary; the
fixture pins every integer the reference computes: the global trim box
and the final L/R (or single) page boxes in ORIGINAL image coordinates
plus their output sizes.

TSV:
  C\t<case>\t<w>\t<h>\t<gt>\t<gb>\t<gl>\t<gr>\t<lpo>\t<lpi>\t<rpi>\t<rpo>\t<overlap>\t<mode>
  G\t<case>\t<l>\t<t>\t<r>\t<b>                      (global trim box)
  P\t<case>\t<side>\t<l>\t<t>\t<r>\t<b>\t<ow>\t<oh>  (page box, original coords)

Usage: python3 scripts/gen_split_spread.py <out.tsv> [cases] [seed]
"""
import random
import sys
import types


class FakeImage:
    """PIL.Image stand-in carrying size + origin-in-original composition."""

    def __init__(self, size, origin=(0, 0)):
        self.size = size
        self.origin = origin

    def crop(self, box):
        l, t, r, b = box
        return FakeImage((r - l, b - t), (self.origin[0] + l, self.origin[1] + t))


pil = types.ModuleType('PIL')
img_mod = types.ModuleType('PIL.Image')
img_mod.Image = FakeImage
pil.Image = img_mod
sys.modules['PIL'] = pil
sys.modules['PIL.Image'] = img_mod

fake = types.ModuleType('src')
fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
# bypass src/preprocessing/__init__.py (imports imagehash, absent here)
prep = types.ModuleType('src.preprocessing')
prep.__path__ = ['/root/reference/src/preprocessing']
sys.modules['src.preprocessing'] = prep
sys.path.insert(0, '/root/reference')

from src.preprocessing.split_spread import (  # noqa: E402
    TrimConfig, apply_global_trim, split_spread)


def main(out_path, cases=400, seed=20260817):
    rng = random.Random(seed)
    rows = []
    trim_pool = [0.0, 0.0, 0.01, 0.03, 0.049, 0.1, 0.25, 0.4999]
    for c in range(cases):
        # odd widths exercise the mid_x floor; tiny dims the degenerate crops
        w = rng.choice([rng.randint(2, 40), rng.randint(100, 4000),
                        2 * rng.randint(50, 2000) + 1])
        h = rng.choice([rng.randint(2, 40), rng.randint(100, 4000)])
        cfg = TrimConfig(*(rng.choice(trim_pool) for _ in range(8)))
        overlap = rng.choice([0, 0, 1, 8, 13, 40])
        mode = rng.choice(['spread', 'spread', 'single'])
        rows.append('C\t%d\t%d\t%d\t%r\t%r\t%r\t%r\t%r\t%r\t%r\t%r\t%d\t%s' % (
            c, w, h, cfg.global_top, cfg.global_bottom, cfg.global_left,
            cfg.global_right, cfg.left_page_outer, cfg.left_page_inner,
            cfg.right_page_inner, cfg.right_page_outer, overlap, mode))

        img = FakeImage((w, h))
        trimmed = apply_global_trim(img, cfg)
        gl, gt = trimmed.origin
        rows.append('G\t%d\t%d\t%d\t%d\t%d' % (
            c, gl, gt, gl + trimmed.size[0], gt + trimmed.size[1]))

        if mode == 'spread':
            left, right = split_spread(
                trimmed, overlap, cfg.left_page_outer, cfg.right_page_outer,
                cfg.left_page_inner, cfg.right_page_inner)
            for side, page in (('L', left), ('R', right)):
                ox, oy = page.origin
                rows.append('P\t%d\t%s\t%d\t%d\t%d\t%d\t%d\t%d' % (
                    c, side, ox, oy, ox + page.size[0], oy + page.size[1],
                    page.size[0], page.size[1]))
        else:
            ox, oy = trimmed.origin
            rows.append('P\t%d\tsingle\t%d\t%d\t%d\t%d\t%d\t%d' % (
                c, ox, oy, ox + trimmed.size[0], oy + trimmed.size[1],
                trimmed.size[0], trimmed.size[1]))

    with open(out_path, 'w') as f:
        f.write('\n'.join(rows) + '\n')
    print('wrote %d cases -> %s' % (cases, out_path))


if __name__ == '__main__':
    main(sys.argv[1],
         int(sys.argv[2]) if len(sys.argv) > 2 else 400,
         int(sys.argv[3]) if len(sys.argv) > 3 else 20260817)

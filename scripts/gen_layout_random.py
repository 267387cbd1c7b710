#!/usr/bin/env python3
"""Random differential fixture for the layout operators: seeded random
region sets through the REFERENCE's sort_reading_order + remove_overlaps
(src/layout/reading_order.py) — column split at the strict mid_x
boundary, (y, TYPE_PRIORITY, x) ties, unknown types (priority 99),
min-area IoU >= 0.5 same-type suppression with confidence ties.

TSV:
  G\t<case>\t<page_width>
  I\t<case>\t<type>\t<x1>\t<y1>\t<x2>\t<y2>\t<conf>   (input, in order)
  O\t<case>\t<idx-into-inputs of sorted output>        (sort_reading_order)
  D\t<case>\t<idx-into-inputs kept>                    (remove_overlaps)

Usage: python3 scripts/gen_layout_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
pil = types.ModuleType('PIL')
for sub in ['Image', 'ImageDraw', 'ImageFont']:
    m = types.ModuleType(f'PIL.{sub}')
    class _C:  # noqa: the lazy annotations just need attributes to exist
        pass
    m.Image = _C; m.ImageDraw = _C; m.ImageFont = _C; m.FreeTypeFont = _C
    setattr(pil, sub, m); sys.modules[f'PIL.{sub}'] = m
sys.modules['PIL'] = pil
for mod in ['cv2', 'numpy', 'torch']:
    sys.modules.setdefault(mod, types.ModuleType(mod))

from src.layout.reading_order import sort_reading_order, remove_overlaps

TYPES = ["TITLE", "TEXT", "CAPTION", "FOOTNOTE", "FIGURE", "TABLE",
         "FORMULA", "ABANDON", "UNKNOWN_KIND"]


def main(out_path, cases=250, seed=4242):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        width = rng.choice([960, 961, 1200, 100])
        n = rng.randint(1, 12)
        regions = []
        for i in range(n):
            if regions and rng.random() < 0.3:
                # near-duplicate of an earlier region (overlap suppression,
                # exact boundary cases incl. equal confidence)
                base = dict(rng.choice(regions))
                bb = base["bbox"]
                jitter = rng.choice([0, 0, rng.randint(-8, 8)])
                base["bbox"] = [bb[0] + jitter, bb[1], bb[2] + jitter, bb[3]]
                if rng.random() < 0.5:
                    base["type"] = rng.choice(TYPES)
                base["confidence"] = rng.choice([base["confidence"],
                                                 round(rng.random(), 3)])
                regions.append(base)
                continue
            # ys drawn from a small pool so exact y-ties are common; some
            # boxes straddle the exact mid_x boundary (strict <)
            x1 = rng.choice([0, 10, width // 2 - 50, width // 2, width - 60])
            y1 = rng.choice([0, 0, 100, 100, 250, 500])
            regions.append({"type": rng.choice(TYPES),
                            "bbox": [x1, y1, x1 + rng.randint(20, 120),
                                     y1 + rng.randint(10, 80)],
                            "confidence": round(rng.random(), 3)})
        # identity indices survive .copy() comparisons via full-field match
        def idx_of(r, pool, used):
            for i, p in enumerate(pool):
                if i not in used and p["type"] == r["type"] and \
                        p["bbox"] == list(r["bbox"]) and p["confidence"] == r["confidence"]:
                    used.add(i)
                    return i
            raise AssertionError("region not found")
        rows.append(f"G\t{c}\t{width}")
        for r in regions:
            bb = r["bbox"]
            rows.append(f"I\t{c}\t{r['type']}\t{bb[0]}\t{bb[1]}\t{bb[2]}\t{bb[3]}\t{r['confidence']}")
        used = set()
        for r in sort_reading_order(regions, width):
            rows.append(f"O\t{c}\t{idx_of(r, regions, used)}")
        used = set()
        for r in remove_overlaps(regions):
            rows.append(f"D\t{c}\t{idx_of(r, regions, used)}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

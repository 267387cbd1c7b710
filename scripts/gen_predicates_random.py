#!/usr/bin/env python3
"""Random differential fixture for the quality predicates: seeded random
texts/boxes through the REFERENCE's voting.is_garbage / bbox_iou /
bbox_contains, layout_ocr_utils.calc_non_char_ratio / is_low_quality,
and rover line_processing.is_garbage — python \\w (isalnum ∪ '_' incl.
Nl/No like ①Ⅷ²), repeat-run boundaries, ja-ratio thresholds, min-area
vs union IoU denominators.

TSV (escapes \\\\ \\t \\n \\r):
  T\t<case>\t<text>\t<conf>\t<pg>\t<ncr!r>\t<lowq>\t<line_g>
  B\t<case>\t<x1..y2 a>\t<x1..y2 b>\t<thr>\t<iou!r>\t<contains>

Usage: python3 scripts/gen_predicates_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
pil = types.ModuleType('PIL')
for sub in ['Image', 'ImageDraw', 'ImageFont']:
    m = types.ModuleType(f'PIL.{sub}')
    class _C:
        pass
    m.Image = _C; m.ImageDraw = _C; m.ImageFont = _C; m.FreeTypeFont = _C
    setattr(pil, sub, m); sys.modules[f'PIL.{sub}'] = m
sys.modules['PIL'] = pil
for mod in ['cv2', 'numpy', 'torch']:
    sys.modules.setdefault(mod, types.ModuleType(mod))

from src.ocr_ensemble.voting import is_garbage as page_garbage, bbox_iou, bbox_contains
from src.layout_ocr_utils import calc_non_char_ratio, is_low_quality
from src.rover.line_processing import is_garbage as line_garbage

CHUNKS = ["こんにちは", "カタカナ", "漢字文章", "hello", "WORLD", "123", "１２３",
          "①Ⅷ²", "_under_", "・・・", "!!!!", "◆◆", "  ", "😀😀", "ー", "、。"]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def rand_text(rng):
    k = rng.random()
    if k < 0.1:
        return ""
    if k < 0.25:
        # repeat-run boundary: 9 vs 10 identical chars
        return rng.choice(["あ", "x", "・", "！"]) * rng.choice([8, 9, 10, 11]) + \
            rng.choice(["", "tail"])
    if k < 0.4:
        # special-char runs straddling the 10-run rule (\\w semantics!)
        return "日本語" + rng.choice(["・!・!・!・!・!", "①Ⅷ²①Ⅷ²①Ⅷ²①Ⅷ²",
                                       "__________", "!!!!!!!!!", "．。、・！？…‥〜ー"])
    n = rng.randint(1, 14)
    return "".join(rng.choice(CHUNKS) for _ in range(n))


def main(out_path, cases=400, seed=246810):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        t = rand_text(rng)
        conf = round(rng.uniform(0.2, 1.0), 3)
        pg = page_garbage(t)
        ncr = calc_non_char_ratio(t)
        lowq = is_low_quality(t)
        lg = line_garbage(t, conf)
        rows.append(f"T\t{c}\t{esc(t)}\t{conf}\t{int(pg)}\t{ncr!r}\t{int(lowq)}\t{int(lg)}")
        # boxes: include exact-overlap, touching-edge, containment shapes
        def box():
            x1 = rng.randint(0, 200); y1 = rng.randint(0, 200)
            return [x1, y1, x1 + rng.randint(0, 120), y1 + rng.randint(0, 90)]
        b1 = box()
        b2 = rng.choice([box(), list(b1),
                         [b1[0] + 5, b1[1] + 5, b1[2] - 5, b1[3] - 5],
                         [b1[2], b1[1], b1[2] + 50, b1[3]]])
        thr = rng.choice([0.7, 0.5, 0.9])
        iou = bbox_iou(b1, b2)
        cont = bbox_contains(b1, b2, thr)
        rows.append("B\t" + "\t".join([str(c)] + [str(v) for v in b1 + b2] +
                                      [str(thr), repr(iou), str(int(cont))]))
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

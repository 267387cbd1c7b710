#!/usr/bin/env python3
"""Random differential fixture for the ROVER merge: seeded random
multi-engine OCR pages through the REFERENCE's rover_merge
(src/rover/ensemble.py:99) — garbage filtering, y-clustering, cross-engine
line alignment, char-level weighted voting, gap filling, contributions.

TSV the RoverSpec replays (escapes \\\\ \\t \\n \\r):
  I\t<case>\t<engine>\t<text>\t<x1>\t<y1>\t<x2>\t<y2>\t<conf>
  R\t<case>\t<merged text>\t<gaps_filled>\t<e=c,e=c sorted by engine>

Usage: python3 scripts/gen_rover_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
pil = types.ModuleType('PIL'); pil.Image = types.ModuleType('PIL.Image')
sys.modules['PIL'] = pil; sys.modules['PIL.Image'] = pil.Image

from src.rover.engines.core import TextWithBox, EngineResult
from src.rover.ensemble import rover_merge

ENGINES = ["yomitoku", "paddleocr", "easyocr"]
CHARS = list("abcdef 見出し本文123、。・") + ["\U0001f600"]
GARBAGE = ["・・…!!", "ああああああ", "ab", "   "]


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
             .replace("\r", "\\r").replace("\n", "\\n"))


def mutate(base, rng, noise):
    out = []
    for c in base:
        r = rng.random()
        if r < noise:
            k = rng.random()
            if k < 0.4:
                out.append(rng.choice(CHARS))
            elif k < 0.7:
                pass
            else:
                out.append(c); out.append(rng.choice(CHARS))
        else:
            out.append(c)
    return "".join(out)


def main(out_path, cases=200, seed=31337):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        n_lines = rng.randint(1, 6)
        base_lines = ["".join(rng.choice(CHARS) for _ in range(rng.randint(6, 30)))
                      for _ in range(n_lines)]
        results = {}
        for e in ENGINES:
            if rng.random() < 0.15:
                continue  # engine absent
            items = []
            for li, bl in enumerate(base_lines):
                if rng.random() < 0.2:
                    continue  # engine missed this line (gap-filling path)
                text = mutate(bl, rng, rng.choice([0.0, 0.05, 0.3]))
                y = li * 80 + rng.randint(-20, 20)  # jitter vs yTolerance=30
                x = rng.randint(0, 40)
                conf = round(rng.uniform(0.35, 0.99), 3)
                # sometimes split the line into two x-ordered boxes
                if rng.random() < 0.25 and len(text) > 4:
                    half = len(text) // 2
                    items.append(TextWithBox(text[:half], (x, y, x + 100, y + 20), conf))
                    items.append(TextWithBox(text[half:], (x + 110, y + rng.randint(-5, 5),
                                                           x + 200, y + 20), conf))
                else:
                    items.append(TextWithBox(text, (x, y, x + 200, y + 20), conf))
            if rng.random() < 0.25:
                gy = rng.randint(0, n_lines * 80)
                items.append(TextWithBox(rng.choice(GARBAGE), (0, gy, 50, gy + 20),
                                         round(rng.uniform(0.2, 0.9), 3)))
            if items:
                results[e] = EngineResult(engine=e, items=items, success=True)
        merged = rover_merge(results)
        for e in ENGINES:
            if e in results:
                for it in results[e].items:
                    x1, y1, x2, y2 = it.bbox
                    rows.append(f"I\t{c}\t{e}\t{esc(it.text)}\t{x1}\t{y1}\t{x2}\t{y2}\t{it.confidence}")
        contrib = ",".join(f"{k}={v}" for k, v in sorted(merged.engine_contributions.items()))
        rows.append(f"R\t{c}\t{esc(merged.text)}\t{merged.gaps_filled}\t{contrib}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

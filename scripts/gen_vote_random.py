#!/usr/bin/env python3
"""Random differential fixture for the ensemble voting path: seeded random
(engine -> text) pages through the REFERENCE's calculate_similarity_matrix
+ vote_best_result (src/ocr_ensemble/voting.py:143-215), mirroring the
live merge_by_voting composition (matrix over non-empty results only).

TSV the EnsembleSpec replays (escapes \\\\ \\t \\n \\r):
  C\t<case>\t<threshold>
  E\t<case>\t<engine>\t<text>        (insertion order preserved)
  R\t<case>\t<winner>\t<best_text>\t<engine>:<votes>,...

Usage: python3 scripts/gen_vote_random.py <out.tsv> [cases] [seed]
"""
import random, sys, types
from pathlib import Path

fake = types.ModuleType('src'); fake.__path__ = ['/root/reference/src']
sys.modules['src'] = fake
sys.path.insert(0, '/root/reference')
# the ocr_ensemble package __init__ imports PIL (absent here); stub it —
# voting.py itself only needs difflib
pil = types.ModuleType('PIL'); pil.Image = types.ModuleType('PIL.Image')
sys.modules['PIL'] = pil; sys.modules['PIL.Image'] = pil.Image

from src.ocr_ensemble.voting import calculate_similarity_matrix, vote_best_result

ENGINES = ["yomitoku", "paddleocr", "easyocr", "tesseract"]
CHARS = list("abcdef 見出し本文123、。") + ["\U0001f600", "　"]


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
                out.append(rng.choice(CHARS))  # substitute
            elif k < 0.7:
                pass                            # delete
            else:
                out.append(c); out.append(rng.choice(CHARS))  # insert
        else:
            out.append(c)
    return "".join(out)


def main(out_path, cases=300, seed=42424242):
    rng = random.Random(seed)
    rows = []
    for c in range(cases):
        # lengths straddle the autojunk boundary (len(b) > 199)
        base = "".join(rng.choice(CHARS) for _ in range(rng.choice([8, 40, 120, 195, 205, 260])))
        names = rng.sample(ENGINES, rng.randint(1, 4))
        results = {}
        for e in names:
            r = rng.random()
            if r < 0.12:
                results[e] = ""                      # failed engine
            elif r < 0.3:
                results[e] = base                    # exact agreement
            else:
                results[e] = mutate(base, rng, rng.choice([0.02, 0.1, 0.4, 0.9]))
        threshold = rng.choice([0.5, 0.7, 0.9])
        valid = {k: v for k, v in results.items() if v}
        matrix = calculate_similarity_matrix(valid)
        text, engine, votes = vote_best_result(results, matrix, threshold)
        rows.append(f"C\t{c}\t{threshold}")
        for e, t in results.items():
            rows.append(f"E\t{c}\t{e}\t{esc(t)}")
        votes_s = ",".join(f"{e}:{v}" for e, v in votes.items())
        rows.append(f"R\t{c}\t{engine}\t{esc(text)}\t{votes_s}")
    Path(out_path).write_text("\n".join(rows) + "\n", encoding="utf-8")
    print(f"{cases} cases -> {out_path}")


if __name__ == '__main__':
    main(sys.argv[1], *(int(a) for a in sys.argv[2:]))

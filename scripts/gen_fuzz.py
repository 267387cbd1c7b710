#!/usr/bin/env python3
"""Fuzz-book generator for reference-parity sweeps: random half-formed
markers, broken emphasis, edge page markers, mixed scripts. Usage:
  python3 scripts/gen_fuzz.py <outDir> <nDocs> [seed]
Then gen_golden.py / convert_book per book and run SweepCheck/XmlSweep/
GroupedSweep from scripts/iso (see scripts/iso/README.md)."""
import random, sys
out, n = sys.argv[1], int(sys.argv[2])
rng = random.Random(int(sys.argv[3]) if len(sys.argv) > 3 else 1234)
fragments = [
    "--- Page {} (page_{:04d}.png) ---", "--- page_{:04d} ---", "--- Page: f{}.png ---",
    "# 見出し{}", "## 第{}章 何か", "### {}.{} 詳細", "#### 深い{}", "###### 超深い{}",
    "<!-- toc -->", "<!-- /toc -->", "<!-- skip -->", "<!-- /skip -->", "<!-- content -->", "<!-- /content -->",
    "<!-- FIGURE: fig/{}.png -->", "<!-- figure: Broken -->", "[図{}]", "[表{}]",
    "- 項目{}", "・ 点{}", "① 丸{}", "（{}） 括弧", "1. 番号{}",
    "第{}章 タイトル .... {}", "{}.{} 何とか ─── {}", "Episode {:02d} 話 .... {}",
    "本文{}です。", "続き{}", "**強調{}**文", "** 壊れた強調", "文{}と**太字**と",
    "はじめに {} / {}", "第{}節 {} / {}", "まとめ {} / 10", "{} / {}",
    "◆◇■□●○", "# ◆◆◆", "   ", "", "\t тест {}", "mixed 英数 {}", "。。。", "----",
    "--- Page --- ", "---Page {} ---", "1 / ", " / 3", "# ", "##", ">quote {}",
]
for d in range(n):
    cnt = rng.randint(3, 60)
    lines = []
    for _ in range(cnt):
        f = rng.choice(fragments)
        nums = f.count("{}") + f.count("{:04d}") + f.count("{:02d}")
        args = [rng.randint(0, 30) for _ in range(nums)]
        try: lines.append(f.format(*args))
        except Exception: lines.append(f)
    open(f'{out}/doc_{d}.md', 'w', encoding='utf-8').write("\n".join(lines))
print(f"{n} fuzz books -> {out}")

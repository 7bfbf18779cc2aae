#!/usr/bin/env python3
"""Dev-only: per-query scaling ratios between two BENCH_DETAIL.json
runs (e.g. sf0.1 vs the synthesized sf1) — the 10x audit the round
records in BASELINE.md.

Usage: python3 tools/scale_ratio.py BENCH_DETAIL_small.json BENCH_DETAIL_big.json [topN]
"""
import json, sys

a = json.load(open(sys.argv[1]))["queries"]
b = json.load(open(sys.argv[2]))["queries"]
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
common = sorted(set(a) & set(b))
ta, tb = sum(a[k] for k in common), sum(b[k] for k in common)
print(f"overall: {ta:.1f} s -> {tb:.1f} s = {tb/ta:.2f}x over {len(common)} shared queries")
rats = sorted(((b[k] / max(a[k], 1e-9), k) for k in common), reverse=True)
print(f"top {top_n} ratios:")
for r, k in rats[:top_n]:
    print(f"  {k}: {a[k]:.2f} -> {b[k]:.2f}  ({r:.1f}x)")
linear_or_better = sum(1 for r, _ in rats if r <= 10)
print(f"queries at or below 10x (linear for 10x data): {linear_or_better}/{len(common)}")

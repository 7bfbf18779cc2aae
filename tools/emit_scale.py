#!/usr/bin/env python3
"""Emit the round's SCALE_rN.json decade-ratio artifact (r17 verdict #7).

Takes the per-SF bench detail files produced by SPARK_GRAFT_ONLY probe
runs (BENCH_DETAIL_ONLY.json, or full BENCH_DETAIL.json) in ascending
scale order and writes a machine-diffable record:

    {"round": N, "sfs": [...], "probe_healthy": [...],
     "queries": {name: [median_sf_i, ...]},
     "ratios":  {name: [m[i+1]/m[i], ...]}}

so the judge can check the ~10x/decade linear ceiling per query without
parsing BASELINE.md prose.

Usage:
  python3 tools/emit_scale.py SCALE_r18.json round \
      /tmp/a/BENCH_DETAIL_ONLY.json /tmp/b/BENCH_DETAIL_ONLY.json ...
"""
import json
import sys

out, rnd, files = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
runs = [json.load(open(f)) for f in files]
names = sorted(set.intersection(*(set(r["queries"]) for r in runs)))
queries = {n: [round(r["queries"][n], 3) for r in runs] for n in names}
ratios = {
    n: [round(v[i + 1] / max(v[i], 1e-9), 2) for i in range(len(v) - 1)]
    for n, v in queries.items()
}
record = {
    "round": rnd,
    "sfs": [r.get("sf", "?") for r in runs],
    # a decade ratio is only evidence when BOTH its endpoints ran on a
    # healthy box: surface each run's degraded flag alongside
    "degraded": [bool(r.get("degraded", False)) for r in runs],
    "pass_probe_min": [r.get("pass_probe_min", []) for r in runs],
    "queries": queries,
    "ratios": ratios,
    "max_ratio": round(max((r for v in ratios.values() for r in v), default=0.0), 2),
}
with open(out, "w") as f:
    json.dump(record, f, indent=1, sort_keys=False)
    f.write("\n")
print(f"{out}: {len(names)} queries over {len(runs)} scales; "
      f"max ratio {record['max_ratio']}x; degraded={record['degraded']}")

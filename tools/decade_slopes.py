#!/usr/bin/env python3
"""Slope audit for the 100x decade pair: per-query two-decade factor
(sec_100x / sec_sf0.1) from the two BENCH_DETAIL artifacts, flagging
super-linear cells (factor > 100, i.e. per-decade slope > 10). Cells
under the ~1 s job-overhead floor at BOTH scales are noise, not slopes.

Usage: python3 tools/decade_slopes.py BENCH_DETAIL.json BENCH_DETAIL_r12_100x.json
"""
import json, math, sys

base = json.load(open(sys.argv[1]))["queries"]
big = json.load(open(sys.argv[2]))["queries"]

rows = []
for name, v in big.items():
    b = base.get(name)
    if not b:
        continue
    s0, s2 = b["sec"], v["sec"]
    factor = s2 / s0 if s0 > 0 else float("inf")
    rows.append((name, s0, s2, factor))

rows.sort(key=lambda r: -r[3])
flagged = [(n, s0, s2, f) for n, s0, s2, f in rows
           if f > 100 and s2 > 2.0]
print(f"{len(rows)} cells; {len(flagged)} super-linear (>100x over two "
      f"decades AND >2 s at 100x)")
print("\nTop factors (name, sf0.1 s, 100x s, factor, per-decade):")
for n, s0, s2, f in rows[:20]:
    print(f"  {n:32s} {s0:8.2f} {s2:9.2f} {f:8.1f}x {math.sqrt(f):6.2f}/dec")
print("\nTop absolute 100x cells:")
for n, s0, s2, f in sorted(rows, key=lambda r: -r[2])[:15]:
    print(f"  {n:32s} {s0:8.2f} {s2:9.2f} {f:8.1f}x")
tot0 = sum(r[1] for r in rows)
tot2 = sum(r[2] for r in rows)
print(f"\ntotals: sf0.1 {tot0:.1f} s -> 100x {tot2:.1f} s "
      f"({tot2 / tot0:.1f}x over two decades, "
      f"{math.sqrt(tot2 / tot0):.2f}x/decade)")

#!/usr/bin/env python3
"""Compare the full-suite gsf1 bench against the same-session sf0.1 run.

Usage: python3 scripts/ratio_sf1.py [bench_sf01_r10.json bench_sf1.json]

Prints every query sorted by sf1/sf0.1 ratio (10x data), flagging those
above the 10x data ratio — the SCALE.md contract is that each flagged
query gets a named cause.
"""
import json
import sys

base_path = sys.argv[1] if len(sys.argv) > 1 else "bench_sf01_r10.json"
sf1_path = sys.argv[2] if len(sys.argv) > 2 else "bench_sf1.json"
base = json.load(open(base_path))
sf1 = json.load(open(sf1_path))

print(f"sf0.1 total {base['value']:.1f}s sentinel {base['sentinel']}")
print(f"sf1   total {sf1['value']:.1f}s sentinel {sf1['sentinel']}")
print(f"sf1 errors: {sf1['errors']}")

rows = []
for q, t1 in sf1["queries"].items():
    t0 = base["queries"].get(q, -1)
    if t0 > 0 and t1 > 0:
        rows.append((t1 / t0, t0, t1, q))
rows.sort(reverse=True)
flagged = 0
for r, t0, t1, q in rows:
    mark = " <-- >10x" if r > 10 else ""
    if r > 10:
        flagged += 1
    print(f"{q:32s} {t0:7.2f} {t1:7.2f} {r:6.1f}x{mark}")
print(f"\n{flagged} queries above the 10x data ratio")

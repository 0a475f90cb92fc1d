#!/usr/bin/env python3
"""Step-up table: per-query ratio between two bench JSONs (e.g. sf1 -> sf10).

Usage: python3 scripts/stepup.py BENCH_r13_sf1.json /tmp/bench_r13_sf10.json [threshold]

Prints a markdown table sorted by ratio desc, flags rows whose ratio
exceeds the threshold (default 10.0 = linear for a 10x data step) and
the totals line.
"""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0

qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb), key=lambda k: -(qb[k] / max(qa[k], 1e-9)))
print(f"| query | {sys.argv[1].split('/')[-1]} | {sys.argv[2].split('/')[-1]} | ratio |")
print("|---|---|---|---|")
flagged = []
for k in common:
    r = qb[k] / max(qa[k], 1e-9)
    mark = " **" if r > thr else ""
    if r > thr:
        flagged.append((k, r))
    print(f"| {k} | {qa[k]:.2f} | {qb[k]:.2f} | {r:.2f}x{mark} |")
ta = sum(qa[k] for k in common)
tb = sum(qb[k] for k in common)
print(f"| TOTAL ({len(common)} common) | {ta:.1f} | {tb:.1f} | {tb/ta:.2f}x |")
print()
print("only in A:", sorted(set(qa) - set(qb)))
print("only in B:", sorted(set(qb) - set(qa)))
print(f"flagged >{thr}x:", [(k, round(r, 1)) for k, r in flagged])
print("B meta: failed=%s contended=%s rejected=%s skipped=%s" % (
    b.get("failed"), b.get("contended"), b.get("rejected"), b.get("skipped")))

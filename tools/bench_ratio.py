#!/usr/bin/env python3
"""Ratio table: current bench_detail.json vs a prior round's BENCH_r{N}.json
tail (the driver keeps only the last ~2KB of stdout, so the prior map may be
truncated — compare on whatever lines survived).
Usage: python3 tools/bench_ratio.py BENCH_r15.json [threshold]"""
import json, re, sys

prior_path = sys.argv[1]
thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1.3

cur = [json.loads(l) for l in open("bench_detail.json")]
cur_q = cur[1]["queries"]

prior = json.load(open(prior_path))
tail = prior.get("tail", "")
pairs = dict((k, float(v)) for k, v in
             re.findall(r'"(\w+)":(\d+\.\d+)', tail))

common = sorted(set(cur_q) & set(pairs))
ratios = [(cur_q[k] / pairs[k], k) for k in common if pairs[k] > 0]
ratios.sort(reverse=True)
import statistics
print(f"common lines: {len(common)}; median ratio "
      f"{statistics.median(r for r, _ in ratios):.3f}")
print("-- rises over threshold:")
for r, k in ratios:
    if r > thresh:
        print(f"  {k}: {pairs[k]:.2f} -> {cur_q[k]:.2f}  ({r:.2f}x)")
print("-- biggest drops:")
for r, k in sorted(ratios)[:8]:
    print(f"  {k}: {pairs[k]:.2f} -> {cur_q[k]:.2f}  ({r:.2f}x)")

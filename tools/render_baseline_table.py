#!/usr/bin/env python3
"""Render the BASELINE.md §3 two-column per-query table from a Bench
full-rendering JSON (bench_out.json). Usage:
    render_baseline_table.py [bench_out.json]
Prints the markdown table to stdout; the surrounding §3 prose is
hand-maintained."""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
qs = sorted(json.load(open(path))["queries"].items())
half = (len(qs) + 1) // 2
left, right = qs[:half], qs[half:]
print("| query | sec (sf0.1) | query | sec (sf0.1) |")
print("|---|---|---|---|")
for i in range(half):
    l = f"| {left[i][0]} | {left[i][1]:.2f} "
    r = f"| {right[i][0]} | {right[i][1]:.2f} |" if i < len(right) else "| | |"
    print(l + r)

#!/usr/bin/env python3
"""Regenerate bench_anchors.json from builder bench artifacts.

The anchors feed Bench's per-query re-measure threshold
(max(1.0 s, 2 x anchor)): a sample above that is re-measured twice at
the end of the sweep, closing the old fixed-2.0 s blind spot where a
one-shot context spike just under 2 s stuck as the number of record.
The anchor is the per-query MIN across the given artifacts (min is the
standard engine-time estimator under external noise — a one-shot spike
in the newest sweep must not loosen its own re-measure trigger).
Run after each round's definitive sweep:
    python3 scripts/update_anchors.py BENCH_rN_builder.json [older.json ...]
"""
import json, sys

srcs = sys.argv[1:] or ["BENCH_r13_builder.json", "BENCH_r12_builder.json"]
anchors = {}
for src in srcs:
    d = json.load(open(src))
    for k, v in d["queries"].items():
        if v >= 0 and (k not in anchors or v < anchors[k]):
            anchors[k] = v
out = {"source": srcs, "anchors": {k: round(v, 3) for k, v in sorted(anchors.items())}}
json.dump(out, open("bench_anchors.json", "w"), indent=0, separators=(",", ":"))
print(f"wrote bench_anchors.json: {len(anchors)} anchors from {srcs}")

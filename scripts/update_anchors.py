#!/usr/bin/env python3
"""Regenerate bench_anchors.json from builder bench artifacts.

The anchors feed Bench's per-query re-measure threshold (2 x anchor
for anchored queries): a sample above that is re-measured twice at the
end of the sweep, closing the old fixed-2.0 s blind spot where a
one-shot context spike just under 2 s stuck as the number of record.

The anchor is the per-query SECOND-SMALLEST value across the given
artifacts (falling back to the min when fewer than three artifacts
carry the query). A plain min is the standard engine-time estimator
under external noise, but it is also fragile the OTHER way: one
outlier-LOW sample — a timer quirk or an unusually warm context —
halves the re-measure threshold for every later sweep and permanently
tags a normal-speed query as contended (round 18: q10_rank recorded
one 0.153 s sample against a 0.25-0.34 s norm, and the 2 x 0.153
trigger then fired on half the subsequent sweeps). The second-smallest
value requires the floor to be REPRODUCED once before it becomes the
trigger, while staying a tight lower order statistic.

Run after each round's definitive sweep:
    python3 scripts/update_anchors.py BENCH_rN_builder.json [older.json ...]
"""
import json, sys

srcs = sys.argv[1:] or ["BENCH_r13_builder.json", "BENCH_r12_builder.json"]
vals = {}
for src in srcs:
    d = json.load(open(src))
    for k, v in d["queries"].items():
        if v >= 0:
            vals.setdefault(k, []).append(v)
anchors = {}
for k, vs in vals.items():
    s = sorted(vs)
    anchors[k] = s[1] if len(s) >= 3 else s[0]
out = {"source": srcs, "anchors": {k: round(v, 3) for k, v in sorted(anchors.items())}}
json.dump(out, open("bench_anchors.json", "w"), indent=0, separators=(",", ":"))
print(f"wrote bench_anchors.json: {len(anchors)} anchors from {srcs}")

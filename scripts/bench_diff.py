#!/usr/bin/env python3
"""Noise-aware comparison of two graft.Bench artifacts (dev tool).

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Classifies each query's delta using the evidence the artifact carries:
  - REGRESSION: new min > threshold x old min AND the new run's samples
    are consistent (spread < 3x), so it is not one interference spike;
  - SUSPECT: slower past threshold but with a wide sample spread or a
    noisy sentinel window -> re-measure before believing it;
  - IMPROVED: new min < old min / threshold;
  - new/removed queries listed separately.

The noise floor (sentinel timings between re-measures) is summarized
for both runs; a noisy floor downgrades regressions to SUSPECT.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path, threshold=1.5):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    osamp, nsamp = old.get("samples", {}), new.get("samples", {})
    ofloor = old.get("noise_floor", [])
    nfloor = new.get("noise_floor", [])

    def floor_noisy(floor):
        return bool(floor) and max(floor) > 5 * (min(floor) or 0.1)

    new_noisy = floor_noisy(nfloor)
    print(f"old: {old['value']:.1f}s over {len(oq)} queries "
          f"(floor max {max(ofloor):.2f}s)" if ofloor else f"old: {old['value']:.1f}s")
    print(f"new: {new['value']:.1f}s over {len(nq)} queries "
          f"(floor max {max(nfloor):.2f}s{', NOISY' if new_noisy else ''})"
          if nfloor else f"new: {new['value']:.1f}s")

    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    regressions, suspects, improved = [], [], []
    for name in sorted(set(oq) & set(nq)):
        o, n = oq[name], nq[name]
        if o < 0 or n < 0:
            if n < 0:
                print(f"FAILED in new run: {name}")
            continue
        if o <= 0.05:  # too fast to trend
            continue
        ratio = n / o
        if ratio > threshold:
            ss = nsamp.get(name, [n])
            spread = max(ss) / max(min(ss), 1e-3)
            if new_noisy or spread > 3:
                suspects.append((ratio, name, o, n, ss))
            else:
                regressions.append((ratio, name, o, n, ss))
        elif ratio < 1 / threshold:
            improved.append((ratio, name, o, n))

    for tag, rows in (("REGRESSION", regressions), ("SUSPECT", suspects)):
        for ratio, name, o, n, ss in sorted(rows, reverse=True):
            print(f"{tag} {name}: {o:.2f}s -> {n:.2f}s ({ratio:.1f}x) samples={ss}")
    for ratio, name, o, n in sorted(improved):
        print(f"improved {name}: {o:.2f}s -> {n:.2f}s ({ratio:.2f}x)")
    print(f"\n{len(regressions)} regressions, {len(suspects)} suspects, "
          f"{len(improved)} improved")
    return 1 if regressions else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
    sys.exit(main(args[0], args[1], thr))

#!/usr/bin/env python3
"""Drift-aware bench-artifact promotion (round-16 verdict item 2).

The round-15/16 failure mode: the promoted sweep of record had to
contain ALL queries, the quietest sweep of the day predated the last
query, so the artifact of record silently absorbed ~9% host
contention while the per-query minima (anchors) told the real story.
The `drift` field Bench.scala writes now makes that machine-readable;
this script makes the record-selection POLICY consume it:

  1. Load the given bench_out-format files (this round's sweeps).
  2. Keep COMPLETE sweeps: zero failed entries and the maximal query
     count across the inputs.
  3. Candidate record = the quietest complete sweep (min total).
  4. If the candidate still sits more than DRIFT_PCT above the
     per-query composite (each query's MIN across the UNION of all
     clean sweeps, complete or not — the honest engine floor), the
     candidate absorbed a
     contention window no single re-sweep escaped: promote the
     COMPOSITE, provenance-tagged ("composite": true + per-source
     contribution counts + the candidate-vs-composite delta).
     Otherwise promote the candidate sweep verbatim (a real
     single-window measurement beats a splice when it is just as
     quiet).

Usage:
    python3 scripts/promote_bench.py OUT.json sweep1.json [sweep2.json ...]
"""
import json
import sys

DRIFT_PCT = 5.0


def main(out_path: str, srcs: list) -> int:
    sweeps = []
    for p in srcs:
        try:
            d = json.load(open(p))
        except Exception as e:  # noqa: BLE001
            print(f"skip {p}: {type(e).__name__}: {e}")
            continue
        qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
        sweeps.append((p, d, qs, bool(d.get("failed"))))
    if not sweeps:
        print("no readable sweeps")
        return 1
    dropped = [p for p, _, q, failed in sweeps if failed]
    if dropped:
        print(f"dropped sweeps with failures: {dropped}")
    ok = [(p, d, q) for p, d, q, failed in sweeps if not failed]
    if not ok:
        print("every sweep has failures — fix them before promoting")
        return 1
    # the round's query universe = the UNION of the clean sweeps (a
    # query added mid-round appears only in the later sweeps; the
    # union is what the driver will time)
    universe = set()
    for _, _, q in ok:
        universe |= q.keys()
    nmax = max(len(q) for _, _, q in ok)
    complete = [(p, d, q) for p, d, q in ok if len(q) == len(universe)]

    # composite: per-query min across ALL clean sweeps, with provenance
    comp = {}
    prov = {}
    for name in sorted(universe):
        best_p, best_v = None, None
        for p, _, q in ok:
            v = q.get(name)
            if v is not None and (best_v is None or v < best_v):
                best_p, best_v = p, v
        comp[name] = best_v
        prov[name] = best_p
    comp_total = sum(comp.values())

    if not complete:
        # no single sweep covers the round's full query set (a query
        # landed after the quiet window) — the composite is the only
        # full-coverage artifact
        cand_path, cand_doc, cand_q = min(
            ok, key=lambda t: sum(t[2].values()) / max(1, len(t[2])))
        cand_total = sum(cand_q.values())
        delta = DRIFT_PCT + 1.0  # force the composite branch
        print(f"no single sweep covers all {len(universe)} queries "
              f"(max coverage {nmax}) — promoting the composite")
    else:
        # candidate: quietest complete sweep
        cand_path, cand_doc, cand_q = min(
            complete, key=lambda t: sum(t[2].values()))
        cand_total = sum(cand_q.values())
        delta = ((cand_total - comp_total) / comp_total * 100.0
                 if comp_total > 0 else 0.0)
        print(f"quietest complete sweep {cand_path}: {cand_total:.1f} s; "
              f"composite floor {comp_total:.1f} s; delta {delta:.1f}%")

    if complete and delta <= DRIFT_PCT:
        doc = dict(cand_doc)
        # per-entry discount evidence: entries above 1.5x the
        # cross-sweep floor are scheduling noise inside an otherwise
        # quiet window — the artifact names them (with the floor) so a
        # reader never mistakes the tail for engine cost
        over = {k: {"sec": v, "floor": comp[k]}
                for k, v in cand_q.items()
                if comp.get(k) and v > 1.5 * comp[k]}
        doc["promotion"] = {"policy": "quietest_complete_sweep",
                            "candidates": [p for p, _, _ in ok],
                            "composite_total": round(comp_total, 3),
                            "delta_vs_composite_pct": round(delta, 1),
                            "over_15x_floor": over}
        json.dump(doc, open(out_path, "w"), separators=(",", ":"))
        print(f"promoted {cand_path} verbatim -> {out_path} "
              f"(delta {delta:.1f}% <= {DRIFT_PCT}%; "
              f"{len(over)} entries tagged over 1.5x floor)")
        return 0

    # contention no single sweep escaped: promote the composite
    by_src = {}
    for name, p in prov.items():
        by_src[p] = by_src.get(p, 0) + 1
    doc = {
        "metric": "total",
        "value": round(comp_total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in sorted(comp.items())},
        "composite": True,
        "promotion": {"policy": "per_query_composite",
                      "reason": f"quietest complete sweep {cand_path} sat "
                                f"{delta:.1f}% above the composite floor "
                                f"(> {DRIFT_PCT}%)",
                      "sources": by_src,
                      "candidates": [p for p, _, _ in ok]},
        "sf": cand_doc.get("sf", ""),
    }
    json.dump(doc, open(out_path, "w"), separators=(",", ":"))
    print(f"promoted per-query composite -> {out_path} "
          f"({len(by_src)} source sweeps: {by_src})")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2:]))

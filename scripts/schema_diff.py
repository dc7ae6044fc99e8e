#!/usr/bin/env python3
"""Round-start schema-drift sentinel (round-7 verdict item 5).

Diffs the PHYSICAL arrow/parquet types of every table under the given
testdata roots against the committed manifest (scripts/schema_manifest.json)
and fails loud with a one-line diagnosis per drifted column — the check
that would have reduced the round-6 TIMESTAMP(NANOS) -> timestamp[us]
(TIMESTAMP_NTZ) outage to a single line before any query ran.

Usage:  python3 scripts/schema_diff.py [sfdir ...]
        (default: /root/testdata/sf0.001 sf0.01 sf0.1)

Exit 0 = no drift; exit 1 = drift or missing table, details on stdout.
To accept an intentional drift, regenerate the manifest (see the
generation snippet in the file header of schema_manifest.json's commit)
and re-run the full Verify gate.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq

HERE = os.path.dirname(os.path.abspath(__file__))
MANIFEST = os.path.join(HERE, "schema_manifest.json")


def main(roots):
    with open(MANIFEST) as f:
        want = json.load(f)
    drift = 0
    for root in roots:
        paths = sorted(glob.glob(os.path.join(root, "*.parquet")))
        if not paths:
            print(f"DRIFT {root}: no parquet tables found")
            drift += 1
            continue
        seen = set()
        for p in paths:
            t = os.path.basename(p).replace(".parquet", "")
            seen.add(t)
            if t not in want:
                print(f"NEW   {root}/{t}: table not in manifest "
                      f"(add it + extend Tables/queries if it is load-bearing)")
                continue
            got = [(f.name, str(f.type)) for f in pq.read_schema(p)]
            exp = [(c["name"], c["type"]) for c in want[t]]
            if got != exp:
                gm, em = dict(got), dict(exp)
                for name in sorted(set(gm) | set(em)):
                    if gm.get(name) != em.get(name):
                        print(f"DRIFT {root}/{t}.{name}: manifest "
                              f"{em.get(name, '<absent>')} -> physical "
                              f"{gm.get(name, '<absent>')}")
                        drift += 1
                if [n for n, _ in got] != [n for n, _ in exp] and gm == em:
                    print(f"DRIFT {root}/{t}: column ORDER changed")
                    drift += 1
        missing = set(want) - seen
        for t in sorted(missing):
            print(f"DRIFT {root}: table {t} missing")
            drift += 1
    if drift:
        print(f"{drift} drift(s) — fix Tables normalization or regenerate "
              f"the manifest, then re-run the Verify gate")
        return 1
    print(f"schemas clean across {len(roots)} root(s)")
    return 0


if __name__ == "__main__":
    roots = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    sys.exit(main(roots))

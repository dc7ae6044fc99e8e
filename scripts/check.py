#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only, not
part of the shipped library): load each Verify parquet output, run the
matching oracle SQL in DuckDB over the same sf dir, and diff values.

Usage: python3 scripts/check.py /tmp/vout /root/testdata/sf0.01
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(outdir: str, sfdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = duckdb.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')",
                connection=con).df()
            want = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                import pandas as pd
                eq = (a.isna() & b.isna()) | (a == b)
                if not bool(eq.all()):
                    bad = (c, a[~eq].head(3), b[~eq].head(3))
                    break
            except Exception as e:  # noqa: BLE001
                if list(a) != list(b):
                    bad = (c, str(e), "")
                    break
        if bad:
            print(f"FAIL {name}: column {bad[0]} differs\n  spark: {bad[1]}\n  duck:  {bad[2]}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

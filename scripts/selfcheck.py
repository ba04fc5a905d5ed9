#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
  python3 scripts/selfcheck.py <sfDir> <outDir>

For each query in <outDir>/oracle_sql.json: load the Spark parquet
result, run the oracle SQL in DuckDB against views over the sfDir
tables, sort columns by name and rows by all columns, and compare
values. Exit nonzero and print a diff head on mismatch.

(Driver-side tooling only — the Scala library never depends on this.)
"""
import glob
import json
import math
import os
import sys

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, then rows; stringify values like a hash would."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        # mirror the driver: values pass through pandas, so DuckDB
        # HUGEINT (e.g. SUM over INTEGER) arrives as float64 and must
        # stringify differently from an int64 — keep that visible here.
        if isinstance(v, (list, np.ndarray)):
            # the driver's pandas canon crashes sorting ARRAY cells
            # (r04 q203 ERR) — make that a loud local failure too
            raise TypeError("array cell in result — driver canon "
                            "cannot sort this; flatten at the edge")
        if isinstance(v, np.generic):
            v = v.item()
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)

    out = [tuple(cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result written")
            failures += 1
            continue
        # Read the SPARK side via pandas/pyarrow, NOT through DuckDB:
        # routing it through read_parquet normalizes DECIMAL columns
        # to float64, which made this gate blind to the r04
        # Decimal-vs-float64 hash-fail class (q132/q133/q200/q317) —
        # the driver's canon sees Decimal('209.00') from pandas while
        # the oracle side arrives as float64 209.0. Mirror that here.
        import pandas as pd
        gdf = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        got = [tuple(r) for r in gdf.itertuples(index=False, name=None)]
        got_cols = list(gdf.columns)
        try:
            wdf = con.execute(oracle[name]).df()
            want = [tuple(r) for r in wdf.itertuples(index=False, name=None)]
            want_cols = list(wdf.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            gc, gr = canon(got, got_cols)
            wc, wr = canon(want, want_cols)
        except TypeError as e:
            print(f"FAIL {name}: canon error: {e}")
            failures += 1
            continue
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != oracle {wc}")
            failures += 1
        elif gr != wr:
            print(f"FAIL {name}: {len(gr)} spark rows vs {len(wr)} oracle rows")
            diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            extra_g = [r for r in gr if r not in set(wr)][:3]
            extra_w = [r for r in wr if r not in set(gr)][:3]
            for a, b in diff:
                print(f"   spark={a}\n  oracle={b}")
            if extra_g:
                print(f"  only-spark: {extra_g}")
            if extra_w:
                print(f"  only-oracle: {extra_w}")
            failures += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
    no_oracle = []  # queries without oracle get rows-only check by driver
    print(f"== {len(oracle) - failures}/{len(oracle)} oracle queries pass ==")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

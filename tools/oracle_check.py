#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
written by graft.Verify, run the corresponding oracle SQL in DuckDB over the
same parquet tables and compare (columns sorted by name, rows sorted, values
compared exactly; doubles compared bit-exactly unless --tol given).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleGen sweep data is a
        # Spark-written DIRECTORY of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    # --partial: tolerate absent outputs (a filtered Verify run writes only
    # the named queries). WITHOUT the flag an absent dir is a FAILURE — in a
    # full run it means the query threw and Verify swallowed the error;
    # treating that as "not run" would green-light a broken gate.
    partial = "--partial" in sys.argv[3:]
    for name, sql in sorted(oracle.items()):
        if partial and not __import__("os").path.isdir(f"{out_dir}/{name}"):
            n_skip += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_fail += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs {wc}")
            n_fail += 1
            continue
        g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        # int-vs-float dtype drift: Python's 17 == 17.0 hides it, but the
        # driver hashes string reprs ("17" vs "17.0") and fails. DuckDB
        # HUGEINT (e.g. any un-cast SUM) reaches pandas as float64 — caught
        # round 3 on x2_sequence_packing only by the driver.
        kind_drift = [c for c in gc
                      if {g[c].dtype.kind, w[c].dtype.kind} == {"i", "f"}]
        if kind_drift:
            print(f"FAIL {name}: int-vs-float dtype drift in {kind_drift} "
                  f"(driver hashes '17' vs '17.0' as a mismatch)")
            n_fail += 1
            continue
        mismatch = None
        for c in gc:
            gv, wv = list(g[c]), list(w[c])
            for i, (a, b) in enumerate(zip(gv, wv)):
                a, b = norm_cell(a), norm_cell(b)
                if a != b and str(a) != str(b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail" +
          (f", {n_skip} not run" if n_skip else ""))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

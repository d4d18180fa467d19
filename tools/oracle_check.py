#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> [sf_dir]
Registers sf tables as views, runs each oracle_sql.json entry, compares with
the Spark parquet dumps (columns sorted by name, values compared in order).
"""
import duckdb, json, glob, sys
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails += 1
        continue
    sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    odf = con.execute(sql).fetchdf()
    sdf = sdf[sorted(sdf.columns)].reset_index(drop=True)
    odf = odf[sorted(odf.columns)].reset_index(drop=True)
    status = "OK"
    if list(sdf.columns) != list(odf.columns):
        status = f"SCHEMA {list(sdf.columns)} vs {list(odf.columns)}"
    elif len(sdf) != len(odf):
        status = f"ROWS {len(sdf)} vs {len(odf)}"
    else:
        try:
            pd.testing.assert_frame_equal(sdf, odf, check_dtype=False,
                                          check_exact=False, rtol=1e-9)
        except AssertionError as e:
            status = "VALUES " + str(e).replace("\n", " ")[:200]
        # the driver's hash compare is KIND-sensitive (round-1 lesson:
        # DuckDB HUGEINT -> float64 vs Spark BIGINT hashed differently
        # despite equal values). Width drift (int32 vs int64) is fine —
        # those rows hashed green in CORRECTNESS_r01 — but int-vs-float
        # (or numeric-vs-object) is a future red row.
        if status == "OK":
            kinds_s = [d.kind for d in sdf.dtypes]
            kinds_o = [d.kind for d in odf.dtypes]
            norm = lambda ks: ["i" if k in "iu" else k for k in ks]
            if norm(kinds_s) != norm(kinds_o):
                status = f"DTYPE KINDS {kinds_s} vs {kinds_o}"
    if status != "OK":
        fails += 1
    print(f"{name}: rows={len(sdf)} {status}")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)

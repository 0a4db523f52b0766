#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares each
<outDir>/<name> parquet against its DuckDB oracle from oracle_sql.json.

Exact cell-by-cell comparison after aligning columns by name, PLUS a dtype
check per column — the driver's hash is dtype-sensitive (round 2 shipped a
value-equal/type-different miss: DuckDB HUGEINT rendered 0.0 vs Spark's
BIGINT 0), so value equality alone is not enough.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # Spark-written tables are DIRECTORIES of part files (the SfScaleGen sf1
    # layout); the driver's testdata tables are single files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, rows_only = [], [], []

for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.sql(f"FROM '{d}/*.parquet'").df()
    if name not in oracle:
        rows_only.append((name, len(spark_df)))
        continue
    try:
        ora_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        fails.append((name, f"columns differ: spark={sc} oracle={oc}"))
        continue
    if len(spark_df) != len(ora_df):
        fails.append((name, f"row count: spark={len(spark_df)} oracle={len(ora_df)}"))
        continue
    a, b = spark_df[sc].reset_index(drop=True), ora_df[sc].reset_index(drop=True)
    bad = None
    for c in sc:
        av, bv = a[c], b[c]
        # Driver's hash stringifies values, so dtype drift (int vs float,
        # HUGEINT→float64) diverges even when values compare equal. Require
        # matching dtype kinds (datetimes are normalized below; object/string
        # columns both stringify identically so 'O' vs 'O' is the only safe mix).
        ak, bk = av.dtype.kind, bv.dtype.kind
        if ak != bk and 'M' not in (ak, bk):
            bad = f"col {c}: dtype kind mismatch spark={av.dtype} oracle={bv.dtype}"
            break
        try:
            if av.dtype.kind == 'M' or bv.dtype.kind == 'M':
                av = pd.to_datetime(av).astype('datetime64[us]')
                bv = pd.to_datetime(bv).astype('datetime64[us]')
            eq = (av == bv) | (av.isna() & bv.isna())
        except Exception as e:
            bad = f"col {c}: compare error {e}"
            break
        if not eq.all():
            i = int((~eq).idxmax())
            bad = f"col {c} row {i}: spark={av[i]!r} oracle={bv[i]!r} ({int((~eq).sum())} diffs)"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append((name, len(spark_df)))

print(f"== PASS ({len(passes)}) ==")
for n, r in passes:
    print(f"  {n}: {r} rows")
print(f"== ROWS-ONLY ({len(rows_only)}) ==")
for n, r in rows_only:
    print(f"  {n}: {r} rows")
print(f"== FAIL ({len(fails)}) ==")
for n, msg in fails:
    print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)

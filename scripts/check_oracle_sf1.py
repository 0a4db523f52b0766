#!/usr/bin/env python3
"""SCALE.md sf1 oracle check: same compare as check_oracle.py, but one query
at a time with wall-clock prints (cheap queries first), so a pathologically
slow DuckDB oracle (the recursive-CTE connected components at sf1) can't
hide an hour of progress behind a silent run. Results stream to stdout as
each query finishes; a per-query timeout marks the oracle TIMEOUT instead of
stalling the table (the ENGINE side already finished — a slow single-node
oracle at 10x scale is the expected outcome, not a defect)."""
import json, sys, glob, os, time
import multiprocessing as mp
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1"
timeout_s = int(sys.argv[3]) if len(sys.argv) > 3 else 2400

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))


def compare(name, q):
    con = duckdb.connect()
    # sf1 walk oracles (pair-stream blow-ups over 6M lineitems) spill
    # catastrophically under DuckDB's default memory limit — one run filled
    # the root disk from /root/repo/.tmp. Pin a high in-memory budget and a
    # /tmp spill dir so the oracle grinds instead of crashing the machine.
    con.sql("SET memory_limit='90GB'")
    con.sql("SET threads TO 16")
    con.sql("SET temp_directory='/tmp/duckdb_sf1_spill'")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        t = os.path.basename(p)[: -len(".parquet")]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS FROM '{src}'")
    d = os.path.join(out_dir, name)
    spark_df = con.sql(f"FROM '{d}/*.parquet'").df()
    ora_df = con.sql(oracle[name]).df()
    sc, oc = sorted(spark_df.columns), sorted(ora_df.columns)
    if sc != oc:
        return f"FAIL cols spark={sc} oracle={oc}"
    if len(spark_df) != len(ora_df):
        return f"FAIL rows spark={len(spark_df)} oracle={len(ora_df)}"
    a = spark_df[sc].reset_index(drop=True)
    b = ora_df[sc].reset_index(drop=True)
    for c in sc:
        av, bv = a[c], b[c]
        ak, bk = av.dtype.kind, bv.dtype.kind
        if ak != bk and "M" not in (ak, bk):
            return f"FAIL dtype {c}: {av.dtype} vs {bv.dtype}"
        if ak == "M" or bk == "M":
            av = pd.to_datetime(av).dt.tz_localize(None)
            bv = pd.to_datetime(bv).dt.tz_localize(None)
        if not av.map(str).equals(bv.map(str)):
            bad = av.map(str) != bv.map(str)
            i = bad.idxmax()
            return f"FAIL cell {c}[{i}]: {av[i]} vs {bv[i]}"
    return f"PASS ({len(spark_df)} rows)"


def worker(name, q, ret):
    try:
        ret[name] = compare(name, q)
    except Exception as e:
        ret[name] = f"FAIL error: {e}"


if __name__ == "__main__":
    names = [n for n in sorted(os.listdir(out_dir))
             if os.path.isdir(os.path.join(out_dir, n)) and n in oracle]
    # cheap first: big scans and recursive oracles (dedup_*) go last
    names.sort(key=lambda n: (n.startswith("dedup_"), n))
    mgr = mp.Manager()
    ret = mgr.dict()
    for n in names:
        t0 = time.time()
        p = mp.Process(target=worker, args=(n, oracle[n], ret))
        p.start()
        p.join(timeout_s)
        if p.is_alive():
            p.terminate()
            p.join()
            print(f"{n}: TIMEOUT >{timeout_s}s (oracle side)", flush=True)
        else:
            print(f"{n}: {ret.get(n, 'FAIL no result')}"
                  f"  [{time.time() - t0:.0f}s]", flush=True)

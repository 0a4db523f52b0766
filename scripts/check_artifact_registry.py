#!/usr/bin/env python3
"""Registry↔artifact population lock (verdict r13 task 2).

Round 13 committed a 254-gate bench and a 254-gate sweep against a
255-gate registry because the 255th gate landed after the final runs —
and nothing in the close checklist could notice. This script makes the
check mechanical: the gate sets of the committed bench-detail and
scalesweep artifacts must EQUAL the registry (the oracle_sql.json key
set a `graft.Verify` run dumps — Verify itself filters queries without
an oracle twin, and the registry cross-check keeps queries/oracleSql
1:1, so the dump IS the registry).

Usage:
  python3 scripts/check_artifact_registry.py \
      --registry target/verify_out/oracle_sql.json \
      --bench BENCH_QUERIES_r14.json \
      --sweep SCALESWEEP_r14.json

Exit 0 and one OK line per artifact iff every set matches; exit 1 with
the symmetric difference otherwise.
"""
import argparse
import json
import sys


def load_registry(path):
    with open(path) as f:
        return set(json.load(f).keys())


def bench_keys(path):
    with open(path) as f:
        return set(json.load(f)["queries"].keys())


def sweep_keys(path):
    with open(path) as f:
        rows = json.load(f)
    return {r["q"] for r in rows if "q" in r}


def check(name, got, want):
    missing = sorted(want - got)
    extra = sorted(got - want)
    if missing or extra:
        print(f"FAIL {name}: missing_from_artifact={missing} "
              f"not_in_registry={extra}")
        return False
    print(f"OK {name}: {len(got)} gates == registry")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--registry", required=True)
    ap.add_argument("--bench")
    ap.add_argument("--sweep")
    args = ap.parse_args()
    reg = load_registry(args.registry)
    print(f"registry: {len(reg)} gates ({args.registry})")
    ok = True
    if args.bench:
        ok &= check(args.bench, bench_keys(args.bench), reg)
    if args.sweep:
        ok &= check(args.sweep, sweep_keys(args.sweep), reg)
    if not (args.bench or args.sweep):
        print("nothing to check: pass --bench and/or --sweep")
        ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

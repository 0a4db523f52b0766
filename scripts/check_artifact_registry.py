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
      --sweep SCALESWEEP_r14.json \
      --audit-ordering PLANAUDIT_r16.json

Exit 0 and one OK line per artifact iff every set matches; exit 1 with
the symmetric difference otherwise.

--audit-ordering (verdict r14 task 1, second half, mechanized r16): the
committed plan audit must POSTDATE the last src/main change, or it
describes a tree nobody ships. The check requires (a) no uncommitted /
untracked changes under src/main, and (b) the last commit touching
src/main is an ancestor of (or equal to) the last commit touching the
audit file — i.e. the audit was regenerated at or after the final code
change.
"""
import argparse
import json
import subprocess
import sys


def git(*args):
    return subprocess.run(["git", *args], capture_output=True,
                          text=True, check=True).stdout.strip()


def check_audit_ordering(audit_path):
    dirty = git("status", "--porcelain", "--", "src/main")
    if dirty:
        print(f"FAIL audit-ordering: uncommitted src/main changes postdate "
              f"{audit_path}:\n{dirty}")
        return False
    src_commit = git("log", "-1", "--format=%H", "--", "src/main")
    audit_commit = git("log", "-1", "--format=%H", "--", audit_path)
    if not audit_commit:
        print(f"FAIL audit-ordering: {audit_path} is not committed")
        return False
    # src_commit must be an ancestor of (or equal to) audit_commit
    rc = subprocess.run(["git", "merge-base", "--is-ancestor",
                         src_commit, audit_commit]).returncode
    if rc != 0:
        print(f"FAIL audit-ordering: last src/main change {src_commit[:12]} "
              f"is NOT an ancestor of {audit_path}'s last commit "
              f"{audit_commit[:12]} — regenerate the plan audit")
        return False
    print(f"OK audit-ordering: {audit_path} ({audit_commit[:12]}) postdates "
          f"the last src/main change ({src_commit[:12]})")
    return True


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
    ap.add_argument("--registry")
    ap.add_argument("--bench")
    ap.add_argument("--sweep")
    ap.add_argument("--audit-ordering", dest="audit_ordering",
                    help="PLANAUDIT_r*.json whose commit must postdate the "
                         "last src/main change")
    args = ap.parse_args()
    ok = True
    if args.registry:
        reg = load_registry(args.registry)
        print(f"registry: {len(reg)} gates ({args.registry})")
        if args.bench:
            ok &= check(args.bench, bench_keys(args.bench), reg)
        if args.sweep:
            ok &= check(args.sweep, sweep_keys(args.sweep), reg)
    elif args.bench or args.sweep:
        print("--bench/--sweep need --registry")
        ok = False
    if args.audit_ordering:
        ok &= check_audit_ordering(args.audit_ordering)
    if not (args.bench or args.sweep or args.audit_ordering):
        print("nothing to check: pass --bench, --sweep and/or "
              "--audit-ordering")
        ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Regenerate BENCH_REF.json from two (or more) full-run BENCH_FULL dumps.

Per-query MAX-merge of wall seconds and executor task-seconds — the
conservative same-HEAD record the bench's `inflated` self-flag compares
against (>3x task_sec AND +2s). Regenerate after ANY bench or query
change; a stale ref misfires the flag on legitimately-changed queries.

Usage: python3 tools/merge_bench_ref.py RUN1.json RUN2.json [...] > BENCH_REF.json
"""
import json
import sys

runs = [json.load(open(p)) for p in sys.argv[1:]]
assert runs, "need at least one BENCH_FULL dump"
names = sorted({k for r in runs for k in r["queries"]})
wall = {k: max(r["queries"][k] for r in runs if k in r["queries"])
        for k in names}
# a query can record a wall time but no metrics entry (errored mid-query,
# or an older-format dump without "metrics") — skip it rather than crash
# on max() of an empty sequence
task = {k: max(r["metrics"][k]["task_sec"] for r in runs
               if k in r.get("metrics", {}))
        for k in names
        if any(k in r.get("metrics", {}) for r in runs)}
note = (f"max-merge of {len(runs)} full warmed runs "
        f"({len(names)} queries); regenerate via tools/merge_bench_ref.py "
        "after any bench/query change")
out = {"task_sec": task, "wall": wall, "note": note}
print(json.dumps(out, indent=0, sort_keys=True))

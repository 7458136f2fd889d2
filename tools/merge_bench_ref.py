#!/usr/bin/env python3
"""Regenerate BENCH_REF.json from two (or more) full-run BENCH_FULL dumps.

Per-query MIN-merge of wall seconds and executor task-seconds — the
least-contended observation of the plan is the honest reference the
bench's `inflated` self-flag compares against (>3x task_sec AND +2s).
MAX-merge (rounds 8-11) let ONE contention spike permanently inflate a
reference row and desensitize the flag (q106's ref wall regressed
4.99s->13.56s task-sec from a single contended source run); the bench
now times best-of-2 passes per query, so the min of min-of-passes is
the stable floor. Regenerate after ANY bench or query change; a stale
ref misfires the flag on legitimately-changed queries.

Usage: python3 tools/merge_bench_ref.py RUN1.json RUN2.json [...] > BENCH_REF.json
"""
import json
import numbers
import sys

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        runs.append(json.load(f))
assert runs, "need at least one BENCH_FULL dump"


def numeric(v):
    return isinstance(v, numbers.Real) and not isinstance(v, bool)


names = sorted({k for r in runs for k in r["queries"]})
# skip non-numeric entries (an errored query may record a placeholder, or
# a format drift) rather than crash the merge
wall = {}
for k in names:
    vals = [r["queries"][k] for r in runs
            if numeric(r["queries"].get(k))]
    if vals:
        wall[k] = min(vals)
task = {}
for k in names:
    vals = [r["metrics"][k]["task_sec"] for r in runs
            if numeric(r.get("metrics", {}).get(k, {}).get("task_sec"))]
    if vals:
        task[k] = min(vals)
note = (f"min-merge of {len(runs)} full warmed best-of-N-pass runs "
        f"({len(names)} queries); regenerate via tools/merge_bench_ref.py "
        "after any bench/query change")
# The merge policy is recorded IN the artifact (r12 advice): rounds 8-11
# max-merged, r12+ min-merge — a consumer comparing cross-round refs must
# not silently mix regimes.
out = {"policy": "min", "task_sec": task, "wall": wall, "note": note}
print(json.dumps(out, indent=0, sort_keys=True))

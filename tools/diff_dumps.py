#!/usr/bin/env python3
"""Cross-JVM determinism check: EXCEPT-ALL-diff two Verify dumps.

Run `graft.Verify` twice into separate dirs (fresh JVMs), then:

    python3 tools/diff_dumps.py /tmp/dumpA /tmp/dumpB

Every per-query parquet dir is diffed BOTH directions in DuckDB
(EXCEPT ALL, so duplicate-row multiplicity counts too). Exit 0 iff
all queries are bit-identical — the claim the rows-only queries rest
on (oracle-checked queries get this for free from the hash compare).
"""
import duckdb
import os
import sys

a_root, b_root = sys.argv[1], sys.argv[2]
# union of BOTH roots: a query present in only one dump is a diff, not a
# silently-skipped name (a partial dump must never report bit-identical)
names = sorted({d for root in (a_root, b_root) for d in os.listdir(root)
                if os.path.isdir(os.path.join(root, d))})
con = duckdb.connect()
bad = []
for n in names:
    a = os.path.join(a_root, n, '*.parquet')
    b = os.path.join(b_root, n, '*.parquet')
    try:
        d1 = con.execute(f"SELECT count(*) FROM (SELECT * FROM '{a}' "
                         f"EXCEPT ALL SELECT * FROM '{b}')").fetchone()[0]
        d2 = con.execute(f"SELECT count(*) FROM (SELECT * FROM '{b}' "
                         f"EXCEPT ALL SELECT * FROM '{a}')").fetchone()[0]
        if d1 or d2:
            bad.append((n, d1, d2))
    except Exception as e:  # schema mismatch, unreadable dump, ...
        bad.append((n, 'ERR', str(e).splitlines()[0][:100]))
for n, d1, d2 in bad:
    print(f"DIFF {n}: a-only={d1} b-only={d2}")
print(f"{len(names)} queries diffed; "
      f"{'ALL bit-identical' if not bad else f'{len(bad)} mismatched'}")
sys.exit(1 if bad else 0)

#!/usr/bin/env python3
"""Dev-only oracle checker (mirrors the driver's DuckDB compare).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [subsetRegex]

With a subsetRegex (the same filter passed to Verify), absent result dirs
for MATCHING names are "not dumped" skips; without one (a FULL run), an
absent result dir means the Spark-side dump crashed and counts as a FAIL.

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares row count, column names (sorted), and
values (sorted columns, row-order-sensitive after each side's own ORDER BY,
plus an order-insensitive hash fallback). NOT part of the shipped engine —
driver-side python only.
"""
import json
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return f"{v:.10g}"
    return str(v)


# DuckDB output types Spark has no parquet-writable equivalent for. The
# driver's hasher silently diverges on these (sum() over any integer
# promotes to HUGEINT/int128 in DuckDB; Spark writes BIGINT) even when the
# values are exactly equal — the q83/q97 round-5 failure class. Oracle SQL
# must CAST such columns explicitly.
BANNED_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
                "UTINYINT", "UUID", "BIT", "INTERVAL")


def lint_types(con, oracle):
    """Fail any oracle query whose output has a type Spark cannot emit."""
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            rel = con.sql(sql)
            bad = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                   if any(b in str(t).upper() for b in BANNED_TYPES)]
            if bad:
                n_bad += 1
                print(f"LINT {name}: un-Spark-able oracle column type(s): "
                      + ", ".join(bad) + " — add an explicit CAST")
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"LINT-ERROR {name}: {type(e).__name__}: {str(e)[:200]}")
    return n_bad


def main(sf_dir, out_dir, subset=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    subset_re = re.compile(subset) if subset else None
    n_lint = lint_types(con, oracle)
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if subset_re is not None and not subset_re.search(name):
                # Subset dump (dev: Verify with a query filter): this name
                # was never asked for — "not dumped", not a failure.
                n_skip += 1
                continue
            # FULL run (or name matched the filter): the Spark-side dump
            # crashed before writing — that's a hard failure.
            n_fail += 1
            print(f"FAIL {name}: result dir missing (Spark dump crashed?)")
            continue
        try:
            exp = con.sql(sql).fetchall()
            exp_cols = [d[0] for d in con.sql(sql).description]
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got = got_rel.fetchall()
            got_cols = [d[0] for d in got_rel.description]
            issues = []
            if sorted(exp_cols) != sorted(got_cols):
                issues.append(f"cols exp={sorted(exp_cols)} got={sorted(got_cols)}")
            if len(exp) != len(got):
                issues.append(f"rows exp={len(exp)} got={len(got)}")
            if not issues:
                # compare with columns sorted by name
                e_ix = [exp_cols.index(c) for c in sorted(exp_cols)]
                g_ix = [got_cols.index(c) for c in sorted(got_cols)]
                e_rows = sorted(tuple(norm(r[i]) for i in e_ix) for r in exp)
                g_rows = sorted(tuple(norm(r[i]) for i in g_ix) for r in got)
                if e_rows != g_rows:
                    bad = next(i for i, (a, b) in enumerate(zip(e_rows, g_rows))
                               if a != b)
                    issues.append(
                        f"values differ, first at sorted-row {bad}:\n"
                        f"    exp={e_rows[bad]}\n    got={g_rows[bad]}")
            if issues:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(issues))
            else:
                n_pass += 1
                print(f"ok   {name} ({len(exp)} rows)")
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:300]}")
    skipped = f", {n_skip} not-dumped" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail, {n_lint} lint{skipped}")
    return 1 if (n_fail or n_lint) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))

#!/usr/bin/env python3
"""Assert every self-verifying flag column is TRUE in a Verify output dir.

Usage: python3 scripts/check_flags.py <verifyOutDir> [query ...]

The data-dependent-flag queries prove their own recall/tolerance budgets
in-query (a boolean column the DuckDB oracle pins TRUE). The driver's
correctness gate runs at sf0.01; this check re-verifies the budgets at
any other scale factor (normally sf0.1, where the round-5 PQ regression
was caught) without needing a quadratic DuckDB oracle there: a FALSE (or
empty) flag column fails loudly.
"""
import sys
import duckdb

FLAG_QUERIES = [
    "x_pq_ann", "x_minhash_neardup", "x_hll_rollup", "x_approx_quantile",
    "x_winnow_dedup", "x_knn_blocked", "x_ivfpq_ann", "x_simhash",
    "x_lsh_ann", "x_neardedup_incremental",
]

outdir = sys.argv[1]
queries = sys.argv[2:] or FLAG_QUERIES

con = duckdb.connect()
fails = 0
for name in queries:
    try:
        desc = con.execute(f"DESCRIBE SELECT * FROM '{outdir}/{name}/*.parquet'").fetchall()
    except Exception as e:
        print(f"FAIL {name}: cannot read result: {e}")
        fails += 1
        continue
    bools = [c for c, t, *_ in desc if t == "BOOLEAN"]
    if not bools:
        print(f"FAIL {name}: no boolean flag column found "
              f"(columns: {[c for c, *_ in desc]})")
        fails += 1
        continue
    for c in bools:
        n, ok = con.execute(
            f"SELECT COUNT(*), bool_and(\"{c}\") FROM '{outdir}/{name}/*.parquet'"
        ).fetchone()
        if n == 0 or not ok:
            print(f"FAIL {name}.{c}: rows={n} all_true={ok}")
            fails += 1
        else:
            print(f"PASS {name}.{c}: {n} rows, flag TRUE")

print()
print("ALL FLAGS GREEN" if fails == 0 else f"{fails} FLAG FAILURE(S)")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

Loads each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = views over the sfDir
parquet files), and compares schema + values exactly (floats bit-for-bit,
since the engine is designed for exact-decimal reproducibility).
Optional query names restrict the check to that subset (local iteration /
the sf0.1 flag script, where only feasible oracles are re-run).
"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    """Sort columns by name; return (sorted col names, row tuples)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    out = [tuple(r[i] for i in order) for r in rows]
    return names, out

def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def concrete_types(query):
    """column -> concrete DuckDB type (via DESCRIBE, not the coarse
    DBAPI category — the round-10 blind spot: Decimal('13') == 13 in
    Python while the driver hashes typed values, so only the concrete
    type catches a BIGINT-vs-HUGEINT/DECIMAL divergence)."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {query}").fetchall()}

def int128ish(t):
    """int128-class types the driver's hasher can't canonicalize."""
    if t in ("HUGEINT", "UHUGEINT"):
        return True
    if t.startswith("DECIMAL("):
        return int(t[8:].split(",")[0]) > 18
    return False

fails = 0
for name in sorted(only if only else oracle):
    if name not in oracle:
        print(f"FAIL {name}: not in oracle_sql.json"); fails += 1; continue
    sql = oracle[name]
    try:
        mine = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
        mrows, mcols = mine.fetchall(), [d[0] for d in mine.description]
        mt = concrete_types(f"SELECT * FROM '{outdir}/{name}/*.parquet'")
    except Exception as e:
        print(f"FAIL {name}: cannot read result: {e}"); fails += 1; continue
    try:
        orc = con.execute(sql)
        orows, ocols = orc.fetchall(), [d[0] for d in orc.description]
        ot = concrete_types(f"({sql})")
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue

    mnames, mdata = canon(mrows, mcols)
    onames, odata = canon(orows, ocols)
    if mnames != onames:
        print(f"FAIL {name}: columns {mnames} vs oracle {onames}"); fails += 1; continue
    # Concrete-dtype mismatch is a FAIL, not a WARN: the driver's gate
    # hashes typed values, so a value-equal result in a different
    # concrete type still reads as a mismatch there (round-10 lesson —
    # 9 value-correct queries failed on exactly this).
    tmismatch = [c for c in mnames if mt.get(c) != ot.get(c)]
    if tmismatch:
        print(f"FAIL {name}: dtype mismatch {[(c, mt.get(c), ot.get(c)) for c in tmismatch]}")
        fails += 1; continue
    wide = [c for c in mnames if int128ish(mt.get(c, "")) or int128ish(ot.get(c, ""))]
    if wide:
        print(f"FAIL {name}: int128-class column(s) {wide} — the driver's "
              f"hasher can't canonicalize HUGEINT/DECIMAL(>18); narrow to "
              f"BIGINT (or VARCHAR) on BOTH sides")
        fails += 1; continue
    if len(mdata) != len(odata):
        print(f"FAIL {name}: rows {len(mdata)} vs oracle {len(odata)}"); fails += 1; continue
    bad = None
    for i, (mr, orr) in enumerate(zip(mdata, odata)):
        if not all(eq(a, b) for a, b in zip(mr, orr)):
            bad = (i, mr, orr); break
    if bad:
        print(f"FAIL {name}: first diff at row {bad[0]}:\n  mine:   {bad[1]}\n  oracle: {bad[2]}")
        fails += 1; continue
    print(f"PASS {name}: {len(mdata)} rows")

# queries with no oracle: rows-only smoke
meta = set(oracle)
import os
for d in sorted(os.listdir(outdir)):
    if d in meta or d.endswith(".json") or (only and d not in only):
        continue
    try:
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"ROWS {d}: {n} rows (no oracle)")
    except Exception as e:
        print(f"FAIL {d}: unreadable rows-only result: {e}"); fails += 1

print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

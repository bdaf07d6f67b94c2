#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle comparison:
for each query output parquet + oracle SQL, compare schema-insensitively
(columns sorted by name, rows sorted) and EXACTLY on values — a mismatch
here means the driver's hash check would fail.

Usage: oracle_check.py <outDir> <sfDir>
"""
import sys, json, glob, math
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = ok = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}: no spark output"); fail += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"ERROR  {name}: {e}"); fail += 1; continue
    mine = mine[sorted(mine.columns)]
    ref = ref[sorted(ref.columns)]
    if list(mine.columns) != list(ref.columns):
        print(f"SCHEMA {name}: mine={list(mine.columns)} ref={list(ref.columns)}"); fail += 1; continue
    if len(mine) != len(ref):
        print(f"ROWS   {name}: mine={len(mine)} ref={len(ref)}"); fail += 1; continue
    mine = mine.sort_values(by=list(mine.columns), ignore_index=True)
    ref = ref.sort_values(by=list(ref.columns), ignore_index=True)
    bad = None
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if str(a.dtype) != str(b.dtype):
            bad = f"dtype[{c}]: {a.dtype} vs {b.dtype}"; break
        neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            bad = f"value[{c}] row {i}: {a[i]!r} vs {b[i]!r}"; break
    if bad:
        print(f"DIFF   {name}: {bad}"); fail += 1
    else:
        ok += 1
print(f"\n{ok} ok, {fail} failed of {len(oracle)}")
sys.exit(1 if fail else 0)

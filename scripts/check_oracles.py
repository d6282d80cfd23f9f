#!/usr/bin/env python3
"""Pre-validate SparkEntry oracles: run each oracle SQL in DuckDB over the
testdata parquet and compare against the Spark-written parquet from
graft.Verify, mimicking the driver (sort columns by name, compare values).

Usage: check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fail = 0
for name in sorted(oracle):
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        print(f'MISSING spark output: {name}'); fail += 1; continue
    sp = con.sql(f"select * from '{out}/{name}/*.parquet'").df()
    du = con.sql(oracle[name]).df()
    sp = sp.reindex(sorted(sp.columns), axis=1)
    du = du.reindex(sorted(du.columns), axis=1)
    du.columns = list(du.columns)
    ok_schema = list(sp.columns) == list(du.columns)
    if not ok_schema:
        print(f'FAIL {name}: columns spark={list(sp.columns)} duck={list(du.columns)}'); fail += 1; continue
    if len(sp) != len(du):
        print(f'FAIL {name}: rows spark={len(sp)} duck={len(du)}'); fail += 1; continue
    sp2 = sp.sort_values(list(sp.columns)).reset_index(drop=True)
    du2 = du.sort_values(list(du.columns)).reset_index(drop=True)
    mismatch = None
    dtype_hazard = None
    for c in sp.columns:
        a, b = sp2[c], du2[c]
        # the DRIVER's hash is type-sensitive: a DuckDB HUGEINT/DECIMAL
        # column lands in pandas as dtype=object and hash-mismatches even
        # when every value is equal (bit us in r5: qd_pack_shards). Flag it
        # here so the oracle gets a ::BIGINT cast before the driver runs.
        if b.dtype == object and a.dtype != object and dtype_hazard is None:
            dtype_hazard = (c, str(a.dtype), str(b.dtype))
        try:
            a = a.astype(b.dtype)
        except Exception:
            pass
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = eq.idxmin()
            mismatch = (c, i, a[i], b[i]); break
    if mismatch:
        print(f'FAIL {name}: col={mismatch[0]} row={mismatch[1]} spark={mismatch[2]!r} duck={mismatch[3]!r}')
        fail += 1
    elif dtype_hazard:
        print(f'FAIL {name}: dtype hazard col={dtype_hazard[0]} spark={dtype_hazard[1]} duck={dtype_hazard[2]} '
              f'(values equal but driver hash is type-sensitive — cast the oracle column)')
        fail += 1
    else:
        print(f'OK   {name} ({len(sp)} rows)')

# rows-only queries (no oracle): just require non-empty output
for d in sorted(glob.glob(f'{out}/*/')):
    name = d.rstrip('/').split('/')[-1]
    if name in oracle: continue
    try:
        n = con.sql(f"select count(*) from '{d}*.parquet'").fetchone()[0]
        print(f'{"OK  " if n > 0 else "WARN"} {name} rows-only ({n} rows)')
        if n == 0: fail += 1
    except Exception as e:
        print(f'FAIL {name} rows-only: {e}'); fail += 1

print('ALL OK' if fail == 0 else f'{fail} FAILURES')
sys.exit(1 if fail else 0)

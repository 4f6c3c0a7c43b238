#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running SparkEntry.oracleSql on the same tables.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; GenScaleData (Spark) writes
        # a directory of part files — accept both layouts
        p = f"{sf}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_bad += 1; continue
        got = got.sort_values(by=list(got.columns), ignore_index=True)
        exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_bad += 1; continue
        if len(exp) == 0:
            print(f"WARN {name}: 0 rows (weak)"); continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = (~eq).idxmax()
                bad_cols.append(f"{c}[row{i}]: {a[i]!r} vs {b[i]!r} (dtype {a.dtype}/{b.dtype})")
        # dtype mismatch matters for the driver's hash even when values print equal
        dt = [f"{c}: {got[c].dtype} vs {exp[c].dtype}" for c in got.columns if str(got[c].dtype) != str(exp[c].dtype)]
        if bad_cols:
            print(f"FAIL {name}: {'; '.join(bad_cols[:3])}"); n_bad += 1
        elif dt:
            # The driver's value hash sees 5 (int64) != 5.0 (float64): a dtype
            # diff IS a failure there, so it must be one here too.
            print(f"FAIL {name}: dtype diff ({'; '.join(dt)}) values match, rows={len(exp)}")
            n_bad += 1
        else:
            print(f"OK   {name}: rows={len(exp)}"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(oracle)} total")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate:
runs each oracle SQL in DuckDB over the same parquet tables and compares
with the parquet dumped by graft.Verify (columns sorted by name, rows
sorted, values compared). NOT part of the shipped Scala library.

Usage: python3 scripts/local_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:200]}"); n_bad += 1; continue
        ok, msg = compare(got, exp)
        if ok: n_ok += 1; print(f"ok       {name} ({got.num_rows} rows)")
        else:  n_bad += 1; print(f"MISMATCH {name}: {msg}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

def compare(got, exp):
    import pandas as pd
    g, e = got.to_pandas(), exp.to_pandas()
    g = g[sorted(g.columns)]; e = e[sorted(e.columns)]
    if list(g.columns) != list(e.columns):
        return False, f"columns {list(g.columns)} != {list(e.columns)}"
    if len(g) != len(e):
        return False, f"rows {len(g)} != {len(e)}"
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                import numpy as np
                bad = ~((gv.isna() & ev.isna()) | (gv == ev))
                if bad.any():
                    i = bad.idxmax()
                    return False, f"col {c} row {i}: {gv[i]!r} != {ev[i]!r}"
            else:
                if not gv.astype(str).equals(ev.astype(str)):
                    diff = gv.astype(str) != ev.astype(str)
                    i = diff.idxmax()
                    return False, f"col {c} row {i}: {gv[i]!r} != {ev[i]!r}"
        except Exception as ex:
            return False, f"col {c}: compare error {ex}"
    return True, ""

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

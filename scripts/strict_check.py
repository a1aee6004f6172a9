#!/usr/bin/env python3
"""Stricter dev-only replica of the driver's hash compare: sorts columns by
name, sorts rows, stringifies EVERY value (no numeric coercion), and diffs.
Catches dtype mismatches (int vs double) that local_check.py's lax numeric
compare misses but the driver's value-hash does not.

Usage: python3 scripts/strict_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb


def canon(tbl):
    import pandas as pd
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    # stringify first so arrays/ndarrays sort fine and dtypes show in repr
    sdf = df.apply(lambda col: col.map(lambda v: repr(v)))
    sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    return df, sdf


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING  {name}"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"ERROR    {name}: {str(e)[:300]}"); n_bad += 1; continue
        gdf, g = canon(got)
        edf, e = canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"COLS     {name}: {list(g.columns)} != {list(e.columns)}")
            n_bad += 1; continue
        if len(g) != len(e):
            print(f"ROWS     {name}: {len(g)} != {len(e)}"); n_bad += 1; continue
        bad = False
        # dtype check (arrow-level)
        for c in sorted(gdf.columns):
            gt = str(gdf[c].dtype); et = str(edf[c].dtype)
            if gt != et:
                print(f"DTYPE    {name}.{c}: spark={gt} oracle={et}")
                bad = True
        for c in g.columns:
            if not g[c].equals(e[c]):
                diff = g[c] != e[c]
                i = diff.idxmax()
                print(f"VALUE    {name}.{c} row {i}: spark={g[c][i]} oracle={e[c][i]}")
                bad = True
                break
        if bad:
            n_bad += 1
        else:
            n_ok += 1; print(f"ok       {name} ({len(g)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))

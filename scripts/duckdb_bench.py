#!/usr/bin/env python3
"""Dev/driver-side head-to-head: run the headline queries' baseline SQL in
DuckDB (the reference's actual query engine) over the same sf parquet
tables. Best-of-N wall time per query, all cores (DuckDB defaults to all
threads), same measurement discipline as graft.Bench. NOT part of the
shipped Scala library.

graft.Bench invokes this with --json in the SAME session as its own
measurement, so BENCH_rN.json carries both columns under identical machine
conditions (the r6 lesson: the two sides measured hours apart drifted 2.3x
on the same query).

Usage:
  python3 scripts/duckdb_bench.py <sfDir> <oracleJson> [--json] [--bench bench_json] [--rounds N]

  <oracleJson>   {"query_name": "SELECT ...", ...} — e.g. the
                 bench_oracle_sql.json graft.Bench writes, or a Verify
                 dump's oracle_sql.json restricted to headline queries.
  --json         print ONE machine-readable line {"name": best_sec, ...}
                 instead of the pretty table
  --bench FILE   pretty mode only: show ratios vs a BENCH_rN.json
"""
import sys, json, time
import duckdb


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    sf_dir, oracle_path = args[0], args[1]
    as_json = "--json" in argv
    rounds = 5
    if "--rounds" in argv:
        rounds = int(argv[argv.index("--rounds") + 1])
    bench_json = None
    if "--bench" in argv:
        bench_json = argv[argv.index("--bench") + 1]

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))

    best = {}
    for name in sorted(oracle):
        b = float("inf")
        for i in range(rounds):
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            b = min(b, time.perf_counter() - t0)
            # adaptive repeats: long queries have proportionally lower
            # timer noise, so don't burn minutes re-running a 100 s query
            # five times (best-of-5 under 2 s, best-of-3 under 10 s,
            # best-of-2 above)
            if (b >= 10.0 and i >= 1) or (b >= 2.0 and i >= 2):
                break
        best[name] = b

    if as_json:
        print(json.dumps({k: round(v, 6) for k, v in best.items()}))
        return

    spark = {}
    if bench_json:
        spark = json.load(open(bench_json)).get("queries", {})
    print(f"{'query':34s} {'duckdb':>8s} {'spark':>8s}  ratio")
    td = ts = 0.0
    for name in sorted(best):
        s = spark.get(name)
        ratio = f"{s / best[name]:6.2f}x" if s else ""
        print(f"{name:34s} {best[name]:8.3f} {s or float('nan'):8.3f}  {ratio}")
        td += best[name]
        ts += s or 0.0
    if ts:
        print(f"{'TOTAL':34s} {td:8.3f} {ts:8.3f}  {ts/td:6.2f}x")


if __name__ == "__main__":
    main(sys.argv[1:])

#!/usr/bin/env python3
"""Dev-only head-to-head: run the headline queries' ORACLE SQL in DuckDB
(the reference's actual query engine) over the same sf parquet tables, and
compare with the engine's BENCH numbers. Best-of-five wall time per query,
all cores (DuckDB defaults to all threads), same measurement discipline as
graft.Bench. NOT part of the shipped Scala library.

Usage: python3 scripts/duckdb_bench.py <sfDir> [bench_json]
"""
import sys, json, time
import duckdb

HEADLINE = [
    "q01_pricing_summary", "q03_join_revenue_by_nation",
    "q06_window_latest_order", "q12_unnest_tokens",
    "q20_window_running_sum", "q23_minhash_signature",
    "q25_jaccard_neardups", "q27_cosine_topk",
    "q101_tfidf_topk", "q105_shingle_novelty",
    "q108_dedup_survivorship", "q111_cluster_quality",
    "q113_chunk_overlap", "q125_dup_spans", "q126_cross_neardups",
    "q127_span_strip", "q128_split_leakage", "q132_semantic_dedup",
]

def main(sf_dir, bench_json=None):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open("/tmp/verify_out/oracle_sql.json"))
    spark = {}
    if bench_json:
        spark = json.load(open(bench_json)).get("queries", {})
    print(f"{'query':34s} {'duckdb':>8s} {'spark':>8s}  ratio")
    td = ts = 0.0
    for name in HEADLINE:
        sql = oracle[name]
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        s = spark.get(name)
        ratio = f"{best / s:6.2f}x" if s else ""
        print(f"{name:34s} {best:8.3f} {s or float('nan'):8.3f}  {ratio}")
        td += best
        ts += s or 0.0
    print(f"{'TOTAL':34s} {td:8.3f} {ts:8.3f}  {td/ts:6.2f}x" if ts else "")

if __name__ == "__main__":
    main(*sys.argv[1:])

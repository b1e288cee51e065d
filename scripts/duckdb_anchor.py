#!/usr/bin/env python3
"""Record DuckDB wall-times for the headline TPC-H trio as an external
performance anchor (driver-side tooling — the library itself never calls
DuckDB).

Runs each query's oracle SQL from a `graft.Verify` dump against the sf0.1
parquet tables, warm + timed per query (the same discipline Bench.scala
uses), and writes DUCKDB_ANCHOR.json at the repo root. Bench.scala reads
that file and embeds it in target/bench_summary.json so "within 2x of
baseline" has an external engine's number next to the Spark times.

Usage: python3 scripts/duckdb_anchor.py <sfDir> <verifyOutDir>
  (verifyOutDir must contain oracle_sql.json from `runMain graft.Verify`)
"""
import json, os, sys, time
import duckdb

# the TPC-H trio plus representatives per operator family that have a
# FULL-VALUE DuckDB oracle (not an invariant boolean) — both engines do
# the real work, including queries where either engine may lose: dedup
# transforms (d11/d17), regex-heavy text (t8), recursive-CTE packing
# (sp5), exact quantiles (t9), a vector cross-join (dc3), and a
# windowed gaps-and-islands merge (a7), alongside the r10 set.
# DELIBERATELY EXCLUDED: sp5_greedy_pack — its oracle is a recursive CTE
# that DuckDB executes in 37s for 5000 rows (one rescan per recursion
# step); that measures a pathological SQL encoding of sequential packing,
# not the engine, and would swing the geomean ~100x in Spark's favor.
QUERIES = ["q01_pricing_summary", "q02_filtered_revenue", "q05_regional_revenue",
           "d1_dedup_exact", "t1_token_counts", "j5_dim_join_revenue",
           "t13_bigram_ppl", "t14_filter_config", "m10_video_frames",
           "k9_zorder_layout",
           "t8_html_strip", "d11_paragraph_dedup", "d17_substring_spans",
           "t9_length_quantiles", "dc3_semantic_decontam", "a7_turn_merge"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    times = {}
    for q in QUERIES:
        sql = oracle[q]
        con.execute(sql).fetchall()  # warm: footers, casts, plan
        # best-of-3 timed samples — the SAME sampling policy Bench.scala
        # applies to the Spark side (warm + up to 3 samples, min). A
        # single draw vs best-of-N is an asymmetric estimator; keeping
        # both sides min-of-N makes the anchor ratio comparable.
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            n = len(con.execute(sql).fetchall())
            best = min(best, time.monotonic() - t0)
        times[q] = round(best, 3)
        print(f"{q}: {times[q]}s ({n} rows)")
    anchor = {"engine": "duckdb", "version": duckdb.__version__,
              "threads": os.cpu_count(), "sf": sf_dir,
              "sampling": "warm + best-of-3 (matches Bench.scala best-of sampling)",
              "queries": times}
    with open("DUCKDB_ANCHOR.json", "w") as f:
        json.dump(anchor, f, indent=1)
    print("wrote DUCKDB_ANCHOR.json")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

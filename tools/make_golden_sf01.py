#!/usr/bin/env python3
"""Regenerate the sf0.1 golden parquet files for LargeSfOracleSpec.

The spec (src/test/scala/graft/LargeSfOracleSpec.scala) oracle-checks the
most shape-sensitive keys at sf0.1 INSIDE `sbt test` (VERDICT r9 #8): the
driver's own DuckDB gate runs only at sf0.01, and several failure classes
(sketch precision cliffs, window-fold merge order, graph-round decimal
growth) only show up at the larger scale. DuckDB is not on the test
classpath, so the oracle side is materialized here, once, as parquet the
spec reads back with Spark.

Usage:
  python3 tools/make_golden_sf01.py <oracle_sql.json> [sfDir] [outDir]

Defaults: sfDir=/root/testdata/sf0.1,
          outDir=src/test/resources/golden_sf0.1

Regenerate whenever (a) a listed key's oracle SQL changes, or (b) the
driver regenerates the fixture parquet (the spec fails loudly either way).
KEYS below must match LargeSfOracleSpec.keys — the spec pins the two-way
file<->list match.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The shape-sensitive set: sketches (merge-order + precision), window
# folds (numeric recurrences), graph rounds (iterative decimal growth),
# dedup kernels (LSH banding), ANN evals, drift/heavy-hitter passes.
KEYS = [
    "agg_approx_distinct", "agg_approx_quantile", "agg_countmin",
    "agg_sketch_union", "agg_kmv_jaccard", "agg_bitmap_distinct",
    "agg_equidepth_hist", "agg_hll_precision_sweep",
    "agg_moments_skew_kurt", "win_kalman", "win_holt_winters",
    "win_theil_sen", "win_time_decay_sum", "forecast_backtest",
    "graph_pagerank", "graph_hits", "graph_kcore_peel", "dedup_minhash",
    "dedup_connected", "sim_ivf_nprobe_sweep", "events_psi_drift",
    "text_heavy_hitters",
    # round-11 additions: rank-fusion decimals, BM25 float chain, CDC cut
    # shifts, IVF+PQ composite decimals, greedy k-center trajectory,
    # gram-join removal audit
    "text_bm25", "sim_rrf_fusion", "dedup_chunk_cdc", "sim_ivfpq_topk",
    "sim_ivfpq_recall_eval", "sample_kcenter", "decontaminate_apply",
]


def main(oracle_path, sf_dir, out_dir):
    oracle = json.load(open(oracle_path))
    missing = [k for k in KEYS if k not in oracle]
    if missing:
        raise SystemExit(f"keys without oracle SQL: {missing}")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for k in KEYS:
        dest = f"{out_dir}/{k}.parquet"
        if os.path.exists(dest):
            os.remove(dest)
        con.sql(f"COPY ({oracle[k]}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"{k}: {n} rows -> {dest}")


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
         sys.argv[3] if len(sys.argv) > 3
         else "src/test/resources/golden_sf0.1")

package graft

import org.apache.spark.sql.functions.col

/** sf0.1 oracle gate INSIDE `sbt test` (VERDICT r9 #8): the driver's
  * DuckDB compare runs only at sf0.01, and several failure classes —
  * sketch precision cliffs, window-fold merge order, iterative-round
  * numeric growth, LSH banding shifts — only surface at the larger
  * scale (r8's graph_hits decimal hash failure was exactly this class).
  *
  * The oracle side is the DuckDB result of each key's `oracleSql` at
  * sf0.1, materialized once as parquet by `tools/make_golden_sf01.py`
  * (DuckDB is not on the test classpath). The compare mirrors the
  * driver's: columns sorted by name, Spark types equal, row multisets
  * equal (exceptAll both ways) — bit-exact doubles included, which is
  * precisely the determinism the engine's exact-decimal folds promise
  * at ANY scale.
  *
  * If the driver regenerates the fixtures or a listed key's oracle SQL
  * changes, this fails loudly; regenerate with
  * `python3 tools/make_golden_sf01.py <verifyOut>/oracle_sql.json`.
  */
class LargeSfOracleSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"
  private val goldenDir = "/root/repo/src/test/resources/golden_sf0.1"

  /** Must match tools/make_golden_sf01.py KEYS (two-way pinned below). */
  private val keys = Seq(
    "agg_approx_distinct", "agg_approx_quantile", "agg_countmin",
    "agg_sketch_union", "agg_kmv_jaccard", "agg_bitmap_distinct",
    "agg_equidepth_hist", "agg_hll_precision_sweep",
    "agg_moments_skew_kurt", "win_kalman", "win_holt_winters",
    "win_theil_sen", "win_time_decay_sum", "forecast_backtest",
    "graph_pagerank", "graph_hits", "graph_kcore_peel", "dedup_minhash",
    "dedup_connected", "sim_ivf_nprobe_sweep", "events_psi_drift",
    "text_heavy_hitters",
    // round-11 additions: rank-fusion decimals, BM25 float chain, CDC
    // cut shifts, IVF+PQ composite decimals, k-center trajectory,
    // gram-join removal audit
    "text_bm25", "sim_rrf_fusion", "dedup_chunk_cdc", "sim_ivfpq_topk",
    "sim_ivfpq_recall_eval", "sample_kcenter", "decontaminate_apply")

  test("golden files and the key list match two-way (generator drift)") {
    val files = Option(new java.io.File(goldenDir).listFiles).get
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).toSet
    assert(files == keys.toSet,
      s"golden-only: ${files -- keys.toSet}; list-only: ${keys.toSet -- files}")
  }

  keys.foreach { k =>
    test(s"$k matches the DuckDB oracle at sf0.1") {
      val got = SparkEntry.queries(k)(spark, sf01)
      val exp = spark.read.parquet(s"$goldenDir/$k.parquet")
      val g = got.select(got.columns.sorted.map(col).toIndexedSeq: _*)
      val e = exp.select(exp.columns.sorted.map(col).toIndexedSeq: _*)
      assert(g.schema.map(f => (f.name, f.dataType)) ==
        e.schema.map(f => (f.name, f.dataType)),
        s"schema drift: spark=${g.schema.treeString} golden=${e.schema.treeString}")
      val (ng, ne) = (g.count(), e.count())
      assert(ng == ne, s"row count spark=$ng golden=$ne")
      assert(g.exceptAll(e).isEmpty && e.exceptAll(g).isEmpty,
        s"row multisets differ for $k at sf0.1 (first extras: " +
          s"${g.exceptAll(e).take(3).mkString("; ")})")
    }
  }
}

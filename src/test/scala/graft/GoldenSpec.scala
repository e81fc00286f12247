package graft

/** Golden values pinned at sf0.001, cross-computed in DuckDB 1.0.0 at the
  * time the full oracle gate was green (85/85). These protect future
  * refactors: a regression shows up here in seconds without re-running the
  * whole DuckDB comparison.
  */
class GoldenSpec extends SparkSpec {

  test("flagship Q1 pins its six groups exactly") {
    val rows = graft.ops.Aggregates.q1(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getAs[Double]("sum_qty"), r.getAs[Long]("cnt"))).toSeq
    val expected = Seq(
      ("A", "F", 13096.0, 510L),
      ("A", "O", 13173.0, 534L),
      ("N", "F", 15619.0, 594L),
      ("N", "O", 13130.0, 528L),
      ("R", "F", 13038.0, 531L),
      ("R", "O", 13188.0, 528L))
    assert(rows == expected)
  }

  test("dedup_minhash pins 28 near-dup pairs at sf0.001") {
    assert(SparkEntry.queries("dedup_minhash")(spark, sf).count() == 28L)
  }

  test("dedup_embedding pins 24 dup docs at sf0.001") {
    assert(SparkEntry.queries("dedup_embedding")(spark, sf).count() == 24L)
  }

  test("sim_pairs_lsh pins 28 doc near-dup pairs at sf0.001") {
    assert(SparkEntry.queries("sim_pairs_lsh")(spark, sf).count() == 28L)
  }

  test("round-2 operators pin their sf0.001 row counts") {
    val expected = Map(
      "q18_big_orders" -> 25L,
      "multimodal_framesample" -> 839L,
      "dedup_connected" -> 45L,
      "sample_hash" -> 943L,
      "agg_pivot" -> 2L,
      "win_range_time" -> 1000L,
      "set_union_byname" -> 160L)
    expected.foreach { case (k, n) =>
      assert(SparkEntry.queries(k)(spark, sf).count() == n, k)
    }
  }

  test("round-5 operators pin their sf0.001 row counts") {
    val expected = Map(
      "table_profile_approx" -> 4L,
      "sample_temperature" -> 20L,
      "corpus_token_budget" -> 59L,
      "dedup_containment" -> 28L,
      "join_interval_binned" -> 16L,
      "dedup_minhash_estimate" -> 28L,
      "events_rfm" -> 15L,
      "stream_topk" -> 858L,
      "multimodal_dedup_bytes" -> 500L,
      "join_interval_auto" -> 200L,
      "events_attribution" -> 202L,
      "events_gap_fill" -> 449L,
      "text_boilerplate" -> 500L,
      "sample_split" -> 500L,
      "join_interval_overlap" -> 12L,
      "embedding_norm_audit" -> 10L,
      "events_ab_lift" -> 1L,
      "join_asof_nearest" -> 202L,
      "text_bigram_lm" -> 500L)
    expected.foreach { case (k, n) =>
      assert(SparkEntry.queries(k)(spark, sf).count() == n, k)
    }
  }

  test("round-6 operators pin their sf0.001 row counts") {
    val expected = Map(
      "sample_priority" -> 100L,
      "text_ngram_novelty" -> 500L,
      "embedding_centroid_drift" -> 10L,
      "events_funnel_window" -> 15L,
      "join_asof_tolerance" -> 202L,
      "stream_funnel_window" -> 1L)
    expected.foreach { case (k, n) =>
      assert(SparkEntry.queries(k)(spark, sf).count() == n, k)
    }
  }

  test("round-4 operators pin their sf0.001 row counts") {
    val expected = Map(
      "text_chunk" -> 1388L,
      "text_repetition" -> 500L,
      "sample_stratified" -> 150L,
      "events_funnel" -> 15L,
      "sql_recursive" -> 83L,
      "fn_variant" -> 5L,
      "convert_parquet_xml" -> 5L,
      "agg_sketch_union" -> 1L,
      "join_range_binned" -> 21L,
      "stream_funnel" -> 1L)
    expected.foreach { case (k, n) =>
      assert(SparkEntry.queries(k)(spark, sf).count() == n, k)
    }
  }

  test("round-4 analytics and train-prep operators pin sf0.001 row counts") {
    val expected = Map(
      "q4_priority" -> 5L,
      "q6_forecast" -> 1L,
      "q7_nation_volume" -> 14L,
      "q8_market_share" -> 7L,
      "q12_priority_lines" -> 2L,
      "q14_promo" -> 1L,
      "q17_small_qty" -> 1L,
      "q19_disjunctive" -> 1L,
      "q22_idle_customers" -> 2L,
      "pack_sequences" -> 500L,
      "contamination_check" -> 11L,
      "kmeans_lloyd" -> 8L,
      "graph_pagerank" -> 50L,
      "compact_plan" -> 997L,
      "snapshot_diff" -> 4L,
      "events_sessionize" -> 946L,
      "join_skew_salted" -> 10L,
      "events_anomaly" -> 18L,
      "schema_evolution" -> 2L,
      "fn_regexp" -> 500L,
      "win_topk_native" -> 449L,
      "events_markov" -> 25L,
      "stream_upsert_sink" -> 5L,
      "q9_profit" -> 70L,
      "q15_top_supplier" -> 7L,
      "q16_parts_breadth" -> 78L,
      "agg_regression" -> 3L,
      "events_paths" -> 25L,
      "multimodal_audio_window" -> 4296L,
      "q21_waiting_supplier" -> 10L,
      "scan_csv_malformed" -> 1L)
    expected.foreach { case (k, n) =>
      assert(SparkEntry.queries(k)(spark, sf).count() == n, k)
    }
  }

  test("join_cross pins the 125-row cartesian") {
    assert(SparkEntry.queries("join_cross")(spark, sf).count() == 125L)
  }

  test("source_custom_v2 pins the synthetic generator aggregate") {
    val rows = SparkEntry.queries("source_custom_v2")(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("cnt"),
        r.getAs[Long]("max_id"))).toSeq
    assert(rows.map(_._2).sum == 4000L)
    assert(rows.map(_._1) == Seq("click", "error", "purchase", "signup",
      "view"))
    assert(rows.map(_._3).max == 3999L)
  }
}

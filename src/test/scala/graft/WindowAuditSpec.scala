package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Registry-wide unpartitioned-window audit (VERDICT r8 #3).
  *
  * A `Window` with an empty partitionSpec plans as a single-partition
  * WindowExec — the whole input funnels through ONE task. That is only
  * acceptable when the windowed table is provably bounded (a dimension,
  * a calendar, a size grid — never anything corpus-, vocab-, user- or
  * graph-sized). This spec walks EVERY registered query's optimized
  * logical plan and fails if an unpartitioned window appears outside
  * the allowlist below, where each entry names its bound. Adding a new
  * global window means adding its bound here — or (better) reworking it
  * like `agg_countmin` / `text_vocab_coverage` (bucket-parallel rank,
  * bounded-heap top-k) so no global window exists at all.
  *
  * Scope note: this audits the FINAL DataFrame's plan — the same plan
  * the driver executes per key. Memoized kernels materialized eagerly
  * inside query construction are audited through whichever key's final
  * plan consumes them lazily; the known-eager kernels (connected
  * components, LPA) are window-free by construction (PlanSpec pins the
  * heap/aggregate shapes).
  */
class WindowAuditSpec extends SparkSpec {

  /** key -> bound that makes its global window(s) a one-small-task sort,
    * independent of corpus size.
    */
  private val allowed: Map[String, String] = Map(
    // calendar-sized series (the fixture's event horizon in days/weeks/
    // months — at 100 TB a calendar is still a calendar)
    "events_error_budget" -> "daily calendar (O(#days))",
    "trend_changepoint" -> "daily calendar (O(#days))",
    "win_bollinger" -> "daily calendar (O(#days))",
    "win_percentile_bands" -> "daily calendar (O(#days))",
    "win_seasonal_decompose" -> "daily calendar (O(#days))",
    "win_seasonal_strength" -> "daily calendar (O(#days))",
    "win_wow_yoy" -> "weekly calendar (O(#weeks))",
    "events_error_burn_multiwindow" -> "hourly calendar (O(#hours))",
    "orders_backlog" -> ("monthly calendar after the full-outer " +
      "month rollup (O(#months))"),
    "trend_revenue_drawdown" -> "monthly calendar (O(#months))",
    "trend_revenue_monthly" -> "monthly calendar (O(#months))",
    // dimension / catalog-sized tables (they grow with the CATALOG, not
    // the data volume)
    "inventory_abc_class" -> ("part dimension (catalog-sized; " +
      "range-partition swap documented at the site)"),
    "supplier_delay_rank" -> ("per-supplier aggregate (catalog-" +
      "sized, n_lines>=20-filtered) ranked for a top-25 cut"),
    // fixed small grids, histograms, and heap survivors
    "agg_benford_audit" -> "9-digit Benford grid",
    "corpus_gini" -> "O(#sources) Lorenz curve",
    "corpus_mix" -> "O(#sources) mixing table",
    "sample_temperature" -> "O(#sources) share table",
    "corpus_token_budget" -> "256-bucket boundary table (O(B))",
    "corpus_quality_tradeoff" -> ("O(#0.1-nat score bins) cumulative " +
      "curve after the doc-NLL collapse"),
    "sample_systematic" -> "256-bucket boundary table (O(B))",
    "events_concurrent_peak" -> ("O(#6h-bucket boundaries) after " +
      "the windowed rollup"),
    "events_power_pareto" -> ("per-type user-decile grid " +
      "(O(types*10)) after the keyed user rollup"),
    "events_user_gini" -> "O(#deciles) after the keyed user rollup",
    "events_survival" -> "O(#tenure-days) life table",
    "graph_degree_histogram" -> "O(max degree) histogram",
    "shard_balance" -> "O(#shards) manifest",
    "stream_lateness_audit" -> "O(max lateness minutes) histogram",
    "text_zipf_fit" -> "top-64 heap survivors only",
    "customer_pareto_front" -> ("1024-bin suffix-max table (O(bins)); " +
      "the entity-sized prefix window is PARTITIONED by bin"),
    "stats_ks_test" -> ("domain-bounded (value, count) histogram " +
      "(2-decimal quantized values — the events_outlier_mad bound)"),
    "stats_mann_whitney" -> ("domain-bounded pooled value histogram " +
      "(2-decimal quantized values)"),
    "stats_spearman_days" -> "daily calendar (O(#days)), two rank axes",
    "tokenizer_bpe_merge" -> ("symbol-pair vocabulary (O(charset^2) " +
      "for char pairs; merges are bounded)"),
    "tokenizer_bpe_pairs" -> "O(charset^2) char-bigram pair table",
    "tokenizer_unigram_seed" ->
      "substring-piece table of the VOCABULARY (Zipf-bounded), not the corpus"
  )

  /** Keys whose PLAN CONSTRUCTION legitimately throws in this spec's
    * context (they materialize side effects eagerly and can collide with
    * parallel suites). The audit exemption is restricted to this explicit
    * list — an unexpected construction failure FAILS the spec instead of
    * silently exempting the key from the window audit (ADVICE r9: the old
    * catch-all could let a key grow an unpartitioned window behind a
    * construction-time exception).
    */
  private val constructionExempt: Set[String] = Set.empty

  test("every unpartitioned window in a registered query's final plan " +
      "is on the documented-bounded allowlist (SCALE.md / VERDICT r8 #3)") {
    val global = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val hasGlobal =
          try fn(spark, sf).queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.isEmpty => w
          }.nonEmpty
          catch {
            case scala.util.control.NonFatal(e) =>
              assert(constructionExempt.contains(name),
                s"plan construction for '$name' threw unexpectedly — " +
                  s"audit cannot run; add to constructionExempt ONLY if " +
                  s"legitimately runtime-only: $e")
              false
          }
        if (hasGlobal) Some(name) else None
    }
    info(s"global-window keys: ${global.mkString(", ")}")
    val offending = global.filterNot(allowed.contains)
    assert(offending.isEmpty,
      s"unpartitioned window(s) outside the allowlist: " +
        s"${offending.mkString(", ")} — either rework (bucketed rank / " +
        "bounded heap) or document the bound in WindowAuditSpec.allowed")
    // the list must stay TIGHT: an entry whose key no longer plans a
    // global window is stale cover — remove it so the audit keeps teeth
    val unused = allowed.keySet -- global.toSet
    assert(unused.isEmpty,
      s"allowlist entries with no global window in the plan: $unused")
  }

  test("the allowlist carries no stale entries (every key still exists)") {
    val stale = allowed.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlist keys no longer registered: $stale")
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch twins of the streaming operators (SURVEY.md §2B "Streaming").
  * Each windowing query here uses the exact `window()` / `session_window()`
  * expressions that the Structured Streaming versions in
  * [[graft.streaming.Streams]] use — same grouping logic, same results —
  * which is what makes them DuckDB-oracle-checkable while the streaming
  * semantics (watermarks, late data, state) are pinned by ScalaTest specs.
  */
object StreamTwin {
  import Tables._

  /** Static event-type dimension for the stream-static join (deterministic
    * in-code values; shared by the twin query and the streaming spec).
    */
  private[graft] def typeDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("click", "engagement", 1.0), ("view", "engagement", 0.5),
      ("purchase", "conversion", 10.0), ("signup", "conversion", 5.0),
      ("error", "ops", 0.0)).toDF("event_type", "category", "weight")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_val"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("cnt"), col("sum_val"))
        .orderBy("wstart", "event_type")),

    // twin of Streams.burstAlerts (same 1-minute window + threshold
    // expressions, minus the watermark): per-user burst windows — the
    // streaming rate-limit/bot alert. Only alert rows leave the stream.
    "stream_burst_alert" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 minute"), col("user_id"))
        .agg(count(lit(1)).as("n_in_window"))
        .filter(col("n_in_window") >= 2)
        .select(col("window.start").as("wstart"), col("user_id"),
          col("n_in_window"))
        .orderBy("wstart", "user_id")),

    // twin of Streams.driftBinCounts + the stateless PSI fold a live
    // drift monitor runs in its sink: per 6-hour window, the PSI of the
    // value distribution (fixed log-width bins, Laplace-smoothed over
    // the materialized 0..9 grid) against the corpus-wide reference —
    // the streaming go/no-go drift gate (events_psi_drift compares two
    // halves of history; this scores every live window). Only the
    // (window, bin) count is stateful; the reference is a broadcast
    // 10-row table and each window's fold is O(10).
    "stream_psi_drift" -> { (s, d) =>
      val binCol = least(lit(9L),
        floor(log(greatest(col("value"), lit(0d)) + lit(1d))))
      val cur = events(s, d)
        .groupBy(window(col("ts"), "6 hours"), binCol.as("bin"))
        .agg(count(lit(1)).as("cc"))
        .select(col("window.start").as("wstart"), col("bin"), col("cc"))
      val ref0 = events(s, d)
        .groupBy(binCol.as("bin")).agg(count(lit(1)).as("cr"))
      val ref = broadcast(s.range(10).select(col("id").as("bin"))
        .join(ref0, Seq("bin"), "left").na.fill(0L, Seq("cr"))
        .crossJoin(ref0.agg(sum(col("cr")).as("n_ref"))))
      val grid = cur.select("wstart").distinct()
        .select(col("wstart"),
          explode(sequence(lit(0L), lit(9L))).as("bin"))
      val nw = cur.groupBy("wstart").agg(sum(col("cc")).as("n_win"))
      val pr = (col("cr").cast("double") + lit(0.5)) /
        (col("n_ref").cast("double") + lit(5.0))
      val pc = (col("cc").cast("double") + lit(0.5)) /
        (col("n_win").cast("double") + lit(5.0))
      grid.join(cur, Seq("wstart", "bin"), "left")
        .na.fill(0L, Seq("cc"))
        .join(ref, "bin")
        .join(nw, "wstart")
        .withColumn("term",
          round((pc - pr) * log(pc / pr), 9).cast("decimal(20,9)"))
        .groupBy("wstart", "n_win")
        .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
        .select(col("wstart"), col("n_win").as("n_events"), col("psi"))
        .orderBy("wstart")
    },

    "stream_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("cnt"), moneySum(col("value")).as("sum_val"))
        .select(col("window.start").as("wstart"), col("cnt"), col("sum_val"))
        .orderBy("wstart")),

    "stream_session" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")),

    // twin of dropDuplicatesWithinWatermark: deterministic first-event pick
    "stream_dedup" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min(col("event_id")).as("first_event_id"),
          count(lit(1)).as("n_dups"))
        .orderBy("user_id", "event_type")),

    // twin of the mapGroupsWithState running per-user state: final state
    "stream_stateful" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          moneySum(col("value")).as("total_value"),
          max(col("ts")).as("last_ts"))
        .orderBy("user_id")),

    // twin of the stream-static enrichment join: LITERALLY the same
    // function (Streams.enrichWithDim) applied to the batch frame — the
    // strongest possible twin guarantee
    "stream_static_join" -> ((s, d) =>
      graft.streaming.Streams.enrichWithDim(events(s, d), typeDim(s))
        .orderBy("category")),

    // twin of the foreachBatch upsert sink: drive the SAME merge function
    // (Streams.upsertCountsTo) through two deterministic "micro-batches"
    // (even / odd event ids) and read the final state table — the
    // accumulated counts must equal one plain GROUP BY over everything,
    // which is what the oracle checks. StreamingSpec additionally drives
    // the same function through a real writeStream.foreachBatch.
    "stream_upsert_sink" -> { (s, d) =>
      val dir = scratch("stream_upsert_sink", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val ev = events(s, d)
      val sink = graft.streaming.Streams.upsertCountsTo(dir) _
      sink(ev.filter(col("event_id") % 2 === 0), 0L)
      sink(ev.filter(col("event_id") % 2 =!= 0), 1L)
      s.read.parquet(dir).orderBy("event_type")
    },

    // twin of the windowed distinct-user sketch: the SAME builder
    // (Streams.distinctUsersPerWindow) supplies the HLL estimate — exact
    // windowed countDistinct is unsupported on a stream, the reason the
    // sketch exists — and the twin joins it to the batch-exact count,
    // reducing the estimate to its accuracy claim (agg_approx_distinct
    // pattern; the oracle pins the exact count + bound-held boolean).
    "stream_distinct_users" -> { (s, d) =>
      val ev = events(s, d)
      val approx = graft.streaming.Streams.distinctUsersPerWindow(ev)
      val exact = ev
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
        .select(col("window.start").as("wstart"), col("n_exact"))
      exact.join(approx, "wstart")
        .select(col("wstart"), col("n_exact"),
          // ±2 absolute floor: tiny hourly windows (n ≈ 5..17) make the
          // 15% relative band sub-integer, and even the rsd-0.02 HLL
          // legitimately sits up to 2 off there (1 of 720 fixture
          // windows) — the bound states what the sketch actually meets
          (abs(col("n_approx") - col("n_exact"))
            <= greatest(lit(2.0), col("n_exact").cast("double") * 0.15))
            .as("within_bound"))
        .orderBy("wstart")
    },

    // twin of the foreachBatch CDC applier: the ordered changelog
    // (Lakehouse.cdcLog) split into two micro-batches (seq <= 1, then
    // seq >= 2) and merged by the SAME function a writeStream would call
    // (Streams.cdcApplyTo) — the final state table must equal the batch
    // cdc_apply's one-shot last-writer-wins, which is exactly what the
    // (shared) oracle checks. Cross-batch ordering is foreachBatch's
    // sequential contract; within a batch, seq decides.
    "stream_cdc_apply" -> { (s, d) =>
      val dir = scratch("stream_cdc_apply", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val log = Lakehouse.cdcLog(s, d)
      val sink = graft.streaming.Streams.cdcApplyTo(dir) _
      sink(log.filter(col("seq") <= 1), 0L)
      sink(log.filter(col("seq") >= 2), 1L)
      s.read.parquet(dir).orderBy("o_orderkey")
    },

    // twin of the foreachBatch mergeable-aggregate maintainer
    // (Streams.upsertOrderProfileTo — the streaming form of
    // incremental_agg_merge's decimal-sum/min/max merge): the SAME
    // function a writeStream would call, driven over the same two
    // deterministic "micro-batches" the batch op uses (orders before /
    // after the 1999-01-01 cutoff). The accumulated state must equal
    // one plain GROUP BY over all orders — mergeability is the whole
    // claim, and that's exactly what the oracle states. The wide
    // decimal sum stays INTERNAL (state table only); the read-side
    // projection is double (SURVEY §7.4 output contract).
    "stream_agg_merge" -> { (s, d) =>
      val dir = scratch("stream_agg_merge", d)
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      val o = t(s, d, "orders")
        .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      val cutoff = lit("1999-01-01").cast("timestamp")
      val sink = graft.streaming.Streams.upsertOrderProfileTo(dir) _
      sink(o.filter(col("o_orderdate") < cutoff), 0L)
      sink(o.filter(col("o_orderdate") >= cutoff), 1L)
      s.read.parquet(dir)
        .select(col("o_custkey"), col("n").as("n_orders"),
          col("s").cast("double").as("total"),
          col("mn").cast("double").as("min_price"),
          col("mx").cast("double").as("max_price"))
        .orderBy("o_custkey")
    },

    // twin of the stream-stream interval join (purchase attribution):
    // same join condition as Streams.purchaseAttribution
    "stream_join" -> { (s, d) =>
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
      purchases.join(clicks, expr(
        """p_user = c_user AND
          |click_ts BETWEEN purchase_ts - INTERVAL 10 MINUTES
          |            AND purchase_ts""".stripMargin))
        .select(col("purchase_id"), col("click_id"),
          col("p_user").as("user_id"))
        .orderBy("purchase_id", "click_id")
    },

    // twin of the stateful funnel (Streams.funnelProgress): stage
    // reach-counts over the per-user funnel — the batch-checkable summary
    // of the sequenced state; per-user timestamps are oracle-checked by
    // `events_funnel` and stream-vs-batch equality by StreamingSpec
    "stream_funnel" -> ((s, d) =>
      Analytics.queries("events_funnel")(s, d)
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))),

    // twin of the deadline-aware stateful funnel
    // (Streams.funnelWindowProgress): stage reach-counts under the 24 h
    // attribution bound; per-user timestamps are oracle-checked by
    // `events_funnel_window`, stream-vs-batch equality by StreamingSpec
    "stream_funnel_window" -> ((s, d) =>
      Analytics.queries("events_funnel_window")(s, d)
        .agg(count(col("t_view")).as("n_view"),
          count(col("t_click")).as("n_click"),
          count(col("t_purchase")).as("n_purchase"))),

    // twin of the windowed "trending types" top-k sink: hourly (window,
    // type) counts -> native per-window top-3 via the SAME
    // Streams.topTypesPerWindow the streaming spec drives over a
    // Complete-mode sink
    "stream_topk" -> ((s, d) =>
      graft.streaming.Streams.topTypesPerWindow(
        events(s, d)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("window.start").as("wstart"), col("event_type"),
            col("cnt")),
        3)
        .orderBy(col("wstart"), col("cnt").desc, col("event_type"))),

    // twin of the watermarked hourly count (late-row drop is pinned by the
    // streaming spec; batch sees all rows) — distinct users per hour
    "stream_watermark_late" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"),
          countDistinct(col("user_id")).as("n_users"))
        .select(col("window.start").as("wstart"), col("cnt"), col("n_users"))
        .orderBy("wstart")),

    // out-of-orderness audit — the table a stream owner reads to SET
    // the watermark delay (`withWatermark` too tight drops data, too
    // loose bloats state; this measures the actual lateness tail).
    // Arrival order = event_id (the ingest sequence); per user the
    // event-time regression vs the running max is the lateness, rolled
    // into minute buckets with the cumulative share — "p99 of late
    // events are within N minutes" reads straight off the table.
    // Per-user windows only (the watermark state key), one shuffle; the
    // histogram is O(max lateness in minutes).
    "stream_lateness_audit" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val wc = org.apache.spark.sql.expressions.Window
        .orderBy("late_min")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_max", max(col("us")).over(w))
        .filter(col("prev_max").isNotNull)
        .withColumn("late_min",
          (greatest(lit(0L), col("prev_max") - col("us"))
            / 60000000L).cast("long"))
        .groupBy("late_min")
        .agg(count(lit(1)).as("n_events"))
        .withColumn("cum", sum(col("n_events")).over(wc))
        .crossJoin(broadcast(events(s, d)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("user_id").orderBy("event_id")))
          .filter(col("rn") > 1)
          .agg(count(lit(1)).as("tot"))))
        .select(col("late_min"), col("n_events"),
          round(col("cum").cast("double") / col("tot"), 6)
            .as("cum_share"))
        .orderBy("late_min")
    }
  )

  def oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      s"""SELECT date_trunc('hour', ts) AS wstart, event_type,
         |count(*) AS cnt, ${sql.moneySum("value")} AS sum_val
         |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin,
    // time_bucket's 2000-01-01 origin is 6h-aligned with Spark's epoch
    // window origin, so the bucket starts agree; the PSI arithmetic is
    // the events_psi_drift discipline (all-DOUBLE probabilities,
    // round-9 decimal term sums)
    "stream_psi_drift" ->
      """WITH ev AS (
        |  SELECT time_bucket(INTERVAL '6 hours', ts) AS wstart,
        |    least(9, CAST(floor(
        |      ln(greatest(value, 0) + 1)) AS BIGINT)) AS bin
        |  FROM events),
        |cur AS (
        |  SELECT wstart, bin, CAST(count(*) AS BIGINT) AS cc
        |  FROM ev GROUP BY 1, 2),
        |ref0 AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS cr
        |  FROM ev GROUP BY 1),
        |nr AS (SELECT CAST(sum(cr) AS BIGINT) AS n_ref FROM ref0),
        |ref AS (
        |  SELECT g.bin, COALESCE(ref0.cr, 0) AS cr, nr.n_ref
        |  FROM (SELECT unnest(generate_series(0, 9)) AS bin) g
        |  LEFT JOIN ref0 ON ref0.bin = g.bin CROSS JOIN nr),
        |nw AS (
        |  SELECT wstart, CAST(sum(cc) AS BIGINT) AS n_win
        |  FROM cur GROUP BY 1),
        |grid AS (
        |  SELECT w.wstart, CAST(b.bin AS BIGINT) AS bin
        |  FROM (SELECT DISTINCT wstart FROM cur) w
        |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b),
        |filled AS (
        |  SELECT g.wstart, g.bin, COALESCE(cur.cc, 0) AS cc
        |  FROM grid g LEFT JOIN cur
        |    ON cur.wstart = g.wstart AND cur.bin = g.bin)
        |SELECT f.wstart, nw.n_win AS n_events,
        |  round(CAST(sum(CAST(round(
        |    ((CAST(cc AS DOUBLE) + 0.5) / (CAST(n_win AS DOUBLE) + 5.0)
        |      - (CAST(cr AS DOUBLE) + 0.5)
        |        / (CAST(n_ref AS DOUBLE) + 5.0))
        |    * ln(((CAST(cc AS DOUBLE) + 0.5)
        |        / (CAST(n_win AS DOUBLE) + 5.0))
        |      / ((CAST(cr AS DOUBLE) + 0.5)
        |        / (CAST(n_ref AS DOUBLE) + 5.0))), 9)
        |    AS DECIMAL(20,9))) AS DOUBLE), 6) AS psi
        |FROM filled f
        |JOIN ref ON ref.bin = f.bin
        |JOIN nw ON nw.wstart = f.wstart
        |GROUP BY f.wstart, nw.n_win
        |ORDER BY f.wstart""".stripMargin,
    "stream_burst_alert" ->
      """SELECT date_trunc('minute', ts) AS wstart, user_id,
        |count(*) AS n_in_window
        |FROM events GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY wstart, user_id""".stripMargin,
    "stream_sliding" ->
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts)
         |    - k * INTERVAL '15 minutes' AS wstart,
         |count(*) AS cnt, ${sql.moneySum("value")} AS sum_val
         |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) t(k)
         |GROUP BY 1 ORDER BY wstart""".stripMargin,
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,
    "stream_topk" ->
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS wstart, event_type,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT wstart, event_type, cnt,
        |    row_number() OVER (PARTITION BY wstart
        |      ORDER BY cnt DESC, event_type) AS rn
        |  FROM c)
        |SELECT wstart, event_type, cnt FROM r WHERE rn <= 3
        |ORDER BY wstart, cnt DESC, event_type""".stripMargin,
    "stream_dedup" ->
      """SELECT user_id, event_type, min(event_id) AS first_event_id,
        |count(*) AS n_dups
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "stream_stateful" ->
      s"""SELECT user_id, count(*) AS n_events,
         |${sql.moneySum("value")} AS total_value, max(ts) AS last_ts
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_upsert_sink" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_distinct_users" ->
      """SELECT date_trunc('hour', ts) AS wstart,
        |count(DISTINCT user_id) AS n_exact, TRUE AS within_bound
        |FROM events GROUP BY 1 ORDER BY wstart""".stripMargin,
    // the micro-batched merge must accumulate to one plain GROUP BY over
    // all orders — mergeable state is the claim, the full-scan is the
    // independent statement of it
    "stream_agg_merge" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders)
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(p) AS DOUBLE) AS total,
        |  CAST(min(p) AS DOUBLE) AS min_price,
        |  CAST(max(p) AS DOUBLE) AS max_price
        |FROM o GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    // the micro-batched apply must accumulate to the one-shot batch
    // answer — the oracle IS cdc_apply's
    "stream_cdc_apply" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    0 AS seq, 'I' AS op FROM snap
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 50.0, 1, 'U'
        |  FROM snap WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 2, 'D'
        |  FROM snap WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'R', o_totalprice, 3, 'I'
        |  FROM snap WHERE o_orderkey % 20 = 0),
        |fin AS (
        |  SELECT o_orderkey, arg_max(op, seq) AS last_op,
        |    arg_max(o_custkey, seq) AS o_custkey,
        |    arg_max(o_orderstatus, seq) AS o_orderstatus,
        |    arg_max(o_totalprice, seq) AS o_totalprice
        |  FROM log GROUP BY o_orderkey)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM fin WHERE last_op <> 'D' ORDER BY o_orderkey""".stripMargin,
    "stream_static_join" ->
      """SELECT category, count(*) AS cnt,
        |CAST(sum(CAST(value AS DECIMAL(18,2))
        |         * CAST(weight AS DECIMAL(8,2))) AS DOUBLE) AS weighted
        |FROM events
        |JOIN (VALUES ('click', 'engagement', 1.0),
        |             ('view', 'engagement', 0.5),
        |             ('purchase', 'conversion', 10.0),
        |             ('signup', 'conversion', 5.0),
        |             ('error', 'ops', 0.0)) d(event_type, category, weight)
        |  ON events.event_type = d.event_type
        |GROUP BY category ORDER BY category""".stripMargin,
    "stream_join" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
        |p.user_id AS user_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE AND p.ts
        |ORDER BY purchase_id, click_id""".stripMargin,
    "stream_watermark_late" ->
      """SELECT date_trunc('hour', ts) AS wstart, count(*) AS cnt,
        |count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY wstart""".stripMargin,
    "stream_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id)
        |SELECT count(t_view) AS n_view, count(t_click) AS n_click,
        |  count(t_purchase) AS n_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,
    "stream_funnel_window" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, v.t_view, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |    AND e.ts <= v.t_view + INTERVAL 24 HOUR
        |  GROUP BY e.user_id, v.t_view),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |    AND e.ts <= c.t_view + INTERVAL 24 HOUR
        |  GROUP BY e.user_id)
        |SELECT count(v.t_view) AS n_view, count(t_click) AS n_click,
        |  count(t_purchase) AS n_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin,

    "stream_lateness_audit" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    max(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_max
        |  FROM events),
        |l AS (
        |  SELECT CAST(greatest(0, prev_max - us) // 60000000 AS BIGINT)
        |    AS late_min
        |  FROM seq WHERE prev_max IS NOT NULL),
        |h AS (
        |  SELECT late_min, count(*) AS n_events FROM l GROUP BY 1),
        |t AS (SELECT count(*) AS tot FROM l)
        |SELECT late_min, n_events,
        |  round(CAST(sum(n_events) OVER (ORDER BY late_min
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / tot, 6) AS cum_share
        |FROM h CROSS JOIN t ORDER BY late_min""".stripMargin
  )
}

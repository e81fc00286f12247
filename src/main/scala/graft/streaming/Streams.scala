package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode}

/** Structured Streaming operators (SURVEY.md §2B "Streaming").
  *
  * Each builder takes an input DataFrame that may be a `readStream` source
  * (file source, Kafka, MemoryStream in tests) or a batch frame — the same
  * plan serves both, which is how the batch twins in
  * [[graft.ops.StreamTwin]] stay oracle-checkable. Watermarks bound state so
  * these run indefinitely at scale; grouping is by (window, key) so state is
  * partitioned across executors.
  */
object Streams {

  /** One event; mirrors the `events` fixture schema after ns->us repair. */
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

  /** Running per-user state for the stateful operator. */
  final case class UserState(n_events: Long, total_value: Double)

  final case class UserSnapshot(user_id: Long, n_events: Long,
    total_value: Double)

  /** Stream-static enrichment: join the (micro-batched) stream against a
    * broadcast dimension and aggregate by the dim's category. No state and
    * no watermark needed — the static side is re-broadcast per micro-batch,
    * the canonical streaming-enrichment shape. Weighted sum goes through
    * exact decimals so batch/stream/oracle all agree bit-for-bit.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), "event_type")
      .groupBy("category")
      .agg(count(lit(1)).as("cnt"),
        sum(graft.ops.Tables.money(col("value"))
          * graft.ops.Tables.frac(col("weight")))
          .cast("double").as("weighted"))

  /** Tumbling 1-hour counts with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

  /** Per-user 1-minute burst alerts: tumbling windows whose event count
    * reaches the threshold — the streaming twin of events_bot_filter's
    * rate rule, emitting ONLY alert rows (the scale point: threshold
    * filtering happens inside the stream, so state stays bounded by the
    * watermark and non-bursty traffic never leaves the aggregation).
    */
  def burstAlerts(events: DataFrame, threshold: Long = 2): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(count(lit(1)).as("n_in_window"))
      .filter(col("n_in_window") >= threshold)
      .select(col("window.start").as("wstart"), col("user_id"),
        col("n_in_window"))

  /** Per-window value-distribution histogram — the stateful stage of a
    * streaming PSI drift monitor: bin each event's value into the fixed
    * log-width grid (floor(ln(v+1)) capped at 9, data-independent so two
    * windows stay comparable) and count per (6-hour window, bin) under a
    * watermark. The PSI fold itself (10 rows per window against a
    * broadcast reference) is STATELESS and runs in the sink — chaining a
    * second stateful aggregation after a windowed one is the streaming
    * anti-pattern this split exists to avoid. The batch twin
    * (`stream_psi_drift`) performs the full fold for the oracle.
    */
  def driftBinCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"),
        least(lit(9L),
          floor(log(greatest(col("value"), lit(0d)) + lit(1d)))).as("bin"))
      .agg(count(lit(1)).as("cc"))
      .select(col("window.start").as("wstart"), col("bin"), col("cc"))

  /** Sliding 1-hour/15-minute windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("cnt"))

  /** Session windows per user with a 30-minute gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Per-window top-k event types by count — the "trending now" sink step.
    * Top-k OVER an aggregate is not expressible in Append mode, so on a
    * stream this applies to the Complete-mode windowed-agg output (or
    * inside foreachBatch); in batch it applies directly. Routed through
    * the native TopKPerKey operator — ≤ k rows per (window, partition)
    * move. Shared by the `stream_topk` twin and StreamingSpec so the two
    * cannot drift.
    */
  def topTypesPerWindow(counts: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey.topK(counts, Seq(col("wstart")),
      Seq(col("cnt").desc, col("event_type")), k)

  /** Hourly distinct-user telemetry via a MERGEABLE cardinality sketch:
    * exact windowed countDistinct is UNSUPPORTED on a stream (it would
    * hold the full value set in state), so the HLL estimate is the only
    * bounded-state form — which is precisely the production argument for
    * sketches at 100 TB. Works under `readStream` (watermarked windowed
    * agg) and on a batch frame unchanged; the `stream_distinct_users`
    * twin joins this against the batch-exact count and pins the
    * estimate's bound (the agg_approx_distinct pattern). Shared with
    * StreamingSpec so stream and twin cannot drift.
    */
  def distinctUsersPerWindow(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      // rsd 0.02 sizes the HLL so small hourly windows (n ~ 5..60)
      // resolve within the ±max(1, 15%) audit band — the default 0.05
      // sketch sat 2-3 off on n≈11..17 windows
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
      .select(col("window.start").as("wstart"), col("n_approx"))

  /** Stateful dedup on (user_id, event_type) bounded by the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Running per-user aggregates via mapGroupsWithState — the custom-state
    * extension point; emits a snapshot per user per micro-batch.
    */
  def runningUserState(events: Dataset[Event]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserSnapshot](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          val batch = rows.toSeq
          val next = UserState(prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          UserSnapshot(userId, next.n_events, next.total_value)
      }
  }

  /** Per-user funnel progress: first view, first click strictly after it,
    * first purchase strictly after that click.
    */
  final case class FunnelState(tView: Option[java.sql.Timestamp],
    tClick: Option[java.sql.Timestamp],
    tPurchase: Option[java.sql.Timestamp])

  final case class FunnelSnapshot(user_id: Long,
    t_view: Option[java.sql.Timestamp],
    t_click: Option[java.sql.Timestamp],
    t_purchase: Option[java.sql.Timestamp])

  private def funnelStep(st: FunnelState, e: Event): FunnelState =
    e.event_type match {
      case "view" if st.tView.isEmpty =>
        st.copy(tView = Some(e.ts))
      case "click" if st.tClick.isEmpty
          && st.tView.exists(v => e.ts.after(v)) =>
        st.copy(tClick = Some(e.ts))
      case "purchase" if st.tPurchase.isEmpty
          && st.tClick.exists(c => e.ts.after(c)) =>
        st.copy(tPurchase = Some(e.ts))
      case _ => st
    }

  /** Stateful funnel sequencing via mapGroupsWithState — the "ordered
    * stages per key" shape windowed aggregates cannot express. Events are
    * event-time-sorted WITHIN each micro-batch; across batches the fold is
    * first-match-wins, which equals the batch funnel (min-ts per stage)
    * whenever a user's events arrive in event-time order batch-to-batch —
    * the file/Kafka-source norm. A production job tolerant of cross-batch
    * disorder would buffer per-user events until the watermark instead;
    * same state API, bigger state.
    */
  def funnelProgress(events: Dataset[Event]): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelSnapshot](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foreach(e => st = funnelStep(st, e))
          state.update(st)
          FunnelSnapshot(userId, st.tView, st.tClick, st.tPurchase)
      }
  }

  /** Deadline-aware funnel step: later stages only count within `deadlineMs`
    * of the first view — the streaming form of `events_funnel_window`'s
    * 24 h attribution bound. The deadline check is pure state arithmetic
    * (no extra state fields, no timers): once the first view is pinned,
    * every candidate stage compares its event time against tView + D.
    */
  private def funnelWindowStep(deadlineMs: Long)(st: FunnelState,
      e: Event): FunnelState = {
    def inWindow: Boolean =
      st.tView.exists(v => e.ts.getTime <= v.getTime + deadlineMs)
    e.event_type match {
      case "view" if st.tView.isEmpty =>
        st.copy(tView = Some(e.ts))
      case "click" if st.tClick.isEmpty
          && st.tView.exists(v => e.ts.after(v)) && inWindow =>
        st.copy(tClick = Some(e.ts))
      case "purchase" if st.tPurchase.isEmpty
          && st.tClick.exists(c => e.ts.after(c)) && inWindow =>
        st.copy(tPurchase = Some(e.ts))
      case _ => st
    }
  }

  /** [[funnelProgress]] with the 24 h attribution deadline — state shape
    * and ordering discipline identical; only the step function changes
    * (which is the point: deadline semantics are a per-event predicate,
    * not a new state machine).
    */
  def funnelWindowProgress(events: Dataset[Event],
      deadlineMs: Long = 24L * 3600L * 1000L): Dataset[FunnelSnapshot] = {
    import events.sparkSession.implicits._
    val step = funnelWindowStep(deadlineMs) _
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelSnapshot](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foreach(e => st = step(st, e))
          state.update(st)
          FunnelSnapshot(userId, st.tView, st.tClick, st.tPurchase)
      }
  }

  /** Stream-stream interval join: purchases attributed to same-user clicks
    * within the 10 minutes before the purchase. Watermarks on BOTH sides
    * bound the join state — the condition every production stream-stream
    * join needs to avoid unbounded buffers.
    */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", "30 minutes")
    purchases.join(clicks, expr(
      """p_user = c_user AND
        |click_ts BETWEEN purchase_ts - INTERVAL 10 MINUTES
        |            AND purchase_ts""".stripMargin))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Spark 4 arbitrary-state v2 (`transformWithState`): same running
    * per-user totals as [[runningUserState]] but on the StatefulProcessor
    * API with typed ValueState (requires the RocksDB state store).
    */
  class RunningTotalsProcessor
    extends StatefulProcessor[Long, Event, UserSnapshot] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserState]("totals",
        Encoders.product[UserState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[UserSnapshot] = {
      val prev = Option(state.get()).getOrElse(UserState(0L, 0.0))
      val batch = rows.toSeq
      val next = UserState(prev.n_events + batch.size,
        prev.total_value + batch.map(_.value).sum)
      state.update(next)
      Iterator.single(UserSnapshot(key, next.n_events, next.total_value))
    }
  }

  def runningUserStateV2(events: Dataset[Event]): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** foreachBatch upsert sink: merge each micro-batch's per-type counts
    * into a parquet state table by read-union-reaggregate-swap — the
    * foreachBatch escape hatch for targets without native streaming
    * support (JDBC upserts, lakehouse MERGE). The swap goes through a
    * temp directory so a crash mid-write never leaves a half-merged
    * state table; counts sum exactly (longs), so replaying a batch with
    * the same data is the only idempotency hazard — exactly the contract
    * foreachBatch documents (batchId is provided for dedup; this demo
    * state is count-additive).
    */
  /** foreachBatch CDC applier: merge one micro-batch of an ORDERED
    * changelog (columns o_orderkey/o_custkey/o_orderstatus/o_totalprice/
    * seq/op with op ∈ I/U/D) into a parquet state table. Within the batch
    * last-writer-wins by seq; across batches the sequential foreachBatch
    * contract IS the ordering (existing state is tagged seq −1, so any
    * batch row beats it), and a delete that wins removes the key — a later
    * batch's re-insert then lands on absent state. Same crash-safe
    * tmp-swap as [[upsertCountsTo]]; replays are idempotent because the
    * merge is a pure last-writer-wins function of (state ∪ batch).
    */
  def cdcApplyTo(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "seq", "op").map(col)
    val in =
      if (fs.exists(p))
        spark.read.parquet(dir)
          .withColumn("seq", lit(-1L)).withColumn("op", lit("I"))
          .select(cols: _*)
          .unionByName(batch.select(cols: _*))
      else batch.select(cols: _*)
    val merged = in.groupBy("o_orderkey")
      .agg(expr("max_by(op, seq)").as("last_op"),
        expr("max_by(o_custkey, seq)").as("o_custkey"),
        expr("max_by(o_orderstatus, seq)").as("o_orderstatus"),
        expr("max_by(o_totalprice, seq)").as("o_totalprice"))
      .filter(col("last_op") =!= "D")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  def upsertCountsTo(dir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delta = batch.groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("cnt"))
    val merged =
      if (fs.exists(p))
        spark.read.parquet(dir).unionByName(delta)
          .groupBy("event_type")
          .agg(sum(col("cnt")).cast("long").as("cnt"))
      else delta
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** foreachBatch mergeable-aggregate maintainer — the streaming twin of
    * the batch `incremental_agg_merge` lifecycle (r8 VERDICT gap #6):
    * merge one micro-batch of orders into a per-customer profile kept as
    * MERGEABLE state (count, exact-decimal sum, min, max — each
    * re-combinable with itself, so state ∪ delta re-aggregates to the
    * same values one full scan would produce). avg stays derived
    * (sum/count) at read time, the classic reason views store sums.
    * Per micro-batch cost is O(delta) + a key-join merge with the
    * stored state — never a rescan of the base, the same contract the
    * batch op documents. The decimal sum is pinned to DECIMAL(28,2)
    * after every merge so the state schema cannot widen batch-over-batch
    * (sum() re-widens per Spark's decimal promotion). Same crash-safe
    * tmp-swap as [[upsertCountsTo]]; a replayed batch double-counts —
    * the documented foreachBatch hazard, dedupable by batchId.
    */
  def upsertOrderProfileTo(dir: String)(batch: DataFrame,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val delta = batch
      .select(col("o_custkey"),
        graft.ops.Tables.money(col("o_totalprice")).as("p"))
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("decimal(28,2)").as("s"),
        min(col("p")).as("mn"), max(col("p")).as("mx"))
    val merged =
      if (fs.exists(p))
        spark.read.parquet(dir).unionByName(delta)
          .groupBy("o_custkey")
          .agg(sum(col("n")).cast("long").as("n"),
            sum(col("s")).cast("decimal(28,2)").as("s"),
            min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      else delta
    val tmp = new org.apache.hadoop.fs.Path(dir + "_tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** Convenience writer used by specs: stream to an in-memory table. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode)
    : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}

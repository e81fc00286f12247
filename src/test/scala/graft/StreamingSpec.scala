package graft

import graft.streaming.Streams
import graft.streaming.Streams.Event
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics pinned by hand-computed expected sets (SURVEY.md
  * §5.2 item 5): watermark late-drop, stateful dedup, session windows, and
  * mapGroupsWithState running state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L,
    typ: String = "click", value: Double = 1.0): Event =
    Event(id, ts(minute), user, typ, value)

  test("tumbling window with watermark drops too-late rows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.tumblingCounts(in.toDF()), "tumbling_t", OutputMode.Append())
    // batch 1: events in hour 0 and hour 1; watermark advances to 70-10=60min
    in.addData(ev(1, 5), ev(2, 30), ev(3, 70))
    q.processAllAvailable()
    // batch 2: a row at minute 20 is older than the 60-min watermark ->
    // its hour-0 window is already closed in Append mode; row is dropped
    in.addData(ev(4, 20), ev(5, 80))
    q.processAllAvailable()
    // batch 3: advance watermark far enough to flush hour-1
    in.addData(ev(6, 300))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("tumbling_t")
      .select("wstart", "cnt").as[(Timestamp, Long)].collect().toMap
    assert(out(ts(0)) == 2L) // late ev(4) did NOT land in hour 0
    assert(out(ts(60)) == 2L) // ev(3), ev(5)
  }

  test("driftBinCounts bins values on the log grid per 6-hour window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.driftBinCounts(in.toDF()), "drift_t", OutputMode.Append())
    // window [00:00, 06:00): values 1.0 -> bin 0 (ln 2), 10.0 -> bin 2
    // (ln 11), 100.0 -> bin 4 (ln 101); second 1.0 doubles bin 0
    in.addData(ev(1, 10, value = 1.0), ev(2, 20, value = 1.0),
      ev(3, 30, value = 10.0), ev(4, 40, value = 100.0))
    q.processAllAvailable()
    // advance the watermark past the first window so Append flushes it
    in.addData(ev(5, 6 * 60 + 30, value = 1.0), ev(6, 24 * 60))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("drift_t")
      .select("wstart", "bin", "cc").as[(Timestamp, Long, Long)]
      .collect().map { case (w, b, c) => (w, b) -> c }.toMap
    assert(out((ts(0), 0L)) == 2L)
    assert(out((ts(0), 2L)) == 1L)
    assert(out((ts(0), 4L)) == 1L)
    assert(!out.keySet.exists { case (w, b) => w == ts(0) && b > 4L })
  }

  test("burstAlerts emits only windows at or above the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.burstAlerts(in.toDF(), threshold = 3), "burst_t",
      OutputMode.Append())
    // user 1 bursts in minute 5 (3 events); user 2 stays under threshold
    in.addData(ev(1, 5), ev(2, 5), ev(3, 5), ev(4, 5, user = 2),
      ev(5, 6, user = 2))
    q.processAllAvailable()
    // advance the watermark past minute 5's window so Append flushes it
    in.addData(ev(6, 30))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("burst_t")
      .select("wstart", "user_id", "n_in_window")
      .as[(Timestamp, Long, Long)].collect()
    assert(out.toSet == Set((ts(5), 1L, 3L)),
      s"expected exactly user 1's minute-5 burst, got ${out.mkString(",")}")
  }

  test("dropDuplicatesWithinWatermark dedups per (user, type)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.dedupWithinWatermark(in.toDF()), "dedup_t", OutputMode.Append())
    in.addData(ev(1, 0, user = 1), ev(2, 1, user = 1), ev(3, 2, user = 2))
    q.processAllAvailable()
    q.stop()
    val n = spark.table("dedup_t").count()
    assert(n == 2) // (u1,click) deduped, (u2,click) kept
  }

  test("session windows merge events within the 30-minute gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.sessionCounts(in.toDF()), "session_t", OutputMode.Append())
    // user 1: events at 0, 20, 40 (one session: gaps < 30m);
    //          event at 120 (second session)
    in.addData(ev(1, 0), ev(2, 20), ev(3, 40), ev(4, 120))
    // close sessions by advancing the watermark far ahead
    in.addData(ev(5, 600, user = 9))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("session_t")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect()
      .filter(_._1 == 1L).sortBy(_._2.getTime)
    assert(out.length == 2)
    assert(out(0) == ((1L, ts(0), ts(70), 3L))) // end = last(40m) + 30m gap
    assert(out(1) == ((1L, ts(120), ts(150), 1L)))
  }

  test("file-source readStream tumbling counts equal the batch twin") {
    // the real readStream path: stream the fixture events parquet (as the
    // repaired-μs frame re-emitted to a scratch dir), aggregate with the
    // same window expression, compare to the batch twin
    val src = "/root/repo/target/tmp/stream_src/events"
    val batch = graft.ops.Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(src)
    val streamed = spark.readStream.schema(batch.schema).parquet(src)
    val q = Streams.toMemorySink(
      Streams.tumblingCounts(streamed), "file_stream_t",
      OutputMode.Complete())
    q.processAllAvailable()
    q.stop()
    val got = spark.table("file_stream_t")
      .select("wstart", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    val want = batch
      .groupBy(org.apache.spark.sql.functions.window(
        org.apache.spark.sql.functions.col("ts"), "1 hour"),
        org.apache.spark.sql.functions.col("event_type"))
      .count()
      .select(org.apache.spark.sql.functions.col("window.start"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("count"))
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming windowed top-k types equal the batch twin") {
    import org.apache.spark.sql.functions.{col, count, lit, window}
    val src = "/root/repo/target/tmp/stream_src_topk/events"
    val batch = graft.ops.Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(src)
    val streamed = spark.readStream.schema(batch.schema).parquet(src)
    val counts = streamed
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("cnt"))
    val q = Streams.toMemorySink(counts, "topk_counts_t",
      OutputMode.Complete())
    q.processAllAvailable()
    q.stop()
    // the sink-side top-k is the SAME function the batch twin routes
    // through — Complete-mode agg + TopKPerKey over the sink table
    val got = Streams.topTypesPerWindow(spark.table("topk_counts_t"), 3)
      .select("wstart", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    val want = graft.ops.StreamTwin.queries("stream_topk")(spark, sf)
      .select("wstart", "event_type", "cnt")
      .as[(Timestamp, String, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("foreachBatch upsert sink accumulates counts across micro-batches") {
    val stateDir = "/root/repo/target/tmp/stream_upsert_spec"
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("event_id", "event_type")
      .writeStream
      .foreachBatch(Streams.upsertCountsTo(stateDir) _)
      .outputMode(OutputMode.Append())
      .start()
    input.addData((1L, "view"), (2L, "view"), (3L, "click"))
    q.processAllAvailable()
    // state after batch 1: view=2, click=1
    val after1 = spark.read.parquet(stateDir)
      .as[(String, Long)].collect().toMap
    assert(after1 == Map("view" -> 2L, "click" -> 1L), after1)
    input.addData((4L, "view"), (5L, "purchase"))
    q.processAllAvailable()
    q.stop()
    // state after batch 2 merges into batch 1's counts
    val after2 = spark.read.parquet(stateDir)
      .as[(String, Long)].collect().toMap
    assert(after2 ==
      Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L), after2)
  }

  test("foreachBatch CDC applier converges through a real writeStream " +
      "(insert, update, delete, re-insert across micro-batches)") {
    val stateDir = "/root/repo/target/tmp/stream_cdc_spec"
    val p = new org.apache.hadoop.fs.Path(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, String, Double, Long, String)]
    val q = input.toDF().toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "seq", "op")
      .writeStream
      .foreachBatch(Streams.cdcApplyTo(stateDir) _)
      .outputMode(OutputMode.Append())
      .start()
    // batch 1: insert keys 1, 2, 3; update key 2
    input.addData((1L, 10L, "O", 5.0, 0L, "I"), (2L, 20L, "O", 6.0, 0L, "I"),
      (3L, 30L, "O", 7.0, 0L, "I"), (2L, 20L, "U", 8.0, 1L, "U"))
    q.processAllAvailable()
    val after1 = spark.read.parquet(stateDir)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3)))
      .toMap
    assert(after1 == Map(1L -> ("O", 5.0), 2L -> ("U", 8.0),
      3L -> ("O", 7.0)), after1.toString)
    // batch 2: delete key 1, re-insert key 3 with new status
    input.addData((1L, 10L, "O", 5.0, 2L, "D"),
      (3L, 30L, "R", 9.0, 3L, "I"))
    q.processAllAvailable()
    q.stop()
    val after2 = spark.read.parquet(stateDir)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3)))
      .toMap
    assert(after2 == Map(2L -> ("U", 8.0), 3L -> ("R", 9.0)),
      after2.toString)
  }

  test("windowed distinct-user sketch over readStream equals the batch " +
      "builder (HLL state is the only stream-legal distinct)") {
    val src = "/root/repo/target/tmp/stream_src/events_distinct"
    val batch = graft.ops.Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(src)
    val streamed = spark.readStream.schema(batch.schema).parquet(src)
    val q = Streams.toMemorySink(
      Streams.distinctUsersPerWindow(streamed), "stream_distinct_users_t",
      OutputMode.Complete())
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_distinct_users_t")
      .as[(java.sql.Timestamp, Long)].collect().toSet
    val want = Streams.distinctUsersPerWindow(batch)
      .as[(java.sql.Timestamp, Long)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stream-static dim join over readStream equals the batch twin") {
    val src = "/root/repo/target/tmp/stream_src/events_dim"
    val batch = graft.ops.Tables.events(spark, sf)
    batch.write.mode("overwrite").parquet(src)
    val streamed = spark.readStream.schema(batch.schema).parquet(src)
    val dim = graft.ops.StreamTwin.typeDim(spark)
    val q = Streams.toMemorySink(
      Streams.enrichWithDim(streamed, dim), "stream_static_dim",
      OutputMode.Complete())
    q.processAllAvailable()
    q.stop()
    val got = spark.table("stream_static_dim")
      .select("category", "cnt", "weighted")
      .as[(String, Long, Double)].collect().toSet
    val want = Streams.enrichWithDim(batch, dim)
      .select("category", "cnt", "weighted")
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("stream-stream interval join attributes purchases to recent clicks") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.toMemorySink(
      Streams.purchaseAttribution(in.toDF()), "attr_t", OutputMode.Append())
    in.addData(
      ev(1, 0, user = 1, typ = "click"),
      ev(2, 5, user = 1, typ = "purchase"), // within 10m of click 1 -> match
      ev(3, 30, user = 1, typ = "purchase"), // no click within 10m
      ev(4, 3, user = 2, typ = "click"), // different user
      ev(5, 100, user = 9, typ = "view"))
    q.processAllAvailable()
    // flush join state well past the watermark
    in.addData(ev(6, 600, user = 9, typ = "view"))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("attr_t")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 1L)))
  }

  test("stateful funnel sequences stages across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.funnelProgress(in.toDS())
      .writeStream.format("memory").queryName("funnel_t")
      .outputMode(OutputMode.Update()).start()
    // batch 1: user 1 views then clicks (out of arrival order — the
    // in-batch event-time sort must fix it); user 2 clicks WITHOUT a view
    // (stage gate: click must not count); user 3 purchases with no click
    in.addData(
      ev(2, 10, user = 1, typ = "click"),
      ev(1, 5, user = 1, typ = "view"),
      ev(3, 0, user = 2, typ = "click"),
      ev(4, 0, user = 3, typ = "purchase"))
    q.processAllAvailable()
    // batch 2: user 1 purchases (after the click -> completes the funnel);
    // user 2 finally views, then a click in the SAME batch but at an
    // earlier ts than the view — must not count
    in.addData(
      ev(5, 20, user = 1, typ = "purchase"),
      ev(6, 30, user = 2, typ = "view"),
      ev(7, 25, user = 2, typ = "click"))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("funnel_t")
      .as[Streams.FunnelSnapshot].collect()
      .groupBy(_.user_id).map { case (u, snaps) =>
        u -> snaps.maxBy(s =>
          (s.t_view.size + s.t_click.size + s.t_purchase.size))
      }
    assert(last(1L) == Streams.FunnelSnapshot(1L,
      Some(ts(5)), Some(ts(10)), Some(ts(20))))
    assert(last(2L) == Streams.FunnelSnapshot(2L, Some(ts(30)), None, None))
    assert(last(3L) == Streams.FunnelSnapshot(3L, None, None, None))
  }

  test("streaming funnel over the fixture equals the batch events_funnel") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Tables
    // fixture events in two event-time-ordered batches (the documented
    // in-order-arrival regime where streaming == batch min-ts funnel)
    val all = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    val in = MemoryStream[Event]
    val q = Streams.funnelProgress(in.toDS())
      .writeStream.format("memory").queryName("funnel_fx_t")
      .outputMode(OutputMode.Update()).start()
    in.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    in.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_fx_t")
      .as[Streams.FunnelSnapshot].collect()
      .groupBy(_.user_id).map { case (u, snaps) =>
        u -> snaps.maxBy(s =>
          (s.t_view.size + s.t_click.size + s.t_purchase.size))
      }
    val batch = SparkEntry.queries("events_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    batch.foreach { case (u, (v, c, p)) =>
      val s = streamed(u)
      assert((s.t_view, s.t_click, s.t_purchase) == ((v, c, p)), s"user $u")
    }
    // users with no view at all never enter the batch funnel; their
    // streamed snapshots must agree (all-empty)
    streamed.filterNot { case (u, _) => batch.contains(u) }
      .foreach { case (u, s) => assert(s.t_view.isEmpty, s"user $u") }
  }

  test("deadline-aware streaming funnel equals the batch " +
    "events_funnel_window") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Tables
    val all = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val (b1, b2) = all.splitAt(all.length / 2)
    val in = MemoryStream[Event]
    val q = Streams.funnelWindowProgress(in.toDS())
      .writeStream.format("memory").queryName("funnel_win_t")
      .outputMode(OutputMode.Update()).start()
    in.addData(b1.toIndexedSeq)
    q.processAllAvailable()
    in.addData(b2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel_win_t")
      .as[Streams.FunnelSnapshot].collect()
      .groupBy(_.user_id).map { case (u, snaps) =>
        u -> snaps.maxBy(s =>
          (s.t_view.size + s.t_click.size + s.t_purchase.size))
      }
    val batch = SparkEntry.queries("events_funnel_window")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    batch.foreach { case (u, (v, c, p)) =>
      val s = streamed(u)
      assert((s.t_view, s.t_click, s.t_purchase) == ((v, c, p)), s"user $u")
    }
    // the deadline must BITE somewhere on the fixture, or this test pins
    // nothing the unbounded funnel didn't: at least one user must differ
    // from the unbounded batch funnel
    val unbounded = SparkEntry.queries("events_funnel")(spark, sf).collect()
      .map(r => r.getLong(0) -> (Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toMap
    assert(batch != unbounded,
      "24h deadline never bit on the fixture — widen or shrink it")
  }

  test("transformWithState (arbitrary state v2) matches mapGroupsWithState") {
    val old = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[Event]
      val q = Streams.runningUserStateV2(in.toDS())
        .writeStream.format("memory").queryName("state_v2_t")
        .outputMode(OutputMode.Update()).start()
      in.addData(ev(1, 0, user = 1, value = 2.0),
        ev(2, 1, user = 1, value = 3.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, user = 1, value = 5.0))
      q.processAllAvailable()
      q.stop()
      val snaps = spark.table("state_v2_t")
        .as[Streams.UserSnapshot].collect().filter(_.user_id == 1L)
        .sortBy(_.n_events)
      assert(snaps.last.n_events == 3L)
      assert(snaps.last.total_value == 10.0)
    } finally {
      old match {
        case Some(v) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("foreachBatch upsert sink survives stop + restart from the " +
      "checkpoint: no replay, no loss (VERDICT r10 #3 crash recovery)") {
    // The count state is ADDITIVE, so this is the strictest recovery
    // probe available: a replayed batch after restart would double-count
    // (view=5), a lost batch would under-count — final equality with the
    // one-shot batch twin proves the checkpoint resumed exactly after
    // batch 1. File source + checkpointLocation is the durable pairing
    // the MemoryStream tests can't exercise (their offsets die with the
    // query object).
    val root = "/root/repo/target/tmp/stream_recovery_upsert"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val srcDir = s"$root/src"; val ckpt = s"$root/ckpt"
    val stateDir = s"$root/state"
    val schema = Seq((1L, "x")).toDF("event_id", "event_type").schema
    def start() = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(Streams.upsertCountsTo(stateDir) _)
      .outputMode(OutputMode.Append()).start()
    Seq((1L, "view"), (2L, "view"), (3L, "click"))
      .toDF("event_id", "event_type").write.mode("append").parquet(srcDir)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // the "crash": the query dies, the checkpoint survives
    val after1 = spark.read.parquet(stateDir)
      .as[(String, Long)].collect().toMap
    assert(after1 == Map("view" -> 2L, "click" -> 1L), after1)
    // data keeps arriving while the job is down
    Seq((4L, "view"), (5L, "purchase"))
      .toDF("event_id", "event_type").write.mode("append").parquet(srcDir)
    val q2 = start() // fresh query object, SAME checkpoint
    q2.processAllAvailable()
    q2.stop()
    val after2 = spark.read.parquet(stateDir)
      .as[(String, Long)].collect().toMap
    // == one-shot batch aggregate over all 5 rows: replay would give
    // view -> 5, loss would drop purchase
    assert(after2 == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L),
      after2)
  }

  test("foreachBatch CDC applier survives stop + restart from the " +
      "checkpoint: the delete and re-insert land exactly once") {
    val root = "/root/repo/target/tmp/stream_recovery_cdc"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val srcDir = s"$root/src"; val ckpt = s"$root/ckpt"
    val stateDir = s"$root/state"
    def feed(rows: (Long, Long, String, Double, Long, String)*): Unit =
      rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "seq", "op").write.mode("append").parquet(srcDir)
    val schema = Seq((1L, 1L, "x", 1.0, 1L, "x"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "seq", "op").schema
    def start() = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(Streams.cdcApplyTo(stateDir) _)
      .outputMode(OutputMode.Append()).start()
    feed((1L, 10L, "O", 5.0, 0L, "I"), (2L, 20L, "O", 6.0, 0L, "I"),
      (3L, 30L, "O", 7.0, 0L, "I"), (2L, 20L, "U", 8.0, 1L, "U"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // downtime changelog: delete key 1, re-insert key 3
    feed((1L, 10L, "O", 5.0, 2L, "D"), (3L, 30L, "R", 9.0, 3L, "I"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = spark.read.parquet(stateDir)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3)))
      .toMap
    assert(got == Map(2L -> ("U", 8.0), 3L -> ("R", 9.0)), got.toString)
  }

  test("mapGroupsWithState keeps running per-user aggregates across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streams.runningUserState(in.toDS())
      .writeStream.format("memory").queryName("state_t")
      .outputMode(OutputMode.Update()).start()
    in.addData(ev(1, 0, user = 1, value = 2.0), ev(2, 1, user = 1, value = 3.0))
    q.processAllAvailable()
    in.addData(ev(3, 2, user = 1, value = 5.0))
    q.processAllAvailable()
    q.stop()
    val snaps = spark.table("state_t")
      .as[Streams.UserSnapshot].collect().filter(_.user_id == 1L)
      .sortBy(_.n_events)
    assert(snaps.last.n_events == 3L)
    assert(snaps.last.total_value == 10.0)
  }
}

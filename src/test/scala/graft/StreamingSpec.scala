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

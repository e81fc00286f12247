package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Tumbling 1-hour counts with a 10-minute watermark. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("wstart"), col("event_type"), col("cnt"))

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

  /** Convenience writer used by specs: stream to an in-memory table. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode)
    : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}

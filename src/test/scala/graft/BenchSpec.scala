package graft

import org.apache.spark.sql.functions._

/** The bench failure surface: a deliberately-broken query must land in the
  * failure list (VERDICT round-2 item 3 — a regression must not hide
  * inside a good-looking total), while healthy queries still time.
  */
class BenchSpec extends SparkSpec {

  test("a throwing query is recorded as failed, not as a fast timing row") {
    val selected = Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame](
      "healthy" -> ((s, d) => graft.ops.Tables.t(s, d, "nation")),
      "broken" -> ((s, d) =>
        graft.ops.Tables.t(s, d, "nation")
          .select(col("no_such_column"))))
    val (results, failed) = Bench.runQueries(spark, sf, selected)
    assert(failed == List("broken"))
    assert(results.map(_._1) == Seq("broken", "healthy"))
    // both rows carry timings — the failure is visible, not silent
    assert(results.forall(_._2 >= 0.0))
  }

  test("all registered queries run clean through the bench loop at sf0.001") {
    graft.ops.Joins.ensureBucketed(spark, sf)
    val (results, failed) = Bench.runQueries(spark, sf, SparkEntry.queries)
    assert(failed.isEmpty, s"failed: $failed")
    assert(results.size == SparkEntry.queries.size)
  }
}

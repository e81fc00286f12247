package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2B registers here: `queries` holds the
  * Spark implementation, `oracleSql` the DuckDB-equivalent SQL (omitted for
  * non-SQL-expressible ops, which get a rows-only check + a ScalaTest spec).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
    Map[String, String])] = Seq(
    (Scans.queries, Scans.oracle),
    (Relational.queries, Relational.oracle),
    (Joins.queries, Joins.oracle),
    (Aggregates.queries, Aggregates.oracle),
    (Windows.queries, Windows.oracle),
    (SortSet.queries, SortSet.oracle),
    (ScalarFns.queries, ScalarFns.oracle),
    (SqlOps.queries, SqlOps.oracle),
    (Analytics.queries, Analytics.oracle),
    (StreamTwin.queries, StreamTwin.oracle),
    (Dedup.queries, Dedup.oracle),
    (Similarity.queries, Similarity.oracle),
    (TextOps.queries, TextOps.oracle),
    (Multimodal.queries, Multimodal.oracle),
    (Lakehouse.queries, Lakehouse.oracle),
    (TrainPrep.queries, TrainPrep.oracle),
    (Graph.queries, Graph.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projections, predicates and conditional projection (SURVEY.md §2B).
  * Per-row double arithmetic is IEEE-identical across engines as long as the
  * expression tree has the same shape, so no decimal detour is needed here —
  * only aggregates need it (see Tables).
  */
object Relational {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "project_select" -> ((s, d) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("revenue_tax"))
        // (okey, linenumber) is not unique — order by all output columns
        .orderBy("l_orderkey", "l_linenumber", "revenue", "revenue_tax")),

    // deterministic content-hash sampling — the reproducible holdout/split
    // pattern for training-data pipelines: membership depends only on the
    // row's key bytes (md5 prefix), never on partitioning, seed state, or
    // row order, so every engine and every rerun draws the same sample.
    // '28' keeps the first-2-hex-chars buckets 00..28 = 41/256 ~ 16%.
    "sample_hash" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(substring(md5(concat_ws("-",
          col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string"))), 1, 2) <= "28")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (okey, linenumber) is not unique — order by all output columns
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")),

    // stratified sampling: EXACTLY k rows per stratum, drawn by content
    // hash so the draw is reproducible across engines, reruns, and
    // partitionings (the per-class balancing step of a training-data
    // pipeline, where proportional samplers under/over-shoot small
    // strata). One shuffle on the stratum key; the window's rank is the
    // only state, so the plan scales with stratum cardinality, not N.
    "sample_stratified" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 50)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"),
          col("c_acctbal"))
        .orderBy("c_mktsegment", "rn")
    },

    // fixed-size k-sample as a BOTTOM-K-BY-PRIORITY pass — the distributed
    // form of reservoir sampling: priority = content hash of the key, take
    // the k smallest. Unlike a sequential reservoir this is one plan with
    // no scan-order state: each partition keeps its local k candidates
    // (TakeOrderedAndProject — O(k) memory per task, no full sort) and the
    // driver merges k·P candidates, so the same k rows come out at any
    // partitioning, any scale, any engine. Weighted variants just divide
    // the priority by the weight (A-ES); same plan.
    "sample_reservoir" -> ((s, d) =>
      corpus(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string")).as("priority"))
        .orderBy("priority", "doc_id")
        .limit(100)),

    "filter_pred" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00"))
          && (col("l_discount") > 0.05 || col("l_tax") < 0.04)
          && col("l_returnflag").isNotNull)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_shipdate")),

    "case_when" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("bucket",
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("cnt"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("bucket"))
  )

  def oracle: Map[String, String] = Map(
    "sample_stratified" ->
      """SELECT c_mktsegment,
        |  CAST(row_number() OVER (PARTITION BY c_mktsegment
        |    ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
        |    AS BIGINT) AS rn,
        |  c_custkey, c_acctbal
        |FROM customer
        |QUALIFY rn <= 50
        |ORDER BY c_mktsegment, rn""".stripMargin,
    "project_select" ->
      """SELECT l_orderkey, l_linenumber,
        |l_extendedprice * (1 - l_discount) AS revenue,
        |l_extendedprice * (1 - l_discount) * (1 + l_tax) AS revenue_tax
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, revenue, revenue_tax""".stripMargin,
    "sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-'
        |  || CAST(l_linenumber AS VARCHAR)), 1, 2) <= '28'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
        .stripMargin,
    "sample_reservoir" ->
      """SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS priority
        |FROM documents
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_returnflag IN ('A','R')
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND (l_discount > 0.05 OR l_tax < 0.04)
        |  AND l_returnflag IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag,
        |         l_shipdate""".stripMargin,
    "case_when" ->
      s"""SELECT CASE WHEN l_quantity < 10 THEN 'low'
         |            WHEN l_quantity < 30 THEN 'mid'
         |            ELSE 'high' END AS bucket,
         |count(*) AS cnt, ${sql.moneySum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts, top-k, and set operations (SURVEY.md §2B).
  * Null placement is always explicit: Spark's ASC default is NULLS FIRST but
  * DuckDB's is NULLS LAST, so relying on either default would silently
  * diverge.
  */
object SortSet {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sort_multi" -> ((s, d) =>
      t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("c_acctbal").desc_nulls_last, col("c_custkey"))),

    // global top-k: Catalyst plans this as TakeOrderedAndProject (no full sort)
    "limit_topk" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc_nulls_last, col("l_orderkey"),
          col("l_linenumber"))
        .limit(100)),

    "set_union_all" -> { (s, d) =>
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.unionAll(su).groupBy("nk").agg(count(lit(1)).as("cnt")).orderBy("nk")
    },

    "set_union" -> { (s, d) =>
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.union(su).distinct().orderBy("nk")
    },

    "set_intersect" -> { (s, d) =>
      val c = t(s, d, "customer").select(col("c_nationkey").as("nk"))
      val su = t(s, d, "supplier").select(col("s_nationkey").as("nk"))
      c.intersect(su).orderBy("nk")
    },

    // schema-evolution union: two sources sharing some columns, each with
    // its own extras — matched BY NAME with nulls for the missing side
    // (positional union would silently misalign; this is the shape for
    // unioning parquet generations with drifted schemas)
    "set_union_byname" -> { (s, d) =>
      val c = t(s, d, "customer").select(col("c_custkey").as("id"),
        col("c_name").as("name"), col("c_acctbal").as("cust_bal"))
      val su = t(s, d, "supplier").select(col("s_suppkey").as("id"),
        col("s_name").as("name"), col("s_acctbal").as("supp_bal"))
      c.unionByName(su, allowMissingColumns = true)
        .orderBy(col("name"), col("id"))
    },

    // EXCEPT over overlapping-but-unequal key sets: custkeys that placed
    // orders minus custkeys with a positive balance = negative-balance
    // customers who ordered. Both sides share most keys but neither
    // contains the other, so the result is non-empty and discriminating
    // (nationkey EXCEPT nationkey was vacuously empty — every nation has
    // both customers and suppliers at every sf).
    "set_except" -> { (s, d) =>
      val ordered = t(s, d, "orders").select(col("o_custkey").as("ck"))
      val positive = t(s, d, "customer").filter(col("c_acctbal") > 0)
        .select(col("c_custkey").as("ck"))
      ordered.except(positive).orderBy("ck")
    },

    // EXCEPT ALL — bag semantics: each of a customer's order rows is
    // cancelled by at most one matching row from the other side, so the
    // multiplicity delta survives (the form reconciliation queries need;
    // plain EXCEPT collapses it). Both bag ops plan as one shuffle on
    // the value with per-key multiplicity arithmetic — no join blowup.
    "set_except_all" -> { (s, d) =>
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck"))
      val p = t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("ck"))
      o.exceptAll(p).groupBy("ck").agg(count(lit(1)).as("surplus"))
        .orderBy("ck")
    },

    // INTERSECT ALL — min-multiplicity per value: how many of each
    // customer's F-orders are matched one-for-one by O-orders
    "set_intersect_all" -> { (s, d) =>
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("ck"))
      val p = t(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("ck"))
      o.intersectAll(p).groupBy("ck").agg(count(lit(1)).as("matched"))
        .orderBy("ck")
    }
  )

  def oracle: Map[String, String] = Map(
    "sort_multi" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST,
        |         c_custkey""".stripMargin,
    "limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "set_union_all" ->
      """SELECT nk, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nk FROM supplier) u
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "set_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "set_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier
        |ORDER BY nk""".stripMargin,
    "set_union_byname" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS cust_bal
        |FROM customer
        |UNION ALL BY NAME
        |SELECT s_suppkey AS id, s_name AS name, s_acctbal AS supp_bal
        |FROM supplier
        |ORDER BY name, id""".stripMargin,
    "set_except" ->
      """SELECT o_custkey AS ck FROM orders
        |EXCEPT
        |SELECT c_custkey AS ck FROM customer WHERE c_acctbal > 0
        |ORDER BY ck""".stripMargin,
    "set_except_all" ->
      """WITH x AS (
        |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O')
        |SELECT ck, count(*) AS surplus FROM x GROUP BY ck
        |ORDER BY ck""".stripMargin,
    "set_intersect_all" ->
      """WITH x AS (
        |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O')
        |SELECT ck, count(*) AS matched FROM x GROUP BY ck
        |ORDER BY ck""".stripMargin
  )
}

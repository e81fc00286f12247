package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-surface operators exercised through `spark.sql` on temp views:
  * scalar subqueries (decorrelated by Catalyst's RewriteSubquery rules),
  * correlated EXISTS, and CTEs. The SQL text is shared verbatim with the
  * DuckDB oracle — both engines parse the identical ANSI statement.
  */
object SqlOps {
  import Tables._

  /** Register the fixture tables this module needs as temp views. View
    * names must equal the oracle's table names (the SQL text is shared
    * verbatim), so unlike the scratch dirs they cannot be sf-suffixed —
    * these queries rely on the harness contract that a session runs one
    * scale factor at a time (Verify/Bench both iterate sequentially).
    */
  private def views(s: SparkSession, d: String): Unit = {
    t(s, d, "lineitem").createOrReplaceTempView("lineitem")
    t(s, d, "orders").createOrReplaceTempView("orders")
    t(s, d, "customer").createOrReplaceTempView("customer")
  }

  /** ANSI SQL shared by Spark and DuckDB, keyed by query name. */
  val sharedSql: Map[String, String] = Map(
    // scalar subquery: customers above the (deterministic decimal) average
    "sql_subquery" ->
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |         / count(*)
        |  FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    // correlated scalar subquery: each order vs its customer's order count
    "sql_correlated" ->
      """SELECT o_orderkey,
        |  (SELECT count(*) FROM orders o2
        |   WHERE o2.o_custkey = o1.o_custkey) AS cust_orders
        |FROM orders o1
        |WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin,
    // chained CTEs feeding a join
    // recursive CTE (Spark 4 WITH RECURSIVE): a monthly date spine with a
    // gap-filling LEFT JOIN — count(col) gives 0 for empty months, the
    // time-series densification pattern window functions can't produce
    // (they can't emit rows that don't exist)
    "sql_recursive" ->
      """WITH RECURSIVE spine(m) AS (
        |  SELECT TIMESTAMP '1992-01-01 00:00:00'
        |  UNION ALL
        |  SELECT m + INTERVAL 1 MONTH FROM spine
        |  WHERE m < TIMESTAMP '1998-11-01 00:00:00'
        |)
        |SELECT m, count(o_orderkey) AS n_orders
        |FROM spine LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
        |GROUP BY m ORDER BY m""".stripMargin,
    // LATERAL correlated subquery (Spark 4 lateral join): top-2 orders
    // per customer — the per-row dependent subquery both engines parse
    // identically; Catalyst decorrelates it to a ranked join rather than
    // re-executing the inner query per customer row
    "sql_lateral" ->
      """SELECT c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c_custkey <= 200
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "sql_cte" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem GROUP BY l_orderkey),
        |top AS (SELECT * FROM big WHERE qty > 150)
        |SELECT t.l_orderkey, t.qty, o.o_orderpriority
        |FROM top t JOIN orders o ON t.l_orderkey = o.o_orderkey
        |ORDER BY t.l_orderkey""".stripMargin,
    // SQL-standard UNPIVOT (wide metrics -> long (metric, val) rows) —
    // both engines parse the identical clause; every metric is cast to
    // DOUBLE pre-unpivot so the stacked value column has one type
    // the ANSI aggregate FILTER clause — conditional aggregation without
    // the CASE-WHEN contortion, parsed identically by both engines;
    // empty filtered groups yield NULL sums on both (pinned by the hash)
    "sql_filter_clause" ->
      """SELECT o_orderpriority,
        |  count(*) AS n_orders,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
        |    AS finished_value,
        |  count(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000)
        |    AS n_big_customers
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // GROUP BY ALL / ORDER BY ALL (the modern-SQL ergonomic both engines
    // added): every non-aggregate select item becomes a grouping key —
    // the clause pair that keeps wide rollup queries from drifting when
    // a dimension is added to the SELECT list but not the GROUP BY
    "sql_groupby_all" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_value
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin,

    // inline VALUES constructor as a named CTE relation — the seed-table
    // surface (tier maps, code lookups, config grids) every SQL user
    // reaches for before a dim table exists. Both engines parse the
    // identical clause incl. CTE column aliases; the range predicate
    // makes it a bounded theta-join against a 3-row literal relation
    // (broadcast by construction). Balances fold through DECIMAL(18,2).
    "sql_values_cte" ->
      """WITH tiers(tier, lo, hi) AS (
        |  VALUES ('bronze', -10000.0, 2000.0),
        |         ('silver', 2000.0, 6000.0),
        |         ('gold', 6000.0, 100000.0))
        |SELECT t.tier, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total_bal
        |FROM customer c JOIN tiers t
        |  ON c.c_acctbal >= t.lo AND c.c_acctbal < t.hi
        |GROUP BY t.tier ORDER BY t.tier""".stripMargin,

    // named WINDOW clause (the ANSI spec-sharing surface both engines
    // parse identically): one window definition feeds rank AND the
    // running sum, so the two can never drift apart the way repeated
    // inline OVER(...) clauses do when one is edited. Unique ORDER BY
    // tiebreak (o_orderkey) makes the RANGE-frame peers empty, so the
    // default frame is deterministic on both engines; the running sum
    // folds through DECIMAL(18,2) (exact) and ships as DOUBLE.
    "sql_window_named" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS run_value
        |FROM orders
        |WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk""".stripMargin,

    // SQL-standard PIVOT clause (UNPIVOT's inverse): long (priority,
    // status, price) rows widened to one status column per value — both
    // engines parse the identical `PIVOT (agg FOR col IN (v AS name))`
    // relation suffix. The IN list aliases keep the pivoted columns
    // clean unquoted identifiers (numeric/bare-literal names diverge:
    // DuckDB reads "1995" as an identifier, Spark as a string literal);
    // the outer SELECT casts each pivoted sum to DOUBLE because the
    // engines widen sum(DECIMAL) differently (the agg_benford lesson).
    // The pivot itself is one hash aggregate — no self-join per column.
    "sql_pivot" ->
      """SELECT o_orderpriority, CAST(f AS DOUBLE) AS val_f,
        |  CAST(o AS DOUBLE) AS val_o, CAST(p AS DOUBLE) AS val_p
        |FROM (SELECT o_orderpriority, o_orderstatus,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |      FROM orders)
        |  PIVOT (sum(price) FOR o_orderstatus IN ('F' AS f, 'O' AS o,
        |    'P' AS p))
        |ORDER BY o_orderpriority""".stripMargin,

    "sql_unpivot" ->
      """WITH m AS (
        |  SELECT o_orderstatus,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_price,
        |    CAST(count(*) AS DOUBLE) AS n_orders,
        |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*), 6) AS avg_price
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, metric, val
        |FROM m UNPIVOT (val FOR metric IN (total_price, n_orders, avg_price))
        |ORDER BY o_orderstatus, metric""".stripMargin)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sharedSql.map { case (name, q) =>
      name -> ((s: SparkSession, d: String) => { views(s, d); s.sql(q) })
    }

  def oracle: Map[String, String] = sharedSql
}

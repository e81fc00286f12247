package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composite analytics in the classic TPC-H query shapes — multi-join +
  * filter + aggregate + top-k plans a user of the engine would actually
  * run, exercising several operator families in one optimized plan each.
  */
object Analytics {
  import Tables._

  private val revenue = "CAST(sum(" + sql.discPrice("l_extendedprice",
    "l_discount") + ") AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3-shaped: top 10 high-revenue unshipped BUILDING orders
    "q3_shipping" -> { (s, d) =>
      val cutoff = to_timestamp(lit("1998-01-01 00:00:00"))
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // Q5-shaped: revenue by nation within ASIA where the supplying and
    // buying nations match
    "q5_region_volume" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))),

    // Q18-shaped: large-quantity orders and their customers. The classic
    // "IN (GROUP BY ... HAVING)" subquery is expressed as an aggregate +
    // equi-join — the form that scales (one shuffle on l_orderkey, the
    // HAVING filter applied map-side after partial aggregation)
    "q18_big_orders" -> { (s, d) =>
      val big = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(moneySum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
        .limit(100)
    },

    // Q10-shaped: top 20 customers by returned-item revenue
    "q10_returns" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // event-funnel attribution over the stream table: per user, the first
    // view, the first click strictly after it, and the first purchase
    // strictly after that click. Three filtered per-user min-aggregates
    // chained by equi-joins on user_id — every stage shuffles the (user,
    // ts) pairs it needs and nothing else, and the stage outputs shrink
    // monotonically (the funnel property), so the plan scales linearly in
    // events and users. The sequenced-event shape (engagement funnels,
    // retention cohorts) that windowed aggregates alone cannot express.
    "events_funnel" -> { (s, d) =>
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("t_view"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("t_click"))
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    },

    // cohort retention matrix: users bucketed by first-seen week, counted
    // in each later week they return. Two shuffles (first-seen agg, cohort
    // cell agg) plus one equi-join on user_id — the week columns are pure
    // projections, so the plan is the linear-in-events one; a 100 TB event
    // log with billions of users shuffles (user, week) pairs, not rows.
    // date_trunc('week') is ISO-Monday in BOTH engines, which is the whole
    // parity story for calendar cohorts.
    "events_retention" -> { (s, d) =>
      val e = events(s, d).select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      e.join(first, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
            .as("week_n"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("cohort_week", "week_n")
    }
  )

  def oracle: Map[String, String] = Map(
    "events_funnel" ->
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
        |SELECT v.user_id, t_view, t_click, t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "events_retention" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
        |SELECT cohort_week,
        |  CAST(datediff('day', cohort_week, wk) / 7 AS BIGINT) AS week_n,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_n""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $revenue AS revenue
         |FROM customer
         |JOIN orders   ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_volume" ->
      s"""SELECT n_name, $revenue AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |             AND c_nationkey = s_nationkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |JOIN region   ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q18_big_orders" ->
      s"""SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
         |FROM orders
         |JOIN (SELECT l_orderkey,
         |        ${sql.moneySum("l_quantity")} AS sum_qty
         |      FROM lineitem GROUP BY l_orderkey
         |      HAVING ${sql.moneySum("l_quantity")} > 250) b
         |  ON o_orderkey = b.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
         |LIMIT 100""".stripMargin,
    "q10_returns" ->
      s"""SELECT c_custkey, c_name, n_name, $revenue AS revenue,
         |count(*) AS n_items
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}

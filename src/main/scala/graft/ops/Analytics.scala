package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composite analytics in the classic TPC-H query shapes — multi-join +
  * filter + aggregate + top-k plans a user of the engine would actually
  * run, exercising several operator families in one optimized plan each.
  */
object Analytics {
  import Tables._

  private val revenue = "CAST(sum(" + sql.discPrice("l_extendedprice",
    "l_discount") + ") AS DOUBLE)"

  /** Markov transition-pair counts `(prev, cur, n)` over consecutive
    * event types per user — the one corpus window pass (lag over
    * (user_id; ts, event_id)) behind THREE keys (r14, guide §2.4):
    * `events_markov`, `events_markov_stationary` and
    * `events_markov_attribution` each re-ran the identical
    * window + (prev, cur) aggregate; only their probability
    * NORMALIZATION differs (round-6 vs unrounded), which stays per-key
    * on top of this O(types²) memo. Whichever markov key runs first
    * pays the pass (budget family `markov_pairs`).
    */
  private def markovPairCounts(s: SparkSession, d: String): DataFrame =
    graft.plans.ScopedMemo(s, s"markov_pair_counts#$d") {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("cur"))
        .agg(count(lit(1)).as("n"))
    }

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

    // Q4-shaped: order-priority census over a quarter, counting only orders
    // with at least one returned line. EXISTS becomes a left-semi join —
    // the probe side never duplicates order rows however many lines match,
    // and the returned-flag filter prunes the build side before the shuffle.
    "q4_priority" -> { (s, d) =>
      val lo = to_timestamp(lit("1997-01-01 00:00:00"))
      val hi = to_timestamp(lit("1997-04-01 00:00:00"))
      val returned = t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R").select("l_orderkey")
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q6-shaped: the forecasting-revenue-change scan. Pure
    // filter-and-aggregate — every predicate reaches the parquet scan as a
    // pushed filter, no shuffle at all until the single-row final agg.
    // The canonical "is pushdown working" probe at 100 TB.
    "q6_forecast" -> { (s, d) =>
      val lo = to_timestamp(lit("1997-01-01 00:00:00"))
      val hi = to_timestamp(lit("1998-01-01 00:00:00"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi
          && col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(money(col("l_extendedprice")) * frac(col("l_discount")))
          .cast("double").as("revenue"))
    },

    // Q7-shaped: bilateral shipping volume among three nations by year
    // (a two-nation pair is empty at sf0.001 — the fixture's trade graph
    // is sparse at 6k lineitems, so the filter admits all ordered pairs
    // over a 3-nation set to stay non-vacuous at every scale factor).
    // The nation dimension joins twice (supplier side, customer side) —
    // both broadcast — so the big tables shuffle only on their join keys.
    "q7_nation_volume" -> { (s, d) =>
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3")
          && col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")
          && col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q8-shaped: one nation's market share inside a region for one part
    // type, by year. The share is a ratio of two conditional exact-decimal
    // sums — computed in one aggregate pass, not two query branches.
    "q8_market_share" -> { (s, d) =>
      val vol = discPrice(col("l_extendedprice"), col("l_discount"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") === "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation"))
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey")),
          col("c_nationkey") === col("c_nk"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(broadcast(t(s, d, "nation"))
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")),
          col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(money(lit(0)))).cast("double")
          / sum(vol).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9-shaped (adapted: no partsupp cost column — "profit" is revenue
    // less a fixed margin of retail price): profit by supplier nation and
    // order year. Exercises the 5-way fact join with two broadcast dims
    // and a compound aggregation key.
    "q9_profit" -> { (s, d) =>
      // margin term bounded to DECIMAL(8,2) factors so the product stays
      // inside precision 38 on both engines (quantity <= 50 fits (8,2))
      val profit = discPrice(col("l_extendedprice"), col("l_discount")) -
        money(col("p_retailprice")) * frac(lit(0.4)) *
        frac(col("l_quantity"))
      t(s, d, "lineitem")
        .join(t(s, d, "part").filter(col("p_type") =!= "PROMO"),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q15-shaped: the top revenue supplier(s) per year. The "= max" scalar
    // subquery becomes a rank window over the per-(year, supplier)
    // aggregate — one shuffle each for the agg and the (tiny) window.
    "q15_top_supplier" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("l_shipdate")).cast("long").as("l_year"), col("s_suppkey"),
          col("s_name"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("total_rev"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("l_year")
        .orderBy(col("total_rev").desc, col("s_suppkey"))
      rev.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") === 1)
        .select("l_year", "s_suppkey", "s_name", "total_rev")
        .orderBy("l_year")
    },

    // Q16-shaped (adapted: no partsupp — supplier breadth comes from the
    // lineitem fact): distinct suppliers serving each (brand, type)
    // combination, widest first. countDistinct after a broadcast part
    // join; the distinct expands map-side before the final shuffle.
    "q16_parts_breadth" -> { (s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_size") >= 20)),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    },

    // Q12-shaped (adapted: the fixture has no l_shipmode): late-shipment
    // priority census — lines shipped in 1998 bucketed by linestatus,
    // counting high- vs low-priority orders. One join, one agg shuffle.
    "q12_priority_lines" -> { (s, d) =>
      val lo = to_timestamp(lit("1998-01-01 00:00:00"))
      val hi = to_timestamp(lit("1999-01-01 00:00:00"))
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },

    // Q14-shaped: promotion revenue share for one month. The percentage is
    // a conditional-sum ratio over the part join; part is the broadcast
    // side, lineitem never shuffles (partial agg on the scan side of the
    // single final 1-row reduction).
    "q14_promo" -> { (s, d) =>
      val lo = to_timestamp(lit("1997-09-01 00:00:00"))
      val hi = to_timestamp(lit("1997-10-01 00:00:00"))
      val vol = discPrice(col("l_extendedprice"), col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .agg((sum(when(col("p_type") === "PROMO", vol)
            .otherwise(money(lit(0)))).cast("double") * 100.0
          / sum(vol).cast("double")).as("promo_revenue"))
    },

    // Q17-shaped: revenue impact of small-quantity orders for one brand.
    // The correlated "l_quantity < 0.5 * avg per part" subquery becomes a
    // per-part aggregate joined back — one extra shuffle of (partkey, avg)
    // pairs instead of a rescan per row.
    "q17_small_qty" -> { (s, d) =>
      val brandLines = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_brand") === "Brand#3")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
      val avgQty = brandLines.groupBy(col("p_partkey").as("a_partkey"))
        .agg((moneySum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      brandLines
        .join(avgQty, col("p_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg((moneySum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // Q19-shaped: disjunctive brand × quantity-range revenue. The OR-of-
    // ANDs predicate stays a single scan filter (no union of three
    // branches) — Catalyst pushes the common p_partkey join key and the
    // whole disjunction evaluates in one codegen stage.
    "q19_disjunctive" -> { (s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11))
          || (col("p_brand") === "Brand#2"
            && col("l_quantity").between(10, 20))
          || (col("p_brand") === "Brand#3"
            && col("l_quantity").between(20, 30)))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
    },

    // Q21-shaped (adapted: no commit/receipt dates): suppliers who were
    // the ONLY returned-line supplier on a multi-supplier order — one
    // EXISTS (another supplier on the order) and one NOT EXISTS (another
    // supplier with a returned line) against the same fact, the classic
    // double-correlated shape. ONE (orderkey, suppkey)-level reduction
    // feeds both sides: the per-order stats (a second, tiny shuffle over
    // already-reduced rows — no countDistinct expand) and the
    // returned-pair probe (a filter over the same aggregate, so the
    // (ok, sk) exchange is planned once and reused).
    "q21_waiting_supplier" -> { (s, d) =>
      val level1 = t(s, d, "lineitem")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("has_ret"))
      val stats = level1.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("has_ret").as("n_ret_supp"))
      level1.filter(col("has_ret") === 1L)
        .join(stats, "l_orderkey")
        .filter(col("n_supp") >= 2 && col("n_ret_supp") === 1)
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(100)
    },

    // Q22-shaped: wealthy customers with no recent orders, by nation. The
    // scalar avg subquery broadcasts one number; the "no orders" test is a
    // left-anti join on the date-pruned orders scan.
    "q22_idle_customers" -> { (s, d) =>
      val cust = t(s, d, "customer")
      val cutAvg = cust.filter(col("c_acctbal") > 0)
        .agg((moneySum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val recent = t(s, d, "orders")
        .filter(col("o_orderdate") >=
          to_timestamp(lit("1999-01-01 00:00:00")))
        .select("o_custkey")
      cust.crossJoin(broadcast(cutAvg))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("numcust"),
          moneySum(col("c_acctbal")).as("totacctbal"))
        .orderBy("c_nationkey")
    },

    // Q2-shaped (adapted: no partsupp — "supply cost" is the extended
    // price a supplier actually shipped the part at): for each mid-size
    // PROMO part, the EUROPE supplier(s) whose cheapest shipped line hits
    // the per-part minimum. The correlated MIN subquery becomes a per-part
    // aggregate joined back on (partkey, exact-decimal price) — one
    // shuffle for the agg, one for the join, dims all broadcast.
    "q2_min_cost" -> { (s, d) =>
      val eu = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val lines = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_size").between(10, 20) && col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(eu, col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"),
          money(col("l_extendedprice")).as("price"))
      val minCost = lines.groupBy(col("p_partkey").as("mk"))
        .agg(min(col("price")).as("min_price"))
      lines.join(minCost,
          col("p_partkey") === col("mk") && col("price") === col("min_price"))
        .select(col("s_acctbal").cast("double").as("acctbal"), col("s_name"),
          col("n_name"), col("p_partkey"),
          col("min_price").cast("double").as("min_price"), col("s_suppkey"))
        .distinct()
        .orderBy(col("acctbal").desc, col("s_suppkey"), col("p_partkey"))
        .limit(100)
    },

    // Q11-shaped (adapted: no partsupp — a part's "stock value" is the
    // discounted revenue one nation's suppliers shipped of it). The scalar
    // threshold is scale-free (2x the average per-part value, not a fixed
    // fraction of the total) so the query stays non-vacuous from sf0.001
    // to 100 TB. Two aggregates over the same tiny per-part table + one
    // broadcast scalar — the fact scans once.
    "q11_important_parts" -> { (s, d) =>
      val natLines = t(s, d, "lineitem")
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
      val perPart = natLines.groupBy("l_partkey")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("part_value"))
      val thr = perPart.agg((avg(col("part_value")) * 2).as("t"))
      perPart.crossJoin(broadcast(thr))
        .filter(col("part_value") > col("t"))
        .select("l_partkey", "part_value")
        .orderBy(col("part_value").desc, col("l_partkey"))
    },

    // Q13-shaped: customer order-count distribution. The left join keeps
    // zero-order customers (the filter lives in the join condition, not a
    // WHERE — the classic outer-join-filter trap), then a double aggregate:
    // count per customer, histogram over counts. Second agg is tiny.
    "q13_order_counts" -> { (s, d) =>
      // pre-aggregate the fact side FIRST: one shuffle reduces orders to
      // O(customers) (custkey, cnt) rows before the outer join, instead
      // of dragging every order row through it (join-then-count paid a
      // full-orders join; measured 3.05 s → 0.56 s at sf0.1). Zero-order
      // customers surface via LEFT join + coalesce(0) — the LeftOuter
      // must survive optimization (PlanSpec pin; the equivalent
      // join-then-count form hits the classic outer-join-filter trap
      // where a post-join WHERE would legally convert it to Inner).
      val cnts = t(s, d, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      t(s, d, "customer")
        .join(cnts, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q20-shaped (adapted: no partsupp availqty — "excess stock" is a
    // supplier shipping > 45 units of one PROMO part in 1997): the nested
    // IN chain becomes an aggregate + distinct + left-semi join, so the
    // supplier table never duplicates and the fact shuffles only
    // (suppkey, partkey, qty) triples.
    "q20_excess_stock" -> { (s, d) =>
      val bigShip = t(s, d, "lineitem")
        .filter(year(col("l_shipdate")) === 1997)
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(moneySum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 45)
        .select("l_suppkey").distinct()
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .join(bigShip, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

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

    // deadline-bounded funnel: the chain only counts when every later
    // stage lands within 24 h of the FIRST view — the attribution-window
    // semantics real conversion funnels use (an unbounded funnel credits
    // purchases weeks later). Same linear shape as events_funnel — three
    // filtered min-aggs chained by user-key equi-joins, stage outputs
    // shrinking monotonically — with t_view carried through the chain so
    // the deadline predicate stays a per-row comparison, never a range
    // join. Timestamp arithmetic is exact micros in both engines.
    "events_funnel_window" -> { (s, d) =>
      val ev = events(s, d)
      val deadline = expr("t_view + INTERVAL 24 HOURS")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") && col("ts") <= deadline)
        .groupBy("user_id", "t_view").agg(min("ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click") && col("ts") <= deadline)
        .groupBy("user_id").agg(min("ts").as("t_purchase"))
      v.join(c.select("user_id", "t_click"), Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select("user_id", "t_view", "t_click", "t_purchase")
        .orderBy("user_id")
    },

    // top 3-step behavioral paths (sequence-mining lite): consecutive
    // event-type triples per user ranked by frequency. Two lags in ONE
    // window pass (same shuffle), then a path count + top-k — the
    // "what do users do next" query over any event log.
    "events_paths" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("t1", lag("event_type", 2).over(w))
        .withColumn("t2", lag("event_type", 1).over(w))
        .filter(col("t1").isNotNull)
        .groupBy(concat_ws(" > ", col("t1"), col("t2"), col("event_type"))
          .as("path"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path"))
        .limit(25)
    },

    // event-sequence transition matrix (the Markov-chain prep step for
    // session modeling): consecutive event-type pairs per user, counted
    // and normalized into transition probabilities. One window shuffle on
    // user_id + one (prev, cur) agg; the probability denominator is a
    // window over the tiny aggregated matrix, not a second scan.
    "events_markov" -> { (s, d) =>
      val wDenom = org.apache.spark.sql.expressions.Window
        .partitionBy("prev")
      markovPairCounts(s, d)
        .withColumn("p", round(col("n").cast("double")
          / sum(col("n")).over(wDenom), 6))
        .orderBy("prev", "cur")
    },

    // z-score anomaly scan: flag events whose value sits > 3σ from their
    // event_type's mean. Mean/variance come from ONE pass of exact-decimal
    // sufficient statistics (Σx, Σx², n — the agg_corr discipline) and
    // broadcast back onto the stream — the two-pass-looking query is one
    // tiny agg + one map-side join, linear at any log size.
    "events_anomaly" -> { (s, d) =>
      val ev = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      val stats = ev.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).as("n"),
          sum(money(col("value"))).cast("double").as("sx"),
          sum(money(col("value")) * money(col("value"))).cast("double")
            .as("sxx"))
        .select(col("et"), (col("sx") / col("n")).as("mean"),
          sqrt(col("sxx") / col("n")
            - (col("sx") / col("n")) * (col("sx") / col("n"))).as("sd"))
      ev.join(broadcast(stats), col("event_type") === col("et"))
        .withColumn("z", round((col("value") - col("mean")) / col("sd"), 6))
        .filter(abs(col("z")) > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          col("z"))
        .orderBy("event_id")
    },

    // gap-based sessionization: a new session starts wherever a user's
    // inter-event gap exceeds 30 minutes; sessions then aggregate to
    // (events, duration). One window shuffle on user_id + one session-key
    // agg — the batch twin of stream_session's session_window, and the
    // standard event-log preprocessing step. Ordered by (ts, event_id) so
    // timestamp ties cannot reorder the gap flags between engines.
    "events_sessionize" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select("user_id", "ts", "event_id")
        .withColumn("gap_break",
          when(col("ts").cast("long")
            - lag(col("ts"), 1).over(w).cast("long") > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("session_n",
          sum(col("gap_break")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_n")
        .agg(count(lit(1)).as("n_events"),
          (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
            .as("duration_s"))
        .orderBy("user_id", "session_n")
    },

    // session-depth distribution: how many sessions contain exactly k
    // events, with each depth's share — the engagement-shape histogram
    // (a mass at depth 1 is bounce traffic; a heavy tail is power-user
    // concentration) that sits one aggregate above events_sessionize.
    // Sessions collapse to O(#distinct depths) rows before the share
    // division; the only windows are sessionize's own per-user ones.
    "events_session_depth_dist" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val sess = events(s, d)
        .select("user_id", "ts", "event_id")
        .withColumn("gap_break",
          when(col("ts").cast("long")
            - lag(col("ts"), 1).over(w).cast("long") > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("session_n",
          sum(col("gap_break")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            0)))
        .groupBy("user_id", "session_n")
        .agg(count(lit(1)).as("depth"))
      val hist = sess.groupBy("depth")
        .agg(count(lit(1)).as("n_sessions"))
      val tot = hist.agg(sum(col("n_sessions")).as("n_total"))
      hist.crossJoin(broadcast(tot))
        .select(col("depth"), col("n_sessions"),
          round(col("n_sessions").cast("double")
            / col("n_total").cast("double"), 6).as("share"))
        .orderBy("depth")
    },

    // session-level co-occurrence (market basket over event types): which
    // event types appear together in the same 30-min session, counted
    // across all sessions. Sessionization shares events_sessionize's gap
    // logic verbatim; types reduce to DISTINCT per session BEFORE the
    // self-join, so the pair blowup is bounded by (#types-per-session)² —
    // a handful — never by session length or corpus size. One window
    // shuffle + one (user, session)-keyed equi-join; type_a < type_b
    // lists each unordered pair once.
    "events_cooccur" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val types = events(s, d)
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("gap_break",
          when(col("ts").cast("long")
            - lag(col("ts"), 1).over(w).cast("long") > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("session_n",
          sum(col("gap_break")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select("user_id", "session_n", "event_type")
        .distinct()
      val b = types.select(col("user_id").as("u2"),
        col("session_n").as("s2"), col("event_type").as("type_b"))
      types.join(b, col("user_id") === col("u2")
          && col("session_n") === col("s2")
          && col("event_type") < col("type_b"))
        .groupBy(col("event_type").as("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy("type_a", "type_b")
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
    },

    // RFM segmentation (recency / frequency / monetary): one shuffle to
    // the per-user aggregate, the corpus-max timestamp broadcast back,
    // then PURE-PROJECTION scoring against fixed business thresholds.
    // Deliberately NOT quantile scores: global ntile needs a global sort
    // (or the corpus_token_budget bin machinery) and quantile cut-points
    // drift with the data — fixed thresholds are the form that stays
    // map-only at 10⁸ users and comparable across runs.
    "events_rfm" -> { (s, d) =>
      val perUser = events(s, d)
        .groupBy("user_id")
        .agg(max(col("ts")).as("last_ts"),
          count(lit(1)).as("frequency"),
          moneySum(col("value")).as("monetary"))
      val maxTs = events(s, d).agg(max(col("ts")).as("now"))
      perUser.crossJoin(broadcast(maxTs))
        .withColumn("recency_days",
          (expr("unix_micros(now) - unix_micros(last_ts)")
            / lit(86400000000L)).cast("long"))
        .withColumn("r_score",
          when(col("recency_days") <= 7, 3L)
            .when(col("recency_days") <= 30, 2L).otherwise(1L))
        .withColumn("f_score",
          when(col("frequency") >= 50, 3L)
            .when(col("frequency") >= 10, 2L).otherwise(1L))
        .withColumn("m_score",
          when(col("monetary") >= 2000, 3L)
            .when(col("monetary") >= 500, 2L).otherwise(1L))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary"), col("r_score"), col("f_score"), col("m_score"),
          concat(col("r_score"), col("f_score"), col("m_score"))
            .as("segment"))
        .orderBy("user_id")
    },

    // last-touch attribution: every purchase is credited to the most
    // recent preceding engagement touch (click/view) by the same user.
    // Single window pass over the per-user event stream — the as-of shape
    // (join_asof) generalized to carry id+type+gap in one frame, so the
    // plan is one shuffle on user_id regardless of history length; ties
    // on ts break by event_id so the credit is engine-independent.
    "events_attribution" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("click", "view")
      events(s, d)
        .withColumn("t_id", when(isTouch, col("event_id")))
        .withColumn("t_ts", when(isTouch, col("ts")))
        .withColumn("t_ty", when(isTouch, col("event_type")))
        .withColumn("touch_id", last(col("t_id"), ignoreNulls = true).over(w))
        .withColumn("touch_ts", last(col("t_ts"), ignoreNulls = true).over(w))
        .withColumn("touch_type", last(col("t_ty"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("touch_id"),
          col("touch_type"),
          expr("unix_micros(ts) - unix_micros(touch_ts)").as("gap_us"))
        .orderBy("event_id")
    },

    // calendar gap-fill: each user's sparse daily activity densified over
    // their own [first_day, last_day] spine — the missing-bucket repair
    // timeseries feature pipelines run before lag/rolling features. The
    // spine is generated per key (sequence + explode, O(days/user) rows,
    // no driver loop, no global calendar broadcast) and the left join is
    // co-partitioned on user_id with the daily aggregate, so the pass
    // stays one shuffle at any user count.
    "events_gap_fill" -> { (s, d) =>
      val daily = events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      val spine = events(s, d)
        .groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("user_id", "day")
    },

    // A/B experiment readout: users hash-split 50/50 (the sample_split
    // discipline — assignment is a pure function of the user key, so the
    // same user lands in the same arm on every rerun and engine), per-arm
    // conversion = "has any purchase", two-proportion z-score on the
    // pooled rate. One per-user agg + one 4-way conditional agg to a
    // single row — O(1) output at any user count, no pivot, no second
    // scan. All post-agg arithmetic is the same IEEE expression tree in
    // both engines, rounded at the end.
    // 2-D Pareto front (skyline) over per-customer (spend, order count):
    // the customers no one strictly dominates on both axes — the classic
    // skyline operator (Börzsönyi et al.) behind best-tradeoff queries
    // (cheapest-AND-closest hotel; here highest-spend-AND-most-frequent
    // accounts). In 2-D, dominance collapses to a PREFIX MAX: p is
    // dominated iff max{q.n : q.spend > p.spend} >= p.n, or a same-spend
    // point has strictly more orders. So instead of the O(C²) pairwise
    // anti-join the NOT EXISTS oracle spells (the r12b fixture-exact
    // form — measured and retired this round: a broadcast nested-loop
    // over the whole entity table is driver-memory-bound and quadratic),
    // the plan is O(C log C): one keyed agg to entity-sized points, a
    // per-spend-value group max (the tie case), a 1024-cell spend
    // binning whose per-bin maxima feed a BIN-SIZED suffix-max window
    // (the only single-partition window, over <= 1024 rows), and a
    // within-bin strict-prefix max window partitioned by bin. Everything
    // data-sized shuffles on spend/bin; nothing entity-sized broadcasts.
    // Dominance compares exact decimals/longs, so no FP tie ambiguity.
    "customer_pareto_front" -> { (s, d) =>
      val pts = t(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("spend"),
          count(lit(1)).as("n_orders"))
      // one row per distinct spend value: gmax covers the
      // q.spend == p.spend && q.n > p.n dominance case
      val g = pts.groupBy("spend").agg(max(col("n_orders")).as("gmax"))
      val bounds = g.agg(min(col("spend")).as("lo"),
        max(col("spend")).as("hi"))
      // bin is a nondecreasing function of spend, so a strictly higher
      // bin implies strictly higher spend (cross-bin strictness is free)
      val binned = g.crossJoin(broadcast(bounds))
        .withColumn("bin", when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("spend") - col("lo")) * 1024
            / (col("hi") - col("lo"))).cast("long"), lit(1023L))))
        .select("spend", "gmax", "bin")
      val wBins = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val binMax = binned.groupBy("bin").agg(max(col("gmax")).as("bmax"))
        .withColumn("above_bin_max", max(col("bmax")).over(wBins))
        .select("bin", "above_bin_max")
      // within a bin the g rows carry DISTINCT spends, so rows preceding
      // under spend DESC are exactly the strictly-greater spends
      val wIn = Window.partitionBy("bin").orderBy(col("spend").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val strict = binned.join(broadcast(binMax), "bin")
        .withColumn("strict_max", greatest(
          coalesce(max(col("gmax")).over(wIn), lit(Long.MinValue)),
          coalesce(col("above_bin_max"), lit(Long.MinValue))))
        .select("spend", "gmax", "strict_max")
      pts.join(strict, "spend")
        .filter(col("strict_max") < col("n_orders") &&
          col("gmax") <= col("n_orders"))
        .select(col("custkey"), col("spend").cast("double").as("spend"),
          col("n_orders"))
        .orderBy("custkey")
    },

    // Wilson score LOWER bound on each event type's high-value rate —
    // the ranking statistic for small-sample proportions (sorting by the
    // raw rate promotes lucky low-n types; the Wilson interval shrinks
    // toward 0.5 as n drops, so low-evidence types rank honestly low).
    // One corpus-collapsing keyed agg to exact (n, k) integers per type;
    // the bound is a closed fixed-order IEEE formula over those two ints,
    // mirrored textually in the oracle (the events_ab_lift discipline).
    // O(#types) rows out at any corpus size.
    "events_rate_wilson" -> { (s, d) =>
      val z2 = 1.96 * 1.96
      val c = events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") >= 180, 1L).otherwise(0L)).as("k"))
      val p = col("k") / col("n")
      c.select(col("event_type"), col("n"), col("k"),
          round(p, 6).as("rate"),
          round((p + lit(z2) / (lit(2.0) * col("n"))
              - lit(1.96) * sqrt(p * (lit(1.0) - p) / col("n")
                + lit(z2) / (lit(4.0) * col("n") * col("n"))))
            / (lit(1.0) + lit(z2) / col("n")), 6).as("wilson_lb"))
        .orderBy("event_type")
    },

    "events_ab_lift" -> { (s, d) =>
      // conversion = a high-value purchase (>= 180): every fixture user
      // purchases SOMETHING, which would pool p to 1 and zero the z
      // denominator — the threshold keeps both arms mixed at every SF
      val u = events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase"
            && col("value") >= 180, 1L).otherwise(0L))
          .as("converted"))
        .withColumn("in_a",
          substring(md5(col("user_id").cast("string")), 1, 1) < "8")
      u.agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("in_a"), col("converted")).otherwise(0L)).as("conv_a"),
          sum(when(!col("in_a"), col("converted")).otherwise(0L)).as("conv_b"))
        .select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
          round(col("conv_a") / col("n_a"), 6).as("rate_a"),
          round(col("conv_b") / col("n_b"), 6).as("rate_b"),
          round(col("conv_b") / col("n_b") - col("conv_a") / col("n_a"), 6)
            .as("abs_lift"),
          round((col("conv_b") / col("n_b") - col("conv_a") / col("n_a"))
            / sqrt(((col("conv_a") + col("conv_b"))
                / (col("n_a") + col("n_b")))
              * (lit(1.0) - (col("conv_a") + col("conv_b"))
                / (col("n_a") + col("n_b")))
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6)
            .as("z_score"))
    },

    // Welch's unequal-variance t-test on a CONTINUOUS metric (per-user
    // purchase revenue) between the md5-split arms — the readout an
    // experiment runs when the metric is money, not a conversion bit
    // (events_ab_lift's two-proportion z). The corpus collapses to six
    // exact moments (per-arm n, Σx, Σx²) in ONE keyed pass — revenue
    // folds through DECIMAL(18,2) so partial-agg order can't move a
    // cent — and mean/variance/t/df are closed IEEE formulas over that
    // single row, mirrored textually in the oracle. Welch-Satterthwaite
    // df comes out fractional by design.
    "events_ab_welch" -> { (s, d) =>
      val u = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase",
            expr("CAST(round(value, 2) AS DECIMAL(18,2))"))
          .otherwise(expr("CAST(0 AS DECIMAL(18,2))"))).as("x"))
        .withColumn("in_a",
          substring(md5(col("user_id").cast("string")), 1, 1) < "8")
      u.agg(
          sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"),
          sum(when(col("in_a"), col("x"))).as("sx_a"),
          sum(when(!col("in_a"), col("x"))).as("sx_b"),
          sum(when(col("in_a"), expr("x * x"))).as("sxx_a"),
          sum(when(!col("in_a"), expr("x * x"))).as("sxx_b"))
        .withColumn("mean_a", expr("CAST(sx_a AS DOUBLE) / n_a"))
        .withColumn("mean_b", expr("CAST(sx_b AS DOUBLE) / n_b"))
        .withColumn("var_a", expr(
          """(CAST(sxx_a AS DOUBLE)
            |  - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / n_a)
            |  / (n_a - 1)""".stripMargin))
        .withColumn("var_b", expr(
          """(CAST(sxx_b AS DOUBLE)
            |  - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / n_b)
            |  / (n_b - 1)""".stripMargin))
        .withColumn("se2", expr("var_a / n_a + var_b / n_b"))
        .select(col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          expr("round((mean_b - mean_a) / sqrt(se2), 6)").as("t_welch"),
          expr("""round(se2 * se2
            |  / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
            |    + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6)"""
            .stripMargin).as("df_welch"))
    },

    // two-sample Kolmogorov–Smirnov test: click vs view value
    // distributions — the nonparametric distribution-drift gate run
    // before pooling data sources or after a pipeline change (PSI bins
    // by hand; KS needs no binning choice). `value` is quantized to 2
    // decimals, so the merged (value, count) histogram is DOMAIN-bounded
    // (~20-50k rows at any corpus size) and the ECDF cumulative window
    // runs over that tiny table, never the raw stream — the
    // events_outlier_mad shape. The sup gap is maximized over EXACT
    // integers-in-decimal (|ca·nb − cb·na|, DECIMAL(38,0) so a trillion-
    // row corpus can't overflow), so the argmax cannot drift; doubles
    // enter only in the final fixed-order D/z/p formulas, mirrored
    // textually in the oracle.
    "stats_ks_test" -> { (s, d) =>
      val h = events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("na"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("nb"))
      val w = Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = h.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      h.withColumn("ca", sum(col("na")).over(w))
        .withColumn("cb", sum(col("nb")).over(w))
        .crossJoin(broadcast(tot))
        .agg(max(col("ta")).as("n_a"), max(col("tb")).as("n_b"),
          // DECIMAL(18,0) factors: the product stays within DuckDB's
          // 38-digit multiply cap (36 digits) while holding counts to
          // 10^18 — far past any real corpus
          max(abs(col("ca").cast("decimal(18,0)")
              * col("tb").cast("decimal(18,0)")
            - col("cb").cast("decimal(18,0)")
              * col("ta").cast("decimal(18,0)"))).as("gap"))
        .withColumn("d_stat", expr(
          "CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b)"))
        .withColumn("m", expr(
          "CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)"))
        .select(col("n_a"), col("n_b"), round(col("d_stat"), 6).as("d_stat"),
          expr("round(d_stat * sqrt(m), 6)").as("ks_z"),
          expr("round(least(1.0, 2 * exp(-2 * m * d_stat * d_stat)), 6)")
            .as("p_approx"))
    },

    // Mann–Whitney U (Wilcoxon rank-sum): purchase vs click values — the
    // rank-based location test that survives the heavy-tailed metrics a
    // Welch t mis-serves. Average ranks come from the pooled DOMAIN-
    // bounded value histogram: rows before a tied group (one cumulative
    // window over the histogram) give each group's average rank as the
    // exact integer 2·rank = 2·cum_before + n + 1, so the rank-sum
    // doubles (2R_a) accumulate as exact DECIMAL(38,0) and U, the tie
    // correction T = Σ(n³−n), and the normal-approximation z are closed
    // fixed-order IEEE formulas over exact totals — mirrored textually.
    "stats_mann_whitney" -> { (s, d) =>
      val h = events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("value")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("na"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("nb"))
        .withColumn("n", col("na") + col("nb"))
      val wPrev = Window.orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("cum_before",
          coalesce(sum(col("n")).over(wPrev), lit(0L)))
        .agg(sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
          // factor widths sized so every product stays under DuckDB's
          // 38-digit multiply cap: (15,0)×(19,0) = 35; (12,0)³ = 37.
          // na ≤ 10^15 per histogram CELL and rank doubles ≤ 10^19 hold
          // to a ~10^14-row pooled sample — far past any real corpus
          sum(col("na").cast("decimal(15,0)")
            * (lit(2) * col("cum_before") + col("n") + lit(1))
              .cast("decimal(19,0)")).as("r2a"),
          sum((col("n").cast("decimal(12,0)")
              * col("n").cast("decimal(12,0)") * col("n").cast("decimal(12,0)")
            - col("n").cast("decimal(12,0)"))).as("ties"))
        .withColumn("u_stat", expr(
          "(CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1)) / 2"))
        .withColumn("nn", expr("CAST(n_a AS DOUBLE) + n_b"))
        .withColumn("sigma2", expr(
          """CAST(n_a AS DOUBLE) * n_b / 12
            |  * ((nn + 1) - CAST(ties AS DOUBLE) / (nn * (nn - 1)))"""
            .stripMargin))
        .select(col("n_a"), col("n_b"), col("u_stat"),
          expr("""round((u_stat - CAST(n_a AS DOUBLE) * n_b / 2)
            |  / sqrt(sigma2), 6)""".stripMargin).as("z_score"))
    },

    // chi-squared independence test: documents lang × source — the
    // categorical-association audit a corpus curator runs before
    // treating language mix as uniform across sources. The corpus
    // collapses to the O(|langs|·|sources|) contingency table in one
    // keyed agg; margins are two dimension-bounded aggs joined back
    // (broadcast), and every (o−e)²/e cell term is rounded to the 1e-6
    // grid and summed as exact DECIMAL (the forecast_backtest
    // discipline) so the 2-D sum is partial-agg-proof. Output is one
    // row: χ², dof, and Cramér's V at any corpus size.
    "stats_chi2_independence" -> { (s, d) =>
      val cells = t(s, d, "documents")
        .groupBy("lang", "source").agg(count(lit(1)).as("o"))
      val rowM = cells.groupBy("lang").agg(sum(col("o")).as("rt"))
      val colM = cells.groupBy("source").agg(sum(col("o")).as("ct"))
      val n = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"))
      cells.join(broadcast(rowM), "lang")
        .join(broadcast(colM), "source")
        .crossJoin(broadcast(n))
        .withColumn("e", expr(
          "CAST(rt AS DOUBLE) * ct / n"))
        .withColumn("term", expr(
          "CAST(round((o - e) * (o - e) / e, 6) AS DECIMAL(18,6))"))
        .agg(max(col("n")).as("n"), max(col("r")).as("n_rows"),
          max(col("c")).as("n_cols"), sum(col("term")).as("chi2_acc"))
        .select(col("n"), col("n_rows"), col("n_cols"),
          ((col("n_rows") - 1) * (col("n_cols") - 1)).as("dof"),
          col("chi2_acc").cast("double").as("chi2"),
          expr("""round(sqrt(CAST(chi2_acc AS DOUBLE)
            |  / (CAST(n AS DOUBLE) * least(n_rows - 1, n_cols - 1))), 6)"""
            .stripMargin).as("cramers_v"))
    },

    // one-way ANOVA F across all five event types' values — the k-group
    // generalization of events_ab_welch's two-arm t (running 10 pairwise
    // t-tests inflates false positives; ANOVA asks the one omnibus
    // question first). The corpus collapses to exact per-type DECIMAL
    // moments (n, Σy, Σy²) in one keyed pass; each group's SSB/SSW
    // contribution is rounded to the 1e-6 grid and decimal-summed over
    // the O(k) group rows (the forecast_backtest discipline), so the
    // between/within sums are partial-agg-proof; F and η² are closed
    // IEEE finals over those sums. One row out at any corpus size.
    "stats_anova_oneway" -> { (s, d) =>
      val m = events(s, d)
        .select(col("event_type"), money(col("value")).as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(expr("y * y")).as("syy"))
      val g = m.agg(sum(col("n")).as("nn"), sum(col("sy")).as("gsy"),
        count(lit(1)).as("k"))
      m.crossJoin(broadcast(g))
        .withColumn("gmean", expr("CAST(gsy AS DOUBLE) / nn"))
        .withColumn("mean", expr("CAST(sy AS DOUBLE) / n"))
        .withColumn("ssb_t", expr(
          "CAST(round(n * (mean - gmean) * (mean - gmean), 6)" +
            " AS DECIMAL(24,6))"))
        .withColumn("ssw_t", expr(
          "CAST(round(CAST(syy AS DOUBLE)" +
            " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n, 6)" +
            " AS DECIMAL(24,6))"))
        .agg(max(col("k")).as("k"), max(col("nn")).as("n"),
          sum(col("ssb_t")).as("ssb_acc"), sum(col("ssw_t")).as("ssw_acc"))
        .select(col("k"), col("n"),
          col("ssb_acc").cast("double").as("ss_between"),
          col("ssw_acc").cast("double").as("ss_within"),
          expr("""round((CAST(ssb_acc AS DOUBLE) / (k - 1))
            |  / (CAST(ssw_acc AS DOUBLE) / (n - k)), 6)""".stripMargin)
            .as("f_stat"),
          expr("""round(CAST(ssb_acc AS DOUBLE)
            |  / (CAST(ssb_acc AS DOUBLE) + CAST(ssw_acc AS DOUBLE)), 6)"""
            .stripMargin).as("eta_sq"))
    },

    // Levene's variance-homogeneity test (mean-centered form) across the
    // event types — the gate BEFORE trusting stats_anova_oneway, whose F
    // assumes equal group variances. W is the one-way ANOVA F computed
    // on the absolute deviations z = |y − group mean|: pass 1 collapses
    // the corpus to O(k) exact-decimal group means, pass 2 broadcasts
    // them back and re-collapses the z column to O(k) moments — two
    // corpus-linear keyed aggs, nothing corpus-sized moves. Each z is
    // rounded to the 1e-6 grid BEFORE its moments (the decimal-sum
    // discipline: partial-agg merge order can never move W), and the
    // SSB/SSW terms reuse the stats_anova_oneway accumulation verbatim.
    "stats_levene" -> { (s, d) =>
      val base = events(s, d)
        .select(col("event_type"), money(col("value")).as("y"))
      val means = base.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        .select(col("event_type"),
          expr("CAST(sy AS DOUBLE) / n").as("mean"))
      val m = base.join(broadcast(means), "event_type")
        .select(col("event_type"), expr(
          "CAST(round(abs(CAST(y AS DOUBLE) - mean), 6)" +
            " AS DECIMAL(18,6))").as("z"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
          sum(expr("z * z")).as("szz"))
      val g = m.agg(sum(col("n")).as("nn"), sum(col("sz")).as("gsz"),
        count(lit(1)).as("k"))
      m.crossJoin(broadcast(g))
        .withColumn("gmean", expr("CAST(gsz AS DOUBLE) / nn"))
        .withColumn("mean", expr("CAST(sz AS DOUBLE) / n"))
        .withColumn("ssb_t", expr(
          "CAST(round(n * (mean - gmean) * (mean - gmean), 6)" +
            " AS DECIMAL(24,6))"))
        .withColumn("ssw_t", expr(
          "CAST(round(CAST(szz AS DOUBLE)" +
            " - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n, 6)" +
            " AS DECIMAL(24,6))"))
        .agg(max(col("k")).as("k"), max(col("nn")).as("n"),
          sum(col("ssb_t")).as("ssb_acc"), sum(col("ssw_t")).as("ssw_acc"))
        .select(col("k"), col("n"),
          col("ssb_acc").cast("double").as("ss_between"),
          col("ssw_acc").cast("double").as("ss_within"),
          expr("""round((CAST(ssb_acc AS DOUBLE) / (k - 1))
            |  / (CAST(ssw_acc AS DOUBLE) / (n - k)), 6)""".stripMargin)
            .as("w_stat"))
    },

    // Cohen's d + Hedges' g effect sizes (purchase vs click values) —
    // the companion every significance test needs: at corpus scale n is
    // so large that trivial differences reach p < 0.001, and only the
    // standardized effect says whether anyone should care. Same exact
    // DECIMAL moment pass as the Welch t; pooled SD, d, and the
    // small-sample Hedges correction are closed fixed-order IEEE
    // formulas over the one moment row, mirrored textually.
    "stats_cohens_d" -> { (s, d) =>
      events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .select(when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("isa"), money(col("value")).as("y"))
        .agg(
          sum(col("isa")).as("n_a"),
          sum(lit(1L) - col("isa")).as("n_b"),
          sum(when(col("isa") === 1L, col("y"))).as("sy_a"),
          sum(when(col("isa") === 0L, col("y"))).as("sy_b"),
          sum(when(col("isa") === 1L, expr("y * y"))).as("syy_a"),
          sum(when(col("isa") === 0L, expr("y * y"))).as("syy_b"))
        .withColumn("mean_a", expr("CAST(sy_a AS DOUBLE) / n_a"))
        .withColumn("mean_b", expr("CAST(sy_b AS DOUBLE) / n_b"))
        .withColumn("var_a", expr(
          """(CAST(syy_a AS DOUBLE)
            |  - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / n_a)
            |  / (n_a - 1)""".stripMargin))
        .withColumn("var_b", expr(
          """(CAST(syy_b AS DOUBLE)
            |  - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / n_b)
            |  / (n_b - 1)""".stripMargin))
        .withColumn("s_pool", expr(
          """sqrt(((n_a - 1) * var_a + (n_b - 1) * var_b)
            |  / (n_a + n_b - 2))""".stripMargin))
        .select(col("n_a"), col("n_b"),
          round(col("mean_a"), 6).as("mean_a"),
          round(col("mean_b"), 6).as("mean_b"),
          expr("round((mean_b - mean_a) / s_pool, 6)").as("cohens_d"),
          expr("""round((mean_b - mean_a) / s_pool
            |  * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 6)""".stripMargin)
            .as("hedges_g"))
    },

    // Spearman rank correlation between daily volume and daily revenue —
    // the monotone-association test that survives outlier days Pearson
    // (agg_corr) is dragged by. The corpus collapses to the O(#days)
    // daily table in one keyed agg; average ranks with tie handling are
    // EXACT INTEGERS via doubled ranks (2·rank_avg = 2·min_rank + ties −
    // 1, from one rank window + one tie count per axis over the tiny day
    // table), and Spearman = Pearson over those integer ranks (rank
    // correlation is affine-invariant, so the doubling cancels):
    // exact-decimal sums, one closed IEEE final. One row out.
    "stats_spearman_days" -> { (s, d) =>
      val daily = events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"),
          sum(money(col("value"))).as("y"))
      val wx = Window.orderBy("x")
      val wy = Window.orderBy("y")
      val ranked = daily
        .withColumn("ux", lit(2) * rank().over(wx)
          + count(lit(1)).over(Window.partitionBy("x")) - 1)
        .withColumn("uy", lit(2) * rank().over(wy)
          + count(lit(1)).over(Window.partitionBy("y")) - 1)
      ranked.agg(count(lit(1)).as("n_days"),
          sum(col("ux").cast("decimal(18,0)")).as("sx"),
          sum(col("uy").cast("decimal(18,0)")).as("sy"),
          sum((col("ux") * col("uy")).cast("decimal(18,0)")).as("sxy"),
          sum((col("ux") * col("ux")).cast("decimal(18,0)")).as("sxx"),
          sum((col("uy") * col("uy")).cast("decimal(18,0)")).as("syy"))
        .select(col("n_days"),
          expr("""round((n_days * CAST(sxy AS DOUBLE)
            |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            |  / sqrt((n_days * CAST(sxx AS DOUBLE)
            |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            |    * (n_days * CAST(syy AS DOUBLE)
            |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)"""
            .stripMargin).as("spearman_rho"))
    },

    // robust-scaler fit per event type: median / Q1 / Q3 / IQR — the
    // outlier-proof alternative to z-score standardization (mean/sd
    // scaling lets one wild value move every feature; median/IQR don't).
    // Quantiles come from the DOMAIN-bounded per-type value histogram
    // with one cumulative window (the events_outlier_mad shape — never a
    // per-type sort of the raw stream), lower-quantile convention
    // (smallest value whose scaled cumulative count crosses the exact
    // integer threshold), so every step is integer/decimal-exact.
    "feature_robust_scaler" -> { (s, d) =>
      val h = events(s, d)
        .groupBy(col("event_type"), col("value"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("value")
      val cum = h.withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("tot",
          sum(col("cnt")).over(Window.partitionBy("event_type")))
      def qAt(cond: org.apache.spark.sql.Column, out: String) =
        cum.filter(cond).groupBy("event_type")
          .agg(min(col("value")).as(out))
      val q1 = qAt(col("cum") * 4 >= col("tot") + 1, "q1")
      val med = qAt(col("cum") * 2 >= col("tot") + 1, "median")
      val q3 = qAt(col("cum") * 4 >= col("tot") * 3 + 3, "q3")
      med.join(q1, "event_type").join(q3, "event_type")
        .select(col("event_type"), col("median"), col("q1"), col("q3"),
          round(money(col("q3")) - money(col("q1")), 2)
            .cast("double").as("iqr"))
        .orderBy("event_type")
    },

    // weekly seasonality profile per event type: day-of-week volume,
    // in-type share, and peak-day flag — the load-shaping/anomaly
    // baseline every event pipeline keeps. The corpus collapses to a
    // (type × 7) aggregate in one map-combined pass; shares and peaks
    // are windows over that tiny table, never a second scan. DOW is
    // Sunday=0 on both engines (Spark dayofweek()-1, DuckDB
    // date_part('dow')).
    "events_seasonality" -> { (s, d) =>
      val wT = Window.partitionBy("event_type")
      events(s, d)
        .select(col("event_type"),
          (dayofweek(col("ts")) - 1).cast("long").as("dow"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n_events"))
        .withColumn("share", round(col("n_events").cast("double")
          / sum(col("n_events")).over(wT).cast("double"), 6))
        .withColumn("is_peak",
          col("n_events") === max(col("n_events")).over(wT))
        .orderBy("event_type", "dow")
    },

    // robust outliers via the HISTOGRAM median: `value` is quantized to 2
    // decimals, so the per-type (value, count) histogram is bounded by the
    // domain (~20k rows) no matter how many events exist — median and MAD
    // come from a cumulative window over that tiny histogram, never a
    // per-type sort of the raw stream (the shape that makes exact
    // quantiles scale; contrast events_anomaly's moment z-score, which
    // a single wild value drags arbitrarily). Lower-median convention
    // (smallest value whose cumulative count reaches ceil(n/2)) keeps
    // every step integer/decimal-exact — no interpolation, no IEEE drift.
    "events_outlier_mad" -> { (s, d) =>
      val ev = events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
      def lowerMedian(df: DataFrame, keyCol: String, vCol: String,
          out: String): DataFrame = {
        val h = df.groupBy(col(keyCol), col(vCol))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(keyCol).orderBy(vCol)
        h.withColumn("cum", sum(col("cnt")).over(w))
          .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(keyCol)))
          .filter(col("cum") * 2 >= col("tot") + 1)
          .groupBy(keyCol).agg(min(col(vCol)).as(out))
      }
      val med = lowerMedian(ev, "event_type", "value", "med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("dev",
          abs(money(col("value")) - money(col("med"))).cast("double"))
      val mad = lowerMedian(dev, "event_type", "dev", "mad")
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("robust_z",
          round(col("dev") / (lit(1.4826) * col("mad")), 6))
        .filter(col("robust_z") > 3.0)
        .select(col("event_id"), col("event_type"), col("value"),
          col("robust_z"))
        .orderBy("event_id")
    },

    // 3-step sequence mining: each user's event stream in (ts, event_id)
    // order yields its consecutive event-type trigrams via two leads in ONE
    // window pass (state = two lookahead rows per partition scan), then a
    // global count — sequences x support, the frequent-pattern baseline.
    // The trigram space is |types|^3 (125 here), so the agg output is O(1)
    // however many events flow through; deterministic because ts ties
    // break on event_id inside the window order.
    "events_seq_trigrams" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .select(col("user_id"), concat_ws(" > ", col("event_type"),
          col("e2"), col("e3")).as("seq"))
        .groupBy("seq")
        .agg(count(lit(1)).as("n_occur"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_occur").desc, col("seq"))
    },

    // full bilateral trade matrix: customer-nation × supplier-nation
    // revenue and line counts — the Q7 shape widened from one nation
    // pair to the whole O(|nations|²) matrix (trade-dependency heatmap;
    // nation_trade_balance is its row-sum margin). Fact-table joins
    // shuffle once on the line keys; both nation dims broadcast; the
    // matrix is dimension-bounded output at any volume.
    "nation_flow_matrix" -> { (s, d) =>
      val n1 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation")))
      val n2 = broadcast(t(s, d, "nation")
        .select(col("n_nationkey").as("c_nk"),
          col("n_name").as("cust_nation")))
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("s_nk"))
        .join(n2, col("c_nationkey") === col("c_nk"))
        .groupBy("supp_nation", "cust_nation")
        .agg(count(lit(1)).as("n_lines"),
          sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .cast("double").as("volume"))
        .orderBy("supp_nation", "cust_nation")
    },

    // month-of-year seasonal index of order revenue: each calendar
    // month's revenue against the uniform-month baseline (index > 1 =
    // high season) — the deseasonalization table demand planning divides
    // by. One keyed agg to 12 rows; the baseline is a broadcast 1-row
    // total, the ratio exact-decimal-to-double; index·12 arithmetic
    // keeps the division count at one.
    "orders_seasonal_index" -> { (s, d) =>
      val m = t(s, d, "orders")
        .groupBy(month(to_date(col("o_orderdate"))).cast("long")
          .as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(money(col("o_totalprice"))).cast("decimal(18,2)")
            .as("rev"))
      val tot = m.agg(sum(col("rev")).cast("decimal(19,2)").as("rtot"))
      m.crossJoin(broadcast(tot))
        .select(col("month"), col("n_orders"),
          col("rev").cast("double").as("revenue"),
          round(col("rev").cast("double") * 12d
            / col("rtot").cast("double"), 6).as("seasonal_index"))
        .orderBy("month")
    },

    // sequential pattern pairs WITH GAP (a → b within the next 3 events,
    // not necessarily adjacent) — what seq_trigrams' substring view
    // misses: "view … later purchase" with noise events between. Per
    // user: one ordered index window (partitioned by the user key), then
    // a bounded self-join on 1 ≤ j−i ≤ Gap — fan-out ≤ Gap per event, so
    // the pair stream is Gap·|events|, never |events|². Support counts
    // both occurrences and distinct users; confidence normalizes by the
    // users who emitted the antecedent at all. Output is O(#types²).
    "events_seq_pairs_gap" -> { (s, d) =>
      val gap = 3
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val seq = events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("i", row_number().over(w).cast("long"))
        .select("user_id", "event_type", "i")
      val pairs = seq.as("a")
        .join(seq.select(col("user_id"), col("event_type").as("ev_b"),
            col("i").as("j")).as("b"), Seq("user_id"))
        .filter(col("j") > col("i") && col("j") <= col("i") + gap)
        .groupBy(col("event_type").as("ev_a"), col("ev_b"))
        .agg(count(lit(1)).as("n_occur"),
          countDistinct(col("user_id")).as("n_users"))
      val aUsers = seq.groupBy(col("event_type").as("ev_a"))
        .agg(countDistinct(col("user_id")).as("n_users_a"))
      pairs.join(broadcast(aUsers), "ev_a")
        .select(col("ev_a"), col("ev_b"), col("n_occur"), col("n_users"),
          round(col("n_users").cast("double")
            / col("n_users_a").cast("double"), 6).as("confidence"))
        .orderBy("ev_a", "ev_b")
    },

    // burst episodes per event type — the paging signal: hours whose
    // rate exceeds 2× the trailing-24h mean, collapsed to contiguous
    // episodes (start/end/duration/peak). The hourly grid is ZERO-FILLED
    // per type (a silent hour is rate 0 — skipping it corrupts both the
    // trailing mean and episode contiguity), the trailing mean is a
    // partitioned 24-row frame that EXCLUDES the current hour (a burst
    // must not dilute its own baseline), the 2× test is exact-integer
    // (c·12 > sum24 — no doubles, no rounding seams), and episodes use
    // the gaps-and-islands index trick per type. Everything after the
    // one corpus-linear (type, hour) count is O(#types × #hours).
    "events_burst_states" -> { (s, d) =>
      val hc = events(s, d)
        .groupBy(col("event_type"),
          floor(unix_micros(col("ts")) / 3600000000L).as("h"))
        .agg(count(lit(1)).as("ce"))
      val bounds = hc.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val types = hc.select("event_type").distinct()
      val grid = types.crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"))).as("h"))
        .join(hc, Seq("event_type", "h"), "left")
        .select(col("event_type"), col("h"),
          coalesce(col("ce"), lit(0L)).as("c"))
      val wPrev = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(-24, -1)
      val burst = grid
        .withColumn("n24", count(lit(1)).over(wPrev))
        .withColumn("s24", sum(col("c")).over(wPrev))
        .filter(col("n24") === 24 && col("c") * 12 > col("s24"))
      val wIdx = Window.partitionBy("event_type").orderBy("h")
      burst
        .withColumn("grp", col("h") - row_number().over(wIdx))
        .groupBy("event_type", "grp")
        .agg(min(col("h")).as("h_start"), max(col("h")).as("h_end"),
          count(lit(1)).as("dur_hours"), max(col("c")).as("peak_rate"),
          sum(col("c")).as("n_events"))
        // epoch-hour indices, not constructed timestamps: integer output
        // sidesteps engine timestamp-tz flavor seams entirely
        .select(col("event_type"), col("h_start"), col("h_end"),
          col("dur_hours"), col("peak_rate"), col("n_events"))
        .orderBy("event_type", "h_start")
    },

    // discrete survival curve over user lifetimes: tenure = days between
    // a user's first and last activity; S(t) = fraction of users whose
    // tenure reached t. Computed from the TENURE HISTOGRAM, not per-user
    // rows — one shuffle to per-user min/max, one to the O(#distinct
    // tenure days) histogram, then a reverse-cumulative window over that
    // histogram. The unpartitioned window is over day-granularity tenure
    // values (bounded by the log's calendar span — ~30 here, a few
    // thousand at any horizon), never over users, which is what keeps the
    // curve computable when users number 10⁹.
    "events_survival" -> { (s, d) =>
      val ten = events(s, d)
        .groupBy("user_id")
        .agg(datediff(max(to_date(col("ts"))), min(to_date(col("ts"))))
          .cast("long").as("tenure"))
      val hist = ten.groupBy("tenure").agg(count(lit(1)).as("n_ended"))
      val w = Window.orderBy(col("tenure").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist
        .withColumn("n_reached", sum(col("n_ended")).over(w))
        .withColumn("n_total",
          sum(col("n_ended")).over(
            Window.rowsBetween(Window.unboundedPreceding,
              Window.unboundedFollowing)))
        .select(col("tenure").as("tenure_days"), col("n_ended"),
          col("n_reached"),
          round(col("n_reached").cast("double")
            / col("n_total").cast("double"), 6).as("survival"))
        .orderBy("tenure_days")
    },

    // per-user behavioral entropy: Shannon entropy (bits) of each user's
    // event-type mix — the engagement-diversity score bot-detection and
    // recommendation pipelines compute per entity. Two keyed aggregates
    // ((user, type) counts, then the per-user fold) — no windows, no
    // per-user sort. Entropy terms are IEEE doubles, so the cross-row sum
    // goes through the round(·,12)→decimal discipline (Tables.scala) and
    // partial-agg merge order can never move a bit.
    "events_user_entropy" -> { (s, d) =>
      val tc = events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      tc.withColumn("tot",
          sum(col("n")).over(Window.partitionBy("user_id")))
        .groupBy("user_id")
        .agg(max(col("tot")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(expr("CAST(round(-(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))" +
            " * log2(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 12)" +
            " AS DECIMAL(28,12))"))
            .cast("double").as("entropy_bits"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          round(col("entropy_bits"), 6).as("entropy_bits"))
        .orderBy("user_id")
    },

    // longest consecutive-day activity streak per user — the classic
    // gaps-and-islands on the per-user distinct-day grid (the engagement
    // metric every DAU dashboard carries). One shuffle to distinct
    // (user, day), one per-user window for the island id (epoch_day −
    // row_number is constant within a run), then two keyed aggregates.
    // All windows partition by user_id — nothing global anywhere.
    "events_streaks" -> { (s, d) =>
      val days = events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      val runs = days
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("run_len"))
      runs.groupBy("user_id")
        .agg(max(col("run_len")).as("longest_streak"),
          sum(col("run_len")).as("n_active_days"))
        .orderBy("user_id")
    },

    // inter-arrival timing profile per user: mean/min/max gap and the
    // coefficient of variation (sd/mean — the burstiness score; cv ≈ 1 is
    // Poisson, cv ≫ 1 is bursty, the signal rate-limiters and bot
    // detectors key on). Gaps are EXACT integer microseconds from one
    // lag window pass; moments sum in decimal (Σgap² of 30-day-µs gaps
    // overflows BIGINT — the 128-bit-accumulator lesson), and only the
    // final mean/sd arithmetic runs in IEEE double. One user-keyed
    // window + one keyed agg — linear at any history length.
    "events_interarrival" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap",
          expr("unix_micros(ts) - unix_micros(prev)"))
        .select(col("user_id"), col("gap"),
          col("gap").cast("decimal(19,0)").as("gd"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_gaps"),
          sum(col("gd")).cast("double").as("sg"),
          sum(expr("CAST(gd * gd AS DECIMAL(38,0))")).cast("double")
            .as("sgg"),
          min(col("gap")).as("min_gap_us"),
          max(col("gap")).as("max_gap_us"))
        .select(col("user_id"), col("n_gaps"),
          round(col("sg") / col("n_gaps") / 1e6, 6).as("mean_gap_s"),
          col("min_gap_us"), col("max_gap_us"),
          round(sqrt(greatest(lit(0d), col("sgg") / col("n_gaps")
            - (col("sg") / col("n_gaps")) * (col("sg") / col("n_gaps"))))
            / (col("sg") / col("n_gaps")), 6).as("cv"))
        .orderBy("user_id")
    },

    // velocity spike detection: flag (user, hour) cells whose event count
    // runs >= 2.5x that user's OWN mean hourly rate (and >= 3 absolute) —
    // per-entity baselines, where events_anomaly is per-type global.
    // Two keyed aggregates ((user, hour) cells, then the per-user
    // baseline over active hours) + one user-keyed join back — the
    // baseline table is O(users) and the comparison is per-row. Baseline
    // mean is integer-sum / integer-count in IEEE double, identical both
    // engines.
    "events_velocity" -> { (s, d) =>
      val cells = events(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
      val base = cells.groupBy("user_id")
        .agg((sum(col("n")).cast("double") / count(lit(1)))
          .as("mean_hourly"))
      cells.join(base, "user_id")
        .filter(col("n") >= 3
          && col("n").cast("double") >= lit(2.5) * col("mean_hourly"))
        .select(col("user_id"), col("hr"), col("n"),
          round(col("mean_hourly"), 6).as("mean_hourly"),
          round(col("n").cast("double") / col("mean_hourly"), 6)
            .as("spike_factor"))
        .orderBy("user_id", "hr")
    },

    // first-touch attribution — the complementary model to
    // events_attribution's last-touch (campaign ROI uses both ends:
    // which touch ACQUIRED the user vs which CONVERTED them). Same
    // single-window as-of shape, but `first(ignoreNulls)` over the
    // unbounded-preceding frame carries the EARLIEST engagement touch;
    // still one shuffle by user, O(1) frame state.
    "events_first_touch" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val isTouch = col("event_type").isin("click", "view")
      events(s, d)
        .withColumn("t_id", when(isTouch, col("event_id")))
        .withColumn("t_ts", when(isTouch, col("ts")))
        .withColumn("t_ty", when(isTouch, col("event_type")))
        .withColumn("touch_id",
          first(col("t_id"), ignoreNulls = true).over(w))
        .withColumn("touch_ts",
          first(col("t_ts"), ignoreNulls = true).over(w))
        .withColumn("touch_type",
          first(col("t_ty"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("touch_id"), col("touch_type"),
          expr("unix_micros(ts) - unix_micros(touch_ts)").as("age_us"))
        .orderBy("event_id")
    },

    // cohort lifetime value: customers grouped by first-order year, the
    // per-cohort average cumulative revenue at each year offset — the
    // LTV curve (events_retention counts heads; this follows the money).
    // Two customer-keyed aggregates (first year, then (customer, offset)
    // revenue), one O(cohorts × offsets) cumulative window over the tiny
    // matrix — the fact table never enters a window.
    "cohort_ltv" -> { (s, d) =>
      val firstYear = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(min(year(col("o_orderdate"))).as("cohort_year"))
      val perOffset = t(s, d, "orders")
        .join(firstYear, "o_custkey")
        .groupBy(col("o_custkey"), col("cohort_year"),
          (year(col("o_orderdate")) - col("cohort_year")).as("year_offset"))
        .agg(moneySum(col("o_totalprice")).as("rev"))
      val cohortSize = firstYear.groupBy("cohort_year")
        .agg(count(lit(1)).as("n_customers"))
      val cells = perOffset.groupBy("cohort_year", "year_offset")
        .agg(sum(expr("CAST(rev AS DECIMAL(18,2))")).as("rev_d"))
      val w = Window.partitionBy("cohort_year").orderBy("year_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells
        .withColumn("cum_rev", sum(col("rev_d")).over(w))
        .join(broadcast(cohortSize), "cohort_year")
        .select(col("cohort_year"),
          col("year_offset").cast("long").as("year_offset"),
          col("rev_d").cast("double").as("cohort_revenue"),
          round(col("cum_rev").cast("double") / col("n_customers"), 6)
            .as("ltv_per_customer"))
        .orderBy("cohort_year", "year_offset")
    },

    // supplier concentration per part type: Herfindahl–Hirschman index
    // over supplier revenue shares — the sourcing-risk audit (HHI → 1 is
    // a single-supplier category; procurement flags > 0.25). One
    // (type, supplier)-keyed exact-decimal aggregate, shares and the
    // Σ share² fold computed over the O(types × suppliers) matrix with
    // round(·,12)-decimal summed squares — merge-order-proof.
    "supplier_hhi" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("l_suppkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .as("rev"))
      val tot = rev.groupBy("p_type")
        .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_suppliers"))
      rev.join(tot, "p_type")
        .withColumn("share",
          col("rev").cast("double") / col("tot").cast("double"))
        .groupBy("p_type")
        .agg(max(col("n_suppliers")).as("n_suppliers"),
          sum(expr("CAST(round(share * share, 12) AS DECIMAL(28,12))"))
            .cast("double").as("hhi_raw"))
        .select(col("p_type"), col("n_suppliers"),
          round(col("hhi_raw"), 6).as("hhi"))
        .orderBy("p_type")
    },

    // supplier-concentration drift: the overall HHI per order YEAR — is
    // sourcing consolidating (HHI rising toward the 0.25 flag) or
    // diversifying? The time-series companion to the static per-type
    // supplier_hhi, same exact-decimal share² discipline; the fact table
    // collapses to O(years × suppliers) revenue cells in one keyed agg
    // and everything after is dim-sized.
    "supplier_hhi_trend" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          col("l_suppkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .as("rev"))
      val tot = rev.groupBy("yr")
        .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_suppliers"))
      rev.join(tot, "yr")
        .withColumn("share",
          col("rev").cast("double") / col("tot").cast("double"))
        .groupBy("yr")
        .agg(max(col("n_suppliers")).as("n_suppliers"),
          sum(expr("CAST(round(share * share, 12) AS DECIMAL(28,12))"))
            .cast("double").as("hhi_raw"))
        .select(col("yr").as("order_year"), col("n_suppliers"),
          round(col("hhi_raw"), 6).as("hhi"))
        .orderBy("order_year")
    },

    // monthly revenue trend with month-over-month and year-over-year
    // growth — the reporting time series every revenue dashboard carries.
    // The corpus collapses to O(#months) rows in one keyed exact-decimal
    // aggregate BEFORE any window touches it, so the unpartitioned lag
    // windows run over a calendar-bounded table (~80 rows here, a few
    // hundred at any horizon) — never over the fact table.
    "trend_revenue_monthly" -> { (s, d) =>
      val monthly = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(date_trunc("month", col("o_orderdate")))
          .as("month"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
      val w = Window.orderBy("month")
      monthly
        .withColumn("prev_m", lag(col("revenue"), 1).over(w))
        .withColumn("prev_y", lag(col("revenue"), 12).over(w))
        .select(col("month"), round(col("revenue"), 2).as("revenue"),
          col("n_orders"),
          round((col("revenue") - col("prev_m")) / col("prev_m"), 6)
            .as("mom_growth"),
          round((col("revenue") - col("prev_y")) / col("prev_y"), 6)
            .as("yoy_growth"))
        .orderBy("month")
    },

    // open-order backlog over time (the event-sourcing inventory view):
    // an order opens in its order month and closes in its LAST ship
    // month; backlog_m = cumulative opened − cumulative closed. Two
    // keyed monthly histograms merged full-outer, then cumulative
    // windows over the O(#months) calendar table — the fact tables
    // collapse before any ordered state exists.
    "orders_backlog" -> { (s, d) =>
      val opened = t(s, d, "orders")
        .groupBy(to_date(date_trunc("month", col("o_orderdate")))
          .as("month"))
        .agg(count(lit(1)).as("n_opened"))
      val closed = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(max(col("l_shipdate")).as("last_ship"))
        .groupBy(to_date(date_trunc("month", col("last_ship")))
          .as("month"))
        .agg(count(lit(1)).as("n_closed"))
      val w = Window.orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      opened.join(closed, Seq("month"), "full_outer")
        .select(col("month"),
          coalesce(col("n_opened"), lit(0L)).as("n_opened"),
          coalesce(col("n_closed"), lit(0L)).as("n_closed"))
        .withColumn("backlog",
          sum(col("n_opened") - col("n_closed")).over(w))
        .orderBy("month")
    },

    // order-size distribution: how many line items orders carry — the
    // basket-size histogram capacity planning and join-selectivity
    // estimates read (it is also the bound behind basket_rules' pair
    // space). Two keyed aggregates, O(#distinct sizes) out.
    "orders_size_dist" -> { (s, d) =>
      val sizes = t(s, d, "lineitem")
        .groupBy("l_orderkey").agg(count(lit(1)).as("n_items"))
      val tot = sizes.agg(count(lit(1)).as("n_orders"))
      sizes.groupBy("n_items").agg(count(lit(1)).as("n_orders_at"))
        .crossJoin(broadcast(tot))
        .select(col("n_items"), col("n_orders_at"),
          round(col("n_orders_at").cast("double") / col("n_orders"), 6)
            .as("share"))
        .orderBy("n_items")
    },

    // ABC / Pareto classification of parts by revenue contribution — the
    // inventory-policy split (A: the heads that cover 80% of revenue,
    // B: the next 15%, C: the long tail). The corpus collapses to an
    // O(parts) revenue table in ONE exact-decimal keyed agg; the ordered
    // cumulative share then runs a single global window over the SMALL
    // dim-sized table (at cluster scale: range-partition the window by
    // the revenue sort key — the input is O(parts), never the fact
    // table). Shares divide exact decimals in IEEE double, so the class
    // boundaries are bit-identical across engines.
    "inventory_abc_class" -> { (s, d) =>
      val rev = t(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .as("rev"))
      val tot = rev.agg(sum(col("rev")).as("tot"))
      val w = Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev
        .withColumn("cum", sum(col("rev")).over(w))
        .crossJoin(broadcast(tot))
        .withColumn("cum_share",
          col("cum").cast("double") / col("tot").cast("double"))
        .withColumn("cls",
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B").otherwise("C"))
        .groupBy("cls")
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("double").as("revenue"),
          round(sum(col("rev")).cast("double")
            / max(col("tot")).cast("double"), 6).as("share"))
        .orderBy("cls")
    },

    // fulfillment-latency profile: order-date → ship-date delay in whole
    // days, summarized per order priority (the SLA table an ops review
    // reads; exposes whether URGENT really ships faster). One equi-join
    // on the order key + one keyed agg; the delay is exact integer days,
    // the mean divides an exact integer sum, and the exact interpolated
    // p90 follows the agg_percentile precedent (integer inputs ⇒
    // round(4) agrees across engines).
    "ship_delay_stats" -> { (s, d) =>
      t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
          col("o_orderkey") === col("l_orderkey"))
        .withColumn("delay",
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_lines"),
          round(sum(col("delay")).cast("double") / count(lit(1)), 6)
            .as("mean_delay_days"),
          min(col("delay")).as("min_delay"),
          round(expr("percentile(delay, 0.9)"), 4).as("p90_delay"),
          max(col("delay")).as("max_delay"))
        .orderBy("o_orderpriority")
    },

    // repeat-purchase cadence: the distribution of gaps between a
    // customer's consecutive orders, bucketed into the lifecycle bands a
    // retention model keys on (within a week / month / quarter / longer).
    // One customer-keyed lag window + one O(4)-out keyed agg — the
    // orders-table sibling of events_interarrival's per-user microsecond
    // profile, at business granularity with a fixed-band histogram.
    "orders_repeat_intervals" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
      val gaps = t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_days",
          datediff(col("o_orderdate"), col("prev")).cast("long"))
        .withColumn("band",
          when(col("gap_days") <= 7, "01_week")
            .when(col("gap_days") <= 30, "02_month")
            .when(col("gap_days") <= 90, "03_quarter")
            .otherwise("04_long"))
      val tot = gaps.agg(count(lit(1)).as("n_total"))
      gaps.groupBy("band")
        .agg(count(lit(1)).as("n_gaps"),
          round(sum(col("gap_days")).cast("double") / count(lit(1)), 6)
            .as("mean_gap_days"))
        .crossJoin(broadcast(tot))
        .select(col("band"), col("n_gaps"), col("mean_gap_days"),
          round(col("n_gaps").cast("double") / col("n_total"), 6)
            .as("share"))
        .orderBy("band")
    },

    // Laspeyres price index by month — realized unit prices (exact
    // decimal Σprice/Σqty per brand-month, rounded to a DECIMAL(18,6)
    // price) weighted by base-month quantities, so the index tracks pure
    // price movement with the basket frozen at the first month. The fact
    // table collapses to O(brands × months) in one exact-decimal keyed
    // agg; everything after is dim-sized (base-basket join + one keyed
    // decimal dot-product per month). Products stay in decimal until the
    // single final IEEE division.
    "price_index_monthly" -> { (s, d) =>
      val bm = t(s, d, "lineitem")
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          to_date(date_trunc("month", col("o_orderdate"))).as("month"))
        .agg(sum(money(col("l_extendedprice"))).as("sp"),
          sum(money(col("l_quantity"))).as("sq"))
        // up: DECIMAL(12,6) bounds unit price < 10^6; q: DECIMAL(18,2)
        // holds brand-month quantity sums to 10^16 — both chosen so the
        // up × q product stays inside precision 38 EXACTLY in both
        // engines (a wider operand would trip Spark's lossy
        // precision-reduction on multiply)
        .select(col("p_brand"), col("month"),
          expr("CAST(round(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE), 6)" +
            " AS DECIMAL(12,6))").as("up"),
          col("sq").cast("decimal(18,2)").as("sq"))
      val m0 = bm.agg(min(col("month")).as("m0"))
      val base = bm.crossJoin(broadcast(m0))
        .filter(col("month") === col("m0"))
        .select(col("p_brand"), col("up").as("up0"), col("sq").as("q0"))
      bm.join(broadcast(base), "p_brand")
        .groupBy("month")
        .agg(count(lit(1)).as("n_brands"),
          sum(expr("CAST(up * q0 AS DECIMAL(38,8))")).cast("double")
            .as("num"),
          sum(expr("CAST(up0 * q0 AS DECIMAL(38,8))")).cast("double")
            .as("den"))
        .select(col("month"), col("n_brands"),
          round(col("num") / col("den"), 6).as("price_index"))
        .orderBy("month")
    },

    // weekly activity grid: event volume by (weekday, hour) cell with
    // corpus share — the calendar heatmap behind capacity planning and
    // anomaly baselines (a spike off this grid is events_velocity's
    // per-user signal at fleet level). One keyed agg to ≤168 cells plus
    // a broadcast 1-row total.
    "events_calendar_profile" -> { (s, d) =>
      val cells = events(s, d)
        .groupBy(expr("weekday(ts)").cast("int").as("dow"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n_events"))
      val tot = cells.agg(sum(col("n_events")).as("n_total"))
      cells.crossJoin(broadcast(tot))
        .select(col("dow"), col("hr"), col("n_events"),
          round(col("n_events").cast("double") / col("n_total"), 6)
            .as("share"))
        .orderBy("dow", "hr")
    },

    // substitute-SKU candidates: part pairs interchangeable by catalog
    // attributes (same type + size, different brand) whose list prices
    // sit within 0.2% — the assortment-rationalization table. The pair
    // space is quadratic only WITHIN a (type, size) block of the
    // dim-sized parts table; the price band is evaluated entirely in
    // exact decimals so the cut is bit-identical across engines.
    "part_substitutes" -> { (s, d) =>
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"), money(col("p_retailprice")).as("price"))
      val a = p.select(col("p_partkey").as("pk_a"),
        col("p_brand").as("brand_a"), col("p_type"), col("p_size"),
        col("price").as("price_a"))
      val b = p.select(col("p_partkey").as("pk_b"),
        col("p_brand").as("brand_b"), col("p_type"), col("p_size"),
        col("price").as("price_b"))
      a.join(b, Seq("p_type", "p_size"))
        .filter(col("brand_a") =!= col("brand_b")
          && col("pk_a") < col("pk_b"))
        .filter(expr("abs(price_a - price_b)" +
          " <= CAST(0.002 AS DECIMAL(4,3)) * greatest(price_a, price_b)"))
        .select(col("pk_a"), col("pk_b"), col("p_type"), col("p_size"),
          col("price_a").cast("double").as("price_a"),
          col("price_b").cast("double").as("price_b"))
        .orderBy("pk_a", "pk_b")
    },

    // peak concurrency per day: the classic interval-stabbing sweep over
    // 30-min sessions (+1 at session start, -1 just past session end,
    // running sum, daily max) — the sizing number a capacity plan needs
    // that avg-sessions-per-day hides. O(2 × sessions) sweep points; the
    // global ordered cumsum runs over the SESSION-boundary table, not
    // events (at cluster scale: range-partition the sweep by time and
    // carry partition prefix sums). Daily max is order-invariant within
    // equal (t, delta) ties, and the sort key is totalized anyway.
    "events_concurrent_peak" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val sess = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("gap_break",
          when(col("ts").cast("long")
            - lag(col("ts"), 1).over(w).cast("long") > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("session_n",
          sum(col("gap_break")).over(w.rowsBetween(
            Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_n")
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      val pts = sess.select(col("user_id"), col("session_n"),
          col("st").as("t"), lit(1L).as("delta"))
        .unionAll(sess.select(col("user_id"), col("session_n"),
          expr("en + INTERVAL 1 SECOND").as("t"), lit(-1L).as("delta")))
      val sweep = Window
        .orderBy(col("t"), col("delta"), col("user_id"), col("session_n"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      pts.withColumn("cur", sum(col("delta")).over(sweep))
        .groupBy(to_date(col("t")).as("day"))
        .agg(max(col("cur")).as("peak_concurrent"))
        .orderBy("day")
    },

    // activity-concentration Gini over users (the bot/power-user skew
    // number; corpus_gini is the token-per-source sibling): exact
    // integer rank-weighted sum in decimal — computed from the (n, cnt)
    // HISTOGRAM, never a per-user rank. Within a tie group (equal n)
    // ranks offset+1..offset+cnt contribute n·(cnt·offset + cnt(cnt+1)/2)
    // whatever the user order, so the old O(users) single-partition
    // global window (VERDICT r7 #5's WindowExec funnel) collapses to one
    // window over O(#distinct per-user counts) rows — bounded by the max
    // activity count, not the user population, at any corpus size.
    "events_user_gini" -> { (s, d) =>
      val per = events(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
      val hist = per.groupBy("n").agg(count(lit(1)).as("cnt"))
      val wh = Window.orderBy("n")
      hist
        .withColumn("offset", coalesce(sum(col("cnt")).over(
          wh.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .agg(sum(col("cnt")).as("n_users"),
          sum(col("n") * col("cnt")).as("total_events"),
          sum(expr(
            """CAST(n AS DECIMAL(19,0)) * (
              |  CAST(cnt AS DECIMAL(19,0)) * CAST(offset AS DECIMAL(19,0))
              |  + CAST((cnt * (cnt + 1)) div 2 AS DECIMAL(19,0)))"""
              .stripMargin))
            .cast("double").as("iw"))
        .select(col("n_users"), col("total_events"),
          round((lit(2.0) * col("iw"))
            / (col("n_users").cast("double")
              * col("total_events").cast("double"))
            - (col("n_users") + 1L).cast("double")
              / col("n_users").cast("double"), 6).as("gini"))
    },

    // seasonal-naive forecast backtest: predict each (type, hour-cell)
    // from the SAME HOUR YESTERDAY and score MAPE + mean bias per type —
    // the baseline every real forecaster must beat (and the staleness
    // monitor when the model IS seasonal-naive). The corpus collapses to
    // hour cells first; the prediction is one self-equi-join on
    // (type, cell − 24 h) — no window over sparse cells, which would
    // silently compare non-adjacent hours. Per-cell errors are rounded
    // then decimal-summed.
    "events_forecast_baseline" -> { (s, d) =>
      val cells = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("cell"))
        .agg(count(lit(1)).as("n"))
      val pred = cells.select(col("event_type"),
        expr("cell + INTERVAL 24 HOURS").as("cell"), col("n").as("np"))
      cells.join(pred, Seq("event_type", "cell"))
        .select(col("event_type"),
          expr("CAST(round(abs(CAST(n - np AS DOUBLE)) / n, 9)" +
            " AS DECIMAL(20,9))").as("ape"),
          expr("CAST(round(CAST(np - n AS DOUBLE) / n, 9)" +
            " AS DECIMAL(20,9))").as("err"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_cells"),
          round(sum(col("ape")).cast("double") / count(lit(1)), 6)
            .as("mape"),
          round(sum(col("err")).cast("double") / count(lit(1)), 6)
            .as("mean_bias"))
        .orderBy("event_type")
    },

    // seasonally-adjusted anomaly ranking: each (event_type, hour-cell)'s
    // volume z-scored against that type's SAME-HOUR-OF-DAY baseline
    // (events_anomaly is the global per-type z; this removes the daily
    // cycle first, so a busy-but-normal 9am can't mask a quiet-hour
    // spike). Two keyed aggs — hour cells, then the O(types × 24)
    // baseline broadcast back — and a top-20 rank on the rounded score,
    // so the output is never threshold-vacuous.
    "events_anomaly_seasonal" -> { (s, d) =>
      val cells = events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("cell"))
        .agg(count(lit(1)).as("n"))
      val base = cells
        .groupBy(col("event_type").as("et"), hour(col("cell")).as("hr"))
        .agg(count(lit(1)).as("nc"),
          sum(col("n")).cast("double").as("sn"),
          sum(expr("CAST(n * n AS DECIMAL(38,0))")).cast("double")
            .as("snn"))
        .select(col("et"), col("hr"),
          (col("sn") / col("nc")).as("mu"),
          sqrt(greatest(lit(0d), col("snn") / col("nc")
            - (col("sn") / col("nc")) * (col("sn") / col("nc"))))
            .as("sd"))
        .filter(col("sd") > 0)
      cells.join(broadcast(base),
          col("event_type") === col("et")
            && hour(col("cell")) === col("hr"))
        .select(col("event_type"), col("cell"), col("n"),
          round((col("n").cast("double") - col("mu")) / col("sd"), 6)
            .as("z"))
        .orderBy(col("z").desc, col("event_type"), col("cell"))
        .limit(20)
    },

    // customer value-segment migration matrix: quarterly spend banded
    // LOW/MID/HIGH (fixed exact-decimal thresholds — no data-dependent
    // tercile ties), then consecutive-quarter transitions counted per
    // (from, to) cell with row-share. The lifecycle health table a CRM
    // reads (events_markov is the event-type sibling; this is business-
    // value state at calendar granularity). One exact-decimal keyed agg
    // to O(customers × quarters), one lag window, one O(9)-out agg.
    "customer_segment_migration" -> { (s, d) =>
      val q = t(s, d, "orders")
        .groupBy(col("o_custkey"),
          to_date(date_trunc("quarter", col("o_orderdate"))).as("qtr"))
        .agg(sum(money(col("o_totalprice"))).as("spend"))
        .withColumn("seg",
          when(col("spend") < 200000, "1_LOW")
            .when(col("spend") < 400000, "2_MID").otherwise("3_HIGH"))
      val w = Window.partitionBy("o_custkey").orderBy("qtr")
      val trans = q
        .withColumn("prev_seg", lag(col("seg"), 1).over(w))
        .withColumn("prev_qtr", lag(col("qtr"), 1).over(w))
        // only ADJACENT quarters count as a transition — a customer who
        // skips a quarter re-enters the matrix fresh
        .filter(col("prev_seg").isNotNull
          && col("qtr") === add_months(col("prev_qtr"), 3))
      trans.groupBy(col("prev_seg").as("seg_from"), col("seg").as("seg_to"))
        .agg(count(lit(1)).as("n_moves"))
        .withColumn("row_share",
          round(col("n_moves").cast("double")
            / sum(col("n_moves")).over(Window.partitionBy("seg_from")), 6))
        .orderBy("seg_from", "seg_to")
    },

    // market-basket association rules over order contents: support /
    // confidence / lift for brand pairs bought together (events_cooccur
    // is type-level per session; this is the true basket form with the
    // full rule metrics). The pair join runs AFTER a per-order distinct
    // on the ~25-value brand dimension, so the pair space is bounded by
    // (brands/order)² ≈ constant per order — linear in orders, the only
    // shape basket mining survives at 100 TB. Metrics are integer
    // counts through IEEE division, round(·,6), lift ties broken by
    // brand names.
    "basket_rules" -> { (s, d) =>
      // memoized: the pair generator AND the per-brand count read the
      // per-order brand-SET table. r13 (guide §2.3 "aggregate before you
      // shuffle" / §2.4): the former (okey, brand) DISTINCT + second
      // groupBy(okey) paid two corpus-sized exchanges; collect_set
      // dedups inside ONE partial-aggregable hash agg, so the corpus
      // crosses one exchange and brandN explodes the order-sized basket
      // table instead of rescanning the join (identical sets: sort_array
      // over the set == sort_array(collect_list) over the old distinct).
      val baskets = graft.plans.ScopedMemo(s, s"basket_baskets#$d")(
        t(s, d, "lineitem")
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
          .groupBy("okey")
          .agg(sort_array(collect_set(col("brand"))).as("bs")))
      val nOrders = t(s, d, "orders").agg(count(lit(1)).as("n_orders"))
      val brandN = baskets
        .select(explode(col("bs")).as("brand"))
        .groupBy("brand").agg(count(lit(1)).as("bn"))
      // pair enumeration stays IN-ROW: emit the (i < j) pairs from the
      // sorted per-order set with one codegen'd nested transform — the
      // okey SELF-JOIN this replaces re-exchanged both cached sides and
      // sort-merged them (measured 14.3 s vs 4.0 s cold at sf0.1 for
      // identical pair counts). Fan-out per order is (brands-per-order
      // choose 2), bounded by the brand dimension (25 fixture-wide), so
      // no per-key blowup exists at any corpus size — the market-basket
      // shape where the catalog is small and the fact table is the
      // 100 TB side.
      val pairs = baskets
        .select(explode(expr(
          """flatten(transform(bs, (x, i) ->
            |  transform(slice(bs, i + 2, size(bs)), y ->
            |    struct(x AS brand_a, y AS brand_b))))""".stripMargin))
          .as("p"))
        .select(col("p.brand_a"), col("p.brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(count(lit(1)).as("pair_n"))
      pairs
        .join(broadcast(brandN.select(col("brand").as("brand_a"),
          col("bn").as("n_a"))), "brand_a")
        .join(broadcast(brandN.select(col("brand").as("brand_b"),
          col("bn").as("n_b"))), "brand_b")
        .crossJoin(broadcast(nOrders))
        .filter(col("pair_n") >= 5)
        .select(col("brand_a"), col("brand_b"), col("pair_n"),
          round(col("pair_n").cast("double") / col("n_a"), 6)
            .as("confidence"),
          round((col("pair_n").cast("double") / col("n_a"))
            / (col("n_b").cast("double") / col("n_orders")), 6).as("lift"))
        .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
        .limit(50)
    },

    // DAU/WAU stickiness: per day, the daily actives and the trailing
    // 7-day actives, ratio = the engagement-stickiness KPI. The trailing
    // DISTINCT count never windows over users: each (user, day) activity
    // fans out to the ≤7 future days it keeps the user "weekly-active"
    // for (a bounded explode, the join_interval_binned discipline), then
    // one distinct + one keyed count. Linear with a 7× constant; at
    // 100 TB both aggregates shuffle (user, day) pairs, never events.
    "events_stickiness" -> { (s, d) =>
      val days = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = days
        .select(col("user_id"), explode(sequence(lit(0), lit(6)))
          .as("off"), col("day"))
        .select(col("user_id"), expr("date_add(day, off)").as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6)
            .as("stickiness"))
        .orderBy("day")
    },

    // growth accounting (the MAU-decomposition identity): every active
    // user-week is classified new / retained / resurrected from its
    // per-user lag, and churn posts to the FOLLOWING week when a user
    // goes absent — so week-over-week active counts reconcile exactly
    // (active_w = active_{w-1} + new + resurrected − churned). Two
    // per-user window passes over the distinct (user, week) grid + keyed
    // counts; the grid is |users|·|weeks| at worst, shuffled once on
    // user_id then once on week — linear in the event log either way.
    "events_growth_accounting" -> { (s, d) =>
      val uw = events(s, d)
        .select(col("user_id"),
          to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("wk")
      val classed = uw
        .withColumn("prev", lag(col("wk"), 1).over(w))
        .withColumn("nxt", lead(col("wk"), 1).over(w))
      val states = classed.groupBy("wk").agg(
        sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(datediff(col("wk"), col("prev")) === 7, 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("prev").isNotNull
          && datediff(col("wk"), col("prev")) > 7, 1L).otherwise(0L))
          .as("n_resurrected"))
      val churn = classed
        .filter(col("nxt").isNull || datediff(col("nxt"), col("wk")) > 7)
        .select(date_add(col("wk"), 7).as("wk"))
        .groupBy("wk").agg(count(lit(1)).as("n_churned"))
      states.join(churn, Seq("wk"), "full_outer")
        .select(col("wk"), coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .orderBy("wk")
    },

    // activity-concentration (Pareto) audit: how much of the event volume
    // the top 1% / top 10% of users carry, and the smallest user count
    // that covers half of all traffic. The companion to events_user_gini
    // (a scalar) when the question is "where do I cap / downsample power
    // users before training". Events collapse to O(users) counts, then to
    // the (n, cnt) HISTOGRAM — like events_user_gini, rank arithmetic
    // over a tie group (equal n) never needs user order: the top-k cutoff
    // takes min(cnt, k − users_before) members × n events from a group,
    // and the half-traffic rank is users_before + ⌈(half − events_before)
    // / n⌉ inside the first group whose cumulative reaches half. So the
    // only windows run over O(#distinct per-user counts) rows (bounded by
    // the max activity count, not the user population) instead of the
    // r7-flagged O(users) single-partition global rank. Cutoffs use
    // integer ceil-division (no float boundary), shares are exact counts
    // with one final rounded division.
    "events_power_pareto" -> { (s, d) =>
      val per = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
      val tot = per.agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_users"))
      val wh = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      per.groupBy("n").agg(count(lit(1)).as("cnt"))
        .withColumn("u_off", coalesce(sum(col("cnt")).over(wh), lit(0L)))
        .withColumn("e_off",
          coalesce(sum(col("n") * col("cnt")).over(wh), lit(0L)))
        .crossJoin(broadcast(tot))
        .agg(
          max(col("n_users")).as("n_users"),
          max(col("n_events")).as("n_events"),
          round(sum(expr("n * greatest(CAST(0 AS BIGINT)," +
              " least(cnt, (n_users + 99) div 100 - u_off))"))
              .cast("double") / max(col("n_events")), 6)
            .as("top1pct_share"),
          round(sum(expr("n * greatest(CAST(0 AS BIGINT)," +
              " least(cnt, (n_users + 9) div 10 - u_off))"))
              .cast("double") / max(col("n_events")), 6)
            .as("top10pct_share"),
          // exact ceil-division pick inside the unique group that crosses
          // half the traffic; BIGINT end-to-end (the DuckDB rank type)
          min(expr("CASE WHEN 2 * e_off < n_events" +
              " AND 2 * (e_off + n * cnt) >= n_events" +
              " THEN u_off + (n_events - 2 * e_off + 2 * n - 1)" +
              " div (2 * n) END"))
            .cast("long").as("pareto_k"))
    },

    // quantity uplift per discount level: the pricing-response curve
    // (avg basket quantity at each discount percent vs the no-discount
    // baseline). Output is O(#discount levels) — tiny at any SF; the
    // heavy part is one keyed aggregate over lineitem with map-side
    // combine. Discount levels are exact 2-decimal values, so the
    // percent bucket is a lossless decimal*100 cast, and averages are
    // exact decimal sums with one rounded division each.
    "discount_uplift" -> { (s, d) =>
      val per = t(s, d, "lineitem")
        .withColumn("disc_pct",
          (money(col("l_discount")) * 100).cast("int"))
        .groupBy("disc_pct")
        .agg(count(lit(1)).as("n_lines"),
          sum(money(col("l_quantity"))).as("sq"))
      val base = per.filter(col("disc_pct") === 0)
        .select(col("sq").as("sq0"), col("n_lines").as("n0"))
      per.crossJoin(broadcast(base))
        .select(col("disc_pct"), col("n_lines"),
          round(col("sq").cast("double") / col("n_lines"), 6).as("avg_qty"),
          round((col("sq").cast("double") / col("n_lines"))
            / (col("sq0").cast("double") / col("n0")), 6).as("qty_uplift"))
        .orderBy("disc_pct")
    },

    // per-nation trade balance: revenue flowing OUT of each nation's
    // suppliers (exports) vs revenue its customers spend (imports), and
    // the net. Two independent star aggregates over lineitem — each one
    // shuffle on its join key with partial aggregation — full-outer
    // merged on the 25-row nation dim (broadcast). Decimal-exact sums;
    // the subtraction happens on the already-rounded doubles, identically
    // ordered on both engines.
    "nation_trade_balance" -> { (s, d) =>
      val li = t(s, d, "lineitem")
      val exp = li
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("exports"))
      val imp = li
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("imports"))
      exp.join(imp, Seq("nationkey"), "full_outer")
        .join(broadcast(t(s, d, "nation")),
          col("nationkey") === col("n_nationkey"))
        .select(col("n_name"),
          round(coalesce(col("exports"), lit(0.0)), 2).as("exports"),
          round(coalesce(col("imports"), lit(0.0)), 2).as("imports"),
          round(coalesce(col("exports"), lit(0.0))
            - coalesce(col("imports"), lit(0.0)), 2).as("balance"))
        .orderBy("n_name")
    },

    // per-user ML feature assembly — the feature-store materialization
    // pass that turns the raw event log into one model-ready row per
    // user (recency/tenure/frequency/diversity/intensity/monetary) in a
    // SINGLE keyed aggregate. The point at scale: every feature here is
    // partial-aggregable, so the log is read once, combined map-side,
    // and shuffled once on user_id — adding a feature costs zero extra
    // passes (vs the one-query-per-feature antipattern). The corpus
    // anchor timestamp rides a 1-row broadcast. Monetary sums are exact
    // decimal; the two rate features are single rounded divisions.
    "user_feature_matrix" -> { (s, d) =>
      val ev = events(s, d)
      val anchor = ev.agg(max(col("ts")).as("corpus_max"))
      ev.crossJoin(broadcast(anchor))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(to_date(col("ts"))).as("active_days"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
          max(col("corpus_max")).as("cmax"),
          sum(money(col("value"))).as("sv"))
        .select(col("user_id"), col("n_events"), col("n_types"),
          col("active_days"),
          datediff(to_date(col("cmax")), to_date(col("last_ts")))
            .cast("long").as("recency_days"),
          datediff(to_date(col("last_ts")), to_date(col("first_ts")))
            .cast("long").as("tenure_days"),
          round(col("sv").cast("double") / col("n_events"), 6)
            .as("avg_value"),
          round(col("n_events").cast("double") / col("active_days"), 6)
            .as("events_per_active_day"))
        .orderBy("user_id")
    },

    // click→purchase conversion latency profiled by purchase hour: the
    // funnel-timing table (how long users deliberate, and whether
    // late-night conversions are slower). Reuses join_asof's single
    // backward window pass to find each purchase's preceding click —
    // still no range join — then 24 output rows. Percentiles are exact
    // (`percentile`, the agg_percentile precedent) over per-hour groups;
    // at 100 TB the swap is approx_percentile per the agg_approx_quantile
    // key — same plan shape, sketch instead of sort.
    "events_conversion_latency" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id")
        .orderBy(col("ts"), col("is_purchase"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      events(s, d)
        .withColumn("is_purchase",
          when(col("event_type") === "purchase", 1).otherwise(0))
        .withColumn("click_ts",
          when(col("event_type") === "click", col("ts")))
        .withColumn("last_click_ts",
          last("click_ts", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase"
          && col("last_click_ts").isNotNull)
        .select(hour(col("ts")).as("purchase_hour"),
          expr("(unix_micros(ts) - unix_micros(last_click_ts)) " +
            "div 1000000").as("gap_s"))
        .groupBy("purchase_hour")
        .agg(count(lit(1)).as("n_conversions"),
          round(expr("percentile(gap_s, 0.5)"), 4).as("p50_s"),
          round(expr("percentile(gap_s, 0.9)"), 4).as("p90_s"),
          round(sum(col("gap_s")).cast("double") / count(lit(1)), 6)
            .as("mean_s"))
        .orderBy("purchase_hour")
    },

    // interval-union coverage: overlapping 30-min activity intervals
    // merged into maximal spans per user (classic gaps-and-islands over
    // time — the "how long was the user actually present" measure that
    // summing session lengths double-counts). Two window passes per
    // user (running max-end, then span-id cumsum) — per-user bounded
    // partitions, no self-join, no interval explosion; the merge is the
    // textbook O(n log n) sweep expressed declaratively.
    "events_coverage_spans" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("start_s", expr("unix_micros(ts) div 1000000"))
        .withColumn("end_s", col("start_s") + 1800L)
        .withColumn("max_prev_end", max(col("end_s")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)))
        .withColumn("new_span",
          when(col("max_prev_end").isNull
            || col("start_s") > col("max_prev_end"), 1L).otherwise(0L))
        .withColumn("span_id", sum(col("new_span")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .groupBy("user_id", "span_id")
        .agg(min(col("start_s")).as("s0"), max(col("end_s")).as("s1"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(col("s1") - col("s0")).as("covered_s"),
          max(col("s1") - col("s0")).as("max_span_s"))
        .orderBy("user_id")
    },

    // supplier reliability ranking: mean order→ship delay per supplier,
    // ranked best-first among suppliers above a volume floor (the
    // minimum-sample guard that keeps one lucky line from topping the
    // board). One equi-join + keyed agg collapses to the dim-sized
    // supplier table before the single rank window; integer day sums
    // are exact, one rounded division per supplier.
    "supplier_delay_rank" -> { (s, d) =>
      val per = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n_lines"),
          sum(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))).cast("long")).as("sum_delay"))
        .filter(col("n_lines") >= 20)
        .withColumn("avg_delay_days",
          round(col("sum_delay").cast("double") / col("n_lines"), 6))
      per.withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("avg_delay_days"), col("l_suppkey"))).cast("long"))
        .filter(col("rnk") <= 25)
        .select(col("rnk"), col("l_suppkey"), col("n_lines"),
          col("avg_delay_days"))
        .orderBy("rnk")
    },

    // difference-in-differences on top of events_ab_lift's hash split:
    // the 2×2 (arm × pre/post) conversion grid and the DiD estimate
    // (post-pre delta in B minus the same delta in A) — the estimator
    // that survives a launch-day trend that contaminates a naive
    // post-only lift read. Same deterministic md5 arm assignment and
    // high-value-purchase conversion definition as events_ab_lift; rates
    // are per-period ACTIVE users (a user active in one period only
    // counts only there). Integer cells, four one-shot divisions, one
    // rounded combination.
    "events_ab_did" -> { (s, d) =>
      val split = to_timestamp(lit("2024-01-16 00:00:00"))
      val u = events(s, d)
        .withColumn("post", col("ts") >= split)
        .groupBy("user_id", "post")
        .agg(max(when(col("event_type") === "purchase"
            && col("value") >= 180, 1L).otherwise(0L)).as("conv"))
        .withColumn("in_b",
          substring(md5(col("user_id").cast("string")), 1, 1) >= "8")
      u.agg(
          sum(when(!col("in_b") && !col("post"), 1L).otherwise(0L))
            .as("n_a_pre"),
          sum(when(!col("in_b") && col("post"), 1L).otherwise(0L))
            .as("n_a_post"),
          sum(when(col("in_b") && !col("post"), 1L).otherwise(0L))
            .as("n_b_pre"),
          sum(when(col("in_b") && col("post"), 1L).otherwise(0L))
            .as("n_b_post"),
          sum(when(!col("in_b") && !col("post"), col("conv"))
            .otherwise(0L)).as("c_a_pre"),
          sum(when(!col("in_b") && col("post"), col("conv"))
            .otherwise(0L)).as("c_a_post"),
          sum(when(col("in_b") && !col("post"), col("conv"))
            .otherwise(0L)).as("c_b_pre"),
          sum(when(col("in_b") && col("post"), col("conv"))
            .otherwise(0L)).as("c_b_post"))
        .select(col("n_a_pre"), col("n_a_post"), col("n_b_pre"),
          col("n_b_post"),
          round(col("c_a_pre") / col("n_a_pre"), 6).as("rate_a_pre"),
          round(col("c_a_post") / col("n_a_post"), 6).as("rate_a_post"),
          round(col("c_b_pre") / col("n_b_pre"), 6).as("rate_b_pre"),
          round(col("c_b_post") / col("n_b_post"), 6).as("rate_b_post"),
          round((col("c_b_post") / col("n_b_post")
              - col("c_b_pre") / col("n_b_pre"))
            - (col("c_a_post") / col("n_a_post")
              - col("c_a_pre") / col("n_a_pre")), 6).as("did"))
    },

    // bot/automation scoring — the traffic-cleaning gate a training
    // pipeline runs before any behavioral signal is trusted: per user,
    // the burst ceiling (max events inside any rolling 60 s window, the
    // rate-limit signature) and sustained intensity (events per active
    // day), flagged against an absolute burst rule OR a corpus-relative
    // intensity rule (3× the mean — fixed thresholds go stale as traffic
    // grows; relative ones travel with the corpus). One RANGE window per
    // user on epoch seconds + one keyed agg; the corpus mean is a 1-row
    // broadcast. ALL users are emitted with their scores (the audit
    // table), not just the flagged tail.
    "events_bot_filter" -> { (s, d) =>
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts_s").rangeBetween(-59, 0)
      val per = events(s, d)
        .withColumn("ts_s", expr("unix_micros(ts) div 1000000"))
        .withColumn("in_burst", count(lit(1)).over(wr))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          max(col("in_burst")).as("burst_max"),
          countDistinct(to_date(col("ts"))).as("active_days"))
        .withColumn("epd",
          round(col("n_events").cast("double") / col("active_days"), 6))
      val mean = per.agg(
        round(sum(col("n_events")).cast("double")
          / sum(col("active_days")), 6).as("mean_epd"))
      per.crossJoin(broadcast(mean))
        .select(col("user_id"), col("n_events"), col("burst_max"),
          col("epd").as("events_per_active_day"), col("mean_epd"),
          (col("burst_max") >= 5
            || col("epd") > col("mean_epd") * 3).as("is_bot"))
        .orderBy("user_id")
    },

    // stationary distribution of the event-type Markov chain: three
    // unrolled power-iteration rounds π ← πP on events_markov's
    // transition matrix — "where does a user's session settle" (the
    // long-run type mix), the chain-level summary the per-edge matrix
    // doesn't give. The state space is O(#types), so after the one
    // corpus-scale lag+count pass EVERYTHING is broadcast-sized: each
    // round is a tiny broadcast join + keyed sum. π·P terms follow the
    // round-9 decimal contract so the per-state sums are order-free.
    "events_markov_stationary" -> { (s, d) =>
      val wDenom = org.apache.spark.sql.expressions.Window
        .partitionBy("prev")
      // normalization (unrounded here) stays per-key on top of the
      // shared pair-count memo; the window runs over the O(types²)
      // matrix, never the corpus (r14, guide §2.4)
      val pm = graft.plans.ScopedMemo(s, s"markov_stationary_pm#$d")(
        markovPairCounts(s, d)
          .withColumn("p",
            col("n").cast("double") / sum(col("n")).over(wDenom))
          .select("prev", "cur", "p"))
      val states = pm.select(col("prev").as("state")).distinct()
      val nStates = states.agg(count(lit(1)).as("t"))
      val pi0 = states.crossJoin(broadcast(nStates))
        .select(col("state"), (lit(1.0) / col("t")).as("pi"))
      val pi3 = (1 to 3).foldLeft(pi0) { (pi, _) =>
        pm.join(broadcast(pi), col("prev") === col("state"))
          .withColumn("term",
            expr("CAST(round(pi * p, 9) AS DECIMAL(20,9))"))
          .groupBy(col("cur"))
          .agg(sum(col("term")).cast("double").as("pi"))
          .select(col("cur").as("state"), col("pi"))
      }
      pi3.select(col("state"), round(col("pi"), 6).as("stationary_p"))
        .orderBy("state")
    },

    // retention half-life: pool the events_retention cohort grid into one
    // decay curve R(w) (only cohorts OLD enough to reach offset w count
    // in its denominator — the right-censoring correction naive pooling
    // gets wrong), then fit ln R(w) = a + b·w and report halflife
    // = −ln2/b. The curve is O(#week-offsets) rows before any float
    // touches it; the fit is the agg_regression five-moment discipline
    // on round-9 decimal terms.
    "events_retention_halflife" -> { (s, d) =>
      val e = events(s, d).select(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("wk"))
      val first = e.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      val grid = graft.plans.ScopedMemo(s, s"retention_halflife_grid#$d")(
        e.join(first, "user_id")
          .groupBy(col("cohort_week"),
            (datediff(col("wk"), col("cohort_week")) / 7).cast("long")
              .as("week_n"))
          .agg(countDistinct(col("user_id")).as("n_active")))
      val sizes = grid.filter(col("week_n") === 0)
        .select(col("cohort_week"), col("n_active").as("cohort_size"))
      val maxWk = e.agg(max(col("wk")).as("max_wk"))
      val curve = grid.filter(col("week_n") >= 1)
        .join(sizes, "cohort_week")
        .crossJoin(broadcast(maxWk))
        .filter((datediff(col("max_wk"), col("cohort_week")) / 7)
          .cast("long") >= col("week_n"))
        .groupBy("week_n")
        .agg(sum(col("n_active")).as("active"),
          sum(col("cohort_size")).as("eligible"))
        .withColumn("r", col("active").cast("double") / col("eligible"))
        .filter(col("r") > 0)
      val fit = curve
        .select(col("week_n"), col("r"),
          expr("CAST(week_n AS DECIMAL(19,0))").as("x"),
          expr("CAST(round(ln(r), 9) AS DECIMAL(20,9))").as("y"),
          expr("CAST(round(week_n * ln(r), 9) AS DECIMAL(20,9))").as("xy"),
          expr("CAST(week_n * week_n AS DECIMAL(19,0))").as("xx"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("xy")).cast("double").as("sxy"),
          sum(col("xx")).cast("double").as("sxx"))
      fit.select(col("n_points"),
          round((col("n_points").cast("double") * col("sxy")
              - col("sx") * col("sy"))
            / (col("n_points").cast("double") * col("sxx")
              - col("sx") * col("sx")), 6).as("slope"))
        .select(col("n_points"), col("slope"),
          when(col("slope") < 0,
            round(lit(-math.log(2.0)) / col("slope"), 4))
            .as("halflife_weeks"))
    },

    // lifecycle census as of corpus end: every user staged
    // active / cooling / lapsed / churned by elapsed-hour recency
    // windows (<6h / <12h / <24h / ≥24h — hour granularity because the
    // health split must move on the same clock the product does) — the
    // top-of-dashboard retention read. One per-user keyed agg, the
    // anchor broadcast, integer microsecond arithmetic, O(4) output.
    "events_lifecycle_stage" -> { (s, d) =>
      val ev = events(s, d)
      val anchor = ev.agg(max(col("ts")).as("ts_max"))
      val staged = ev.groupBy("user_id")
        .agg(max(col("ts")).as("last_ts"))
        .crossJoin(broadcast(anchor))
        .select(col("user_id"),
          expr("(unix_micros(ts_max) - unix_micros(last_ts)) " +
            "div 3600000000").as("rec_h"))
        .select(col("user_id"),
          when(col("rec_h") < 6, lit("active"))
            .when(col("rec_h") < 12, lit("cooling"))
            .when(col("rec_h") < 24, lit("lapsed"))
            .otherwise(lit("churned")).as("stage"))
      val tot = staged.agg(count(lit(1)).as("n_total"))
      staged.groupBy("stage").agg(count(lit(1)).as("n_users"))
        .crossJoin(broadcast(tot))
        .select(col("stage"), col("n_users"),
          round(col("n_users").cast("double") / col("n_total"), 6)
            .as("share"))
        .orderBy("stage")
    },

    // capacity load factor per event type: peak hourly volume over mean
    // hourly volume (how bursty is this traffic class → how much
    // headroom its consumers must reserve). Events collapse to
    // O(types × hours) cells in one keyed agg; peak/mean fold to one
    // row per type. Integer counts, one rounded division.
    "events_load_factor" -> { (s, d) =>
      events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(col("n")).as("n_events"),
          max(col("n")).as("peak_hourly"))
        .select(col("event_type"), col("n_hours"), col("n_events"),
          col("peak_hourly"),
          round(col("peak_hourly").cast("double")
            / (col("n_events").cast("double") / col("n_hours")), 4)
            .as("load_factor"))
        .orderBy("event_type")
    },

    // new-vs-returning traffic mix per day: the share of each day's
    // events from users first seen that day — the acquisition/retention
    // composition read. One per-user first-seen agg broadcast back as a
    // dim join (users ≪ events), then an O(#days) rollup.
    "events_new_vs_returning" -> { (s, d) =>
      val ev = events(s, d)
      val firstDay = ev.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("first_day"))
      ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .join(firstDay, "user_id")
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new_user_events"))
        .select(col("day"), col("n_events"), col("n_new_user_events"),
          round(col("n_new_user_events").cast("double")
            / col("n_events"), 6).as("new_share"))
        .orderBy("day")
    },

    // rolling 7-day active users: per observed day, DAU, trailing-7-day
    // WAU, and their ratio (the rolling stickiness read next to the
    // monthly events_stickiness). NO range join and NO per-day rescan:
    // the log collapses to distinct (user, day) once, then each pair
    // CONTRIBUTES itself to the 7 window-end days via a bounded explode
    // — linear ×7 rows through one hash aggregate, the shape that holds
    // at 10⁹ users where a days×events theta-join would not. Only days
    // observed in the log are emitted (a trailing window needs no rows
    // to exist to be well-defined on them, but the report keys on real
    // traffic days).
    "events_rolling_wau" -> { (s, d) =>
      val ud = events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"), explode(expr(
          "transform(sequence(0, 6), i -> date_add(day, i))")).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
        .orderBy("day")
    },

    // population-stability-index drift: per event type, PSI between the
    // value distribution of the first half-month (reference) and the
    // second (current) — the standard go/no-go drift gate a feature
    // pipeline runs before retraining (PSI < 0.1 stable, > 0.25 shifted).
    // Bins are FIXED log-width buckets floor(ln(max(value,0)+1)) capped
    // at 9 — the inner max pins any negative value to bin 0 BEFORE the
    // log (ADVICE r8: unclamped, a value ≤ -1 made ln null on Spark but
    // an error/NaN on DuckDB — a dropped-bin PSI deflation on one engine
    // and a hard failure on the other)
    // (data-independent, so the binning needs no quantile pass and two
    // runs over different windows stay comparable); the 10-cell grid per
    // type materializes missing bins as zeros, Laplace-smoothed by +0.5
    // so empty cells can't produce ln(0). Events collapse to O(types ×
    // 10) cells in one keyed agg; PSI terms follow the round-9 decimal
    // sum contract so partial-agg order can't move a score.
    "events_psi_drift" -> { (s, d) =>
      val cut = to_timestamp(lit("2024-01-16 00:00:00"))
      val ev = events(s, d)
        .select(col("event_type"), (col("ts") < cut).as("is_ref"),
          least(lit(9L),
            floor(log(greatest(col("value"), lit(0d)) + lit(1d)))).as("bin"))
      val cells = ev.groupBy("event_type", "bin")
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("cr"),
          sum(when(col("is_ref"), 0L).otherwise(1L)).as("cc"))
      val grid = ev.select("event_type").distinct()
        .select(col("event_type"),
          explode(sequence(lit(0L), lit(9L))).as("bin"))
      val tot = cells.groupBy("event_type")
        .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
      val pr = (col("cr").cast("double") + lit(0.5)) /
        (col("n_ref").cast("double") + lit(5.0))
      val pc = (col("cc").cast("double") + lit(0.5)) /
        (col("n_cur").cast("double") + lit(5.0))
      grid.join(cells, Seq("event_type", "bin"), "left")
        .na.fill(0L, Seq("cr", "cc"))
        .join(broadcast(tot), "event_type")
        .withColumn("term",
          round((pc - pr) * log(pc / pr), 9).cast("decimal(20,9)"))
        .groupBy("event_type", "n_ref", "n_cur")
        .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
        .select(col("event_type"), col("n_ref"), col("n_cur"), col("psi"))
        .orderBy("event_type")
    },

    // price dispersion per part type: spread and coefficient of
    // variation of list prices (the assortment-pricing health check —
    // a CV near zero means no price laddering). Dim-sized keyed agg;
    // exact-decimal moment sums, doubles only in the final CV formula.
    "part_price_dispersion" -> { (s, d) =>
      t(s, d, "part")
        .groupBy(col("p_type"))
        .agg(count(lit(1)).as("n_parts"),
          sum(money(col("p_retailprice"))).as("sp"),
          sum(expr("CAST(p_retailprice AS DECIMAL(18,2)) " +
            "* CAST(p_retailprice AS DECIMAL(18,2))")).as("spp"),
          round(min(col("p_retailprice")), 2).as("min_price"),
          round(max(col("p_retailprice")), 2).as("max_price"))
        .select(col("p_type"), col("n_parts"),
          round(col("sp").cast("double") / col("n_parts"), 6)
            .as("mean_price"),
          round(sqrt(greatest(lit(0d),
              col("spp").cast("double") / col("n_parts")
                - (col("sp").cast("double") / col("n_parts"))
                * (col("sp").cast("double") / col("n_parts"))))
            / (col("sp").cast("double") / col("n_parts")), 6).as("cv"),
          col("min_price"), col("max_price"))
        .orderBy("p_type")
    },

    // price elasticity of demand per brand: OLS slope of ln(quantity) on
    // ln(unit price) across the brand's line items — the log-log
    // regression whose slope IS the elasticity (−2 means a 1% price rise
    // drops volume 2%). Same one-pass sufficient-statistics discipline
    // as agg_regression, but the regressors are ln() doubles, so each is
    // rounded to the 1e-9 grid and carried as DECIMAL(12,9) (ln values
    // are single-digit magnitude) — products then land exactly in
    // DECIMAL(25,18) on both engines and the moment sums stay
    // order-independent; the finals are IEEE on already-exact inputs.
    "price_elasticity" -> { (s, d) =>
      val x = expr("CAST(round(ln(CAST(l_extendedprice AS DOUBLE) " +
        "/ CAST(l_quantity AS DOUBLE)), 9) AS DECIMAL(12,9))")
      val y = expr(
        "CAST(round(ln(CAST(l_quantity AS DOUBLE)), 9) AS DECIMAL(12,9))")
      val n = col("n").cast("double")
      val slope = (n * col("sxy") - col("sx") * col("sy")) /
        (n * col("sxx") - col("sx") * col("sx"))
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), x.as("x"), y.as("y"))
        .groupBy("brand")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          sum(col("x") * col("x")).cast("double").as("sxx"))
        .select(col("brand"), col("n"),
          round(slope, 6).as("elasticity"))
        .orderBy("brand")
    },

    // SRE error-budget ledger: daily error share vs a 25% SLO with the
    // period-to-date cumulative burn — the table a reliability review
    // reads top-down (daily burn says "bad day", cumulative burn says
    // "bad month"). Events collapse to O(#days) in one keyed agg before
    // the single calendar-bounded running window; integer counts, two
    // rounded divisions per row.
    "events_error_budget" -> { (s, d) =>
      val Slo = 0.25
      val wc = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_errors"))
        .withColumn("cum_errors", sum(col("n_errors")).over(wc))
        .withColumn("cum_total", sum(col("n_total")).over(wc))
        .select(col("day"), col("n_total"), col("n_errors"),
          round(col("n_errors").cast("double") / col("n_total"), 6)
            .as("err_rate"),
          round(col("n_errors").cast("double") / col("n_total") / Slo, 4)
            .as("burn"),
          round(col("cum_errors").cast("double") / col("cum_total") / Slo,
            4).as("cum_burn"))
        .orderBy("day")
    },

    // catalog assortment gaps: (brand, type, size) grid cells with NO
    // product — the merchandising coverage report (and the generated-dim
    // + anti-join shape: build the full combination grid from the three
    // distinct dims, subtract what exists). Everything is dim-sized; the
    // grid is bounded by #brands × #types × #sizes and every side
    // broadcasts at any scale.
    "part_assortment_gaps" -> { (s, d) =>
      val p = t(s, d, "part")
      val grid = p.select("p_brand").distinct()
        .crossJoin(p.select("p_type").distinct())
        .crossJoin(p.select("p_size").distinct())
      grid.join(p.select("p_brand", "p_type", "p_size").distinct(),
          Seq("p_brand", "p_type", "p_size"), "left_anti")
        .orderBy("p_brand", "p_type", "p_size")
    },

    // running drawdown of daily revenue: peak-to-date and the worst
    // peak-to-trough fall so far — the finance-style risk read on a
    // revenue series (a 40% drawdown means a 67% rally just to get
    // back). The corpus collapses to O(#days) in one exact-decimal
    // keyed agg BEFORE the two running windows (the trend_revenue
    // discipline: calendar-bounded windows only).
    "trend_revenue_drawdown" -> { (s, d) =>
      val wc = org.apache.spark.sql.expressions.Window.orderBy("day")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
        .withColumn("peak", max(col("revenue")).over(wc))
        .withColumn("drawdown",
          round((col("peak") - col("revenue")) / col("peak"), 6))
        .withColumn("max_drawdown", max(col("drawdown")).over(wc))
        // revenue/peak stay UNROUNDED: they are exact scale-4 decimal
        // sums cast to double, and round(x, 2) on a value ending .xx50
        // is the classic double-vs-decimal HALF_UP divergence (caught by
        // the oracle at 2400 rows where 25-row reports get lucky)
        .select(col("day"), col("revenue"), col("peak"), col("drawdown"),
          col("max_drawdown"))
        .orderBy("day")
    },

    // order-status mix by month (the backlog/fulfillment trend the
    // status columns exist for): per (month, status) counts, value, and
    // within-month share. One keyed agg to O(#months × 3) rows; the
    // share window runs over that rollup, never the orders.
    "orders_status_trend" -> { (s, d) =>
      val wm = org.apache.spark.sql.expressions.Window
        .partitionBy("month")
      t(s, d, "orders")
        .groupBy(to_date(date_trunc("month", col("o_orderdate")))
          .as("month"), col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("total_value"))
        .withColumn("share", round(col("n_orders").cast("double")
          / sum(col("n_orders")).over(wm), 6))
        .orderBy("month", "status")
    },

    // level-shift changepoint scan over the daily revenue series: for
    // every candidate split day (≥ 30 days each side) the gap between
    // the before-mean and the after-mean, top-5 by |gap| — the "did the
    // metric step?" screen a release/incident review runs before eyeing
    // charts (drawdown reads falls; this localizes WHERE the level
    // moved). The corpus collapses to O(#days) in one exact-decimal
    // keyed agg; prefix sums ride ONE running window and the series
    // total ONE unbounded frame over those rows — every candidate split
    // is then a pure per-row projection, so the scan is O(#days), not
    // O(#days²). Means divide exact decimals in IEEE double, rounded
    // before the |gap| ranking; ties break on day.
    "trend_changepoint" -> { (s, d) =>
      val W = org.apache.spark.sql.expressions.Window
      val wc = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
      val wall = W.orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
      val daily = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
      daily
        .withColumn("cum_n", count(lit(1)).over(wc))
        .withColumn("cum_s", sum(col("rev")).over(wc))
        .withColumn("tot_n", count(lit(1)).over(wall))
        .withColumn("tot_s", sum(col("rev")).over(wall))
        .filter(col("cum_n") >= 30 && col("tot_n") - col("cum_n") >= 30)
        .withColumn("mean_before",
          round(col("cum_s").cast("double") / col("cum_n"), 6))
        .withColumn("mean_after",
          round((col("tot_s") - col("cum_s")).cast("double")
            / (col("tot_n") - col("cum_n")), 6))
        .withColumn("shift",
          round(col("mean_after") - col("mean_before"), 6))
        .withColumn("rank", row_number().over(
          W.orderBy(abs(col("shift")).desc, col("day"))).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("rank"), col("day").as("split_day"),
          col("cum_n").as("n_before"),
          (col("tot_n") - col("cum_n")).as("n_after"),
          col("mean_before"), col("mean_after"), col("shift"))
        .orderBy("rank")
    },

    // Markov removal-effect attribution: the data-driven alternative to
    // first/last-touch credit — each channel's worth is how much the
    // 4-step conversion probability DROPS when paths through it die
    // (the removal-effect formulation practitioners run over
    // clickstream Markov chains). Transition matrix = events_markov's
    // rounded probabilities; start distribution = each user's first
    // event type; conversion = reaching absorbing 'purchase' within 4
    // transitions, unrolled as 4 joins. The corpus collapses in TWO
    // aggs (transitions, starts); everything after is O(types² ×
    // scenarios) ≤ ~125 rows, so the unrolled chain is free at any
    // scale and scenario fan-out rides one broadcast dim, not 5
    // separate plans. Every cross-row sum runs in exact decimal over
    // round(·,12) products — partial-agg order can't move a
    // probability by an ulp.
    "events_markov_attribution" -> { (s, d) =>
      import s.implicits._
      val wDenom = org.apache.spark.sql.expressions.Window
        .partitionBy("prev")
      val ev = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
      // transitions ride the shared pair-count memo (r14, guide §2.4 —
      // this key previously re-ran the corpus window pass two sibling
      // keys had already done); the round-6 normalization stays per-key
      // over the O(types²) matrix
      val trans = graft.plans.ScopedMemo(s, s"markov_attr_trans#$d")(
        markovPairCounts(s, d)
          .withColumn("p", round(col("n").cast("double")
            / sum(col("n")).over(wDenom), 6))
          .select("prev", "cur", "p"))
      // first event per user via min_by over the total order
      // (ts, event_id) — identical row to the old rn=1 window filter
      // (event_id makes the order total), but partial-aggregable: one
      // candidate per (user, partition) moves map-side instead of every
      // event through a user-partitioned sort (r14, guide §2.3)
      val starts = graft.plans.ScopedMemo(s, s"markov_attr_starts#$d")(
        ev.groupBy("user_id")
          .agg(expr("min_by(event_type, struct(ts, event_id))")
            .as("state"))
          .groupBy("state")
          .agg(count(lit(1)).as("n")))
      val startsP = starts
        .crossJoin(broadcast(starts.agg(sum(col("n")).as("tot"))))
        .select(col("state"),
          round(col("n").cast("double") / col("tot"), 6).as("sp"))
      val scenarios = broadcast(Seq(("base", ""), ("no_click", "click"),
        ("no_view", "view"), ("no_error", "error"),
        ("no_signup", "signup")).toDF("scenario", "removed"))
      val states = ev.select(col("event_type").as("state")).distinct()
      val grid = graft.plans.ScopedMemo(s, s"markov_attr_grid#$d")(
        states.crossJoin(scenarios)
          .filter(col("state") =!= col("removed")))
      val strans = graft.plans.ScopedMemo(s, s"markov_attr_strans#$d")(
        trans.crossJoin(scenarios)
          .filter(col("prev") =!= col("removed")
            && col("cur") =!= col("removed"))
          .select("scenario", "prev", "cur", "p"))
      val r0 = grid.select(col("scenario"), col("state"),
        when(col("state") === "purchase", 1d).otherwise(0d).as("r"))
      val r4 = (1 to 4).foldLeft(r0) { (r, _) =>
        val acc = strans
          .join(r.select(col("scenario"), col("state").as("cur"),
            col("r")), Seq("scenario", "cur"))
          .groupBy(col("scenario"), col("prev").as("state"))
          .agg(sum(expr("CAST(round(p * r, 12) AS DECIMAL(16,12))"))
            .cast("double").as("acc"))
        grid.join(acc, Seq("scenario", "state"), "left")
          .select(col("scenario"), col("state"),
            when(col("state") === "purchase", 1d)
              .otherwise(coalesce(col("acc"), lit(0d))).as("r"))
      }
      // (r14, measured and left alone: memoizing conv — 5 rows referenced
      // twice below — swapped the in-plan double execution of the tiny
      // 4-round chain for an extra eager job and measured no better
      // inside ambient noise, so the simpler lazy form stays)
      val conv = r4.join(startsP, "state")
        .groupBy("scenario")
        .agg(sum(expr("CAST(round(sp * r, 12) AS DECIMAL(16,12))"))
          .cast("double").as("conversion"))
      val base = conv.filter(col("scenario") === "base")
        .select(col("conversion").as("base_conv"))
      conv.crossJoin(broadcast(base))
        .select(col("scenario"), col("conversion"),
          round((col("base_conv") - col("conversion"))
            / col("base_conv"), 6).as("removal_effect"))
        .orderBy("scenario")
    },

    // CUPED variance reduction over the hash-split experiment: adjust
    // each user's post-period spend by their pre-period spend
    // (y' = y − θ(x − x̄), θ = cov(x,y)/var(x)) — the experimentation-
    // platform technique that cuts metric variance by ρ² (so required
    // sample sizes shrink) without moving the estimand, since
    // assignment ⊥ pre-period. The corpus collapses to ONE user table;
    // θ and the variance-reduction ratio come from five exact-decimal
    // moment sums — var(y') uses the closed form var(y) − cov²/var(x),
    // so no per-user double is ever re-aggregated — and per-arm
    // adjusted means run the same mirrored double formula over per-arm
    // decimal sums. Fully partial-aggregable, one shuffle on user_id.
    "events_uplift_cuped" -> { (s, d) =>
      val split = to_timestamp(lit("2024-01-16 00:00:00"))
      val u = graft.plans.ScopedMemo(s, s"cuped_user_xy#$d")(
        events(s, d).groupBy("user_id")
          .agg(
            coalesce(sum(when(col("ts") < split, money(col("value")))),
              lit(0).cast("decimal(18,2)")).cast("decimal(14,2)").as("x"),
            coalesce(sum(when(col("ts") >= split, money(col("value")))),
              lit(0).cast("decimal(18,2)")).cast("decimal(14,2)").as("y"))
          .withColumn("arm",
            when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
              "control").otherwise("treatment")))
      val g = broadcast(u.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
        sum(expr("y * y")).as("syy")))
      val arms = u.groupBy("arm")
        .agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      arms.crossJoin(g)
        .withColumn("covn",
          col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
        .withColumn("varxn",
          col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
        .withColumn("varyn",
          col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))
        .withColumn("theta", col("covn") / col("varxn"))
        .select(col("arm"), col("n_users"),
          round(col("sxa").cast("double") / col("n_users"), 6)
            .as("mean_pre"),
          round(col("sya").cast("double") / col("n_users"), 6)
            .as("mean_post"),
          round(col("sya").cast("double") / col("n_users")
            - col("theta") * (col("sxa").cast("double") / col("n_users")
              - col("sx").cast("double") / col("n")), 6)
            .as("mean_adjusted"),
          round(col("theta"), 6).as("theta"),
          round(col("covn") * col("covn")
            / (col("varxn") * col("varyn")), 6).as("var_reduction"))
        .orderBy("arm")
    },

    // a-priori sample-size planner: users per arm needed to detect an
    // MDE of {1, 2, 5, 10}% of the mean at α=0.05 / 80% power — the
    // "how long must this test run" table every experimentation review
    // starts from, n = 2σ²(z_{α/2}+z_β)²/δ². σ² comes from the same
    // exact-decimal per-user moment sums as CUPED (never re-aggregated
    // doubles); z quantiles are fixed literals (1.959964, 0.841621),
    // NOT a libm erf⁻¹ call (not correctly rounded, engine-divergent).
    // O(1) output from one corpus-collapsing agg.
    "events_sample_size_power" -> { (s, d) =>
      val u = events(s, d).groupBy("user_id")
        .agg(sum(money(col("value"))).cast("decimal(14,2)").as("y"))
      val g = u.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(expr("y * y")).as("syy"))
      val mdes = broadcast(g.sparkSession.range(1)
        .select(explode(lit(Array(1, 2, 5, 10))).as("mde_pct")))
      g.crossJoin(mdes)
        .withColumn("mean_y",
          col("sy").cast("double") / col("n").cast("double"))
        .withColumn("var_y",
          (col("n").cast("double") * col("syy").cast("double")
            - col("sy").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("n").cast("double")))
        .withColumn("delta",
          col("mde_pct").cast("double") / 100d * col("mean_y"))
        .select(col("mde_pct").cast("long").as("mde_pct"),
          round(col("mean_y"), 6).as("mean_metric"),
          round(col("delta"), 6).as("delta"),
          ceil(lit(2d) * col("var_y")
            * ((lit(1.959964d) + lit(0.841621d))
              * (lit(1.959964d) + lit(0.841621d)))
            / (col("delta") * col("delta"))).cast("long")
            .as("n_per_arm"))
        .orderBy("mde_pct")
    },

    // autocorrelation function of the hourly event-count series at the
    // lags an on-call reader actually checks (1‥3 h persistence, 6/12 h
    // sub-daily, 24 h daily cycle, 48 h, 168 h weekly) — the
    // periodicity detector behind seasonal-model choices and anomaly
    // baselines. The corpus collapses to O(#hours) integer counts; the
    // grid is ZERO-FILLED from a generated hour sequence (a missing
    // hour is c=0, not an absent pair — skipping gaps biases r upward),
    // every lag reuses the same cached series via one broadcast lag dim
    // + one shifted self-join, and all moment sums are exact integers —
    // doubles only in the final mirrored r_k formula.
    "events_autocorrelation" -> { (s, d) =>
      val hc = events(s, d)
        .groupBy((floor(unix_micros(col("ts")) / 3600000000L))
          .as("h"))
        .agg(count(lit(1)).as("ce"))
      val bounds = hc.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val series = graft.plans.ScopedMemo(s, s"autocorr_series#$d")(
        bounds
          .select(explode(sequence(col("h0"), col("h1"))).as("h"))
          .join(hc, Seq("h"), "left")
          .select(col("h"), coalesce(col("ce"), lit(0L)).as("c")))
      val g = broadcast(series.agg(count(lit(1)).as("n"),
        sum(col("c")).as("s1"), sum(expr("c * c")).as("s2")))
      val lags = broadcast(s.range(1)
        .select(explode(lit(Array(1, 2, 3, 6, 12, 24, 48, 168)))
          .as("k")))
      series.crossJoin(lags)
        .withColumn("h2", col("h") + col("k"))
        .join(series.select(col("h").as("h2"), col("c").as("c2")), "h2")
        .groupBy("k")
        .agg(count(lit(1)).as("m"), sum(expr("c * c2")).as("sxy"),
          sum(col("c")).as("sh"), sum(col("c2")).as("st"))
        .crossJoin(g)
        .withColumn("ybar",
          col("s1").cast("double") / col("n").cast("double"))
        .select(col("k").cast("long").as("lag_hours"), col("m")
            .as("n_pairs"),
          round((col("sxy").cast("double")
            - col("ybar") * (col("sh") + col("st")).cast("double")
            + col("m").cast("double") * col("ybar") * col("ybar"))
            / (col("s2").cast("double")
              - col("n").cast("double") * col("ybar") * col("ybar")),
            6).as("acf"))
        .orderBy("lag_hours")
    },

    // funnel conversion with Wilson 95% intervals — the uncertainty
    // the plain funnel hides (a 60% step on 20 users and on 20k users
    // read identically without the CI; decisions need the band).
    // Wilson is the right interval for proportions (the normal
    // approximation misbehaves near 0/1) and is deterministically
    // computable: integer reach counts from ONE user-collapse pass,
    // then pure IEEE arithmetic with the z literal and sqrt (correctly
    // rounded) — no erf, no libm divergence. Presence-based nested
    // reach (view ⊇ view∧click ⊇ view∧click∧purchase), the recruiting
    // funnel read.
    "events_funnel_significance" -> { (s, d) =>
      val u = events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("v"),
          max(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("c"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("p"))
      val counts = u.agg(
        sum(col("v")).as("n_view"),
        sum(when(col("v") === 1 && col("c") === 1, 1L).otherwise(0L))
          .as("n_click"),
        sum(when(col("v") === 1 && col("c") === 1 && col("p") === 1, 1L)
          .otherwise(0L)).as("n_purchase"))
      val z = lit(1.959964d)
      def wilson(k: org.apache.spark.sql.Column,
          n: org.apache.spark.sql.Column) = {
        val nd = n.cast("double")
        val p = k.cast("double") / nd
        val z2n = z * z / nd
        val center = (p + z * z / (lit(2d) * nd)) / (lit(1d) + z2n)
        val half = z * sqrt(p * (lit(1d) - p) / nd
          + z * z / (lit(4d) * nd * nd)) / (lit(1d) + z2n)
        (round(p, 6), round(center - half, 6), round(center + half, 6))
      }
      val (r1, lo1, hi1) = (wilson(col("n_click"), col("n_view")))
      val (r2, lo2, hi2) = (wilson(col("n_purchase"), col("n_click")))
      counts.select(
          struct(lit("1_view_to_click").as("step"),
            col("n_view").as("n_denom"), col("n_click").as("n_num"),
            r1.as("rate"), lo1.as("wilson_lo"), hi1.as("wilson_hi"))
            .as("a"),
          struct(lit("2_click_to_purchase").as("step"),
            col("n_click").as("n_denom"),
            col("n_purchase").as("n_num"),
            r2.as("rate"), lo2.as("wilson_lo"), hi2.as("wilson_hi"))
            .as("b"))
        .select(explode(array(col("a"), col("b"))).as("s"))
        .select(col("s.step").as("step"), col("s.n_denom"),
          col("s.n_num"), col("s.rate"), col("s.wilson_lo"),
          col("s.wilson_hi"))
        .orderBy("step")
    },

    // multi-window multi-burn-rate alerting (the SRE-workbook policy
    // that replaced single-threshold paging): an alert needs BOTH a
    // short window over budget (it is happening now) and a long window
    // over budget (it has been happening long enough to matter) —
    // 'page' on (1h AND 6h), 'ticket' on (6h AND 24h). Events collapse
    // to O(#hours) integer (err, total) cells on a ZERO-FILLED hour
    // grid (a silent hour is data, not a gap); the three burns ride
    // ROWS-frame integer sums over that grid and the policy is a pure
    // projection. Burn = err_rate / 0.25 SLO, the error_budget
    // constant.
    "events_error_burn_multiwindow" -> { (s, d) =>
      val hc = events(s, d)
        .groupBy((floor(unix_micros(col("ts")) / 3600000000L)).as("h"))
        .agg(count(lit(1)).as("tot"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("err"))
      val grid = hc.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"))).as("h"))
        .join(hc, Seq("h"), "left")
        .select(col("h"), coalesce(col("tot"), lit(0L)).as("tot"),
          coalesce(col("err"), lit(0L)).as("err"))
      def wf(n: Int) = Window.orderBy("h").rowsBetween(-(n - 1), 0)
      def burn(err: org.apache.spark.sql.Column,
          tot: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(tot > 0,
          err.cast("double") / tot.cast("double") / 0.25)
      grid
        .withColumn("b1", burn(sum(col("err")).over(wf(1)),
          sum(col("tot")).over(wf(1))))
        .withColumn("b6", burn(sum(col("err")).over(wf(6)),
          sum(col("tot")).over(wf(6))))
        .withColumn("b24", burn(sum(col("err")).over(wf(24)),
          sum(col("tot")).over(wf(24))))
        .select(col("h").as("hour_idx"), col("tot"), col("err"),
          round(col("b1"), 6).as("burn_1h"),
          round(col("b6"), 6).as("burn_6h"),
          round(col("b24"), 6).as("burn_24h"),
          when(col("b1") > 1.2 && col("b6") > 1.1, "page")
            .when(col("b6") > 1.1 && col("b24") > 1.05, "ticket")
            .otherwise("ok").as("alert"))
        .orderBy("hour_idx")
    },

    // next-event prediction eval — the Markov model's TEST set: fit the
    // argmax-next-type predictor on pre-split transitions (the
    // sample_time_stratified discipline: fit and eval never share a
    // row), score top-1 accuracy on post-split transitions per
    // predicting state. This is the eval loop every sequence model
    // ships with, in miniature: the corpus collapses to transition
    // pairs in one per-user window pass, the fitted table is
    // O(types) and broadcasts, accuracy is integer counting.
    "events_next_event_eval" -> { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val split = to_timestamp(lit("2024-01-16 00:00:00"))
      val seq = events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("next", lead("event_type", 1).over(w))
        .filter(col("next").isNotNull)
      val fit = seq.filter(col("ts") < split)
        .groupBy(col("event_type").as("prev"), col("next"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("prev")
        .agg(expr("min_by(next, struct(-cnt, next))").as("predicted"))
      seq.filter(col("ts") >= split)
        .join(broadcast(fit), col("event_type") === col("prev"))
        .groupBy("prev", "predicted")
        .agg(count(lit(1)).as("n_eval"),
          sum(when(col("next") === col("predicted"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("prev"), col("predicted"), col("n_eval"),
          col("n_correct"),
          round(col("n_correct").cast("double") / col("n_eval"), 6)
            .as("accuracy"))
        .orderBy("prev")
    },

    // per-feature relevance screen: mutual information (bits) between
    // "user did event type t" and "user converted" — the model-free
    // feature ranking a training pipeline runs before spending GPU time
    // on low-signal columns (correlation misses non-linear relations;
    // MI doesn't). One user-collapse pass; the 2×2 contingency counts
    // per type are exact integers and the only doubles are the final
    // p·log₂ terms (log2 parity with DuckDB is pinned by the
    // text_entropy precedent), zero cells contributing zero by guard.
    "events_feature_mi" -> { (s, d) =>
      val u = graft.plans.ScopedMemo(s, s"feature_mi_users#$d")(
        events(s, d).groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase"
              && col("value") >= 180, 1L).otherwise(0L)).as("conv"),
            collect_set(col("event_type")).as("types")))
      val n = broadcast(u.agg(count(lit(1)).as("n"),
        sum(col("conv")).as("n_conv")))
      val cells = u
        .select(col("conv"), explode(lit(Array("click", "view",
          "signup", "error"))).as("t"),
          col("types"))
        .withColumn("has", array_contains(col("types"), col("t")))
        .groupBy("t")
        .agg(sum(when(col("has") && col("conv") === 1, 1L)
          .otherwise(0L)).as("a"),
          sum(when(col("has") && col("conv") === 0, 1L).otherwise(0L))
            .as("b"),
          sum(when(!col("has") && col("conv") === 1, 1L).otherwise(0L))
            .as("c"),
          sum(when(!col("has") && col("conv") === 0, 1L).otherwise(0L))
            .as("d"))
      def term(cell: org.apache.spark.sql.Column,
          px: org.apache.spark.sql.Column,
          py: org.apache.spark.sql.Column,
          nn: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(cell > 0,
          cell.cast("double") / nn
            * log2(cell.cast("double") * nn / (px * py)))
          .otherwise(lit(0d))
      cells.crossJoin(n)
        .withColumn("nd", col("n").cast("double"))
        .withColumn("mi",
          term(col("a"), (col("a") + col("b")).cast("double"),
            (col("a") + col("c")).cast("double"), col("nd"))
            + term(col("b"), (col("a") + col("b")).cast("double"),
              (col("b") + col("d")).cast("double"), col("nd"))
            + term(col("c"), (col("c") + col("d")).cast("double"),
              (col("a") + col("c")).cast("double"), col("nd"))
            + term(col("d"), (col("c") + col("d")).cast("double"),
              (col("b") + col("d")).cast("double"), col("nd")))
        .select(col("t").as("event_type"),
          (col("a") + col("b")).as("n_users_with"),
          round(col("mi"), 6).as("mi_bits"),
          round((col("a").cast("double") / (col("a") + col("b")))
            / (col("n_conv").cast("double") / col("n")), 6)
            .as("conversion_lift"))
        .orderBy("event_type")
    },

    // CR4 concentration per part type — the antitrust/sourcing-risk
    // ratio regulators and procurement both quote (supplier_hhi is the
    // squared-share integral; CR4 is the "top four own X%" headline):
    // top-4 supplier revenue share within each type. One exact-decimal
    // (type, supplier) agg; the top-4 cut ships through the bounded-
    // heap operator and the type totals come from ONE more rollup of
    // the same tiny matrix — the fact table is read once.
    "supplier_cr4" -> { (s, d) =>
      val bySupp = graft.plans.ScopedMemo(s, s"cr4_by_supp#$d")(
        t(s, d, "lineitem")
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"), col("l_suppkey"))
          .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
            .as("rev")))
      val tot = bySupp.groupBy("p_type")
        .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_suppliers"))
      graft.plans.TopKPerKey.topK(bySupp, Seq(col("p_type")),
          Seq(col("rev").desc, col("l_suppkey")), 4)
        .groupBy("p_type")
        .agg(sum(col("rev")).as("top4"), count(lit(1)).as("n_top"))
        .join(tot, "p_type")
        .select(col("p_type"), col("n_suppliers"),
          round(col("top4").cast("double") / col("tot").cast("double"),
            6).as("cr4"))
        .orderBy("p_type")
    },

    // price-volume bridge (the FP&A "why did revenue move" waterfall):
    // per part type, the 1997→1998 revenue delta decomposed into a
    // price effect ((p₂−p₁)·q₂, priced at new volume) and a volume
    // effect ((q₂−q₁)·p₁, at old price) — an EXACT identity
    // (ΔR = p₂q₂ − p₁q₁), so the two effects reconcile to the delta to
    // the last cent and the spec pins it. One keyed (type, year) agg
    // with exact-decimal revenue/quantity sums; average prices and
    // effects are the final mirrored double divisions over that tiny
    // matrix.
    "trend_price_volume_bridge" -> { (s, d) =>
      val byYear = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .withColumn("yr", year(col("o_orderdate")))
        .filter(col("yr").isin(1997, 1998))
        .groupBy(col("p_type"), col("yr"))
        .agg(sum(discPrice(col("l_extendedprice"), col("l_discount")))
          .cast("double").as("rev"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val y1 = byYear.filter(col("yr") === 1997)
        .select(col("p_type"), col("rev").as("rev1"),
          col("qty").as("qty1"))
      val y2 = byYear.filter(col("yr") === 1998)
        .select(col("p_type"), col("rev").as("rev2"),
          col("qty").as("qty2"))
      y1.join(y2, "p_type")
        .withColumn("p1", col("rev1") / col("qty1").cast("double"))
        .withColumn("p2", col("rev2") / col("qty2").cast("double"))
        // UNROUNDED: rev deltas sit at exact scale-4 cent values where
        // round(x, 2) is the double-vs-decimal HALF_UP tie (the
        // trend_revenue_drawdown lesson); raw IEEE values are identical
        // bits on both engines
        .select(col("p_type"),
          col("rev1").as("rev_1997"),
          col("rev2").as("rev_1998"),
          (col("rev2") - col("rev1")).as("delta"),
          ((col("p2") - col("p1")) * col("qty2").cast("double"))
            .as("price_effect"),
          ((col("qty2") - col("qty1")).cast("double") * col("p1"))
            .as("volume_effect"))
        .orderBy("p_type")
    }
  )

  def oracle: Map[String, String] = Map(
    // Q7 widened to the full matrix; dims joined the same way
    "nation_flow_matrix" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  ${sql.moneyVol} AS volume
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // 12-row month rollup; baseline = total/12, one division
    "orders_seasonal_index" ->
      """WITH m AS (
        |  SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT)
        |      AS month,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(rev) AS DECIMAL(19,2)) AS rtot FROM m)
        |SELECT month, n_orders, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) * 12 / CAST(rtot AS DOUBLE), 6)
        |    AS seasonal_index
        |FROM m CROSS JOIN t ORDER BY month""".stripMargin,

    // same per-user index + gap-bounded self-join; confidence over
    // antecedent users
    "events_seq_pairs_gap" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS i
        |  FROM events),
        |pairs AS (
        |  SELECT a.event_type AS ev_a, b.event_type AS ev_b,
        |    CAST(count(*) AS BIGINT) AS n_occur,
        |    CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
        |  FROM seq a JOIN seq b ON a.user_id = b.user_id
        |    AND b.i > a.i AND b.i <= a.i + 3
        |  GROUP BY 1, 2),
        |au AS (
        |  SELECT event_type AS ev_a,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_a
        |  FROM seq GROUP BY 1)
        |SELECT p.ev_a, p.ev_b, p.n_occur, p.n_users,
        |  round(CAST(p.n_users AS DOUBLE)
        |    / CAST(au.n_users_a AS DOUBLE), 6) AS confidence
        |FROM pairs p JOIN au ON p.ev_a = au.ev_a
        |ORDER BY p.ev_a, p.ev_b""".stripMargin,

    // zero-filled per-type hourly grid; exclusive trailing-24h frame;
    // exact-integer 2x test; gaps-and-islands episode collapse
    "events_burst_states" ->
      """WITH hc AS (
        |  SELECT event_type,
        |    CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
        |    CAST(count(*) AS BIGINT) AS ce
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
        |grid AS (
        |  SELECT ty.event_type, gs.h,
        |    COALESCE(hc.ce, CAST(0 AS BIGINT)) AS c
        |  FROM (SELECT DISTINCT event_type FROM hc) ty
        |  CROSS JOIN (SELECT unnest(generate_series(h0, h1)) AS h
        |              FROM bounds) gs
        |  LEFT JOIN hc ON hc.event_type = ty.event_type
        |    AND hc.h = gs.h),
        |m AS (
        |  SELECT event_type, h, c,
        |    count(*) OVER w AS n24, sum(c) OVER w AS s24
        |  FROM grid
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |b AS (
        |  SELECT event_type, h, c,
        |    h - row_number() OVER (PARTITION BY event_type
        |      ORDER BY h) AS grp
        |  FROM m WHERE n24 = 24 AND c * 12 > s24)
        |SELECT event_type,
        |  min(h) AS h_start, max(h) AS h_end,
        |  CAST(count(*) AS BIGINT) AS dur_hours,
        |  max(c) AS peak_rate, CAST(sum(c) AS BIGINT) AS n_events
        |FROM b GROUP BY event_type, grp
        |ORDER BY event_type, h_start""".stripMargin,
    // recency floor-divides non-negative day deltas (Spark's double->long
    // cast truncates; DuckDB mirrors with explicit floor)
    "events_rfm" ->
      s"""WITH u AS (
         |  SELECT user_id, max(ts) AS last_ts, count(*) AS frequency,
         |    ${sql.moneySum("value")} AS monetary
         |  FROM events GROUP BY 1),
         |n AS (SELECT max(ts) AS now FROM events),
         |r AS (
         |  SELECT user_id,
         |    CAST(floor((epoch_us(now) - epoch_us(last_ts))
         |      / 86400000000) AS BIGINT) AS recency_days,
         |    frequency, monetary
         |  FROM u CROSS JOIN n),
         |sc AS (
         |  SELECT *,
         |    CASE WHEN recency_days <= 7 THEN 3
         |         WHEN recency_days <= 30 THEN 2 ELSE 1 END AS r_score,
         |    CASE WHEN frequency >= 50 THEN 3
         |         WHEN frequency >= 10 THEN 2 ELSE 1 END AS f_score,
         |    CASE WHEN monetary >= 2000 THEN 3
         |         WHEN monetary >= 500 THEN 2 ELSE 1 END AS m_score
         |  FROM r)
         |SELECT user_id, recency_days, frequency, monetary,
         |  CAST(r_score AS BIGINT) AS r_score,
         |  CAST(f_score AS BIGINT) AS f_score,
         |  CAST(m_score AS BIGINT) AS m_score,
         |  CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         |    || CAST(m_score AS VARCHAR) AS segment
         |FROM sc ORDER BY user_id""".stripMargin,
    // the frame excludes the current row, so a touch sharing the
    // purchase's exact ts still attributes only if it sorts earlier on
    // (ts, event_id) — both engines use the identical order + frame
    "events_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN event_type IN ('click', 'view')
        |         THEN event_id END AS t_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN ts END AS t_ts,
        |    CASE WHEN event_type IN ('click', 'view')
        |         THEN event_type END AS t_ty
        |  FROM events),
        |a AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(t_id IGNORE NULLS) OVER w AS touch_id,
        |    last_value(t_ts IGNORE NULLS) OVER w AS touch_ts,
        |    last_value(t_ty IGNORE NULLS) OVER w AS touch_type
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts, touch_id, touch_type,
        |  epoch_us(ts) - epoch_us(touch_ts) AS gap_us
        |FROM a WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "events_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |sp AS (
        |  SELECT user_id, CAST(unnest(generate_series(
        |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
        |    INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT user_id, min(CAST(ts AS DATE)) AS d0,
        |          max(CAST(ts AS DATE)) AS d1
        |        FROM events GROUP BY 1))
        |SELECT sp.user_id, sp.day,
        |  CAST(coalesce(d.n_events, 0) AS BIGINT) AS n_events
        |FROM sp LEFT JOIN daily d
        |  ON sp.user_id = d.user_id AND sp.day = d.day
        |ORDER BY 1, 2""".stripMargin,
    // integer / integer is float division in both engines; the z-score
    // expression tree mirrors term-for-term so IEEE evaluation matches
    // dominance over exact decimals/longs, mirrored as NOT EXISTS
    "customer_pareto_front" ->
      """WITH pts AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS spend,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY o_custkey)
        |SELECT p.custkey, CAST(p.spend AS DOUBLE) AS spend, p.n_orders
        |FROM pts p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts q
        |  WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
        |    AND (q.spend > p.spend OR q.n_orders > p.n_orders))
        |ORDER BY custkey""".stripMargin,

    // same closed-formula mirroring as events_ab_lift: exact (n, k) ints,
    // then the identical IEEE expression text on both engines
    "events_rate_wilson" ->
      """WITH c AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN value >= 180 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS k
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n, k,
        |  round(k / n, 6) AS rate,
        |  round((k / n + (1.96 * 1.96) / (2.0 * n)
        |      - 1.96 * sqrt((k / n) * (1.0 - k / n) / n
        |        + (1.96 * 1.96) / (4.0 * n * n)))
        |    / (1.0 + (1.96 * 1.96) / n), 6) AS wilson_lb
        |FROM c ORDER BY event_type""".stripMargin,

    "events_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 180
        |      THEN 1 ELSE 0 END) AS converted,
        |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS in_a
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(sum(CASE WHEN in_a THEN converted ELSE 0 END) AS BIGINT)
        |      AS conv_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN converted ELSE 0 END)
        |      AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  round(conv_a / n_a, 6) AS rate_a,
        |  round(conv_b / n_b, 6) AS rate_b,
        |  round(conv_b / n_b - conv_a / n_a, 6) AS abs_lift,
        |  round((conv_b / n_b - conv_a / n_a)
        |    / sqrt(((conv_a + conv_b) / (n_a + n_b))
        |      * (1.0 - (conv_a + conv_b) / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
        |FROM c""".stripMargin,
    // same six exact moments, same closed IEEE formulas over them
    "events_ab_welch" ->
      """WITH u AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value, 2) AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS x,
        |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS in_a
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    sum(CASE WHEN in_a THEN x END) AS sx_a,
        |    sum(CASE WHEN NOT in_a THEN x END) AS sx_b,
        |    sum(CASE WHEN in_a THEN x * x END) AS sxx_a,
        |    sum(CASE WHEN NOT in_a THEN x * x END) AS sxx_b
        |  FROM u),
        |f AS (
        |  SELECT n_a, n_b,
        |    CAST(sx_a AS DOUBLE) / n_a AS mean_a,
        |    CAST(sx_b AS DOUBLE) / n_b AS mean_b,
        |    (CAST(sxx_a AS DOUBLE)
        |      - CAST(sx_a AS DOUBLE) * CAST(sx_a AS DOUBLE) / n_a)
        |      / (n_a - 1) AS var_a,
        |    (CAST(sxx_b AS DOUBLE)
        |      - CAST(sx_b AS DOUBLE) * CAST(sx_b AS DOUBLE) / n_b)
        |      / (n_b - 1) AS var_b
        |  FROM c),
        |g AS (SELECT *, var_a / n_a + var_b / n_b AS se2 FROM f)
        |SELECT n_a, n_b,
        |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        |  round((mean_b - mean_a) / sqrt(se2), 6) AS t_welch,
        |  round(se2 * se2
        |    / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
        |      + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6)
        |    AS df_welch
        |FROM g""".stripMargin,
    // exact-integer sup gap (|ca·nb − cb·na| over the pooled histogram),
    // then the identical fixed-order D/z/p IEEE formulas on both engines
    "stats_ks_test" ->
      """WITH h AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS nb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY value),
        |c AS (
        |  SELECT sum(na) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
        |    sum(nb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb
        |  FROM h),
        |tt AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM h),
        |g AS (
        |  SELECT CAST(max(ta) AS BIGINT) AS n_a,
        |    CAST(max(tb) AS BIGINT) AS n_b,
        |    max(abs(CAST(ca AS DECIMAL(18,0)) * CAST(tb AS DECIMAL(18,0))
        |      - CAST(cb AS DECIMAL(18,0)) * CAST(ta AS DECIMAL(18,0))))
        |      AS gap
        |  FROM c CROSS JOIN tt),
        |f AS (SELECT n_a, n_b,
        |    CAST(gap AS DOUBLE) / (CAST(n_a AS DOUBLE) * n_b) AS d_stat,
        |    CAST(n_a AS DOUBLE) * n_b / (n_a + n_b) AS m
        |  FROM g)
        |SELECT n_a, n_b, round(d_stat, 6) AS d_stat,
        |  round(d_stat * sqrt(m), 6) AS ks_z,
        |  round(least(1.0, 2 * exp(-2 * m * d_stat * d_stat)), 6)
        |    AS p_approx
        |FROM f""".stripMargin,
    // average ranks as exact integers over the pooled histogram
    // (2·rank = 2·cum_before + n + 1), exact-decimal rank sums and tie
    // term, then the identical closed U/z formulas on both engines
    "stats_mann_whitney" ->
      """WITH h AS (
        |  SELECT value,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS na,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      + sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS n
        |  FROM events WHERE event_type IN ('purchase', 'click')
        |  GROUP BY value),
        |c AS (
        |  SELECT na, nb, n,
        |    COALESCE(sum(n) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before
        |  FROM h),
        |g AS (
        |  SELECT CAST(sum(na) AS BIGINT) AS n_a,
        |    CAST(sum(nb) AS BIGINT) AS n_b,
        |    sum(CAST(na AS DECIMAL(15,0))
        |      * CAST(2 * cum_before + n + 1 AS DECIMAL(19,0))) AS r2a,
        |    sum(CAST(n AS DECIMAL(12,0)) * CAST(n AS DECIMAL(12,0))
        |        * CAST(n AS DECIMAL(12,0))
        |      - CAST(n AS DECIMAL(12,0))) AS ties
        |  FROM c),
        |f AS (
        |  SELECT n_a, n_b,
        |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE) * (n_a + 1)) / 2
        |      AS u_stat,
        |    CAST(n_a AS DOUBLE) + n_b AS nn, ties
        |  FROM g),
        |s AS (
        |  SELECT n_a, n_b, u_stat,
        |    CAST(n_a AS DOUBLE) * n_b / 12
        |      * ((nn + 1) - CAST(ties AS DOUBLE) / (nn * (nn - 1)))
        |      AS sigma2
        |  FROM f)
        |SELECT n_a, n_b, u_stat,
        |  round((u_stat - CAST(n_a AS DOUBLE) * n_b / 2)
        |    / sqrt(sigma2), 6) AS z_score
        |FROM s""".stripMargin,
    // same per-cell 1e-6-grid rounding + exact-decimal accumulation as
    // the Spark side, so the 2-D sum order cannot matter on either engine
    "stats_chi2_independence" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |rm AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY 1),
        |cm AS (SELECT source, sum(o) AS ct FROM cells GROUP BY 1),
        |t AS (
        |  SELECT sum(o) AS n, count(DISTINCT lang) AS r,
        |    count(DISTINCT source) AS c
        |  FROM cells),
        |j AS (
        |  SELECT cells.o, t.n, t.r, t.c,
        |    CAST(rm.rt AS DOUBLE) * cm.ct / t.n AS e
        |  FROM cells JOIN rm USING (lang) JOIN cm USING (source)
        |  CROSS JOIN t),
        |a AS (
        |  SELECT CAST(max(n) AS BIGINT) AS n,
        |    CAST(max(r) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS n_cols,
        |    sum(CAST(round((o - e) * (o - e) / e, 6) AS DECIMAL(18,6)))
        |      AS chi2_acc
        |  FROM j)
        |SELECT n, n_rows, n_cols,
        |  (n_rows - 1) * (n_cols - 1) AS dof,
        |  CAST(chi2_acc AS DOUBLE) AS chi2,
        |  round(sqrt(CAST(chi2_acc AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * least(n_rows - 1, n_cols - 1))), 6)
        |    AS cramers_v
        |FROM a""".stripMargin,
    // same per-group 1e-6-grid rounding + decimal accumulation of the
    // SSB/SSW terms, closed F / eta-squared finals mirrored textually
    "stats_anova_oneway" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(value AS DECIMAL(18,2))
        |      * CAST(value AS DECIMAL(18,2))) AS syy
        |  FROM events GROUP BY 1),
        |g AS (SELECT sum(n) AS nn, sum(sy) AS gsy, count(*) AS k FROM m),
        |j AS (
        |  SELECT m.n, m.sy, m.syy, g.nn, g.k,
        |    CAST(g.gsy AS DOUBLE) / g.nn AS gmean,
        |    CAST(m.sy AS DOUBLE) / m.n AS mean
        |  FROM m CROSS JOIN g),
        |a AS (
        |  SELECT CAST(max(k) AS BIGINT) AS k,
        |    CAST(max(nn) AS BIGINT) AS n,
        |    sum(CAST(round(n * (mean - gmean) * (mean - gmean), 6)
        |      AS DECIMAL(24,6))) AS ssb_acc,
        |    sum(CAST(round(CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n, 6)
        |      AS DECIMAL(24,6))) AS ssw_acc
        |  FROM j)
        |SELECT k, n, CAST(ssb_acc AS DOUBLE) AS ss_between,
        |  CAST(ssw_acc AS DOUBLE) AS ss_within,
        |  round((CAST(ssb_acc AS DOUBLE) / (k - 1))
        |    / (CAST(ssw_acc AS DOUBLE) / (n - k)), 6) AS f_stat,
        |  round(CAST(ssb_acc AS DOUBLE)
        |    / (CAST(ssb_acc AS DOUBLE) + CAST(ssw_acc AS DOUBLE)), 6)
        |    AS eta_sq
        |FROM a""".stripMargin,
    // same two-pass shape: per-group means, 1e-6-rounded |deviations|,
    // then the anova accumulation verbatim on z
    "stats_levene" ->
      """WITH b AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS y
        |  FROM events),
        |mn AS (
        |  SELECT event_type, CAST(sum(y) AS DOUBLE) / count(*) AS mean
        |  FROM b GROUP BY 1),
        |z AS (
        |  SELECT b.event_type,
        |    CAST(round(abs(CAST(b.y AS DOUBLE) - mn.mean), 6)
        |      AS DECIMAL(18,6)) AS z
        |  FROM b JOIN mn ON mn.event_type = b.event_type),
        |m AS (
        |  SELECT event_type, count(*) AS n, sum(z) AS sz,
        |    sum(z * z) AS szz
        |  FROM z GROUP BY 1),
        |g AS (SELECT sum(n) AS nn, sum(sz) AS gsz, count(*) AS k FROM m),
        |j AS (
        |  SELECT m.n, m.sz, m.szz, g.nn, g.k,
        |    CAST(g.gsz AS DOUBLE) / g.nn AS gmean,
        |    CAST(m.sz AS DOUBLE) / m.n AS mean
        |  FROM m CROSS JOIN g),
        |a AS (
        |  SELECT CAST(max(k) AS BIGINT) AS k,
        |    CAST(max(nn) AS BIGINT) AS n,
        |    sum(CAST(round(n * (mean - gmean) * (mean - gmean), 6)
        |      AS DECIMAL(24,6))) AS ssb_acc,
        |    sum(CAST(round(CAST(szz AS DOUBLE)
        |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n, 6)
        |      AS DECIMAL(24,6))) AS ssw_acc
        |  FROM j)
        |SELECT k, n, CAST(ssb_acc AS DOUBLE) AS ss_between,
        |  CAST(ssw_acc AS DOUBLE) AS ss_within,
        |  round((CAST(ssb_acc AS DOUBLE) / (k - 1))
        |    / (CAST(ssw_acc AS DOUBLE) / (n - k)), 6) AS w_stat
        |FROM a""".stripMargin,
    // same exact moment pass as events_ab_welch; pooled SD + Hedges
    // correction as identical closed formula text
    "stats_cohens_d" ->
      """WITH c AS (
        |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS isa,
        |    CAST(value AS DECIMAL(18,2)) AS y
        |  FROM events WHERE event_type IN ('purchase', 'click')),
        |m AS (
        |  SELECT CAST(sum(isa) AS BIGINT) AS n_a,
        |    CAST(sum(1 - isa) AS BIGINT) AS n_b,
        |    sum(CASE WHEN isa = 1 THEN y END) AS sy_a,
        |    sum(CASE WHEN isa = 0 THEN y END) AS sy_b,
        |    sum(CASE WHEN isa = 1 THEN y * y END) AS syy_a,
        |    sum(CASE WHEN isa = 0 THEN y * y END) AS syy_b
        |  FROM c),
        |f AS (
        |  SELECT n_a, n_b,
        |    CAST(sy_a AS DOUBLE) / n_a AS mean_a,
        |    CAST(sy_b AS DOUBLE) / n_b AS mean_b,
        |    (CAST(syy_a AS DOUBLE)
        |      - CAST(sy_a AS DOUBLE) * CAST(sy_a AS DOUBLE) / n_a)
        |      / (n_a - 1) AS var_a,
        |    (CAST(syy_b AS DOUBLE)
        |      - CAST(sy_b AS DOUBLE) * CAST(sy_b AS DOUBLE) / n_b)
        |      / (n_b - 1) AS var_b
        |  FROM m),
        |p AS (
        |  SELECT n_a, n_b, mean_a, mean_b,
        |    sqrt(((n_a - 1) * var_a + (n_b - 1) * var_b)
        |      / (n_a + n_b - 2)) AS s_pool
        |  FROM f)
        |SELECT n_a, n_b, round(mean_a, 6) AS mean_a,
        |  round(mean_b, 6) AS mean_b,
        |  round((mean_b - mean_a) / s_pool, 6) AS cohens_d,
        |  round((mean_b - mean_a) / s_pool
        |    * (1 - 3.0 / (4 * (n_a + n_b) - 9)), 6) AS hedges_g
        |FROM p""".stripMargin,
    // doubled average ranks are exact integers on both engines; the
    // Pearson-over-ranks final is one closed IEEE expression
    "stats_spearman_days" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS x,
        |    sum(CAST(value AS DECIMAL(18,2))) AS y
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT
        |    2 * rank() OVER (ORDER BY x)
        |      + count(*) OVER (PARTITION BY x) - 1 AS ux,
        |    2 * rank() OVER (ORDER BY y)
        |      + count(*) OVER (PARTITION BY y) - 1 AS uy
        |  FROM daily),
        |a AS (
        |  SELECT count(*) AS n_days,
        |    sum(CAST(ux AS DECIMAL(18,0))) AS sx,
        |    sum(CAST(uy AS DECIMAL(18,0))) AS sy,
        |    sum(CAST(ux * uy AS DECIMAL(18,0))) AS sxy,
        |    sum(CAST(ux * ux AS DECIMAL(18,0))) AS sxx,
        |    sum(CAST(uy * uy AS DECIMAL(18,0))) AS syy
        |  FROM r)
        |SELECT CAST(n_days AS BIGINT) AS n_days,
        |  round((n_days * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((n_days * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (n_days * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
        |    AS spearman_rho
        |FROM a""".stripMargin,
    // per-type histogram + lower-quantile thresholds, all integer-exact
    "feature_robust_scaler" ->
      """WITH h AS (
        |  SELECT event_type, value, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, value,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY value)
        |      AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM h),
        |q1 AS (SELECT event_type, min(value) AS q1 FROM c
        |  WHERE cum * 4 >= tot + 1 GROUP BY 1),
        |med AS (SELECT event_type, min(value) AS median FROM c
        |  WHERE cum * 2 >= tot + 1 GROUP BY 1),
        |q3 AS (SELECT event_type, min(value) AS q3 FROM c
        |  WHERE cum * 4 >= tot * 3 + 3 GROUP BY 1)
        |SELECT event_type, median, q1, q3,
        |  CAST(round(CAST(q3 AS DECIMAL(18,2))
        |    - CAST(q1 AS DECIMAL(18,2)), 2) AS DOUBLE) AS iqr
        |FROM med JOIN q1 USING (event_type) JOIN q3 USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // Sunday=0 on both engines: Spark dayofweek()-1 == DuckDB 'dow'
    "events_seasonality" ->
      """WITH a AS (
        |  SELECT event_type, CAST(date_part('dow', ts) AS BIGINT) AS dow,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, dow, n_events,
        |  round(CAST(n_events AS DOUBLE)
        |    / CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE),
        |    6) AS share,
        |  n_events = max(n_events) OVER (PARTITION BY event_type)
        |    AS is_peak
        |FROM a ORDER BY event_type, dow""".stripMargin,
    // lower-median (no interpolation): smallest value whose cumulative
    // histogram count reaches ceil(n/2); dev through DECIMAL(18,2) like
    // the Spark side so the subtraction is exact
    "events_outlier_mad" ->
      """WITH h AS (
        |  SELECT event_type, value, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |hc AS (
        |  SELECT event_type, value,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY value) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM h),
        |med AS (
        |  SELECT event_type, min(value) AS med FROM hc
        |  WHERE cum * 2 >= tot + 1 GROUP BY 1),
        |dv AS (
        |  SELECT e.event_id, e.event_type, e.value,
        |    CAST(abs(CAST(e.value AS DECIMAL(18,2))
        |      - CAST(m.med AS DECIMAL(18,2))) AS DOUBLE) AS dev
        |  FROM events e JOIN med m USING (event_type)),
        |dh AS (
        |  SELECT event_type, dev, count(*) AS cnt FROM dv GROUP BY 1, 2),
        |dhc AS (
        |  SELECT event_type, dev,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum,
        |    sum(cnt) OVER (PARTITION BY event_type) AS tot
        |  FROM dh),
        |mad AS (
        |  SELECT event_type, min(dev) AS mad FROM dhc
        |  WHERE cum * 2 >= tot + 1 GROUP BY 1)
        |SELECT event_id, dv.event_type AS event_type, value,
        |  round(dev / (1.4826 * mad), 6) AS robust_z
        |FROM dv JOIN mad USING (event_type)
        |WHERE mad > 0 AND round(dev / (1.4826 * mad), 6) > 3.0
        |ORDER BY event_id""".stripMargin,
    "events_seq_trigrams" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || ' > ' || e2 || ' > ' || e3 AS seq,
        |  count(*) AS n_occur, count(DISTINCT user_id) AS n_users
        |FROM s WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n_occur DESC, seq""".stripMargin,
    "events_survival" ->
      """WITH ten AS (
        |  SELECT user_id,
        |    CAST(datediff('day', min(CAST(ts AS DATE)),
        |      max(CAST(ts AS DATE))) AS BIGINT) AS tenure
        |  FROM events GROUP BY user_id),
        |h AS (SELECT tenure, count(*) AS n_ended FROM ten GROUP BY tenure),
        |c AS (
        |  SELECT tenure, n_ended,
        |    CAST(sum(n_ended) OVER (ORDER BY tenure DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS n_reached,
        |    CAST(sum(n_ended) OVER () AS BIGINT) AS n_total
        |  FROM h)
        |SELECT tenure AS tenure_days, n_ended, n_reached,
        |  round(CAST(n_reached AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS survival
        |FROM c ORDER BY tenure_days""".stripMargin,
    "events_user_entropy" ->
      """WITH tc AS (
        |  SELECT user_id, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tt AS (
        |  SELECT user_id, n,
        |    sum(n) OVER (PARTITION BY user_id) AS tot
        |  FROM tc)
        |SELECT user_id, CAST(max(tot) AS BIGINT) AS n_events,
        |  count(*) AS n_types,
        |  round(CAST(sum(CAST(round(
        |      -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |      * log2(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS entropy_bits
        |FROM tt GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS BIGINT) AS day
        |  FROM events),
        |runs AS (
        |  SELECT user_id,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM days),
        |rl AS (
        |  SELECT user_id, grp, count(*) AS run_len
        |  FROM runs GROUP BY 1, 2)
        |SELECT user_id, max(run_len) AS longest_streak,
        |  CAST(sum(run_len) AS BIGINT) AS n_active_days
        |FROM rl GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_interarrival" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) AS gap
        |  FROM events),
        |f AS (
        |  SELECT user_id, gap, CAST(gap AS DECIMAL(19,0)) AS gd
        |  FROM g WHERE gap IS NOT NULL),
        |m AS (
        |  SELECT user_id, count(*) AS n_gaps,
        |    CAST(sum(gd) AS DOUBLE) AS sg,
        |    CAST(sum(CAST(gd * gd AS DECIMAL(38,0))) AS DOUBLE) AS sgg,
        |    min(gap) AS min_gap_us, max(gap) AS max_gap_us
        |  FROM f GROUP BY user_id)
        |SELECT user_id, n_gaps,
        |  round(sg / n_gaps / 1e6, 6) AS mean_gap_s,
        |  min_gap_us, max_gap_us,
        |  round(sqrt(greatest(0, sgg / n_gaps - (sg / n_gaps)
        |      * (sg / n_gaps)))
        |    / (sg / n_gaps), 6) AS cv
        |FROM m ORDER BY user_id""".stripMargin,
    "events_velocity" ->
      """WITH cells AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT user_id, CAST(sum(n) AS DOUBLE) / count(*) AS mean_hourly
        |  FROM cells GROUP BY user_id)
        |SELECT c.user_id, c.hr, c.n,
        |  round(b.mean_hourly, 6) AS mean_hourly,
        |  round(CAST(c.n AS DOUBLE) / b.mean_hourly, 6) AS spike_factor
        |FROM cells c JOIN base b ON c.user_id = b.user_id
        |WHERE c.n >= 3 AND CAST(c.n AS DOUBLE) >= 2.5 * b.mean_hourly
        |ORDER BY c.user_id, c.hr""".stripMargin,
    "events_first_touch" ->
      """WITH e AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    CASE WHEN event_type IN ('click', 'view')
        |         THEN event_id END AS t_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN ts END AS t_ts,
        |    CASE WHEN event_type IN ('click', 'view')
        |         THEN event_type END AS t_ty
        |  FROM events),
        |a AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    first_value(t_id IGNORE NULLS) OVER w AS touch_id,
        |    first_value(t_ts IGNORE NULLS) OVER w AS touch_ts,
        |    first_value(t_ty IGNORE NULLS) OVER w AS touch_type
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, ts, touch_id, touch_type,
        |  epoch_us(ts) - epoch_us(touch_ts) AS age_us
        |FROM a WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "cohort_ltv" ->
      """WITH fy AS (
        |  SELECT o_custkey,
        |    CAST(min(year(o_orderdate)) AS INTEGER) AS cohort_year
        |  FROM orders GROUP BY o_custkey),
        |po AS (
        |  SELECT o.o_custkey, f.cohort_year,
        |    CAST(year(o.o_orderdate) AS INTEGER) - f.cohort_year
        |      AS year_offset,
        |    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS rev
        |  FROM orders o JOIN fy f ON o.o_custkey = f.o_custkey
        |  GROUP BY 1, 2, 3),
        |cs AS (
        |  SELECT cohort_year, count(*) AS n_customers
        |  FROM fy GROUP BY cohort_year),
        |cells AS (
        |  SELECT cohort_year, year_offset,
        |    sum(CAST(rev AS DECIMAL(18,2))) AS rev_d
        |  FROM po GROUP BY 1, 2),
        |cum AS (
        |  SELECT cohort_year, year_offset, rev_d,
        |    sum(rev_d) OVER (PARTITION BY cohort_year ORDER BY year_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        |  FROM cells)
        |SELECT c.cohort_year, CAST(c.year_offset AS BIGINT) AS year_offset,
        |  CAST(c.rev_d AS DOUBLE) AS cohort_revenue,
        |  round(CAST(c.cum_rev AS DOUBLE) / s.n_customers, 6)
        |    AS ltv_per_customer
        |FROM cum c JOIN cs s ON c.cohort_year = s.cohort_year
        |ORDER BY c.cohort_year, c.year_offset""".stripMargin,
    "supplier_hhi" ->
      s"""WITH rev AS (
         |  SELECT p_type, l_suppkey,
         |    sum(${sql.discPrice("l_extendedprice", "l_discount")}) AS rev
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT p_type, sum(rev) AS tot, count(*) AS n_suppliers
         |  FROM rev GROUP BY p_type),
         |sh AS (
         |  SELECT r.p_type, t.n_suppliers,
         |    CAST(r.rev AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
         |  FROM rev r JOIN tot t ON r.p_type = t.p_type)
         |SELECT p_type, max(n_suppliers) AS n_suppliers,
         |  round(CAST(sum(CAST(round(share * share, 12)
         |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS hhi
         |FROM sh GROUP BY p_type ORDER BY p_type""".stripMargin,
    "supplier_hhi_trend" ->
      s"""WITH rev AS (
         |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, l_suppkey,
         |    sum(${sql.discPrice("l_extendedprice", "l_discount")}) AS rev
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT yr, sum(rev) AS tot, count(*) AS n_suppliers
         |  FROM rev GROUP BY yr),
         |sh AS (
         |  SELECT r.yr, t.n_suppliers,
         |    CAST(r.rev AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
         |  FROM rev r JOIN tot t ON r.yr = t.yr)
         |SELECT yr AS order_year,
         |  CAST(max(n_suppliers) AS BIGINT) AS n_suppliers,
         |  round(CAST(sum(CAST(round(share * share, 12)
         |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS hhi
         |FROM sh GROUP BY yr ORDER BY order_year""".stripMargin,

    "trend_revenue_monthly" ->
      s"""WITH m AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         |    CAST(sum(${sql.discPrice("l_extendedprice", "l_discount")})
         |      AS DOUBLE) AS revenue,
         |    count(DISTINCT o_orderkey) AS n_orders
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1),
         |t AS (
         |  SELECT month, revenue, n_orders,
         |    lag(revenue, 1) OVER (ORDER BY month) AS prev_m,
         |    lag(revenue, 12) OVER (ORDER BY month) AS prev_y
         |  FROM m)
         |SELECT month, round(revenue, 2) AS revenue, n_orders,
         |  round((revenue - prev_m) / prev_m, 6) AS mom_growth,
         |  round((revenue - prev_y) / prev_y, 6) AS yoy_growth
         |FROM t ORDER BY month""".stripMargin,
    "orders_backlog" ->
      """WITH opened AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    count(*) AS n_opened
        |  FROM orders GROUP BY 1),
        |lastship AS (
        |  SELECT l_orderkey, max(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY l_orderkey),
        |closed AS (
        |  SELECT CAST(date_trunc('month', last_ship) AS DATE) AS month,
        |    count(*) AS n_closed
        |  FROM lastship GROUP BY 1),
        |merged AS (
        |  SELECT COALESCE(o.month, c.month) AS month,
        |    COALESCE(o.n_opened, 0) AS n_opened,
        |    COALESCE(c.n_closed, 0) AS n_closed
        |  FROM opened o FULL OUTER JOIN closed c ON o.month = c.month)
        |SELECT month, n_opened, n_closed,
        |  CAST(sum(n_opened - n_closed) OVER (ORDER BY month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS backlog
        |FROM merged ORDER BY month""".stripMargin,
    "orders_size_dist" ->
      """WITH sizes AS (
        |  SELECT l_orderkey, count(*) AS n_items
        |  FROM lineitem GROUP BY l_orderkey),
        |tot AS (SELECT count(*) AS n_orders FROM sizes)
        |SELECT n_items, count(*) AS n_orders_at,
        |  round(CAST(count(*) AS DOUBLE) / max(t.n_orders), 6) AS share
        |FROM sizes CROSS JOIN tot t
        |GROUP BY n_items ORDER BY n_items""".stripMargin,
    "inventory_abc_class" ->
      s"""WITH rev AS (
         |  SELECT l_partkey,
         |    sum(${sql.discPrice("l_extendedprice", "l_discount")}) AS rev
         |  FROM lineitem GROUP BY l_partkey),
         |tot AS (SELECT sum(rev) AS tot FROM rev),
         |c AS (
         |  SELECT l_partkey, rev,
         |    sum(rev) OVER (ORDER BY rev DESC, l_partkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM rev),
         |k AS (
         |  SELECT rev, t.tot,
         |    CASE WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.80
         |           THEN 'A'
         |         WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.95
         |           THEN 'B'
         |         ELSE 'C' END AS cls
         |  FROM c CROSS JOIN tot t)
         |SELECT cls, count(*) AS n_parts,
         |  CAST(sum(rev) AS DOUBLE) AS revenue,
         |  round(CAST(sum(rev) AS DOUBLE) / CAST(max(tot) AS DOUBLE), 6)
         |    AS share
         |FROM k GROUP BY cls ORDER BY cls""".stripMargin,
    "ship_delay_stats" ->
      """WITH dl AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS delay
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
        |SELECT o_orderpriority, count(*) AS n_lines,
        |  round(CAST(sum(delay) AS DOUBLE) / count(*), 6)
        |    AS mean_delay_days,
        |  min(delay) AS min_delay,
        |  round(quantile_cont(delay, 0.9), 4) AS p90_delay,
        |  max(delay) AS max_delay
        |FROM dl GROUP BY o_orderpriority ORDER BY o_orderpriority"""
        .stripMargin,
    "orders_repeat_intervals" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day',
        |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey) AS DATE),
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
        |  FROM orders),
        |f AS (
        |  SELECT gap_days,
        |    CASE WHEN gap_days <= 7 THEN '01_week'
        |         WHEN gap_days <= 30 THEN '02_month'
        |         WHEN gap_days <= 90 THEN '03_quarter'
        |         ELSE '04_long' END AS band
        |  FROM g WHERE gap_days IS NOT NULL),
        |tot AS (SELECT count(*) AS n_total FROM f)
        |SELECT band, count(*) AS n_gaps,
        |  round(CAST(sum(gap_days) AS DOUBLE) / count(*), 6)
        |    AS mean_gap_days,
        |  round(CAST(count(*) AS DOUBLE) / max(t.n_total), 6) AS share
        |FROM f CROSS JOIN tot t GROUP BY band ORDER BY band""".stripMargin,
    "price_index_monthly" ->
      """WITH bm AS (
        |  SELECT p_brand,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(round(
        |      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6)
        |      AS DECIMAL(12,6)) AS up,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS sq
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |m0 AS (SELECT min(month) AS m0 FROM bm),
        |base AS (
        |  SELECT p_brand, up AS up0, sq AS q0
        |  FROM bm CROSS JOIN m0 WHERE month = m0),
        |j AS (
        |  SELECT bm.month,
        |    CAST(bm.up * b.q0 AS DECIMAL(38,8)) AS nm,
        |    CAST(b.up0 * b.q0 AS DECIMAL(38,8)) AS dn
        |  FROM bm JOIN base b ON bm.p_brand = b.p_brand)
        |SELECT month, count(*) AS n_brands,
        |  round(CAST(sum(nm) AS DOUBLE) / CAST(sum(dn) AS DOUBLE), 6)
        |    AS price_index
        |FROM j GROUP BY month ORDER BY month""".stripMargin,
    "part_substitutes" ->
      """WITH p AS (
        |  SELECT p_partkey, p_brand, p_type, p_size,
        |    CAST(p_retailprice AS DECIMAL(18,2)) AS price
        |  FROM part)
        |SELECT a.p_partkey AS pk_a, b.p_partkey AS pk_b,
        |  a.p_type, a.p_size,
        |  CAST(a.price AS DOUBLE) AS price_a,
        |  CAST(b.price AS DOUBLE) AS price_b
        |FROM p a JOIN p b
        |  ON a.p_type = b.p_type AND a.p_size = b.p_size
        |  AND a.p_brand <> b.p_brand AND a.p_partkey < b.p_partkey
        |WHERE abs(a.price - b.price)
        |  <= CAST(0.002 AS DECIMAL(4,3)) * greatest(a.price, b.price)
        |ORDER BY pk_a, pk_b""".stripMargin,
    "events_concurrent_peak" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN datediff('second',
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |        ts) > 1800
        |      THEN 1 ELSE 0 END AS gap_break
        |  FROM events),
        |sess AS (
        |  SELECT user_id,
        |    sum(gap_break) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_n,
        |    ts
        |  FROM o),
        |sp AS (
        |  SELECT user_id, session_n, min(ts) AS st, max(ts) AS en
        |  FROM sess GROUP BY 1, 2),
        |pts AS (
        |  SELECT user_id, session_n, st AS t, 1 AS delta FROM sp
        |  UNION ALL
        |  SELECT user_id, session_n, en + INTERVAL 1 SECOND AS t,
        |    -1 AS delta
        |  FROM sp),
        |sw AS (
        |  SELECT t, CAST(sum(delta) OVER (
        |    ORDER BY t, delta, user_id, session_n
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cur
        |  FROM pts)
        |SELECT CAST(t AS DATE) AS day, max(cur) AS peak_concurrent
        |FROM sw GROUP BY 1 ORDER BY day""".stripMargin,
    "events_user_gini" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |r AS (
        |  SELECT n, CAST(row_number() OVER (ORDER BY n, user_id)
        |    AS BIGINT) AS i
        |  FROM per)
        |SELECT count(*) AS n_users, CAST(sum(n) AS BIGINT)
        |    AS total_events,
        |  round((2.0 * CAST(sum(CAST(i AS DECIMAL(19,0))
        |      * CAST(n AS DECIMAL(19,0))) AS DOUBLE))
        |    / (CAST(count(*) AS DOUBLE) * CAST(sum(n) AS DOUBLE))
        |    - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini
        |FROM r""".stripMargin,
    "events_forecast_baseline" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS cell,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT c.event_type,
        |    CAST(round(abs(CAST(c.n - p.n AS DOUBLE)) / c.n, 9)
        |      AS DECIMAL(20,9)) AS ape,
        |    CAST(round(CAST(p.n - c.n AS DOUBLE) / c.n, 9)
        |      AS DECIMAL(20,9)) AS err
        |  FROM cells c JOIN cells p
        |    ON c.event_type = p.event_type
        |    AND c.cell = p.cell + INTERVAL 24 HOUR)
        |SELECT event_type, count(*) AS n_cells,
        |  round(CAST(sum(ape) AS DOUBLE) / count(*), 6) AS mape,
        |  round(CAST(sum(err) AS DOUBLE) / count(*), 6) AS mean_bias
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_anomaly_seasonal" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS cell,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, CAST(hour(cell) AS INT) AS hr,
        |    count(*) AS nc, CAST(sum(n) AS DOUBLE) AS sn,
        |    CAST(sum(CAST(n * n AS DECIMAL(38,0))) AS DOUBLE) AS snn
        |  FROM cells GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, hr, sn / nc AS mu,
        |    sqrt(greatest(0, snn / nc - (sn / nc) * (sn / nc))) AS sd
        |  FROM b),
        |f AS (SELECT event_type, hr, mu, sd FROM s WHERE sd > 0)
        |SELECT c.event_type, c.cell, c.n,
        |  round((CAST(c.n AS DOUBLE) - f.mu) / f.sd, 6) AS z
        |FROM cells c JOIN f ON c.event_type = f.event_type
        |  AND CAST(hour(c.cell) AS INT) = f.hr
        |ORDER BY z DESC, c.event_type, c.cell LIMIT 20""".stripMargin,
    "customer_segment_migration" ->
      """WITH q AS (
        |  SELECT o_custkey,
        |    CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1, 2),
        |seg AS (
        |  SELECT o_custkey, qtr,
        |    CASE WHEN spend < 200000 THEN '1_LOW'
        |         WHEN spend < 400000 THEN '2_MID'
        |         ELSE '3_HIGH' END AS seg
        |  FROM q),
        |tr AS (
        |  SELECT o_custkey, qtr, seg,
        |    lag(seg) OVER (PARTITION BY o_custkey ORDER BY qtr)
        |      AS prev_seg,
        |    lag(qtr) OVER (PARTITION BY o_custkey ORDER BY qtr)
        |      AS prev_qtr
        |  FROM seg),
        |mv AS (
        |  SELECT prev_seg AS seg_from, seg AS seg_to
        |  FROM tr
        |  WHERE prev_seg IS NOT NULL
        |    AND qtr = CAST(prev_qtr + INTERVAL 3 MONTH AS DATE)),
        |ct AS (
        |  SELECT seg_from, seg_to, count(*) AS n_moves
        |  FROM mv GROUP BY 1, 2)
        |SELECT seg_from, seg_to, n_moves,
        |  round(CAST(n_moves AS DOUBLE)
        |    / sum(n_moves) OVER (PARTITION BY seg_from), 6) AS row_share
        |FROM ct ORDER BY seg_from, seg_to""".stripMargin,
    "events_calendar_profile" ->
      """WITH cells AS (
        |  SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
        |    CAST(hour(ts) AS INT) AS hr, count(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT sum(n_events) AS n_total FROM cells)
        |SELECT dow, hr, n_events,
        |  round(CAST(n_events AS DOUBLE) / t.n_total, 6) AS share
        |FROM cells CROSS JOIN tot t ORDER BY dow, hr""".stripMargin,
    "basket_rules" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |bn AS (SELECT brand, count(*) AS bn FROM baskets GROUP BY brand),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b,
        |    count(*) AS pair_n
        |  FROM baskets a JOIN baskets b
        |    ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2),
        |n AS (SELECT count(*) AS n_orders FROM orders)
        |SELECT brand_a, brand_b, pair_n,
        |  round(CAST(pair_n AS DOUBLE) / na.bn, 6) AS confidence,
        |  round((CAST(pair_n AS DOUBLE) / na.bn)
        |    / (CAST(nb.bn AS DOUBLE) / n.n_orders), 6) AS lift
        |FROM pairs
        |JOIN bn na ON na.brand = pairs.brand_a
        |JOIN bn nb ON nb.brand = pairs.brand_b
        |CROSS JOIN n
        |WHERE pair_n >= 5
        |ORDER BY lift DESC, brand_a, brand_b LIMIT 50""".stripMargin,
    "events_stickiness" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM days GROUP BY day),
        |ex AS (
        |  SELECT DISTINCT user_id, day + CAST(off AS INTEGER) AS day
        |  FROM days CROSS JOIN (SELECT unnest(generate_series(0, 6))
        |    AS off) o),
        |wau AS (SELECT day, count(*) AS wau FROM ex GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
        |FROM dau d JOIN wau w ON d.day = w.day
        |ORDER BY d.day""".stripMargin,
    "events_growth_accounting" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
        |    AS wk
        |  FROM events),
        |cl AS (
        |  SELECT user_id, wk,
        |    lag(wk) OVER w AS prev, lead(wk) OVER w AS nxt
        |  FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY wk)),
        |states AS (
        |  SELECT wk,
        |    CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(sum(CASE WHEN datediff('day', prev, wk) = 7
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN prev IS NOT NULL
        |      AND datediff('day', prev, wk) > 7 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_resurrected
        |  FROM cl GROUP BY wk),
        |churn AS (
        |  SELECT wk + 7 AS wk, count(*) AS n_churned
        |  FROM cl WHERE nxt IS NULL OR datediff('day', wk, nxt) > 7
        |  GROUP BY 1)
        |SELECT COALESCE(s.wk, c.wk) AS wk,
        |  COALESCE(n_new, 0) AS n_new,
        |  COALESCE(n_retained, 0) AS n_retained,
        |  COALESCE(n_resurrected, 0) AS n_resurrected,
        |  COALESCE(n_churned, 0) AS n_churned
        |FROM states s FULL OUTER JOIN churn c ON s.wk = c.wk
        |ORDER BY wk""".stripMargin,
    "q2_min_cost" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |l AS (
        |  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN eu ON l_suppkey = s_suppkey
        |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'PROMO'),
        |m AS (SELECT p_partkey AS mk, min(price) AS min_price
        |      FROM l GROUP BY 1)
        |SELECT DISTINCT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name,
        |  n_name, p_partkey, CAST(min_price AS DOUBLE) AS min_price,
        |  s_suppkey
        |FROM l JOIN m ON p_partkey = mk AND price = min_price
        |ORDER BY acctbal DESC, s_suppkey, p_partkey LIMIT 100""".stripMargin,
    "q11_important_parts" ->
      s"""WITH nl AS (
         |  SELECT l_partkey,
         |    ${sql.discPrice("l_extendedprice", "l_discount")} AS v
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'),
         |pp AS (SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS part_value
         |       FROM nl GROUP BY 1),
         |thr AS (SELECT avg(part_value) * 2 AS t FROM pp)
         |SELECT l_partkey, part_value FROM pp CROSS JOIN thr
         |WHERE part_value > t
         |ORDER BY part_value DESC, l_partkey""".stripMargin,
    "q13_order_counts" ->
      """WITH co AS (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM co GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q20_excess_stock" ->
      s"""WITH b AS (
         |  SELECT l_suppkey FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE p_type = 'PROMO' AND year(l_shipdate) = 1997
         |  GROUP BY l_suppkey, l_partkey
         |  HAVING ${sql.moneySum("l_quantity")} > 45)
         |SELECT s_suppkey, s_name FROM supplier
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND s_suppkey IN (SELECT l_suppkey FROM b)
         |ORDER BY s_suppkey""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |                * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  year(l_shipdate) AS l_year,
         |  ${sql.moneyVol} AS volume
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         |  AND n1.n_name <> n2.n_name
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      s"""SELECT year(o_orderdate) AS o_year,
         |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
         |      THEN ${sql.discPrice("l_extendedprice", "l_discount")}
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |  / ${sql.moneyVol} AS mkt_share
         |FROM lineitem
         |JOIN part     ON l_partkey = p_partkey
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region   ON n1.n_regionkey = r_regionkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(8,2))
        |    - CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(0.4 AS DECIMAL(8,2))
        |      * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |WHERE p_type <> 'PROMO'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT year(l_shipdate) AS l_year, s_suppkey, s_name,
         |    $revenue AS total_rev
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1, 2, 3),
         |r AS (
         |  SELECT l_year, s_suppkey, s_name, total_rev,
         |    row_number() OVER (PARTITION BY l_year
         |      ORDER BY total_rev DESC, s_suppkey) AS rnk
         |  FROM rev)
         |SELECT l_year, s_suppkey, s_name, total_rev
         |FROM r WHERE rnk = 1 ORDER BY l_year""".stripMargin,
    "q16_parts_breadth" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size >= 20
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin,
    "q12_priority_lines" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q14_promo" ->
      s"""SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
         |      THEN ${sql.discPrice("l_extendedprice", "l_discount")}
         |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) * 100.0
         |  / ${sql.moneyVol} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q17_small_qty" ->
      s"""WITH bl AS (
         |  SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#3'),
         |aq AS (
         |  SELECT l_partkey AS a_partkey,
         |    ${sql.moneySum("l_quantity")} / count(*) AS avg_qty
         |  FROM bl GROUP BY 1)
         |SELECT ${sql.moneySum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM bl JOIN aq ON l_partkey = a_partkey
         |WHERE l_quantity < avg_qty * 0.5""".stripMargin,
    "q19_disjunctive" ->
      s"""SELECT ${sql.moneyVol} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH st AS (
        |  SELECT l_orderkey AS ok,
        |    count(DISTINCT l_suppkey) AS n_supp,
        |    count(DISTINCT CASE WHEN l_returnflag = 'R'
        |                        THEN l_suppkey END) AS n_ret_supp
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM r
        |JOIN st ON l_orderkey = ok
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE n_supp >= 2 AND n_ret_supp = 1
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey LIMIT 100""".stripMargin,
    "q22_idle_customers" ->
      s"""WITH ab AS (
         |  SELECT ${sql.moneySum("c_acctbal")} / count(*) AS avg_bal
         |  FROM customer WHERE c_acctbal > 0)
         |SELECT c_nationkey, count(*) AS numcust,
         |  ${sql.moneySum("c_acctbal")} AS totacctbal
         |FROM customer CROSS JOIN ab
         |WHERE c_acctbal > avg_bal
         |  AND NOT EXISTS (
         |    SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
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
    "events_funnel_window" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, v.t_view, min(e.ts) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |    AND e.ts <= v.t_view + INTERVAL 24 HOUR
        |  GROUP BY e.user_id, v.t_view),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |    AND e.ts <= c.t_view + INTERVAL 24 HOUR
        |  GROUP BY e.user_id)
        |SELECT v.user_id, v.t_view, t_click, t_purchase
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id
        |ORDER BY v.user_id""".stripMargin,
    "events_paths" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT t1 || ' > ' || t2 || ' > ' || event_type AS path,
        |  count(*) AS n
        |FROM seq WHERE t1 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 25""".stripMargin,
    "events_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT prev, event_type AS cur, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
        |SELECT prev, cur, n,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY prev), 6) AS p
        |FROM m ORDER BY prev, cur""".stripMargin,
    "events_anomaly" ->
      s"""WITH st AS (
         |  SELECT event_type AS et, count(*) AS n,
         |    ${sql.moneySum("value")} AS sx,
         |    CAST(sum(${sql.money("value")} * ${sql.money("value")})
         |      AS DOUBLE) AS sxx
         |  FROM events GROUP BY 1),
         |m AS (SELECT et, sx / n AS mean,
         |        sqrt(sxx / n - (sx / n) * (sx / n)) AS sd FROM st)
         |SELECT event_id, event_type, value,
         |  round((value - mean) / sd, 6) AS z
         |FROM events JOIN m ON event_type = et
         |WHERE abs(round((value - mean) / sd, 6)) > 3.0
         |ORDER BY event_id""".stripMargin,
    // sessionize's own CTEs, folded twice more (depth per session, then
    // sessions per depth)
    "events_session_depth_dist" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN datediff('second',
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |        ts) > 1800
        |      THEN 1 ELSE 0 END AS gap_break
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(gap_break) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_n
        |  FROM o),
        |dep AS (
        |  SELECT user_id, session_n, CAST(count(*) AS BIGINT) AS depth
        |  FROM s GROUP BY 1, 2),
        |hist AS (
        |  SELECT depth, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM dep GROUP BY depth),
        |tot AS (SELECT CAST(sum(n_sessions) AS BIGINT) AS n_total
        |        FROM hist)
        |SELECT depth, n_sessions,
        |  round(CAST(n_sessions AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS share
        |FROM hist CROSS JOIN tot ORDER BY depth""".stripMargin,

    "events_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN datediff('second',
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |        ts) > 1800
        |      THEN 1 ELSE 0 END AS gap_break
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    CAST(sum(gap_break) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_n
        |  FROM o)
        |SELECT user_id, session_n, count(*) AS n_events,
        |  datediff('second', min(ts), max(ts)) AS duration_s
        |FROM s GROUP BY user_id, session_n
        |ORDER BY user_id, session_n""".stripMargin,
    "events_cooccur" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN datediff('second',
        |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
        |        ts) > 1800
        |      THEN 1 ELSE 0 END AS gap_break
        |  FROM events),
        |s AS (
        |  SELECT user_id, event_type,
        |    CAST(sum(gap_break) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_n
        |  FROM o),
        |t AS (SELECT DISTINCT user_id, session_n, event_type FROM s)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_sessions
        |FROM t a JOIN t b
        |  ON a.user_id = b.user_id AND a.session_n = b.session_n
        | AND a.event_type < b.event_type
        |GROUP BY 1, 2 ORDER BY type_a, type_b""".stripMargin,
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
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "events_power_pareto" ->
      """WITH per AS (
        |  SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_events,
        |    count(*) AS n_users FROM per),
        |ranked AS (
        |  SELECT n,
        |    row_number() OVER (ORDER BY n DESC, user_id) AS rk,
        |    sum(n) OVER (ORDER BY n DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM per)
        |SELECT max(t.n_users) AS n_users, max(t.n_events) AS n_events,
        |  round(CAST(sum(CASE WHEN rk <= (t.n_users + 99) // 100
        |      THEN n END) AS DOUBLE) / max(t.n_events), 6) AS top1pct_share,
        |  round(CAST(sum(CASE WHEN rk <= (t.n_users + 9) // 10
        |      THEN n END) AS DOUBLE) / max(t.n_events), 6) AS top10pct_share,
        |  CAST(min(CASE WHEN cum * 2 >= t.n_events THEN rk END) AS BIGINT)
        |    AS pareto_k
        |FROM ranked CROSS JOIN tot t""".stripMargin,

    "discount_uplift" ->
      """WITH per AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS INTEGER)
        |    AS disc_pct,
        |  count(*) AS n_lines,
        |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY 1),
        |base AS (SELECT sq AS sq0, n_lines AS n0 FROM per
        |  WHERE disc_pct = 0)
        |SELECT disc_pct, n_lines,
        |  round(CAST(sq AS DOUBLE) / n_lines, 6) AS avg_qty,
        |  round((CAST(sq AS DOUBLE) / n_lines)
        |    / (CAST(sq0 AS DOUBLE) / n0), 6) AS qty_uplift
        |FROM per CROSS JOIN base ORDER BY disc_pct""".stripMargin,

    "nation_trade_balance" -> {
      val rev = s"CAST(sum(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE)"
      s"""WITH exp AS (
         |  SELECT s_nationkey AS nationkey, $rev AS exports
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  GROUP BY 1),
         |imp AS (
         |  SELECT c_nationkey AS nationkey, $rev AS imports
         |  FROM lineitem
         |  JOIN orders   ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1)
         |SELECT n_name,
         |  round(coalesce(exports, 0.0), 2) AS exports,
         |  round(coalesce(imports, 0.0), 2) AS imports,
         |  round(coalesce(exports, 0.0) - coalesce(imports, 0.0), 2)
         |    AS balance
         |FROM exp FULL OUTER JOIN imp USING (nationkey)
         |JOIN nation ON nationkey = n_nationkey
         |ORDER BY n_name""".stripMargin
    },

    "user_feature_matrix" ->
      """WITH anchor AS (SELECT max(ts) AS cmax FROM events),
        |f AS (
        |  SELECT user_id, count(*) AS n_events,
        |    count(DISTINCT event_type) AS n_types,
        |    count(DISTINCT CAST(ts AS DATE)) AS active_days,
        |    min(ts) AS first_ts, max(ts) AS last_ts,
        |    max(a.cmax) AS cmax,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sv
        |  FROM events CROSS JOIN anchor a
        |  GROUP BY user_id)
        |SELECT user_id, n_events, n_types, active_days,
        |  CAST(date_diff('day', CAST(last_ts AS DATE), CAST(cmax AS DATE))
        |    AS BIGINT) AS recency_days,
        |  CAST(date_diff('day', CAST(first_ts AS DATE),
        |    CAST(last_ts AS DATE)) AS BIGINT) AS tenure_days,
        |  round(CAST(sv AS DOUBLE) / n_events, 6) AS avg_value,
        |  round(CAST(n_events AS DOUBLE) / active_days, 6)
        |    AS events_per_active_day
        |FROM f ORDER BY user_id""".stripMargin,

    "events_conversion_latency" ->
      """WITH p AS (
        |  SELECT pp.ts, c.ts AS click_ts
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') pp
        |  ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON pp.user_id = c.user_id AND pp.ts >= c.ts),
        |g AS (
        |  SELECT CAST(hour(ts) AS INTEGER) AS purchase_hour,
        |    (epoch_us(ts) - epoch_us(click_ts)) // 1000000 AS gap_s
        |  FROM p)
        |SELECT purchase_hour, count(*) AS n_conversions,
        |  round(quantile_cont(gap_s, 0.5), 4) AS p50_s,
        |  round(quantile_cont(gap_s, 0.9), 4) AS p90_s,
        |  round(CAST(sum(gap_s) AS DOUBLE) / count(*), 6) AS mean_s
        |FROM g GROUP BY purchase_hour
        |ORDER BY purchase_hour""".stripMargin,

    "events_coverage_spans" ->
      """WITH b AS (
        |  SELECT user_id, ts, event_id,
        |    epoch_us(ts) // 1000000 AS start_s,
        |    epoch_us(ts) // 1000000 + 1800 AS end_s
        |  FROM events),
        |m AS (
        |  SELECT user_id, ts, event_id, start_s, end_s,
        |    max(end_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS max_prev_end
        |  FROM b),
        |sp AS (
        |  SELECT user_id, start_s, end_s,
        |    sum(CASE WHEN max_prev_end IS NULL OR start_s > max_prev_end
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS span_id
        |  FROM m),
        |agg AS (
        |  SELECT user_id, span_id, min(start_s) AS s0, max(end_s) AS s1
        |  FROM sp GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_spans,
        |  CAST(sum(s1 - s0) AS BIGINT) AS covered_s,
        |  max(s1 - s0) AS max_span_s
        |FROM agg GROUP BY user_id ORDER BY user_id""".stripMargin,

    "supplier_delay_rank" ->
      """WITH per AS (
        |  SELECT l_suppkey, count(*) AS n_lines,
        |    CAST(sum(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE))) AS BIGINT) AS sum_delay
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_suppkey
        |  HAVING count(*) >= 20),
        |r AS (
        |  SELECT l_suppkey, n_lines,
        |    round(CAST(sum_delay AS DOUBLE) / n_lines, 6)
        |      AS avg_delay_days
        |  FROM per)
        |SELECT * FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY avg_delay_days,
        |      l_suppkey) AS BIGINT) AS rnk,
        |    l_suppkey, n_lines, avg_delay_days
        |  FROM r) t
        |WHERE rnk <= 25
        |ORDER BY rnk""".stripMargin,

    "events_ab_did" ->
      """WITH u AS (
        |  SELECT user_id, ts >= TIMESTAMP '2024-01-16 00:00:00' AS post,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 180
        |      THEN 1 ELSE 0 END) AS conv,
        |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1) >= '8' AS in_b
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT
        |    CAST(sum(CASE WHEN NOT in_b AND NOT post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a_pre,
        |    CAST(sum(CASE WHEN NOT in_b AND post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a_post,
        |    CAST(sum(CASE WHEN in_b AND NOT post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b_pre,
        |    CAST(sum(CASE WHEN in_b AND post THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b_post,
        |    sum(CASE WHEN NOT in_b AND NOT post THEN conv ELSE 0 END)
        |      AS c_a_pre,
        |    sum(CASE WHEN NOT in_b AND post THEN conv ELSE 0 END)
        |      AS c_a_post,
        |    sum(CASE WHEN in_b AND NOT post THEN conv ELSE 0 END)
        |      AS c_b_pre,
        |    sum(CASE WHEN in_b AND post THEN conv ELSE 0 END)
        |      AS c_b_post
        |  FROM u)
        |SELECT n_a_pre, n_a_post, n_b_pre, n_b_post,
        |  round(c_a_pre / n_a_pre, 6) AS rate_a_pre,
        |  round(c_a_post / n_a_post, 6) AS rate_a_post,
        |  round(c_b_pre / n_b_pre, 6) AS rate_b_pre,
        |  round(c_b_post / n_b_post, 6) AS rate_b_post,
        |  round((c_b_post / n_b_post - c_b_pre / n_b_pre)
        |    - (c_a_post / n_a_post - c_a_pre / n_a_pre), 6) AS did
        |FROM c""".stripMargin,

    "events_bot_filter" ->
      """WITH b AS (
        |  SELECT user_id, ts, epoch_us(ts) // 1000000 AS ts_s
        |  FROM events),
        |w AS (
        |  SELECT user_id, ts,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts_s
        |      RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS in_burst
        |  FROM b),
        |per AS (
        |  SELECT user_id, count(*) AS n_events,
        |    max(in_burst) AS burst_max,
        |    count(DISTINCT CAST(ts AS DATE)) AS active_days
        |  FROM w GROUP BY user_id),
        |p2 AS (
        |  SELECT user_id, n_events, burst_max, active_days,
        |    round(CAST(n_events AS DOUBLE) / active_days, 6) AS epd
        |  FROM per),
        |m AS (
        |  SELECT round(CAST(sum(n_events) AS DOUBLE)
        |    / sum(active_days), 6) AS mean_epd FROM p2)
        |SELECT user_id, n_events, burst_max,
        |  epd AS events_per_active_day, mean_epd,
        |  burst_max >= 5 OR epd > mean_epd * 3 AS is_bot
        |FROM p2 CROSS JOIN m ORDER BY user_id""".stripMargin,

    "events_markov_stationary" -> {
      val rounds = (1 to 3).map { i =>
        val prev = s"pi${i - 1}"
        s"""pi$i AS (
           |  SELECT cur AS state,
           |    CAST(sum(CAST(round(pi * p, 9) AS DECIMAL(20,9)))
           |      AS DOUBLE) AS pi
           |  FROM pm JOIN $prev ON prev = state GROUP BY cur)""".stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev
         |  FROM events),
         |tr AS (
         |  SELECT prev, event_type AS cur, count(*) AS n
         |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
         |pm AS (
         |  SELECT prev, cur,
         |    CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev) AS p
         |  FROM tr),
         |st AS (SELECT DISTINCT prev AS state FROM pm),
         |tc AS (SELECT count(*) AS t FROM st),
         |pi0 AS (
         |  SELECT state, CAST(1.0 AS DOUBLE) / t AS pi
         |  FROM st CROSS JOIN tc),
         |$rounds
         |SELECT state, round(pi, 6) AS stationary_p
         |FROM pi3 ORDER BY state""".stripMargin
    },

    "events_retention_halflife" ->
      """WITH e AS (
        |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |f AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1),
        |grid AS (
        |  SELECT cohort_week,
        |    CAST(datediff('day', cohort_week, wk) / 7 AS BIGINT)
        |      AS week_n,
        |    count(DISTINCT e.user_id) AS n_active
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
        |sizes AS (SELECT cohort_week, n_active AS cohort_size
        |  FROM grid WHERE week_n = 0),
        |mx AS (SELECT max(wk) AS max_wk FROM e),
        |curve AS (
        |  SELECT week_n,
        |    CAST(sum(n_active) AS BIGINT) AS active,
        |    CAST(sum(cohort_size) AS BIGINT) AS eligible
        |  FROM grid JOIN sizes USING (cohort_week) CROSS JOIN mx
        |  WHERE week_n >= 1
        |    AND CAST(datediff('day', cohort_week, max_wk) / 7 AS BIGINT)
        |      >= week_n
        |  GROUP BY 1),
        |rr AS (
        |  SELECT week_n, CAST(active AS DOUBLE) / eligible AS r
        |  FROM curve WHERE active > 0),
        |m AS (
        |  SELECT count(*) AS n_points,
        |    CAST(sum(CAST(week_n AS DECIMAL(19,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(ln(r), 9) AS DECIMAL(20,9))) AS DOUBLE)
        |      AS sy,
        |    CAST(sum(CAST(round(week_n * ln(r), 9) AS DECIMAL(20,9)))
        |      AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(week_n * week_n AS DECIMAL(19,0))) AS DOUBLE)
        |      AS sxx
        |  FROM rr),
        |s AS (
        |  SELECT n_points,
        |    round((CAST(n_points AS DOUBLE) * sxy - sx * sy)
        |      / (CAST(n_points AS DOUBLE) * sxx - sx * sx), 6) AS slope
        |  FROM m)
        |SELECT n_points, slope,
        |  CASE WHEN slope < 0
        |    THEN round(-0.6931471805599453 / slope, 4) END
        |    AS halflife_weeks
        |FROM s""".stripMargin,

    "events_lifecycle_stage" ->
      """WITH anchor AS (SELECT max(ts) AS ts_max FROM events),
        |per AS (
        |  SELECT user_id, max(ts) AS last_ts FROM events GROUP BY 1),
        |st AS (
        |  SELECT user_id,
        |    CASE WHEN (epoch_us(ts_max) - epoch_us(last_ts))
        |        // 3600000000 < 6 THEN 'active'
        |      WHEN (epoch_us(ts_max) - epoch_us(last_ts))
        |        // 3600000000 < 12 THEN 'cooling'
        |      WHEN (epoch_us(ts_max) - epoch_us(last_ts))
        |        // 3600000000 < 24 THEN 'lapsed'
        |      ELSE 'churned' END AS stage
        |  FROM per CROSS JOIN anchor),
        |tot AS (SELECT count(*) AS n_total FROM st)
        |SELECT stage, count(*) AS n_users,
        |  round(CAST(count(*) AS DOUBLE) / max(n_total), 6) AS share
        |FROM st CROSS JOIN tot GROUP BY stage ORDER BY stage""".stripMargin,

    "events_load_factor" ->
      """WITH cells AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT event_type, count(*) AS n_hours,
        |    CAST(sum(n) AS BIGINT) AS n_events,
        |    max(n) AS peak_hourly
        |  FROM cells GROUP BY 1)
        |SELECT event_type, n_hours, n_events, peak_hourly,
        |  round(CAST(peak_hourly AS DOUBLE)
        |    / (CAST(n_events AS DOUBLE) / n_hours), 4) AS load_factor
        |FROM agg ORDER BY event_type""".stripMargin,

    "events_new_vs_returning" ->
      """WITH fd AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS first_day
        |  FROM events GROUP BY 1),
        |j AS (
        |  SELECT CAST(e.ts AS DATE) AS day, fd.first_day
        |  FROM events e JOIN fd ON e.user_id = fd.user_id)
        |SELECT day, count(*) AS n_events,
        |  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new_user_events,
        |  round(CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*), 6) AS new_share
        |FROM j GROUP BY day ORDER BY day""".stripMargin,

    // the same fixed-log-bin grid with +0.5 Laplace smoothing; every
    // same contribute-forward explode: DATE + INTEGER is a DATE in
    // DuckDB, date_add in Spark
    "events_rolling_wau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS dau
        |  FROM ud GROUP BY day),
        |c AS (
        |  SELECT DISTINCT user_id,
        |    day + CAST(unnest(generate_series(0, 6)) AS INTEGER) AS day
        |  FROM ud),
        |wau AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS wau
        |  FROM c GROUP BY day)
        |SELECT d.day, d.dau, w.wau,
        |  round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6)
        |    AS stickiness
        |FROM dau d JOIN wau w USING (day)
        |ORDER BY day""".stripMargin,

    // probability is all-DOUBLE arithmetic (never DuckDB decimal
    // division), PSI terms round-9 decimal-summed like the Spark side
    "events_psi_drift" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref,
        |    least(9, CAST(floor(
        |      ln(greatest("value", 0) + 1)) AS BIGINT)) AS bin
        |  FROM events),
        |cells AS (
        |  SELECT event_type, bin,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
        |  FROM ev GROUP BY 1, 2),
        |grid AS (
        |  SELECT DISTINCT event_type, b.bin
        |  FROM ev CROSS JOIN
        |    (SELECT unnest(generate_series(0, 9)) AS bin) b),
        |tot AS (
        |  SELECT event_type, CAST(sum(cr) AS BIGINT) AS n_ref,
        |    CAST(sum(cc) AS BIGINT) AS n_cur
        |  FROM cells GROUP BY 1),
        |filled AS (
        |  SELECT g.event_type, g.bin,
        |    coalesce(c.cr, 0) AS cr, coalesce(c.cc, 0) AS cc
        |  FROM grid g LEFT JOIN cells c
        |    ON g.event_type = c.event_type AND g.bin = c.bin)
        |SELECT t.event_type, t.n_ref, t.n_cur,
        |  round(CAST(sum(CAST(round(
        |    ((CAST(cc AS DOUBLE) + 0.5) / (CAST(t.n_cur AS DOUBLE) + 5.0)
        |      - (CAST(cr AS DOUBLE) + 0.5)
        |        / (CAST(t.n_ref AS DOUBLE) + 5.0))
        |    * ln(((CAST(cc AS DOUBLE) + 0.5)
        |        / (CAST(t.n_cur AS DOUBLE) + 5.0))
        |      / ((CAST(cr AS DOUBLE) + 0.5)
        |        / (CAST(t.n_ref AS DOUBLE) + 5.0))), 9)
        |    AS DECIMAL(20,9))) AS DOUBLE), 6) AS psi
        |FROM filled f JOIN tot t ON f.event_type = t.event_type
        |GROUP BY t.event_type, t.n_ref, t.n_cur
        |ORDER BY t.event_type""".stripMargin,

    "part_price_dispersion" ->
      """WITH a AS (
        |  SELECT p_type, count(*) AS n_parts,
        |    sum(CAST(p_retailprice AS DECIMAL(18,2))) AS sp,
        |    sum(CAST(p_retailprice AS DECIMAL(18,2))
        |      * CAST(p_retailprice AS DECIMAL(18,2))) AS spp,
        |    round(min(p_retailprice), 2) AS min_price,
        |    round(max(p_retailprice), 2) AS max_price
        |  FROM part GROUP BY 1)
        |SELECT p_type, n_parts,
        |  round(CAST(sp AS DOUBLE) / n_parts, 6) AS mean_price,
        |  round(sqrt(greatest(CAST(0 AS DOUBLE),
        |      CAST(spp AS DOUBLE) / n_parts
        |      - (CAST(sp AS DOUBLE) / n_parts)
        |        * (CAST(sp AS DOUBLE) / n_parts)))
        |    / (CAST(sp AS DOUBLE) / n_parts), 6) AS cv,
        |  min_price, max_price
        |FROM a ORDER BY p_type""".stripMargin,

    // regressors rounded to the 1e-9 grid and summed as exact decimals
    // (the agg_regression discipline applied to ln() doubles); finals
    // IEEE on the cast sums
    "price_elasticity" ->
      """WITH z AS (
        |  SELECT p_brand AS brand,
        |    CAST(round(ln(CAST(l_extendedprice AS DOUBLE)
        |      / CAST(l_quantity AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
        |    CAST(round(ln(CAST(l_quantity AS DOUBLE)), 9)
        |      AS DECIMAL(12,9)) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |st AS (
        |  SELECT brand, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx
        |  FROM z GROUP BY 1)
        |SELECT brand, n,
        |  round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS elasticity
        |FROM st ORDER BY brand""".stripMargin,

    "events_error_budget" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_total,
        |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS n_errors
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT day, n_total, n_errors,
        |    sum(n_errors) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_errors,
        |    sum(n_total) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS cum_total
        |  FROM daily)
        |SELECT day, n_total, CAST(n_errors AS BIGINT) AS n_errors,
        |  round(CAST(n_errors AS DOUBLE) / n_total, 6) AS err_rate,
        |  round(CAST(n_errors AS DOUBLE) / n_total / 0.25, 4) AS burn,
        |  round(CAST(cum_errors AS DOUBLE) / cum_total / 0.25, 4)
        |    AS cum_burn
        |FROM c ORDER BY day""".stripMargin,

    "part_assortment_gaps" ->
      """WITH grid AS (
        |  SELECT b.p_brand, t.p_type, z.p_size
        |  FROM (SELECT DISTINCT p_brand FROM part) b
        |  CROSS JOIN (SELECT DISTINCT p_type FROM part) t
        |  CROSS JOIN (SELECT DISTINCT p_size FROM part) z)
        |SELECT p_brand, p_type, p_size FROM grid
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part p
        |  WHERE p.p_brand = grid.p_brand AND p.p_type = grid.p_type
        |    AND p.p_size = grid.p_size)
        |ORDER BY p_brand, p_type, p_size""".stripMargin,

    "trend_revenue_drawdown" -> {
      val rev = s"CAST(sum(${sql.discPrice("l_extendedprice", "l_discount")}) AS DOUBLE)"
      s"""WITH daily AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day, $rev AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1),
         |p AS (
         |  SELECT day, revenue,
         |    max(revenue) OVER (ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |  FROM daily),
         |dd AS (
         |  SELECT day, revenue, peak,
         |    round((peak - revenue) / peak, 6) AS drawdown
         |  FROM p)
         |SELECT day, revenue, peak, drawdown,
         |  max(drawdown) OVER (ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS max_drawdown
         |FROM dd ORDER BY day""".stripMargin
    },

    "orders_status_trend" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    o_orderstatus AS status, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total_value
        |  FROM orders GROUP BY 1, 2)
        |SELECT month, status, n_orders, total_value,
        |  round(CAST(n_orders AS DOUBLE)
        |    / sum(n_orders) OVER (PARTITION BY month), 6) AS share
        |FROM m ORDER BY month, status""".stripMargin,

    "trend_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT day,
        |    count(*) OVER wc AS cum_n, sum(rev) OVER wc AS cum_s,
        |    count(*) OVER wa AS tot_n, sum(rev) OVER wa AS tot_s
        |  FROM daily
        |  WINDOW wc AS (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wa AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND UNBOUNDED FOLLOWING)),
        |c AS (
        |  SELECT day, cum_n, tot_n,
        |    round(CAST(cum_s AS DOUBLE) / cum_n, 6) AS mean_before,
        |    round(CAST(tot_s - cum_s AS DOUBLE) / (tot_n - cum_n), 6)
        |      AS mean_after
        |  FROM p WHERE cum_n >= 30 AND tot_n - cum_n >= 30),
        |g AS (
        |  SELECT day, cum_n, tot_n, mean_before, mean_after,
        |    round(mean_after - mean_before, 6) AS shift
        |  FROM c),
        |r AS (
        |  SELECT CAST(row_number() OVER (ORDER BY abs(shift) DESC, day)
        |      AS BIGINT) AS rank,
        |    day AS split_day, cum_n AS n_before, tot_n - cum_n AS n_after,
        |    mean_before, mean_after, shift
        |  FROM g)
        |SELECT * FROM r WHERE rank <= 5 ORDER BY rank""".stripMargin,

    "events_markov_attribution" -> {
      val rounds = (1 to 4).map { i =>
        s"""r$i AS (
           |  SELECT g.scenario, g.state,
           |    CASE WHEN g.state = 'purchase' THEN CAST(1 AS DOUBLE)
           |         ELSE COALESCE(a.acc, CAST(0 AS DOUBLE)) END AS r
           |  FROM grid g LEFT JOIN (
           |    SELECT t.scenario, t.prev AS state,
           |      CAST(sum(CAST(round(t.p * r.r, 12) AS DECIMAL(16,12)))
           |        AS DOUBLE) AS acc
           |    FROM strans t JOIN r${i - 1} r
           |      ON r.scenario = t.scenario AND r.state = t.cur
           |    GROUP BY 1, 2) a
           |  ON a.scenario = g.scenario AND a.state = g.state)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH seq AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS prev,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn
         |  FROM events),
         |trans AS (
         |  SELECT prev, cur,
         |    round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev),
         |      6) AS p
         |  FROM (SELECT prev, event_type AS cur, count(*) AS n
         |        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2) m),
         |sn AS (SELECT event_type AS state, count(*) AS n
         |       FROM seq WHERE rn = 1 GROUP BY 1),
         |startsp AS (
         |  SELECT state,
         |    round(CAST(n AS DOUBLE) / (SELECT sum(n) FROM sn), 6) AS sp
         |  FROM sn),
         |scen(scenario, removed) AS (VALUES
         |  ('base', ''), ('no_click', 'click'), ('no_view', 'view'),
         |  ('no_error', 'error'), ('no_signup', 'signup')),
         |states AS (SELECT DISTINCT event_type AS state FROM events),
         |grid AS (
         |  SELECT s.scenario, st.state FROM states st CROSS JOIN scen s
         |  WHERE st.state <> s.removed),
         |strans AS (
         |  SELECT s.scenario, t.prev, t.cur, t.p
         |  FROM trans t CROSS JOIN scen s
         |  WHERE t.prev <> s.removed AND t.cur <> s.removed),
         |r0 AS (
         |  SELECT scenario, state,
         |    CASE WHEN state = 'purchase' THEN CAST(1 AS DOUBLE)
         |         ELSE CAST(0 AS DOUBLE) END AS r
         |  FROM grid),
         |$rounds,
         |conv AS (
         |  SELECT r.scenario,
         |    CAST(sum(CAST(round(sp.sp * r.r, 12) AS DECIMAL(16,12)))
         |      AS DOUBLE) AS conversion
         |  FROM r4 r JOIN startsp sp ON sp.state = r.state GROUP BY 1),
         |b AS (SELECT conversion AS base_conv FROM conv
         |      WHERE scenario = 'base')
         |SELECT scenario, conversion,
         |  round((base_conv - conversion) / base_conv, 6)
         |    AS removal_effect
         |FROM conv CROSS JOIN b ORDER BY scenario""".stripMargin
    },

    "events_uplift_cuped" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(COALESCE(sum(CASE
        |        WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
        |        THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS DECIMAL(14,2)) AS x,
        |    CAST(COALESCE(sum(CASE
        |        WHEN ts >= TIMESTAMP '2024-01-16 00:00:00'
        |        THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS DECIMAL(14,2)) AS y,
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 'control' ELSE 'treatment' END AS arm
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
        |  FROM u),
        |arms AS (
        |  SELECT arm, count(*) AS n_users, sum(x) AS sxa, sum(y) AS sya
        |  FROM u GROUP BY 1),
        |j AS (
        |  SELECT arm, n_users, sxa, sya, n, sx, sy,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
        |  FROM arms CROSS JOIN g)
        |SELECT arm, n_users,
        |  round(CAST(sxa AS DOUBLE) / n_users, 6) AS mean_pre,
        |  round(CAST(sya AS DOUBLE) / n_users, 6) AS mean_post,
        |  round(CAST(sya AS DOUBLE) / n_users
        |    - (covn / varxn) * (CAST(sxa AS DOUBLE) / n_users
        |      - CAST(sx AS DOUBLE) / n), 6) AS mean_adjusted,
        |  round(covn / varxn, 6) AS theta,
        |  round(covn * covn / (varxn * varyn), 6) AS var_reduction
        |FROM j ORDER BY arm""".stripMargin,

    "events_sample_size_power" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(14,2))
        |      AS y
        |  FROM events GROUP BY 1),
        |g AS (
        |  SELECT count(*) AS n, sum(y) AS sy, sum(y * y) AS syy FROM u),
        |m AS (SELECT unnest([1, 2, 5, 10]) AS mde_pct),
        |j AS (
        |  SELECT mde_pct,
        |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
        |    (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS var_y
        |  FROM g CROSS JOIN m),
        |k AS (
        |  SELECT mde_pct, mean_y, var_y,
        |    CAST(mde_pct AS DOUBLE) / 100 * mean_y AS delta
        |  FROM j)
        |SELECT CAST(mde_pct AS BIGINT) AS mde_pct,
        |  round(mean_y, 6) AS mean_metric,
        |  round(delta, 6) AS delta,
        |  CAST(ceil(2 * var_y
        |    * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
        |    / (delta * delta)) AS BIGINT) AS n_per_arm
        |FROM k ORDER BY mde_pct""".stripMargin,

    "events_autocorrelation" ->
      """WITH hc AS (
        |  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
        |    count(*) AS ce
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
        |grid AS (
        |  SELECT unnest(generate_series(h0, h1)) AS h FROM bounds),
        |series AS (
        |  SELECT g.h, CAST(COALESCE(hc.ce, 0) AS BIGINT) AS c
        |  FROM grid g LEFT JOIN hc ON hc.h = g.h),
        |gl AS (
        |  SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM series),
        |lags AS (SELECT unnest([1, 2, 3, 6, 12, 24, 48, 168]) AS k),
        |p AS (
        |  SELECT l.k, count(*) AS m,
        |    CAST(sum(a.c * b.c) AS BIGINT) AS sxy,
        |    CAST(sum(a.c) AS BIGINT) AS sh,
        |    CAST(sum(b.c) AS BIGINT) AS st
        |  FROM series a CROSS JOIN lags l
        |  JOIN series b ON b.h = a.h + l.k
        |  GROUP BY 1),
        |j AS (
        |  SELECT k, m, sxy, sh, st, n, s2,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        |  FROM p CROSS JOIN gl)
        |SELECT CAST(k AS BIGINT) AS lag_hours, m AS n_pairs,
        |  round((CAST(sxy AS DOUBLE)
        |    - ybar * CAST(sh + st AS DOUBLE)
        |    + CAST(m AS DOUBLE) * ybar * ybar)
        |    / (CAST(s2 AS DOUBLE)
        |      - CAST(n AS DOUBLE) * ybar * ybar), 6) AS acf
        |FROM j ORDER BY lag_hours""".stripMargin,

    "events_funnel_significance" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
        |    max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS p
        |  FROM events GROUP BY 1),
        |cn AS (
        |  SELECT CAST(sum(v) AS BIGINT) AS n_view,
        |    CAST(sum(CASE WHEN v = 1 AND c = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_click,
        |    CAST(sum(CASE WHEN v = 1 AND c = 1 AND p = 1 THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_purchase
        |  FROM u),
        |steps AS (
        |  SELECT '1_view_to_click' AS step, n_view AS n_denom,
        |    n_click AS n_num FROM cn
        |  UNION ALL
        |  SELECT '2_click_to_purchase', n_click, n_purchase FROM cn),
        |w AS (
        |  SELECT step, n_denom, n_num,
        |    CAST(n_num AS DOUBLE) / CAST(n_denom AS DOUBLE) AS p,
        |    CAST(n_denom AS DOUBLE) AS nd
        |  FROM steps),
        |f AS (
        |  SELECT step, n_denom, n_num, p, nd,
        |    (p + 1.959964 * 1.959964 / (2 * nd))
        |      / (1 + 1.959964 * 1.959964 / nd) AS center,
        |    1.959964 * sqrt(p * (1 - p) / nd
        |      + 1.959964 * 1.959964 / (4 * nd * nd))
        |      / (1 + 1.959964 * 1.959964 / nd) AS half
        |  FROM w)
        |SELECT step, n_denom, n_num, round(p, 6) AS rate,
        |  round(center - half, 6) AS wilson_lo,
        |  round(center + half, 6) AS wilson_hi
        |FROM f ORDER BY step""".stripMargin,

    "events_error_burn_multiwindow" ->
      """WITH hc AS (
        |  SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
        |    count(*) AS tot,
        |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS err
        |  FROM events GROUP BY 1),
        |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
        |grid AS (
        |  SELECT g.h, CAST(COALESCE(hc.tot, 0) AS BIGINT) AS tot,
        |    CAST(COALESCE(hc.err, 0) AS BIGINT) AS err
        |  FROM (SELECT unnest(generate_series(h0, h1)) AS h
        |        FROM bounds) g
        |  LEFT JOIN hc ON hc.h = g.h),
        |w AS (
        |  SELECT h, tot, err,
        |    sum(err) OVER w1 AS e1, sum(tot) OVER w1 AS t1,
        |    sum(err) OVER w6 AS e6, sum(tot) OVER w6 AS t6,
        |    sum(err) OVER w24 AS e24, sum(tot) OVER w24 AS t24
        |  FROM grid
        |  WINDOW
        |    w1 AS (ORDER BY h ROWS BETWEEN 0 PRECEDING
        |      AND CURRENT ROW),
        |    w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING
        |      AND CURRENT ROW),
        |    w24 AS (ORDER BY h ROWS BETWEEN 23 PRECEDING
        |      AND CURRENT ROW)),
        |b AS (
        |  SELECT h, tot, err,
        |    CASE WHEN t1 > 0 THEN CAST(e1 AS DOUBLE)
        |      / CAST(t1 AS DOUBLE) / 0.25 END AS b1,
        |    CASE WHEN t6 > 0 THEN CAST(e6 AS DOUBLE)
        |      / CAST(t6 AS DOUBLE) / 0.25 END AS b6,
        |    CASE WHEN t24 > 0 THEN CAST(e24 AS DOUBLE)
        |      / CAST(t24 AS DOUBLE) / 0.25 END AS b24
        |  FROM w)
        |SELECT h AS hour_idx, tot, err,
        |  round(b1, 6) AS burn_1h, round(b6, 6) AS burn_6h,
        |  round(b24, 6) AS burn_24h,
        |  CASE WHEN b1 > 1.2 AND b6 > 1.1 THEN 'page'
        |       WHEN b6 > 1.1 AND b24 > 1.05 THEN 'ticket'
        |       ELSE 'ok' END AS alert
        |FROM b ORDER BY hour_idx""".stripMargin,

    "events_next_event_eval" ->
      """WITH seq AS (
        |  SELECT user_id, ts, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM events),
        |tr AS (SELECT * FROM seq WHERE next IS NOT NULL),
        |fitc AS (
        |  SELECT event_type AS prev, next, count(*) AS cnt
        |  FROM tr WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1, 2),
        |fit AS (
        |  SELECT prev, next AS predicted FROM (
        |    SELECT prev, next, row_number() OVER (PARTITION BY prev
        |      ORDER BY cnt DESC, next) AS rn
        |    FROM fitc) z WHERE rn = 1)
        |SELECT f.prev, f.predicted, count(*) AS n_eval,
        |  CAST(sum(CASE WHEN t.next = f.predicted THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_correct,
        |  round(CAST(sum(CASE WHEN t.next = f.predicted THEN 1 ELSE 0
        |    END) AS DOUBLE) / count(*), 6) AS accuracy
        |FROM tr t JOIN fit f ON f.prev = t.event_type
        |WHERE t.ts >= TIMESTAMP '2024-01-16 00:00:00'
        |GROUP BY 1, 2 ORDER BY f.prev""".stripMargin,

    "events_feature_mi" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 180
        |      THEN 1 ELSE 0 END) AS conv,
        |    list(DISTINCT event_type) AS types
        |  FROM events GROUP BY 1),
        |nn AS (SELECT count(*) AS n,
        |       CAST(sum(conv) AS BIGINT) AS n_conv FROM u),
        |cells AS (
        |  SELECT t,
        |    CAST(sum(CASE WHEN has AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN has AND conv = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT has AND conv = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT has AND conv = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d
        |  FROM (
        |    SELECT conv, tt.t, list_contains(types, tt.t) AS has
        |    FROM u CROSS JOIN (SELECT unnest(
        |      ['click', 'view', 'signup', 'error']) AS t) tt) z
        |  GROUP BY 1),
        |m AS (
        |  SELECT t, a, b, c, d, CAST(n AS DOUBLE) AS nd, n, n_conv
        |  FROM cells CROSS JOIN nn)
        |SELECT t AS event_type, a + b AS n_users_with,
        |  round(
        |    (CASE WHEN a > 0 THEN CAST(a AS DOUBLE) / nd
        |      * log2(CAST(a AS DOUBLE) * nd
        |        / (CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)))
        |      ELSE CAST(0 AS DOUBLE) END)
        |    + (CASE WHEN b > 0 THEN CAST(b AS DOUBLE) / nd
        |      * log2(CAST(b AS DOUBLE) * nd
        |        / (CAST(a + b AS DOUBLE) * CAST(b + d AS DOUBLE)))
        |      ELSE CAST(0 AS DOUBLE) END)
        |    + (CASE WHEN c > 0 THEN CAST(c AS DOUBLE) / nd
        |      * log2(CAST(c AS DOUBLE) * nd
        |        / (CAST(c + d AS DOUBLE) * CAST(a + c AS DOUBLE)))
        |      ELSE CAST(0 AS DOUBLE) END)
        |    + (CASE WHEN d > 0 THEN CAST(d AS DOUBLE) / nd
        |      * log2(CAST(d AS DOUBLE) * nd
        |        / (CAST(c + d AS DOUBLE) * CAST(b + d AS DOUBLE)))
        |      ELSE CAST(0 AS DOUBLE) END), 6) AS mi_bits,
        |  round((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE))
        |    / (CAST(n_conv AS DOUBLE) / n), 6) AS conversion_lift
        |FROM m ORDER BY event_type""".stripMargin,

    "supplier_cr4" -> {
      val rev = s"sum(${sql.discPrice("l_extendedprice", "l_discount")})"
      s"""WITH bs AS (
         |  SELECT p_type, l_suppkey, $rev AS rev
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY 1, 2),
         |tot AS (
         |  SELECT p_type, sum(rev) AS tot, count(*) AS n_suppliers
         |  FROM bs GROUP BY 1),
         |top4 AS (
         |  SELECT p_type, sum(rev) AS top4 FROM (
         |    SELECT p_type, rev, row_number() OVER (PARTITION BY p_type
         |      ORDER BY rev DESC, l_suppkey) AS rn
         |    FROM bs) z WHERE rn <= 4 GROUP BY 1)
         |SELECT t.p_type, t.n_suppliers,
         |  round(CAST(f.top4 AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         |    AS cr4
         |FROM tot t JOIN top4 f ON f.p_type = t.p_type
         |ORDER BY t.p_type""".stripMargin
    },

    "trend_price_volume_bridge" -> {
      val rev = sql.moneyVol
      s"""WITH by_year AS (
         |  SELECT p_type, year(CAST(o_orderdate AS DATE)) AS yr,
         |    $rev AS rev,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN part ON l_partkey = p_partkey
         |  WHERE year(CAST(o_orderdate AS DATE)) IN (1997, 1998)
         |  GROUP BY 1, 2),
         |y1 AS (SELECT p_type, rev AS rev1, qty AS qty1 FROM by_year
         |       WHERE yr = 1997),
         |y2 AS (SELECT p_type, rev AS rev2, qty AS qty2 FROM by_year
         |       WHERE yr = 1998),
         |j AS (
         |  SELECT y1.p_type, rev1, qty1, rev2, qty2,
         |    rev1 / CAST(qty1 AS DOUBLE) AS p1,
         |    rev2 / CAST(qty2 AS DOUBLE) AS p2
         |  FROM y1 JOIN y2 ON y2.p_type = y1.p_type)
         |SELECT p_type, rev1 AS rev_1997, rev2 AS rev_1998,
         |  rev2 - rev1 AS delta,
         |  (p2 - p1) * CAST(qty2 AS DOUBLE) AS price_effect,
         |  CAST(qty2 - qty1 AS DOUBLE) * p1 AS volume_effect
         |FROM j ORDER BY p_type""".stripMargin
    }
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY.md §2B "Window functions").
  * Every window order includes a unique tiebreak key so frames are
  * deterministic; computed rank-style ints are cast to BIGINT to match
  * DuckDB's output types.
  */
object Windows {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rank" -> { (s, d) =>
      val byPrice = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byPriceTies = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc)
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byPrice).cast("long").as("rn"),
          rank().over(byPriceTies).cast("long").as("rnk"),
          dense_rank().over(byPriceTies).cast("long").as("drnk"))
        .orderBy("o_orderpriority", "rn")
    },

    "win_lag_lead" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          lag("value", 1, -1.0).over(w).as("prev_val"),
          lead("value", 1, -1.0).over(w).as("next_val"))
        .orderBy("event_id")
    },

    "win_running" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(money(col("o_totalprice"))).over(w).cast("double")
            .as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // time-RANGE frame: the trailing-1-hour window per user — frames are
    // defined by timestamp distance, not row offsets (equal timestamps are
    // peers, so the result is order-independent within ties). Epoch
    // microseconds on both engines keep the frame arithmetic integral.
    "win_range_time" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).cast("long").as("cnt_1h"),
          sum(money(col("value"))).over(w).cast("double").as("sum_1h"))
        .orderBy("event_id")
    },

    // forward-fill (LOCF) over a sparse time series: the gap-filling pass
    // sensor/price pipelines run before feature extraction. Only purchase
    // rows carry an observation; every later row per user inherits the
    // most recent one via last(ignoreNulls) over a running frame — one
    // window shuffle on user_id, state is a single value per partition
    // scan, so the pass stays linear at any history length. Ties on ts
    // are broken by event_id so the fill is engine-independent.
    "win_ffill" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("obs",
          when(col("event_type") === "purchase", col("value")))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"),
          last(col("obs"), ignoreNulls = true).over(w).as("last_purchase"))
        .orderBy("event_id")
    },

    "win_moving" -> { (s, d) =>
      val w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
        .rangeBetween(-100, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          (sum(money(col("o_totalprice"))).over(w).cast("double")
            / count(lit(1)).over(w)).as("mov_avg"))
        .orderBy("o_orderkey")
    },

    // positional value functions over an explicit full-partition frame:
    // nth_value needs the whole partition visible, so the frame is
    // unbounded on both sides (the default running frame would make
    // nth/last depend on the current row)
    "win_nth" -> { (s, d) =>
      val wAll = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          first(col("o_orderkey")).over(wAll).as("top_order"),
          nth_value(col("o_orderkey"), 2).over(wAll).as("second_order"),
          last(col("o_orderkey")).over(wAll).as("bottom_order"))
        .orderBy("o_orderkey")
    },

    "win_ntile_first" -> { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
      val wAll = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).cast("long").as("quartile"),
          first("c_name").over(w).as("poorest"),
          last("c_name").over(wAll).as("richest"))
        .orderBy("c_custkey")
    },

    "win_percent" -> { (s, d) =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy("c_acctbal", "c_custkey")
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_custkey")
    },

    "win_topk_group" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // the same top-3-per-customer answer computed by the custom
    // whole-operator stack (graft.plans.TopKPerKey: logical node →
    // strategy → bounded-heap physical operator, injected via
    // GraftExtensions) instead of Exchange → Sort → Window → Filter.
    // O(n log K) heaps, shuffle carries ≤ K rows per (key, partition);
    // PlanSpec pins "no Sort, no Window" and OperatorSpec pins result ==
    // the window formulation.
    "win_topk_native" -> { (s, d) =>
      graft.plans.TopKPerKey.topK(
          t(s, d, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .orderBy(col("o_custkey"),
          col("o_totalprice").desc, col("o_orderkey"))
    },

    // gaps-and-islands: runs of consecutive same-type events per user
    // (lag-compare marks run breaks, a running sum numbers the islands,
    // two aggregations summarize) — the behavioral-run analysis
    // (streaks, retention runs, alarm flapping) that plain groupBy can't
    // see because it ignores adjacency. One shuffle on user_id: both
    // windows and the final aggregate share the partition key.
    "win_islands" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = lag(col("event_type"), 1).over(w)
      events(s, d)
        .withColumn("brk",
          when(prev.isNull || col("event_type") =!= prev, 1).otherwise(0))
        .withColumn("island", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_islands"),
          max(col("run_len")).as("max_run"),
          sum(col("run_len")).as("n_events"))
        .orderBy("user_id")
    },

    // truncated EWMA (α = 0.5, depth 8): exponentially-weighted moving
    // average of value per user — the smoothing pass monitoring and
    // feature pipelines run per entity. A true EWMA is a sequential
    // recurrence (not window-expressible); the depth-8 truncation
    // under-weights by < 0.4% and becomes EIGHT lag() reads in ONE
    // window pass (one shuffle, O(depth) state per scan). Weights 2⁻ʲ
    // are exact binary doubles, the weighted sum is a fixed-order
    // per-row expression — bit-identical on both engines.
    "win_ewma" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val depth = 8
      val base = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          money(col("value")).cast("double").as("y"))
      val lagged = (0 until depth).foldLeft(base) { (df, j) =>
        df.withColumn(s"y$j",
          if (j == 0) col("y") else lag(col("y"), j).over(w))
      }
      val num = (0 until depth).map(j =>
        coalesce(col(s"y$j") * lit(math.pow(0.5, j)), lit(0.0)))
        .reduce(_ + _)
      val den = (0 until depth).map(j =>
        when(col(s"y$j").isNotNull, lit(math.pow(0.5, j)))
          .otherwise(lit(0.0)))
        .reduce(_ + _)
      lagged
        .select(col("user_id"), col("event_id"), col("y").as("value"),
          round(num / den, 6).as("ewma"))
        .orderBy("event_id")
    },

    // rolling exact median over the trailing 5 events — the robust
    // smoother (EWMA follows spikes; the median ignores them). A 5-row
    // frame means the median is a PURE expression: sort the 5 lagged
    // values in-row and take the middle — no percentile state, no frame
    // aggregate, emitted only once the frame is full (the first 4 rows
    // per user are null, like slope5 before 2 points). One window
    // shuffle, O(depth) state per scan.
    "win_rolling_median" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val base = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          money(col("value")).cast("double").as("y"))
      val lagged = (1 to 4).foldLeft(base) { (df, j) =>
        df.withColumn(s"y$j", lag(col("y"), j).over(w))
      }
      lagged
        .select(col("user_id"), col("event_id"), col("y").as("value"),
          when(col("y4").isNotNull,
            element_at(array_sort(array(col("y"), col("y1"), col("y2"),
              col("y3"), col("y4"))), 3)).as("median5"))
        .orderBy("event_id")
    },

    // rolling least-squares trend: per-user slope of value over the last
    // 5 events (x = per-user ordinal, so the slope is per-step drift) —
    // the windowed trend detector monitoring pipelines run per entity.
    // The five sufficient statistics are window sums of exact decimals
    // over the 5-row frame (count/Σx/Σy/Σxy/Σx²) — frame math is exact,
    // only the final slope division runs in IEEE double. One user-keyed
    // window shuffle, O(1) state per scan — linear at any history.
    "win_rolling_slope" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val wf = w.rowsBetween(-4, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          money(col("value")).as("y"))
        .withColumn("x", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wf))
        .withColumn("sx", sum(col("x").cast("decimal(19,0)")).over(wf))
        .withColumn("sy", sum(col("y")).over(wf))
        .withColumn("sxy", sum(expr(
          "CAST(x AS DECIMAL(19,0)) * y")).over(wf))
        .withColumn("sxx", sum(expr(
          "CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))")).over(wf))
        .select(col("user_id"), col("event_id"), col("x").as("rn"),
          col("y").cast("double").as("value"),
          // + 0.0 normalizes IEEE −0.0 (a sign-flipped exact-zero
          // numerator) to +0.0 on both engines
          when(col("n") >= 2, round(
            (col("n").cast("double") * col("sxy").cast("double")
              - col("sx").cast("double") * col("sy").cast("double"))
            / (col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 6)
            + lit(0.0))
            .as("slope5"))
        .orderBy("event_id")
    },

    // trailing-10 Pearson correlation between quantity and extended price
    // per supplier — the rolling co-movement monitor (win_rolling_slope's
    // two-variable sibling). All five window moments are EXACT decimal
    // sums (inputs are 2-decimal money values, products bounded well
    // inside precision 38), so the zero-variance guard is an exact
    // decimal comparison — never a float epsilon — and the only doubles
    // are the final correctly-rounded formula both engines evaluate in
    // the same parenthesization. Windows are per-supplier (bounded
    // partitions). The fixture's (orderkey, linenumber) is NOT unique
    // (duplicate keys with distinct payloads exist), so the window order
    // includes x and y: any remaining ties are fully identical rows,
    // interchangeable without moving a moment — and the output is keyed
    // by (supplier, rn) so the result rows have a unique identity.
    "win_rolling_corr" -> { (s, d) =>
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("x"), col("y"))
      val wf = w.rowsBetween(-9, Window.currentRow)
      t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"),
          expr("CAST(l_quantity AS DECIMAL(9,2))").as("x"),
          expr("CAST(l_extendedprice AS DECIMAL(12,2))").as("y"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wf))
        .withColumn("sx", sum(col("x")).over(wf))
        .withColumn("sy", sum(col("y")).over(wf))
        .withColumn("sxy", sum(expr("x * y")).over(wf))
        .withColumn("sxx", sum(expr("x * x")).over(wf))
        .withColumn("syy", sum(expr("y * y")).over(wf))
        .filter(col("n") === 10)
        .withColumn("varx", expr("n * sxx - sx * sx"))
        .withColumn("vary", expr("n * syy - sy * sy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
          col("l_linenumber"),
          when(col("varx") > 0 && col("vary") > 0,
            round(col("num").cast("double")
              / (sqrt(col("varx").cast("double"))
                * sqrt(col("vary").cast("double"))), 6) + lit(0.0))
            .as("corr10"))
        .orderBy("l_suppkey", "rn")
    }
  )

  def oracle: Map[String, String] = Map(
    "win_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |row_number() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |rank() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC) AS rnk,
        |dense_rank() OVER (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC) AS drnk
        |FROM orders ORDER BY o_orderpriority, rn""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id, value,
        |lag(value, 1, -1.0) OVER w AS prev_val,
        |lead(value, 1, -1.0) OVER w AS next_val
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_running" ->
      s"""SELECT o_custkey, o_orderkey, o_orderdate,
         |CAST(sum(${sql.money("o_totalprice")}) OVER (
         |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |  AS running_total
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_range_time" ->
      s"""SELECT event_id, user_id,
         |count(*) OVER w AS cnt_1h,
         |CAST(sum(${sql.money("value")}) OVER w AS DOUBLE) AS sum_1h
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,
    "win_ffill" ->
      """SELECT event_id, user_id, ts, event_type,
        |last_value(CASE WHEN event_type = 'purchase' THEN value END
        |           IGNORE NULLS) OVER w AS last_purchase
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_moving" ->
      s"""SELECT o_orderkey, o_orderpriority,
         |CAST(sum(${sql.money("o_totalprice")}) OVER w AS DOUBLE)
         |  / count(*) OVER w AS mov_avg
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
         |  RANGE BETWEEN 100 PRECEDING AND CURRENT ROW)
         |ORDER BY o_orderkey""".stripMargin,
    "win_nth" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |first_value(o_orderkey) OVER w AS top_order,
        |nth_value(o_orderkey, 2) OVER w AS second_order,
        |last_value(o_orderkey) OVER w AS bottom_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    "win_ntile_first" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |ntile(4) OVER w AS quartile,
        |first_value(c_name) OVER w AS poorest,
        |last_value(c_name) OVER (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal, c_custkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_percent" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |percent_rank() OVER w AS pr,
        |cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_topk_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_topk_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) ranked
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "win_islands" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR event_type <> lag(event_type) OVER w
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |islands AS (
        |  SELECT user_id,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM marked),
        |runs AS (
        |  SELECT user_id, island, count(*) AS run_len
        |  FROM islands GROUP BY user_id, island)
        |SELECT user_id, count(*) AS n_islands, max(run_len) AS max_run,
        |  CAST(sum(run_len) AS BIGINT) AS n_events
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical fixed-order weighted sum — term order and association
    // mirror the Scala fold exactly
    "win_ewma" -> {
      val yexpr = "CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE)"
      val lags = (0 until 8).map { j =>
        if (j == 0) s"$yexpr AS y0"
        else s"lag($yexpr, $j) OVER w AS y$j"
      }.mkString(",\n        |    ")
      val num = (0 until 8)
        .map(j => s"COALESCE(y$j * ${math.pow(0.5, j)}, 0.0)")
        .mkString(" + ")
      val den = (0 until 8)
        .map(j => s"(CASE WHEN y$j IS NOT NULL THEN ${math.pow(0.5, j)}" +
          " ELSE 0.0 END)")
        .mkString(" + ")
      s"""WITH l AS (
         |  SELECT user_id, event_id,
         |    $lags
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id, y0 AS value,
         |  round(($num) / ($den), 6) AS ewma
         |FROM l ORDER BY event_id""".stripMargin
    },
    "win_rolling_median" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS y
        |  FROM events),
        |l AS (
        |  SELECT user_id, event_id, y,
        |    lag(y, 1) OVER w AS y1, lag(y, 2) OVER w AS y2,
        |    lag(y, 3) OVER w AS y3, lag(y, 4) OVER w AS y4
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id, y AS value,
        |  CASE WHEN y4 IS NOT NULL
        |    THEN list_sort([y, y1, y2, y3, y4])[3] END AS median5
        |FROM l ORDER BY event_id""".stripMargin,
    "win_rolling_slope" ->
      """WITH base AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(value AS DECIMAL(18,2)) AS y,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS x
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, x, y,
        |    count(*) OVER wf AS n,
        |    sum(CAST(x AS DECIMAL(19,0))) OVER wf AS sx,
        |    sum(y) OVER wf AS sy,
        |    sum(CAST(x AS DECIMAL(19,0)) * y) OVER wf AS sxy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |      OVER wf AS sxx
        |  FROM base
        |  WINDOW wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, x AS rn, CAST(y AS DOUBLE) AS value,
        |  CASE WHEN n >= 2 THEN round(
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
        |  END AS slope5
        |FROM m ORDER BY event_id""".stripMargin,
    "win_rolling_corr" ->
      """WITH b AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    CAST(l_quantity AS DECIMAL(9,2)) AS x,
        |    CAST(l_extendedprice AS DECIMAL(12,2)) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_suppkey, l_orderkey, l_linenumber,
        |    CAST(row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, x, y)
        |      AS BIGINT) AS rn,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * y) OVER w AS sxy,
        |    sum(x * x) OVER w AS sxx,
        |    sum(y * y) OVER w AS syy
        |  FROM b
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, x, y
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
        |v AS (
        |  SELECT l_suppkey, rn, l_orderkey, l_linenumber,
        |    n * sxx - sx * sx AS varx, n * syy - sy * sy AS vary,
        |    n * sxy - sx * sy AS num
        |  FROM m WHERE n = 10)
        |SELECT l_suppkey, rn, l_orderkey, l_linenumber,
        |  CASE WHEN varx > 0 AND vary > 0 THEN
        |    round(CAST(num AS DOUBLE)
        |      / (sqrt(CAST(varx AS DOUBLE)) * sqrt(CAST(vary AS DOUBLE))),
        |      6) + 0.0
        |  END AS corr10
        |FROM v ORDER BY l_suppkey, rn""".stripMargin
  )
}

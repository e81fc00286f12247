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

  /** Zero-filled daily-revenue day-index series `(di, ri)` shared by
    * `win_ar2_forecast` and `forecast_backtest` — both fold lag
    * self-joins over the identical O(#days) table. One ScopedMemo entry
    * replaces the two per-invocation `.cache()` pins each consumer used
    * to leak (r11 sweep); a missing day is revenue 0, not an absent row.
    */
  private def dayRevSeries(s: SparkSession, d: String): DataFrame =
    graft.plans.ScopedMemo(s, s"day_rev_series#$d") {
      val rev = t(s, d, "orders")
        .groupBy(datediff(to_date(col("o_orderdate")),
          lit("1992-01-01").cast("date")).as("di"))
        .agg(round(sum(money(col("o_totalprice"))), 0)
          .cast("decimal(13,0)").as("ri"))
      val bounds = rev.agg(min(col("di")).as("d0"), max(col("di")).as("d1"))
      bounds
        .select(explode(sequence(col("d0"), col("d1"))).as("di"))
        .join(rev, Seq("di"), "left")
        .select(col("di"),
          coalesce(col("ri"), lit(0).cast("decimal(13,0)")).as("ri"))
    }

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
    },

    // Bollinger bands over the daily revenue series: 20-day rolling mean
    // ± 2σ envelope plus the breakout flag — the volatility-aware anomaly
    // view (a fixed threshold fires on every seasonal swing; the band
    // adapts to local variance). Orders collapse to O(#days) in ONE keyed
    // agg before the single ordered window (the events_error_budget
    // discipline), so the window runs over thousands of rows regardless
    // of corpus size. Rolling moments come from exact-decimal frame sums
    // — and every moment lives in INTEGER (scale-0) decimals: the band
    // math needs whole-dollar resolution, and scale-0 decimal→double
    // casts are a single correctly-rounded conversion on BOTH engines as
    // long as the unscaled value stays under 2^63 (a scale-4
    // sum-of-squares at this magnitude is int128-backed in DuckDB, whose
    // two-step cast to double double-rounds differently from the JVM's
    // correctly-rounded BigDecimal path — measured divergence, 13th
    // significant digit). Window sums are re-tightened to (19,0) so the
    // squares land in DuckDB's int128 class (a (16,0)·(16,0) product
    // stays int64-class there and overflow-RAISES at runtime) while
    // Spark's p≤38 cap still binds; headroom is ~sf1 daily-revenue — at
    // larger scale rescale the unit (dollars → k$) to keep var < 2^63.
    // Bands are emitted UNROUNDED (the
    // trend_revenue_drawdown lesson: round(x, n) at a decimal tie is the
    // double-vs-decimal HALF_UP divergence; raw IEEE arithmetic over
    // identical inputs is bit-identical), and the flag then compares
    // identical bits too.
    "win_bollinger" -> { (s, d) =>
      val w = Window.orderBy("day")
      val wf = w.rowsBetween(-19, Window.currentRow)
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        // explicit round: DuckDB's decimal downscale CAST truncates while
        // Spark's rounds — round(…, 0) is HALF_UP-for-positives on both
        .withColumn("ri", round(col("rev"), 0).cast("decimal(13,0)"))
        .withColumn("n", count(lit(1)).over(wf))
        .withColumn("sr", sum(col("ri")).over(wf).cast("decimal(19,0)"))
        .withColumn("srr",
          sum(expr("ri * ri")).over(wf).cast("decimal(19,0)"))
        .filter(col("n") === 20)
        .withColumn("vari",
          (lit(20).cast("decimal(3,0)") * col("srr")
            - col("sr") * col("sr")).cast("double"))
        .withColumn("mid", col("sr").cast("double") / 20d)
        .withColumn("sd", sqrt(greatest(lit(0d), col("vari"))) / 20d)
        .withColumn("upper", col("mid") + lit(2d) * col("sd"))
        .withColumn("lower", col("mid") - lit(2d) * col("sd"))
        .select(col("day"), col("rev").cast("double").as("revenue"),
          col("mid"), col("upper"), col("lower"),
          when(col("rev").cast("double") > col("upper"), "high")
            .when(col("rev").cast("double") < col("lower"), "low")
            .otherwise("in").as("band_flag"))
        .orderBy("day")
    },

    // Holt's linear (double-exponential) smoothing of daily revenue:
    // level + trend state per day and the one-step-ahead forecast —
    // the trend-aware upgrade of win_ewma (EWMA lags a trending series
    // by a constant offset; Holt's trend term closes it). The recursion
    // l_t = α·y + (1−α)(l+b), b_t = β(l_t−l_{t−1}) + (1−β)b is
    // inherently sequential, so it runs as ONE in-row fold over the
    // packed day-ordered series (the sim_mmr_rerank pack-and-fold
    // discipline): the corpus collapses to O(#days) in one keyed agg,
    // the fold touches each day once, and the result explodes back to
    // Croston's method — the intermittent-demand forecaster (per-SKU
    // series that are MOSTLY zero, where SES/Holt over calendar days
    // just decays to noise): smooth the non-zero demand SIZES and the
    // INTERVALS between them separately (α=0.2), forecast = z/p per
    // day. The win_holt machinery per part: demand days collapse to a
    // per-part array (calendar-bounded, the Holt-Winters in-row-fold
    // argument) and the fold carries ONLY the final (z, p) state — no
    // per-step array append. Fold arithmetic mirrors the partitioned
    // recursive CTE op-for-op (0.2·x + 0.8·state, binary-exact
    // coefficients), rounds only in the final projection. Init: z₁=q₁,
    // p₁=1 (documented choice; Croston's own init is unspecified).
    "win_croston" -> { (s, d) =>
      t(s, d, "lineitem")
        .filter(pmod(col("l_partkey"), lit(97)) === 0)
        .groupBy(col("l_partkey").as("part_key"),
          to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("q"))
        .groupBy("part_key")
        .agg(sort_array(collect_list(struct(col("day"), col("q"))))
          .as("pts"))
        .select(col("part_key"),
          size(col("pts")).cast("long").as("n_demand_days"),
          expr("""
            aggregate(
              slice(pts, 2, greatest(0, size(pts) - 1)),
              named_struct(
                'day', try_element_at(pts, 1).day,
                'z', CAST(try_element_at(pts, 1).q AS DOUBLE),
                'p', CAST(1.0 AS DOUBLE)),
              (acc, pt) -> named_struct(
                'day', pt.day,
                'z', 0.2 * CAST(pt.q AS DOUBLE) + 0.8 * acc.z,
                'p', 0.2 * CAST(datediff(pt.day, acc.day) AS DOUBLE)
                  + 0.8 * acc.p))""").as("st"))
        .select(col("part_key"), col("n_demand_days"),
          round(col("st.z"), 6).as("demand_size_est"),
          round(col("st.p"), 6).as("interval_est"),
          round(col("st.z") / col("st.p"), 6).as("croston_forecast"))
        .orderBy("part_key")
    },

    // rows. α=0.5, β=0.25 are binary-exact doubles and every fold step
    // mirrors the oracle's recursive CTE op-for-op, so the state stays
    // BIT-identical across engines with no rounding anywhere (the
    // win_bollinger lesson). Init: l₁=y₁, b₁=0.
    "win_holt" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .cast("double").as("y"))
        .agg(sort_array(collect_list(struct(col("day"), col("y"))))
          .as("pts"))
        .select(expr("""
          aggregate(
            slice(pts, 2, greatest(0, size(pts) - 1)),
            array(named_struct(
              'day', try_element_at(pts, 1).day,
              'y', try_element_at(pts, 1).y,
              'level', try_element_at(pts, 1).y,
              'trend', CAST(0.0 AS DOUBLE))),
            (acc, p) -> array_append(acc, named_struct(
              'day', p.day,
              'y', p.y,
              'level', 0.5 * p.y
                + 0.5 * (element_at(acc, -1).level
                         + element_at(acc, -1).trend),
              'trend', 0.25 * ((0.5 * p.y
                  + 0.5 * (element_at(acc, -1).level
                           + element_at(acc, -1).trend))
                  - element_at(acc, -1).level)
                + 0.75 * element_at(acc, -1).trend)))
          """).as("hist"))
        .select(explode(col("hist")).as("h"))
        .select(col("h.day").as("day"), col("h.y").as("revenue"),
          col("h.level").as("level"), col("h.trend").as("trend"),
          (col("h.level") + col("h.trend")).as("forecast_next"))
        // empty input leaves only the all-null init struct: drop it so
        // the empty case yields zero rows like the oracle's CTE anchor
        .filter(col("day").isNotNull)
        .orderBy("day")
    },

    // classical seasonal decomposition of daily revenue (additive):
    // trend = centered 7-day moving average, seasonal = per-weekday mean
    // of the detrended series, residual = the rest — the series triage
    // that separates "weekend dip" from "real anomaly" before any alert
    // fires. All cross-row SUMS stay in exact decimal (frame sum sr7,
    // then per-weekday sums of rev AND of sr7 — avg(detrended) =
    // (Σrev − Σsr7/7)/n, so no double is ever re-aggregated); doubles
    // appear only in the final fixed-order division chain, emitted
    // UNROUNDED (bit-identical, the win_bollinger discipline). Weekday
    // comes from epoch-day arithmetic ((day − 1970-01-05) % 7, Mon=0) —
    // engine dayofweek() conventions differ, date subtraction doesn't.
    // O(#days) rows end-to-end after the one keyed agg.
    "win_seasonal_decompose" -> { (s, d) =>
      val wf7 = Window.orderBy("day").rowsBetween(-3, 3)
      val wDow = Window.partitionBy("dow")
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        .withColumn("dow",
          expr("CAST(datediff(day, DATE'1970-01-05') % 7 AS BIGINT)"))
        .withColumn("n7", count(lit(1)).over(wf7))
        .withColumn("sr7", sum(col("rev")).over(wf7))
        .filter(col("n7") === 7)
        .withColumn("s1", sum(col("rev")).over(wDow))
        .withColumn("s2", sum(col("sr7")).over(wDow))
        .withColumn("ndow", count(lit(1)).over(wDow))
        .withColumn("trend", col("sr7").cast("double") / 7d)
        .withColumn("seasonal",
          (col("s1").cast("double") - col("s2").cast("double") / 7d)
            / col("ndow"))
        .select(col("day"), col("dow"),
          col("rev").cast("double").as("revenue"),
          col("trend"), col("seasonal"),
          (col("rev").cast("double") - col("trend") - col("seasonal"))
            .as("residual"))
        .orderBy("day")
    },

    // seasonal/trend STRENGTH of the weekly decomposition — Hyndman's
    // F_s = max(0, 1 − Var(resid)/Var(seasonal+resid)) and its trend
    // twin, the one-row triage that says whether the weekday pattern is
    // load-bearing (F_s → 1: schedule capacity by weekday) or noise
    // (F_s → 0: don't). Components re-derive win_seasonal_decompose's
    // plan; each is rounded to the 1e-9 grid and decimal-summed (value
    // and square both exact) so the variances are partial-agg-proof;
    // the two variance ratios are a fixed-order double chain at the end.
    "win_seasonal_strength" -> { (s, d) =>
      val wf7 = Window.orderBy("day").rowsBetween(-3, 3)
      val wDow = Window.partitionBy("dow")
      val comp = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        .withColumn("dow",
          expr("CAST(datediff(day, DATE'1970-01-05') % 7 AS BIGINT)"))
        .withColumn("n7", count(lit(1)).over(wf7))
        .withColumn("sr7", sum(col("rev")).over(wf7))
        .filter(col("n7") === 7)
        .withColumn("s1", sum(col("rev")).over(wDow))
        .withColumn("s2", sum(col("sr7")).over(wDow))
        .withColumn("ndow", count(lit(1)).over(wDow))
        .withColumn("trend", col("sr7").cast("double") / 7d)
        .withColumn("seasonal",
          (col("s1").cast("double") - col("s2").cast("double") / 7d)
            / col("ndow"))
        .withColumn("residual",
          col("rev").cast("double") - col("trend") - col("seasonal"))
      // 1e-4 grid on DECIMAL(16,4): squares land exactly in (33,8), under
      // BOTH engines' 38-digit cap (a (20,9) grid would need p=41 for the
      // square — DuckDB rejects it outright)
      val terms = comp.select(
        expr("CAST(round(residual, 4) AS DECIMAL(16,4))").as("rd"),
        expr("CAST(round(seasonal + residual, 4) AS DECIMAL(16,4))")
          .as("sr"),
        expr("CAST(round(trend + residual, 4) AS DECIMAL(16,4))")
          .as("tr"))
      terms.agg(count(lit(1)).as("n_days"),
          sum(col("rd")).as("srd"), sum(col("rd") * col("rd")).as("srd2"),
          sum(col("sr")).as("ssr"), sum(col("sr") * col("sr")).as("ssr2"),
          sum(col("tr")).as("str"), sum(col("tr") * col("tr")).as("str2"))
        .select(col("n_days"),
          round(greatest(lit(0d), lit(1d)
            - (col("n_days").cast("double") * col("srd2").cast("double")
              - col("srd").cast("double") * col("srd").cast("double"))
              / (col("n_days").cast("double") * col("ssr2").cast("double")
                - col("ssr").cast("double") * col("ssr").cast("double"))),
            6).as("f_seasonal"),
          round(greatest(lit(0d), lit(1d)
            - (col("n_days").cast("double") * col("srd2").cast("double")
              - col("srd").cast("double") * col("srd").cast("double"))
              / (col("n_days").cast("double") * col("str2").cast("double")
                - col("str").cast("double") * col("str").cast("double"))),
            6).as("f_trend"))
    },

    // CUSUM control chart on daily revenue: two-sided cumulative sums of
    // deviations from the series mean with reset-at-zero, alarm when
    // either side crosses 4σ — the ONLINE changepoint detector
    // (trend_changepoint scans offline; CUSUM is what a monitor runs as
    // days arrive, catching small persistent shifts a fixed threshold
    // misses). Mean/σ come from the integer-dollar decimal moments (the
    // win_bollinger discipline: scale-0 casts are single-rounding on
    // both engines); the reset recursion max(0, prev + (y−μ)) is
    // inherently sequential → ONE in-row fold over the packed series
    // (the win_holt shape), op-for-op identical to the recursive-CTE
    // oracle, so the state stays bit-identical with no rounding.
    "win_cusum" -> { (s, d) =>
      val daily = t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        .withColumn("ri", round(col("rev"), 0).cast("decimal(13,0)"))
        .withColumn("y", col("rev").cast("double"))
      val stats = daily.agg(
          count(lit(1)).cast("decimal(7,0)").as("n"),
          sum(col("ri")).cast("decimal(19,0)").as("sr"),
          sum(expr("ri * ri")).cast("decimal(19,0)").as("srr"))
        .select(
          (col("sr").cast("double") / col("n").cast("double")).as("mu"),
          (sqrt(greatest(lit(0d),
            (col("n") * col("srr") - col("sr") * col("sr"))
              .cast("double"))) / col("n").cast("double")).as("sd"))
      daily
        .agg(sort_array(collect_list(struct(col("day"), col("y"))))
          .as("pts"))
        .crossJoin(stats)
        .select(col("sd"), explode(expr("""
          aggregate(
            slice(pts, 2, greatest(0, size(pts) - 1)),
            array(named_struct(
              'day', try_element_at(pts, 1).day,
              'y', try_element_at(pts, 1).y,
              'cpos', greatest(CAST(0.0 AS DOUBLE),
                try_element_at(pts, 1).y - mu),
              'cneg', greatest(CAST(0.0 AS DOUBLE),
                mu - try_element_at(pts, 1).y))),
            (acc, p) -> array_append(acc, named_struct(
              'day', p.day,
              'y', p.y,
              'cpos', greatest(CAST(0.0 AS DOUBLE),
                element_at(acc, -1).cpos + (p.y - mu)),
              'cneg', greatest(CAST(0.0 AS DOUBLE),
                element_at(acc, -1).cneg + (mu - p.y)))))
          """)).as("h"))
        .select(col("h.day").as("day"), col("h.y").as("revenue"),
          col("h.cpos").as("cusum_pos"), col("h.cneg").as("cusum_neg"),
          when(col("h.cpos") > lit(4d) * col("sd"), "up")
            .when(col("h.cneg") > lit(4d) * col("sd"), "down")
            .otherwise("ok").as("alarm"))
        .filter(col("day").isNotNull) // empty-input init struct guard
        .orderBy("day")
    },

    // Yule–Walker AR(2) fit of daily revenue — the autoregression that
    // turns events_autocorrelation's descriptive r_k into a forecasting
    // model (phi1/phi2 solve the 2×2 Yule–Walker system; the 1-step
    // forecast extrapolates from the last two observed days). The
    // corpus collapses to O(#days) in one keyed agg; the series is
    // ZERO-FILLED over the full day span (a missing day is revenue 0,
    // not an absent row — gap-skipping biases r_k), lag pairs are two
    // O(#days) self-joins on the day index (window-free: a global
    // row_number would be a one-task sort; day+k arithmetic is an
    // equi-join), and every moment sum is an exact integer-dollar
    // decimal (win_bollinger discipline) so doubles appear only in the
    // final fixed-order formulas. Output is ONE row — nothing about
    // this query grows with corpus size except the one keyed agg.
    "win_ar2_forecast" -> { (s, d) =>
      val series = dayRevSeries(s, d)
      val g = series.agg(count(lit(1)).cast("decimal(7,0)").as("n"),
        sum(col("ri")).cast("decimal(19,0)").as("s1"),
        sum(expr("ri * ri")).cast("decimal(30,0)").as("s2"),
        max(col("di")).as("dmax"))
      def lagSums(k: Int) = series
        .join(series.select((col("di") - k).as("di"),
          col("ri").as("rk")), "di")
        .agg(count(lit(1)).cast("decimal(7,0)").as(s"m$k"),
          sum(expr("ri * rk")).cast("decimal(30,0)").as(s"sxy$k"),
          sum(col("ri")).cast("decimal(19,0)").as(s"sa$k"),
          sum(col("rk")).cast("decimal(19,0)").as(s"sb$k"))
      def acf(k: Int) =
        (col(s"sxy$k").cast("double")
          - col("ybar") * (col(s"sa$k") + col(s"sb$k")).cast("double")
          + col(s"m$k").cast("double") * col("ybar") * col("ybar")) /
          (col("s2").cast("double")
            - col("n").cast("double") * col("ybar") * col("ybar"))
      g.crossJoin(lagSums(1)).crossJoin(lagSums(2))
        .join(series.select(col("di").as("dT"), col("ri").as("yT")),
          col("dT") === col("dmax"))
        .join(series.select(col("di").as("dT1"), col("ri").as("yT1")),
          col("dT1") === col("dmax") - 1)
        .withColumn("ybar",
          col("s1").cast("double") / col("n").cast("double"))
        .withColumn("r1", acf(1)).withColumn("r2", acf(2))
        .withColumn("phi1",
          col("r1") * (lit(1d) - col("r2"))
            / (lit(1d) - col("r1") * col("r1")))
        .withColumn("phi2",
          (col("r2") - col("r1") * col("r1"))
            / (lit(1d) - col("r1") * col("r1")))
        .select(col("n").cast("long").as("n_days"),
          round(col("ybar"), 2).as("mean_rev"),
          round(col("r1"), 6).as("r1"), round(col("r2"), 6).as("r2"),
          round(col("phi1"), 6).as("phi1"),
          round(col("phi2"), 6).as("phi2"),
          round(col("ybar")
            + col("phi1") * (col("yT").cast("double") - col("ybar"))
            + col("phi2") * (col("yT1").cast("double") - col("ybar")),
            2).as("forecast_next"))
    },

    // forecast backtest on the daily revenue series: hold out the last 7
    // days, score naive (last train value), seasonal-naive (value 7 days
    // earlier), and drift (last + trend extrapolation) by MAE and MAPE —
    // the eval-closing rule applied to forecasting (events_forecast
    // _baseline PRODUCES baselines; nothing previously measured which
    // one to trust). Zero-filled O(#days) series, predictions by
    // join/scalar arithmetic (window-free), each |error| term rounded to
    // the 1e-6 grid and summed as exact DECIMAL so the 7-term means are
    // partial-agg-proof. Output: 3 method rows at any corpus size.
    "forecast_backtest" -> { (s, d) =>
      val H = 7
      val series = dayRevSeries(s, d)
      // bounds re-derived from the memoized series (same d0/d1 values —
      // the series is zero-filled over exactly [d0, d1])
      val bounds = series.agg(min(col("di")).as("d0"),
        max(col("di")).as("d1"))
      val split = broadcast(series.crossJoin(broadcast(bounds))
        .filter(col("di") === col("d1") - H)
        .select(col("d1"), (col("d1") - H).as("tEnd"),
          col("ri").as("yLast"), col("d0")))
      val first = broadcast(series.crossJoin(broadcast(bounds))
        .filter(col("di") === col("d0"))
        .select(col("ri").as("yFirst")))
      val hold = series.crossJoin(split).crossJoin(first)
        .filter(col("di") > col("tEnd"))
        .join(series.select((col("di") + H).as("di"),
          col("ri").as("ySeason")), "di")
        .withColumn("slope",
          (col("yLast") - col("yFirst")).cast("double")
            / (col("tEnd") - col("d0")).cast("double"))
        .withColumn("h", (col("di") - col("tEnd")).cast("double"))
      val methods = Seq(
        ("naive", col("yLast").cast("double")),
        ("snaive", col("ySeason").cast("double")),
        ("drift", col("yLast").cast("double") + col("slope") * col("h")))
      val perMethod = methods.map { case (m, pred) =>
        hold
          .withColumn("err", pred - col("ri").cast("double"))
          .select(lit(m).as("method"),
            col("err"), col("ri").cast("double").as("actual"))
          .withColumn("ae",
            expr("CAST(round(abs(err), 6) AS DECIMAL(18,6))"))
          .withColumn("ape", when(col("actual") > 0d,
            expr("CAST(round(abs(err) / actual, 6) AS DECIMAL(18,6))")))
          .groupBy("method")
          .agg(count(lit(1)).as("h_days"),
            round(sum(col("ae")).cast("double") / count(lit(1)), 4)
              .as("mae"),
            round(sum(col("ape")).cast("double")
              / sum(when(col("ape").isNotNull, 1L).otherwise(0L)), 6)
              .as("mape"))
      }.reduce(_ unionByName _)
      perMethod.orderBy("method")
    },

    // exponentially time-decayed rolling engagement per event type
    // (7-day half-life, 28-day support): decayed(T) = Σ_{d≤T, T−d<28}
    // v_d · 2^{−(T−d)/7} — the recency-weighted activity feature online
    // systems keep per entity, computed EXACTLY with one partitioned
    // RANGE window: each day carries v_d·2^{d/7} so the frame sum needs
    // no per-row re-weighting, and one multiply by 2^{−T/7} restores the
    // decay (the exp trick that turns a decay kernel into a plain
    // windowed sum). Day indices are EPOCH-relative (datediff from
    // 2024-01-01), so the carried factor 2^{di/7} grows with the corpus
    // span from that epoch: within one 28-day frame the terms stay
    // within 2^4 of each other (no cancellation), but the absolute
    // magnitude is 2^{di/7} — fine for decade-scale horizons (double
    // overflows only past di/7 > 1023, ~19 years of span), and the
    // ~1e-15 relative error holds against the round(·,6) grid only while
    // the magnitudes stay in range. Deployments with longer horizons
    // rebase di per partition (di − min(di) over event_type) on BOTH
    // engines before the exp trick — the restore factor shifts by the
    // same 2^{min/7}, so results are identical in exact arithmetic.
    // Daily sums are exact decimals first (money discipline); the
    // window partitions by type — never global.
    "win_time_decay_sum" -> { (s, d) =>
      val wDecay = Window.partitionBy("event_type").orderBy("di")
        .rangeBetween(-27, 0)
      events(s, d)
        .groupBy(col("event_type"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .as("di"))
        .agg(sum(money(col("value"))).cast("decimal(18,2)").as("v"))
        .withColumn("decayed", round(
          sum(col("v").cast("double") * pow(lit(2d), col("di") / lit(7d)))
            .over(wDecay) * pow(lit(2d), -col("di") / lit(7d)), 6))
        .select(col("event_type"), col("di").cast("long").as("day_idx"),
          col("v").cast("double").as("day_value"), col("decayed"))
        .orderBy("event_type", "day_idx")
    },

    // Theil–Sen robust trend of daily revenue: the median of ALL
    // pairwise day-slopes plus the median-of-residuals intercept — the
    // estimator whose 29% breakdown point survives the outlier days
    // that drag OLS around (win_rolling_slope is the OLS sibling).
    // Pairs are O(#days²) — CALENDAR-bounded (~3M rows here and at ANY
    // corpus size: days don't grow with volume), so the pair join and
    // its ranked median pass are scale-constant after the corpus
    // collapses to O(#days) in one keyed agg. Slopes divide exact
    // decimal-cast revenue deltas by exact integer day gaps in IEEE
    // double; both medians ride the `percentile` AGGREGATE (partial-
    // aggregable, no single-partition row_number window over the 3M
    // pairs — measured 7.9 s → ~2 s at sf0.1) with DuckDB's
    // quantile_cont as the oracle twin, the text_length_outliers
    // precedent; emitted unrounded.
    "win_theil_sen" -> { (s, d) =>
      val daily = graft.plans.ScopedMemo(s, s"theil_sen_daily#$d")(
        t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
            .cast("double").as("y"))
          .withColumn("x",
            datediff(col("day"), lit("1970-01-01").cast("date"))
              .cast("long")))
      val pairs = daily.join(
          daily.select(col("day").as("day2"), col("y").as("y2"),
            col("x").as("x2")),
          col("day") < col("day2"))
        .select(((col("y2") - col("y"))
          / (col("x2") - col("x")).cast("double")).as("slope"))
      val med = pairs.agg(count(lit(1)).as("np"),
        expr("percentile(slope, 0.5)").as("slope"))
      val nd = daily.agg(count(lit(1)).as("nd"))
      val intercept = daily
        .crossJoin(broadcast(med.select(col("slope").as("m"))))
        .select((col("y") - col("m") * col("x").cast("double")).as("r"))
        .agg(expr("percentile(r, 0.5)").as("intercept"))
      med.crossJoin(broadcast(intercept)).crossJoin(broadcast(nd))
        .select(col("nd").as("n_days"), col("np").as("n_pairs"),
          col("slope").as("slope_per_day"), col("intercept"))
    },

    // the BI delta table every weekly business review opens with:
    // weekly revenue with week-over-week AND year-over-year (52-week
    // lag) percentage change side by side — WoW reads momentum, YoY
    // reads through seasonality, and disagreement between them is the
    // signal (WoW down + YoY up = a seasonal dip, not a problem).
    // Orders collapse to O(#weeks) in one exact-decimal keyed agg
    // (ISO-Monday date_trunc on both engines); the fixture calendar is
    // gapless so ROW lags are week lags; ratios are mirrored IEEE
    // divisions over exact-decimal-cast sums, null until the lag
    // exists.
    "win_wow_yoy" -> { (s, d) =>
      val w = Window.orderBy("week")
      t(s, d, "orders")
        .groupBy(to_date(date_trunc("week", col("o_orderdate")))
          .as("week"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        .withColumn("prev_w", lag(col("rev"), 1).over(w))
        .withColumn("prev_y", lag(col("rev"), 52).over(w))
        .select(col("week"), col("rev").cast("double").as("revenue"),
          round((col("rev").cast("double")
            - col("prev_w").cast("double"))
            / col("prev_w").cast("double") * 100d, 6).as("wow_pct"),
          round((col("rev").cast("double")
            - col("prev_y").cast("double"))
            / col("prev_y").cast("double") * 100d, 6).as("yoy_pct"))
        .orderBy("week")
    },

    // Holt–Winters additive triple smoothing (level + trend + 7-day
    // seasonal) of daily revenue — the family capstone above win_holt:
    // the seasonal state is a ROTATING 7-slot array carried through the
    // same ONE in-row fold (head = today's seasonal, rotate + append
    // each step), so the inherently sequential recursion still costs a
    // single pass over the packed O(#days) series. α=0.5, β=γ=0.25 are
    // binary-exact; every step mirrors the recursive-CTE oracle
    // op-for-op (the oracle layers aliases where Spark recomputes the
    // same pure expression — identical bits either way). Init: l₁=y₁,
    // b₁=0, seasons all 0 (additive form needs no seasonal warmup to
    // stay well-defined).
    "win_holt_winters" -> { (s, d) =>
      val LNEW = "(0.5 * (o.y - element_at(element_at(acc, -1)" +
        ".seasons, 1)) + 0.5 * (element_at(acc, -1).level" +
        " + element_at(acc, -1).trend))"
      val SNEW = s"(0.25 * (o.y - $LNEW)" +
        " + 0.75 * element_at(element_at(acc, -1).seasons, 1))"
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .cast("double").as("y"))
        .agg(sort_array(collect_list(struct(col("day"), col("y"))))
          .as("pts"))
        .select(explode(expr(s"""
          aggregate(
            slice(pts, 2, greatest(0, size(pts) - 1)),
            array(named_struct(
              'day', try_element_at(pts, 1).day,
              'y', try_element_at(pts, 1).y,
              'level', try_element_at(pts, 1).y,
              'trend', CAST(0.0 AS DOUBLE),
              'season', CAST(0.0 AS DOUBLE),
              'seasons', array_repeat(CAST(0.0 AS DOUBLE), 7))),
            (acc, o) -> array_append(acc, named_struct(
              'day', o.day,
              'y', o.y,
              'level', $LNEW,
              'trend', 0.25 * ($LNEW - element_at(acc, -1).level)
                + 0.75 * element_at(acc, -1).trend,
              'season', $SNEW,
              'seasons', concat(
                slice(element_at(acc, -1).seasons, 2, 6),
                array($SNEW)))))
          """)).as("h"))
        .select(col("h.day").as("day"), col("h.y").as("revenue"),
          col("h.level").as("level"), col("h.trend").as("trend"),
          col("h.season").as("season"),
          (col("h.level") + col("h.trend")
            + element_at(col("h.seasons"), 1)).as("forecast_next"))
        .filter(col("day").isNotNull) // empty-input init struct guard
        .orderBy("day")
    },

    // trailing-28-day percentile ribbon (P10/P50/P90) of daily revenue
    // — the bands chart behind "is today unusual FOR RECENT history"
    // (bollinger assumes roughly symmetric noise; the ribbon is
    // distribution-free). A 28-row frame makes each percentile a pure
    // in-row pick: collect the frame, sort the exact decimals, index at
    // ceil(p·28) (type-1 quantile — an ELEMENT, not an interpolation,
    // so there is no arithmetic to diverge) — the win_rolling_median
    // small-frame discipline. Emitted only on full frames; O(#days)
    // rows end-to-end.
    "win_percentile_bands" -> { (s, d) =>
      val wf = Window.orderBy("day").rowsBetween(-27, Window.currentRow)
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .as("rev"))
        .withColumn("frame", collect_list(col("rev")).over(wf))
        .filter(size(col("frame")) === 28)
        .withColumn("sorted", array_sort(col("frame")))
        .select(col("day"), col("rev").cast("double").as("revenue"),
          element_at(col("sorted"), 3).cast("double").as("p10"),
          element_at(col("sorted"), 14).cast("double").as("p50"),
          element_at(col("sorted"), 26).cast("double").as("p90"),
          (col("rev") < element_at(col("sorted"), 3)
            || col("rev") > element_at(col("sorted"), 26))
            .as("outside_band"))
        .orderBy("day")
    },

    // Mann–Kendall trend test on daily revenue — Theil–Sen's canonical
    // companion: S = Σ sign(y_j − y_i) over ordered pairs is a pure
    // INTEGER statistic (no magnitudes, so one outlier day moves S by
    // at most ±(n−1)), with the tie-corrected variance and the
    // continuity-corrected z → a monotone-trend verdict at α=0.05. The
    // same calendar-bounded O(#days²) pair kernel as win_theil_sen
    // (scale-constant after the one corpus-collapsing agg); sign
    // compares exact decimals, ties group by exact decimal equality —
    // doubles only in the final variance/z formula, mirrored.
    "win_mann_kendall" -> { (s, d) =>
      val daily = graft.plans.ScopedMemo(s, s"mann_kendall_daily#$d")(
        t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
            .as("rev")))
      val pairs = daily.join(
          daily.select(col("day").as("day2"), col("rev").as("rev2")),
          col("day") < col("day2"))
        .agg(sum(when(col("rev2") > col("rev"), 1L)
          .when(col("rev2") < col("rev"), -1L).otherwise(0L))
          .as("s_stat"))
      val n = daily.agg(count(lit(1)).as("n_days"))
      val ties = daily.groupBy("rev").agg(count(lit(1)).as("tn"))
        .filter(col("tn") >= 2)
        .agg(coalesce(sum(expr("tn * (tn - 1) * (2 * tn + 5)")), lit(0L))
          .as("tie_term"))
      pairs.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
        .withColumn("var_s",
          (expr("n_days * (n_days - 1) * (2 * n_days + 5)")
            .cast("double") - col("tie_term").cast("double")) / 18d)
        .withColumn("z",
          when(col("s_stat") > 0,
            (col("s_stat") - 1L).cast("double") / sqrt(col("var_s")))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1L).cast("double") / sqrt(col("var_s")))
            .otherwise(lit(0d)))
        .select(col("n_days"), col("s_stat"),
          round(col("var_s"), 6).as("var_s"), round(col("z"), 6).as("z"),
          when(col("z") > 1.959964, "increasing")
            .when(col("z") < -1.959964, "decreasing")
            .otherwise("no_trend").as("trend"))
    },

    // 1-D Kalman filter (random-walk state + observation noise) over
    // daily revenue: adaptive-gain smoothing — win_ewma's α is fixed
    // forever, Kalman's gain k = p/(p+R) follows the state uncertainty
    // p (high after shocks, low in steady state), which is why trackers
    // use it over EWMA. Q/R are binary-exact powers of two (2^32, 2^36
    // — chosen at the series' variance scale) so the predict/update
    // recursion pp = p+Q; k = pp/(pp+R); l' = l + k·(y−l);
    // p' = (1−k)·pp is pure IEEE with no literal-parsing skew; it runs
    // as ONE in-row fold (the win_holt shape) mirroring the
    // recursive-CTE oracle op-for-op — state stays bit-identical, all
    // columns emitted unrounded. Init: l₁ = y₁, p₁ = R, gain 1.
    "win_kalman" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(money(col("o_totalprice"))).cast("decimal(18,2)")
          .cast("double").as("y"))
        .agg(sort_array(collect_list(struct(col("day"), col("y"))))
          .as("pts"))
        .select(explode(expr("""
          aggregate(
            slice(pts, 2, greatest(0, size(pts) - 1)),
            array(named_struct(
              'day', try_element_at(pts, 1).day,
              'y', try_element_at(pts, 1).y,
              'level', try_element_at(pts, 1).y,
              'gain', CAST(1.0 AS DOUBLE),
              'p', CAST(68719476736 AS DOUBLE))),
            (acc, o) -> array_append(acc, named_struct(
              'day', o.day,
              'y', o.y,
              'level', element_at(acc, -1).level
                + ((element_at(acc, -1).p + CAST(4294967296 AS DOUBLE))
                   / ((element_at(acc, -1).p
                       + CAST(4294967296 AS DOUBLE))
                      + CAST(68719476736 AS DOUBLE)))
                  * (o.y - element_at(acc, -1).level),
              'gain', (element_at(acc, -1).p
                  + CAST(4294967296 AS DOUBLE))
                / ((element_at(acc, -1).p + CAST(4294967296 AS DOUBLE))
                   + CAST(68719476736 AS DOUBLE)),
              'p', (CAST(1.0 AS DOUBLE)
                  - (element_at(acc, -1).p + CAST(4294967296 AS DOUBLE))
                    / ((element_at(acc, -1).p
                        + CAST(4294967296 AS DOUBLE))
                       + CAST(68719476736 AS DOUBLE)))
                * (element_at(acc, -1).p
                   + CAST(4294967296 AS DOUBLE)))))
          """)).as("h"))
        .select(col("h.day").as("day"), col("h.y").as("revenue"),
          col("h.level").as("level"), col("h.gain").as("gain"))
        .filter(col("day").isNotNull) // empty-input init struct guard
        .orderBy("day")
    }
  )

  def oracle: Map[String, String] = Map(
    // zero-filled daily series, join-based lags, exact decimal moments,
    // double formulas in the same fixed order as the Spark plan
    "win_ar2_forecast" ->
      """WITH rev AS (
        |  SELECT date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS di,
        |    CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)), 0) AS DECIMAL(13,0)) AS ri
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(di) AS d0, max(di) AS d1 FROM rev),
        |series AS (
        |  SELECT gs.di, COALESCE(rev.ri, CAST(0 AS DECIMAL(13,0))) AS ri
        |  FROM (SELECT unnest(generate_series(d0, d1)) AS di
        |        FROM bounds) gs
        |  LEFT JOIN rev ON rev.di = gs.di),
        |g AS (
        |  SELECT CAST(count(*) AS DECIMAL(7,0)) AS n,
        |    CAST(sum(ri) AS DECIMAL(19,0)) AS s1,
        |    CAST(sum(ri * ri) AS DECIMAL(30,0)) AS s2,
        |    max(di) AS dmax
        |  FROM series),
        |l1 AS (
        |  SELECT CAST(count(*) AS DECIMAL(7,0)) AS m1,
        |    CAST(sum(a.ri * b.ri) AS DECIMAL(30,0)) AS sxy1,
        |    CAST(sum(a.ri) AS DECIMAL(19,0)) AS sa1,
        |    CAST(sum(b.ri) AS DECIMAL(19,0)) AS sb1
        |  FROM series a JOIN series b ON b.di = a.di + 1),
        |l2 AS (
        |  SELECT CAST(count(*) AS DECIMAL(7,0)) AS m2,
        |    CAST(sum(a.ri * b.ri) AS DECIMAL(30,0)) AS sxy2,
        |    CAST(sum(a.ri) AS DECIMAL(19,0)) AS sa2,
        |    CAST(sum(b.ri) AS DECIMAL(19,0)) AS sb2
        |  FROM series a JOIN series b ON b.di = a.di + 2),
        |x AS (
        |  SELECT g.*, l1.*, l2.*,
        |    yt.ri AS yT, yt1.ri AS yT1,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
        |  FROM g CROSS JOIN l1 CROSS JOIN l2
        |  JOIN series yt ON yt.di = g.dmax
        |  JOIN series yt1 ON yt1.di = g.dmax - 1),
        |r AS (
        |  SELECT x.*,
        |    (CAST(sxy1 AS DOUBLE) - ybar * CAST(sa1 + sb1 AS DOUBLE)
        |      + CAST(m1 AS DOUBLE) * ybar * ybar)
        |     / (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * ybar * ybar)
        |      AS r1,
        |    (CAST(sxy2 AS DOUBLE) - ybar * CAST(sa2 + sb2 AS DOUBLE)
        |      + CAST(m2 AS DOUBLE) * ybar * ybar)
        |     / (CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * ybar * ybar)
        |      AS r2
        |  FROM x),
        |p AS (
        |  SELECT r.*,
        |    r1 * (1 - r2) / (1 - r1 * r1) AS phi1,
        |    (r2 - r1 * r1) / (1 - r1 * r1) AS phi2
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_days, round(ybar, 2) AS mean_rev,
        |  round(r1, 6) AS r1, round(r2, 6) AS r2,
        |  round(phi1, 6) AS phi1, round(phi2, 6) AS phi2,
        |  round(ybar + phi1 * (CAST(yT AS DOUBLE) - ybar)
        |    + phi2 * (CAST(yT1 AS DOUBLE) - ybar), 2) AS forecast_next
        |FROM p""".stripMargin,

    // same series construction and split; method errors on the round-6
    // grid, exact-decimal sums, same fixed-order means
    "forecast_backtest" ->
      """WITH rev AS (
        |  SELECT date_diff('day', DATE '1992-01-01',
        |      CAST(o_orderdate AS DATE)) AS di,
        |    CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)), 0) AS DECIMAL(13,0)) AS ri
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT min(di) AS d0, max(di) AS d1 FROM rev),
        |series AS (
        |  SELECT gs.di, COALESCE(rev.ri, CAST(0 AS DECIMAL(13,0))) AS ri
        |  FROM (SELECT unnest(generate_series(d0, d1)) AS di
        |        FROM bounds) gs
        |  LEFT JOIN rev ON rev.di = gs.di),
        |sp AS (
        |  SELECT b.d1, b.d1 - 7 AS tEnd, s.ri AS yLast, b.d0
        |  FROM series s CROSS JOIN bounds b WHERE s.di = b.d1 - 7),
        |fi AS (
        |  SELECT s.ri AS yFirst
        |  FROM series s CROSS JOIN bounds b WHERE s.di = b.d0),
        |hold AS (
        |  SELECT s.di, CAST(s.ri AS DOUBLE) AS actual,
        |    CAST(sp.yLast AS DOUBLE) AS yLast,
        |    CAST(s2.ri AS DOUBLE) AS ySeason,
        |    CAST(sp.yLast - fi.yFirst AS DOUBLE)
        |      / CAST(sp.tEnd - sp.d0 AS DOUBLE) AS slope,
        |    CAST(s.di - sp.tEnd AS DOUBLE) AS h
        |  FROM series s CROSS JOIN sp CROSS JOIN fi
        |  JOIN series s2 ON s2.di = s.di - 7
        |  WHERE s.di > sp.tEnd),
        |scored AS (
        |  SELECT 'naive' AS method, yLast - actual AS err, actual
        |  FROM hold
        |  UNION ALL
        |  SELECT 'snaive', ySeason - actual, actual FROM hold
        |  UNION ALL
        |  SELECT 'drift', (yLast + slope * h) - actual, actual FROM hold)
        |SELECT method, CAST(count(*) AS BIGINT) AS h_days,
        |  round(CAST(sum(CAST(round(abs(err), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*), 4) AS mae,
        |  round(CAST(sum(CASE WHEN actual > 0
        |      THEN CAST(round(abs(err) / actual, 6) AS DECIMAL(18,6))
        |      END) AS DOUBLE)
        |    / sum(CASE WHEN actual > 0 THEN 1 ELSE 0 END), 6) AS mape
        |FROM scored GROUP BY method ORDER BY method""".stripMargin,

    // same exp-trick windowed sum: v·2^(d/7) summed over the 28-day
    // RANGE frame, one 2^(−d/7) multiply outside
    "win_time_decay_sum" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
        |    CAST(sum(CAST("value" AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(di AS BIGINT) AS day_idx,
        |  CAST(v AS DOUBLE) AS day_value,
        |  round(sum(CAST(v AS DOUBLE) * pow(2, di / 7.0)) OVER (
        |      PARTITION BY event_type ORDER BY di
        |      RANGE BETWEEN 27 PRECEDING AND CURRENT ROW)
        |    * pow(2, -di / 7.0), 6) AS decayed
        |FROM daily ORDER BY event_type, day_idx""".stripMargin,
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
        |FROM v ORDER BY l_suppkey, rn""".stripMargin,

    "win_bollinger" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT day, rev, count(*) OVER w AS n,
        |    CAST(sum(CAST(round(rev, 0) AS DECIMAL(13,0))) OVER w
        |      AS DECIMAL(19,0)) AS sr,
        |    CAST(sum(CAST(round(rev, 0) AS DECIMAL(13,0))
        |        * CAST(round(rev, 0) AS DECIMAL(13,0))) OVER w
        |      AS DECIMAL(19,0)) AS srr
        |  FROM daily
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT day, rev,
        |    CAST(sr AS DOUBLE) / 20 AS mid,
        |    sqrt(greatest(CAST(0 AS DOUBLE),
        |      CAST(CAST(20 AS DECIMAL(3,0)) * srr - sr * sr AS DOUBLE)))
        |      / 20 AS sd
        |  FROM m WHERE n = 20),
        |e AS (
        |  SELECT day, rev, mid,
        |    mid + 2 * sd AS upper,
        |    mid - 2 * sd AS lower
        |  FROM b)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue, mid, upper, lower,
        |  CASE WHEN CAST(rev AS DOUBLE) > upper THEN 'high'
        |       WHEN CAST(rev AS DOUBLE) < lower THEN 'low'
        |       ELSE 'in' END AS band_flag
        |FROM e ORDER BY day""".stripMargin,

    // partitioned recursion (one chain per part via the part_key join
    // predicate); DATE - DATE is integer days in DuckDB, datediff in
    // Spark — same value into the same double arithmetic
    "win_croston" ->
      """WITH RECURSIVE dem AS (
        |  SELECT l_partkey AS part_key, CAST(l_shipdate AS DATE) AS day,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem WHERE l_partkey % 97 = 0 GROUP BY 1, 2),
        |dd AS (
        |  SELECT part_key, day, q, row_number() OVER (
        |    PARTITION BY part_key ORDER BY day) AS rn
        |  FROM dem),
        |h AS (
        |  SELECT part_key, rn, day, CAST(q AS DOUBLE) AS z,
        |    CAST(1.0 AS DOUBLE) AS p
        |  FROM dd WHERE rn = 1
        |  UNION ALL
        |  SELECT d.part_key, d.rn, d.day,
        |    0.2 * CAST(d.q AS DOUBLE) + 0.8 * h.z AS z,
        |    0.2 * CAST(d.day - h.day AS DOUBLE) + 0.8 * h.p AS p
        |  FROM h JOIN dd d
        |    ON d.part_key = h.part_key AND d.rn = h.rn + 1),
        |n AS (
        |  SELECT part_key, CAST(count(*) AS BIGINT) AS n_demand_days,
        |    max(rn) AS mr
        |  FROM dd GROUP BY 1)
        |SELECT h.part_key, n.n_demand_days,
        |  round(h.z, 6) AS demand_size_est,
        |  round(h.p, 6) AS interval_est,
        |  round(h.z / h.p, 6) AS croston_forecast
        |FROM h JOIN n ON h.part_key = n.part_key AND h.rn = n.mr
        |ORDER BY h.part_key""".stripMargin,

    "win_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |dd AS (
        |  SELECT day, y, row_number() OVER (ORDER BY day) AS rn
        |  FROM daily),
        |h AS (
        |  SELECT rn, day, y, y AS level, CAST(0 AS DOUBLE) AS trend
        |  FROM dd WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.y,
        |    0.5 * d.y + 0.5 * (h.level + h.trend) AS level,
        |    0.25 * ((0.5 * d.y + 0.5 * (h.level + h.trend)) - h.level)
        |      + 0.75 * h.trend AS trend
        |  FROM h JOIN dd d ON d.rn = h.rn + 1)
        |SELECT day, y AS revenue, level, trend,
        |  level + trend AS forecast_next
        |FROM h ORDER BY day""".stripMargin,

    // decompose CTEs + the 1e-4-grid decimal variance sums; the strength
    // ratios are the same fixed-order double chain as the Spark side
    "win_seasonal_strength" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev,
        |    CAST(date_diff('day', DATE '1970-01-05', day) % 7
        |      AS BIGINT) AS dow,
        |    count(*) OVER wf AS n7, sum(rev) OVER wf AS sr7
        |  FROM daily
        |  WINDOW wf AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT * FROM w WHERE n7 = 7),
        |g AS (
        |  SELECT day, dow, rev, sr7,
        |    sum(rev) OVER (PARTITION BY dow) AS s1,
        |    sum(sr7) OVER (PARTITION BY dow) AS s2,
        |    count(*) OVER (PARTITION BY dow) AS ndow
        |  FROM f),
        |comp AS (
        |  SELECT
        |    CAST(rev AS DOUBLE) - CAST(sr7 AS DOUBLE) / 7
        |      - (CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE) / 7) / ndow
        |      AS residual,
        |    CAST(sr7 AS DOUBLE) / 7 AS trend,
        |    (CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE) / 7) / ndow
        |      AS seasonal
        |  FROM g),
        |terms AS (
        |  SELECT CAST(round(residual, 4) AS DECIMAL(19,4)) AS rd,
        |    CAST(round(seasonal + residual, 4) AS DECIMAL(19,4)) AS sr,
        |    CAST(round(trend + residual, 4) AS DECIMAL(19,4)) AS tr
        |  FROM comp),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    sum(rd) AS srd, sum(rd * rd) AS srd2,
        |    sum(sr) AS ssr, sum(sr * sr) AS ssr2,
        |    sum(tr) AS str, sum(tr * tr) AS str2
        |  FROM terms)
        |SELECT n_days,
        |  round(greatest(0.0, 1.0
        |    - (CAST(n_days AS DOUBLE) * CAST(srd2 AS DOUBLE)
        |      - CAST(srd AS DOUBLE) * CAST(srd AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) * CAST(ssr2 AS DOUBLE)
        |        - CAST(ssr AS DOUBLE) * CAST(ssr AS DOUBLE))), 6)
        |    AS f_seasonal,
        |  round(greatest(0.0, 1.0
        |    - (CAST(n_days AS DOUBLE) * CAST(srd2 AS DOUBLE)
        |      - CAST(srd AS DOUBLE) * CAST(srd AS DOUBLE))
        |      / (CAST(n_days AS DOUBLE) * CAST(str2 AS DOUBLE)
        |        - CAST(str AS DOUBLE) * CAST(str AS DOUBLE))), 6)
        |    AS f_trend
        |FROM m""".stripMargin,

    "win_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev,
        |    CAST(date_diff('day', DATE '1970-01-05', day) % 7
        |      AS BIGINT) AS dow,
        |    count(*) OVER wf AS n7, sum(rev) OVER wf AS sr7
        |  FROM daily
        |  WINDOW wf AS (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |f AS (SELECT * FROM w WHERE n7 = 7),
        |g AS (
        |  SELECT day, dow, rev, sr7,
        |    sum(rev) OVER (PARTITION BY dow) AS s1,
        |    sum(sr7) OVER (PARTITION BY dow) AS s2,
        |    count(*) OVER (PARTITION BY dow) AS ndow
        |  FROM f)
        |SELECT day, dow, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(sr7 AS DOUBLE) / 7 AS trend,
        |  (CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE) / 7) / ndow
        |    AS seasonal,
        |  CAST(rev AS DOUBLE) - CAST(sr7 AS DOUBLE) / 7
        |    - (CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE) / 7) / ndow
        |    AS residual
        |FROM g ORDER BY day""".stripMargin,

    "win_cusum" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |di AS (
        |  SELECT day, CAST(rev AS DOUBLE) AS y,
        |    CAST(round(rev, 0) AS DECIMAL(13,0)) AS ri
        |  FROM daily),
        |st AS (
        |  SELECT CAST(count(*) AS DECIMAL(7,0)) AS n,
        |    CAST(sum(ri) AS DECIMAL(19,0)) AS sr,
        |    CAST(sum(ri * ri) AS DECIMAL(19,0)) AS srr
        |  FROM di),
        |ms AS (
        |  SELECT CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt(greatest(CAST(0 AS DOUBLE),
        |      CAST(n * srr - sr * sr AS DOUBLE)))
        |      / CAST(n AS DOUBLE) AS sd
        |  FROM st),
        |dd AS (
        |  SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM di),
        |h AS (
        |  SELECT rn, day, y,
        |    greatest(CAST(0.0 AS DOUBLE), y - mu) AS cpos,
        |    greatest(CAST(0.0 AS DOUBLE), mu - y) AS cneg
        |  FROM dd CROSS JOIN ms WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.y,
        |    greatest(CAST(0.0 AS DOUBLE), h.cpos + (d.y - m.mu)) AS cpos,
        |    greatest(CAST(0.0 AS DOUBLE), h.cneg + (m.mu - d.y)) AS cneg
        |  FROM h JOIN dd d ON d.rn = h.rn + 1 CROSS JOIN ms m)
        |SELECT day, y AS revenue, cpos AS cusum_pos, cneg AS cusum_neg,
        |  CASE WHEN cpos > 4 * sd THEN 'up'
        |       WHEN cneg > 4 * sd THEN 'down'
        |       ELSE 'ok' END AS alarm
        |FROM h CROSS JOIN ms ORDER BY day""".stripMargin,

    "win_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS DOUBLE) AS y,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 3),
        |pairs AS (
        |  SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS slope
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |med AS (
        |  SELECT count(*) AS np, quantile_cont(slope, 0.5) AS slope
        |  FROM pairs),
        |nd AS (SELECT count(*) AS nd FROM daily),
        |res AS (
        |  SELECT d.y - m.slope * CAST(d.x AS DOUBLE) AS r
        |  FROM daily d CROSS JOIN med m),
        |ic AS (SELECT quantile_cont(r, 0.5) AS intercept FROM res)
        |SELECT CAST(nd.nd AS BIGINT) AS n_days,
        |  CAST(med.np AS BIGINT) AS n_pairs,
        |  med.slope AS slope_per_day, ic.intercept
        |FROM med CROSS JOIN ic CROSS JOIN nd""".stripMargin,

    "win_wow_yoy" ->
      """WITH weekly AS (
        |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |l AS (
        |  SELECT week, rev,
        |    lag(rev, 1) OVER (ORDER BY week) AS prev_w,
        |    lag(rev, 52) OVER (ORDER BY week) AS prev_y
        |  FROM weekly)
        |SELECT week, CAST(rev AS DOUBLE) AS revenue,
        |  round((CAST(rev AS DOUBLE) - CAST(prev_w AS DOUBLE))
        |    / CAST(prev_w AS DOUBLE) * 100, 6) AS wow_pct,
        |  round((CAST(rev AS DOUBLE) - CAST(prev_y AS DOUBLE))
        |    / CAST(prev_y AS DOUBLE) * 100, 6) AS yoy_pct
        |FROM l ORDER BY week""".stripMargin,

    "win_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |dd AS (
        |  SELECT day, y, row_number() OVER (ORDER BY day) AS rn
        |  FROM daily),
        |h AS (
        |  SELECT rn, day, y, y AS level, CAST(0 AS DOUBLE) AS trend,
        |    CAST(0 AS DOUBLE) AS season,
        |    list_transform(generate_series(1, 7),
        |      i -> CAST(0 AS DOUBLE)) AS seasons
        |  FROM dd WHERE rn = 1
        |  UNION ALL
        |  SELECT rn, day, y, lnew AS level,
        |    0.25 * (lnew - pl) + 0.75 * pb AS trend,
        |    snew AS season,
        |    list_concat(ss[2:7], [snew]) AS seasons
        |  FROM (
        |    SELECT rn, day, y, pl, pb, ss, sold, lnew,
        |      0.25 * (y - lnew) + 0.75 * sold AS snew
        |    FROM (
        |      SELECT d.rn, d.day, d.y, h.level AS pl, h.trend AS pb,
        |        h.seasons AS ss, h.seasons[1] AS sold,
        |        0.5 * (d.y - h.seasons[1])
        |          + 0.5 * (h.level + h.trend) AS lnew
        |      FROM h JOIN dd d ON d.rn = h.rn + 1) t1) t2)
        |SELECT day, y AS revenue, level, trend, season,
        |  level + trend + seasons[1] AS forecast_next
        |FROM h ORDER BY day""".stripMargin,

    "win_percentile_bands" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |f AS (
        |  SELECT day, rev, list(rev) OVER (ORDER BY day
        |    ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS frame
        |  FROM daily),
        |s AS (
        |  SELECT day, rev, list_sort(frame) AS sorted
        |  FROM f WHERE len(frame) = 28)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(sorted[3] AS DOUBLE) AS p10,
        |  CAST(sorted[14] AS DOUBLE) AS p50,
        |  CAST(sorted[26] AS DOUBLE) AS p90,
        |  (rev < sorted[3] OR rev > sorted[26]) AS outside_band
        |FROM s ORDER BY day""".stripMargin,

    "win_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
        |    WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |n AS (SELECT count(*) AS n_days FROM daily),
        |tt AS (
        |  SELECT CAST(COALESCE(sum(tn * (tn - 1) * (2 * tn + 5)), 0)
        |    AS BIGINT) AS tie_term
        |  FROM (SELECT count(*) AS tn FROM daily GROUP BY rev) g
        |  WHERE tn >= 2),
        |v AS (
        |  SELECT s_stat, n_days, tie_term,
        |    (CAST(n_days * (n_days - 1) * (2 * n_days + 5) AS DOUBLE)
        |      - CAST(tie_term AS DOUBLE)) / 18 AS var_s
        |  FROM p CROSS JOIN n CROSS JOIN tt),
        |z AS (
        |  SELECT n_days, s_stat, var_s,
        |    CASE WHEN s_stat > 0
        |           THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
        |         WHEN s_stat < 0
        |           THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
        |         ELSE CAST(0 AS DOUBLE) END AS z
        |  FROM v)
        |SELECT CAST(n_days AS BIGINT) AS n_days, s_stat,
        |  round(var_s, 6) AS var_s, round(z, 6) AS z,
        |  CASE WHEN z > 1.959964 THEN 'increasing'
        |       WHEN z < -1.959964 THEN 'decreasing'
        |       ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,

    "win_kalman" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |      AS DECIMAL(18,2)) AS DOUBLE) AS y
        |  FROM orders GROUP BY 1),
        |dd AS (
        |  SELECT day, y, row_number() OVER (ORDER BY day) AS rn
        |  FROM daily),
        |h AS (
        |  SELECT rn, day, y, y AS level, CAST(1.0 AS DOUBLE) AS gain,
        |    CAST(68719476736 AS DOUBLE) AS p
        |  FROM dd WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.day, d.y,
        |    h.level + ((h.p + CAST(4294967296 AS DOUBLE))
        |        / ((h.p + CAST(4294967296 AS DOUBLE))
        |           + CAST(68719476736 AS DOUBLE)))
        |      * (d.y - h.level) AS level,
        |    (h.p + CAST(4294967296 AS DOUBLE))
        |      / ((h.p + CAST(4294967296 AS DOUBLE))
        |         + CAST(68719476736 AS DOUBLE)) AS gain,
        |    (CAST(1.0 AS DOUBLE)
        |        - (h.p + CAST(4294967296 AS DOUBLE))
        |          / ((h.p + CAST(4294967296 AS DOUBLE))
        |             + CAST(68719476736 AS DOUBLE)))
        |      * (h.p + CAST(4294967296 AS DOUBLE)) AS p
        |  FROM h JOIN dd d ON d.rn = h.rn + 1)
        |SELECT day, y AS revenue, level, gain
        |FROM h ORDER BY day""".stripMargin
  )
}

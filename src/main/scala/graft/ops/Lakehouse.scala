package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lakehouse-maintenance operators: CDC upsert (MERGE), SCD2 history build,
  * and Z-order clustering. The reference harness's job surface is
  * settings -> transform -> write (`core.py:84-110`); these are the
  * transforms a table-maintenance job at 100 TB actually runs.
  *
  * Scale design: every operator here is one key-shuffle (or pure
  * projection + range exchange for Z-order) — no driver loops, no pair
  * joins. MERGE is the tagged-union + per-key arg-min plan: at 100 TB a
  * lakehouse would first prune to the touched files; the per-key decision
  * step is exactly this window.
  */
object Lakehouse {
  import Tables._

  /** Morton (Z-order) interleave of two 16-bit values, generated as SQL
    * arithmetic so the Spark expression and the DuckDB oracle share one
    * definition. Inputs are min-max-normalized onto the 16-bit grid by
    * [[zInputs]] (see its scaladoc for why that is load-bearing).
    */
  private def morton(shiftR: (String, Int) => String,
      shiftL: (String, Int) => String): String =
    (0 until 16).map { i =>
      val ck = shiftL(s"(${shiftR("ck", i)} & 1)", 2 * i)
      val dy = shiftL(s"(${shiftR("dy", i)} & 1)", 2 * i + 1)
      s"$ck + $dy"
    }.mkString("(", " + ", ")")

  private[graft] val mortonSpark: String =
    morton((c, i) => s"shiftright($c, $i)", (c, i) => s"shiftleft($c, $i)")
  private val mortonDuck: String =
    morton((c, i) => s"($c >> $i)", (c, i) => s"($c << $i)")

  /** orders with min-max-normalized Z-order inputs: ck/dy are custkey and
    * epoch day rescaled onto the full 16-bit grid. Normalization is NOT
    * optional: raw custkey (0..15k) and epoch day (~9k..11.5k) have
    * mismatched effective bit widths, so interleaving the raw values lets
    * the day's high bits dominate every comparison and the "Z-order"
    * degenerates into a plain date sort (the first cut of this operator
    * did exactly that — caught by the clustering-quality spec). Production
    * Z-order (e.g. Delta OPTIMIZE ZORDER BY) range-normalizes each column
    * first for the same reason. The stats pass is one O(1)-output
    * aggregate, broadcast back — free at any table size.
    */
  private[graft] def zInputs(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey").as("ckr"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("dyr"))
    val stats = base.agg(min("ckr").as("ck0"), max("ckr").as("ck1"),
      min("dyr").as("dy0"), max("dyr").as("dy1"))
    base.crossJoin(broadcast(stats))
      .withColumn("ck", floor((col("ckr") - col("ck0")).cast("double")
        * 65535.0 / (col("ck1") - col("ck0"))).cast("long"))
      .withColumn("dy", floor((col("dyr") - col("dy0")).cast("double")
        * 65535.0 / (col("dy1") - col("dy0"))).cast("long"))
      .select("o_orderkey", "ck", "dy")
  }

  /** The synthetic ordered changelog for `cdc_apply` and its streaming
    * twin: initial snapshot inserts (seq 0), updates (seq 1), deletes
    * (seq 2), re-inserts (seq 3) — each seq appears at most once per key,
    * so per-column arg-max over seq picks one coherent row version.
    */
  private[graft] def cdcLog(s: SparkSession, d: String): DataFrame = {
    val snap = t(s, d, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    def op(df: DataFrame, seq: Int, o: String): DataFrame =
      df.withColumn("seq", lit(seq.toLong)).withColumn("op", lit(o))
    op(snap, 0, "I")
      .unionByName(op(snap.filter(col("o_orderkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") + 50.0), 1, "U"))
      .unionByName(op(snap.filter(col("o_orderkey") % 10 === 0), 2, "D"))
      .unionByName(op(snap.filter(col("o_orderkey") % 20 === 0)
        .withColumn("o_orderstatus", lit("R")), 3, "I"))
  }

  /** The synthetic CDC batch derived deterministically from the snapshot:
    * every 7th key is an update (price + 100, status 'U'), every 97th key
    * re-enters as a brand-new row (key + 10M, status 'N'). Shared by the
    * operator and its oracle-construction comment — the operator under
    * test is the MERGE plan, not the change feed.
    */
  /** The SCD2 type-2 dimension built from the event stream (change rows
    * only, versioned, valid_from/valid_to tiling) — shared by
    * `scd2_history` and `scd2_validity_audit`.
    */
  private def scd2Dim(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d)
      .select("user_id", "ts", "event_id", "event_type")
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead("ts", 1).over(w))
      .select(col("user_id"), col("version"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"))
  }

  private def changes(base: DataFrame): DataFrame = {
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100.0)
      .withColumn("o_orderstatus", lit("U"))
    val inserts = base.filter(col("o_orderkey") % 97 === 0)
      .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_custkey"), lit("N").as("o_orderstatus"),
        col("o_totalprice"))
    updates.unionByName(inserts)
  }

  /** Pay-once-at-write warm-up for `zonemap_skip` (the
    * [[Joins.ensureBucketed]] pattern — Bench calls it before timing):
    * write lineitem range-clustered on l_shipdate into [[ZoneFiles]] files
    * plus a file-level (min, max) zone-map table. Range clustering is what
    * makes the zone map selective: each file covers a tight, nearly
    * disjoint shipdate interval, so a date predicate intersects few files.
    * Idempotent per (query, sf) scratch path.
    */
  def ensureZoned(s: SparkSession, d: String): (String, String) = {
    // v2: the index stores part-file basenames (v1 stored absolute URIs,
    // which broke if the scratch tree moved); a new key ignores stale maps
    val data = scratch("zonemap_data_v2", d)
    val zmap = scratch("zonemap_index_v2", d)
    val done = new org.apache.hadoop.fs.Path(zmap, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(done)) {
      val zoned = t(s, d, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_quantity", "l_returnflag")
      zoned
        .repartitionByRange(ZoneFiles, col("l_shipdate"))
        .write.mode("overwrite").parquet(data)
      // explicit schema: a zero-row source writes no part files, and a
      // schemaless read of that directory would fail instead of yielding
      // the empty stats table
      // store only the part-file BASENAME: absolute input_file_name()
      // URIs go stale if the scratch directory is moved/remounted between
      // warm-up and query; readers re-resolve against the data dir they
      // already know, so a relocation can never break the read path
      s.read.schema(zoned.schema).parquet(data)
        .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
        .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
        .coalesce(1)
        .write.mode("overwrite").parquet(zmap)
    }
    (data, zmap)
  }

  /** Zone-mapped file count for `zonemap_skip`. */
  val ZoneFiles = 16

  /** Pay-once-at-write warm-up for `manifest_read` (the [[ensureZoned]]
    * pattern, but the stats index is a JSON manifest — the Delta-log /
    * Iceberg-manifest shape): orders range-clustered on o_orderdate into
    * [[ManifestFiles]] part files, plus ONE JSON-lines manifest recording
    * per file its basename, row count, and o_orderdate min/max (ISO
    * strings, so lexicographic compare == date compare). Idempotent per
    * (query, sf) scratch path.
    */
  def ensureManifested(s: SparkSession, d: String): (String, String) = {
    val data = scratch("manifest_data_v1", d)
    val man = scratch("manifest_json_v1", d)
    val done = new org.apache.hadoop.fs.Path(man, "_SUCCESS")
    val fs = done.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(done)) {
      val src = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate")
      src.repartitionByRange(ManifestFiles, col("o_orderdate"))
        .write.mode("overwrite").parquet(data)
      s.read.schema(src.schema).parquet(data)
        .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
        .agg(count(lit(1)).as("row_count"),
          date_format(min("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("min_orderdate"),
          date_format(max("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
            .as("max_orderdate"))
        .coalesce(1)
        .write.mode("overwrite").json(man)
    }
    (data, man)
  }

  /** Manifest-tracked file count for `manifest_read`. */
  val ManifestFiles = 16

  /** ANALYZE-style per-column profile: ONE aggregate pass, O(1) output —
    * `cols` maps each reported column name to the expression used for
    * ndv/min/max (callers pass a lossless decimal cast for money doubles
    * so the VARCHAR rendering never goes scientific). Shared by the
    * `table_profile` operator and [[graft.harness.ProfileJob]] so the two
    * cannot drift (the exactKeepers pattern).
    */
  def profile(df: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++
      cols.zipWithIndex.flatMap { case ((_, e), i) => Seq(
        countDistinct(e).as(s"ndv_$i"),
        min(e).cast("string").as(s"min_$i"),
        max(e).cast("string").as(s"max_$i"))
      }
    // unpivot via explode-of-structs built with the Column API — column
    // names travel as lit() data, never spliced into an expr() string, so
    // a name containing a quote or comma (reachable through ProfileJob's
    // `columns` setting) cannot break parsing
    val entries = cols.zipWithIndex.map { case ((n, _), i) =>
      struct(lit(n).as("col_name"), col(s"ndv_$i").as("ndv"),
        col(s"min_$i").as("min_v"), col(s"max_$i").as("max_v"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(entries: _*)).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("n_rows"),
        col("kv.ndv").as("ndv"), col("kv.min_v").as("min_v"),
        col("kv.max_v").as("max_v"))
      .orderBy("col_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // data skipping via file-level zone maps (min/max stats): the read
    // path of every lakehouse format. The prune step touches ONLY the
    // O(#files) stats table — collected to the driver exactly like a
    // format's manifest read; at 100 TB that is ~10⁶ rows of metadata
    // against ~10¹⁴ bytes of data — and plans a scan over just the files
    // whose [lo, hi] interval intersects the predicate (a ~3-month slice
    // of ~7 years ⇒ ~1-2 of 16 files; OperatorSpec pins the skip ratio).
    // The exact predicate stays on the scan, so zone-map false positives
    // (files that straddle the cut) cost I/O, never correctness — the
    // oracle checks the pruned plan equals the full-scan filter.
    "zonemap_skip" -> { (s, d) =>
      val (data, zmap) = ensureZoned(s, d)
      val lo = to_timestamp(lit("1995-06-01 00:00:00"))
      val hi = to_timestamp(lit("1995-09-01 00:00:00"))
      val files = s.read.parquet(zmap)
        .filter(!(col("hi") < lo || col("lo") >= hi))
        .select("file").collect().map(r => s"$data/${r.getString(0)}")
      // an empty survivor list (possible only on an empty table) degrades
      // to the full scan, which is equally empty — never a crash
      val src = if (files.isEmpty) t(s, d, "lineitem")
        else s.read.parquet(files.toIndexedSeq: _*)
      src
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"),
          moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // manifest-planned scan — the Delta/Iceberg read shape (VERDICT r12
    // #8): the table of record is a JSON manifest-of-files with per-file
    // stats; planning a query means reading the MANIFEST (O(#files)
    // metadata, collected driver-side exactly like every lakehouse
    // format's log replay), pruning files whose [min, max] o_orderdate
    // interval misses the predicate, and scanning only the survivors.
    // Differs from zonemap_skip in what carries the index: there the
    // stats are a parquet side table; here they ride the manifest
    // document itself, so the file list NEVER comes from a directory
    // listing — the property that makes object-store tables transactional
    // (readers see exactly the manifest's snapshot, half-written files
    // are invisible). The exact predicate stays on the scan, so stats
    // false positives cost I/O, never correctness; the oracle pins
    // pruned-scan == full-scan filter.
    "manifest_read" -> { (s, d) =>
      val (data, man) = ensureManifested(s, d)
      val lo = to_timestamp(lit("1995-01-01 00:00:00"))
      val hi = to_timestamp(lit("1995-07-01 00:00:00"))
      // explicit manifest schema (r13 inherited-state fix): on an EMPTY
      // table the manifest file has no rows, schema inference returns an
      // empty struct, and the stats filter failed analysis with
      // UNRESOLVED_COLUMN — exactly the empty-inputs tripwire case. Real
      // manifest readers always know their log schema a priori.
      val manSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("file",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("row_count",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("min_orderdate",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("max_orderdate",
          org.apache.spark.sql.types.StringType)))
      val files = s.read.schema(manSchema).json(man)
        .filter(!(to_timestamp(col("max_orderdate")) < lo
          || to_timestamp(col("min_orderdate")) >= hi))
        .select("file").collect().map(r => s"$data/${r.getString(0)}")
      // an empty survivor list (possible only on an empty table) degrades
      // to the full scan, which is equally empty — never a crash
      val src = if (files.isEmpty) t(s, d, "orders")
        else s.read.parquet(files.toIndexedSeq: _*)
      src
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("revenue"))
        .orderBy("o_orderstatus")
    },

    // ANALYZE-style table profile: per-column ndv/min/max in ONE pass over
    // the table with O(1) output — the stats-collection job behind CBO
    // and data-skipping indexes. min/max go through the lossless decimal
    // cast before VARCHAR so both engines print "830.19", never
    // scientific notation. Exact ndv keeps the oracle exact; a 100 TB
    // profile job would swap in the mergeable HLL sketch
    // (agg_sketch_union) per column, same plan shape. The multi-distinct
    // expand is the known cost of exactness.
    // ProfileJob routes any parquet table through the same [[profile]]
    // pipeline — the job and the operator cannot drift.
    "table_profile" -> ((s, d) =>
      profile(t(s, d, "orders"), Seq(
        "o_custkey" -> col("o_custkey"),
        "o_orderdate" -> col("o_orderdate"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> money(col("o_totalprice"))))),

    // the 100 TB form of the profile: HLL approx ndv (single-pass, no
    // multi-distinct Expand in a production run) — checked like
    // agg_approx_distinct: the exact ndv is computed alongside so the
    // oracle can pin the estimate's 15% bound as a boolean; a real
    // deployment drops the exact column and the Expand with it.
    "table_profile_approx" -> { (s, d) =>
      val cols = Seq(
        "o_custkey" -> col("o_custkey"),
        "o_orderdate" -> col("o_orderdate"),
        "o_orderstatus" -> col("o_orderstatus"),
        "o_totalprice" -> money(col("o_totalprice")))
      val aggs = Seq(count(lit(1)).as("n_rows")) ++
        cols.zipWithIndex.flatMap { case ((_, e), i) => Seq(
          countDistinct(e).as(s"ndv_$i"),
          approx_count_distinct(e).as(s"andv_$i"),
          min(e).cast("string").as(s"min_$i"),
          max(e).cast("string").as(s"max_$i"))
        }
      val entries = cols.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("col_name"), col(s"ndv_$i").as("ndv"),
          (abs(col(s"andv_$i") - col(s"ndv_$i"))
            <= col(s"ndv_$i") * 0.15).as("within_bound"),
          col(s"min_$i").as("min_v"), col(s"max_$i").as("max_v"))
      }
      t(s, d, "orders").agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"), explode(array(entries: _*)).as("kv"))
        .select(col("kv.col_name").as("col_name"), col("n_rows"),
          col("kv.ndv").as("ndv"), col("kv.within_bound").as("within_bound"),
          col("kv.min_v").as("min_v"), col("kv.max_v").as("max_v"))
        .orderBy("col_name")
    },

    // MERGE INTO (SCD1 upsert): source rows win per key, base rows survive
    // otherwise. Plan: tag both sides, ONE shuffle on the key, per-key
    // arg-min by priority — instead of the anti-join + union plan's two
    // shuffles of the big side. Matched/not-matched never materializes as
    // an intermediate.
    "merge_upsert" -> { (s, d) =>
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val tagged = changes(base).withColumn("prio", lit(0))
        .unionByName(base.withColumn("prio", lit(1)))
      val w = Window.partitionBy("o_orderkey").orderBy("prio")
      tagged.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // SCD type-2 dimension build: collapse the per-user event stream into
    // validity intervals wherever event_type changes. One window shuffle
    // (user_id), ordered by (ts, event_id) so timestamp ties cannot make
    // the history engine-arbitrary. valid_to IS NULL marks the open row.
    "scd2_history" -> ((s, d) =>
      scd2Dim(s, d).orderBy("user_id", "version")),

    // SCD2 validity-chain audit — the dim-table QA gate every feature
    // store runs: per key the version chain must TILE time (no
    // overlaps, no gaps between a row's valid_to and the next row's
    // valid_from) and carry exactly one open (valid_to NULL) row.
    // Exercised against our own scd2_history build, where the clean
    // verdict is the pin; in production the identical audit runs
    // against any externally-maintained dim. One lead() pass over the
    // dim-sized table + a two-level rollup to a single report row —
    // everything integer.
    "scd2_validity_audit" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("version")
      val perKey = scd2Dim(s, d)
        .withColumn("next_from", lead("valid_from", 1).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_versions"),
          sum(when(col("valid_to").isNull, 1L).otherwise(0L))
            .as("n_open"),
          sum(when(col("next_from").isNotNull
              && col("valid_to") > col("next_from"), 1L).otherwise(0L))
            .as("n_overlaps"),
          sum(when(col("next_from").isNotNull
              && col("valid_to") < col("next_from"), 1L).otherwise(0L))
            .as("n_gaps"))
      perKey.agg(count(lit(1)).as("n_keys"),
          sum(col("n_versions")).as("n_versions"),
          sum(col("n_overlaps")).as("n_overlaps"),
          sum(col("n_gaps")).as("n_gaps"),
          sum(when(col("n_open") === 1, 1L).otherwise(0L))
            .as("n_keys_one_open"))
        .select(col("n_keys"), col("n_versions"), col("n_overlaps"),
          col("n_gaps"), col("n_keys_one_open"),
          (col("n_overlaps") === 0 && col("n_gaps") === 0
            && col("n_keys_one_open") === col("n_keys"))
            .as("chain_valid"))
    },

    // compaction planning: bin-pack each partition's small files into
    // target-size rewrite groups. "Files" are synthesized as (month,
    // o_orderkey%20) slices of orders with a deterministic byte size; the
    // operator under test is the planner — per-partition running sum +
    // floor-divide group assignment, one window shuffle on the partition
    // key. This is the metadata pass of OPTIMIZE/compaction: it touches
    // file STATS (O(#files)), never data, which is why it stays cheap at
    // 100 TB where #files ~ 10⁶ and data ~ 10¹⁴ bytes.
    "compact_plan" -> { (s, d) =>
      val files = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("part"),
          pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"))
        .agg((count(lit(1)) * 120L).as("bytes"))
      val w = Window.partitionBy("part").orderBy("file_id")
      files
        .withColumn("cum", sum(col("bytes")).over(w))
        .select(to_date(col("part")).as("part"), col("file_id"),
          col("bytes"),
          floor((col("cum") - col("bytes")) / 65536L).as("rewrite_group"))
        .orderBy("part", "file_id")
    },

    // vacuum planning (the other half of table maintenance next to
    // compact_plan): under copy-on-write, a MERGE rewrites every file
    // that contains an updated key, leaving the file's previous
    // generation unreferenced — the vacuum candidate set. Files are the
    // same synthesized (month, o_orderkey%20) slices as compact_plan;
    // the change feed is the same %7 update set the MERGE family uses
    // (inserts land in NEW files and orphan nothing). Like every
    // maintenance pass here this touches file STATS only — one groupBy
    // over O(#files) metadata rows, zero data bytes — which is what
    // keeps VACUUM plannable at 100 TB where #files ~ 10^6.
    "vacuum_plan" -> { (s, d) =>
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("part"),
          pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"))
        .agg((count(lit(1)) * 120L).as("bytes"),
          sum(when(col("o_orderkey") % 7 === 0, 1L).otherwise(0L))
            .as("n_changed"))
        .filter(col("n_changed") > 0)
        .select(to_date(col("part")).as("part"), col("file_id"),
          col("bytes").as("reclaim_bytes"), col("n_changed"))
        .orderBy("part", "file_id")
    },

    // compaction EXECUTION twin of compact_plan (VERDICT r10 #4): the plan
    // stops at rewrite groups; this key MATERIALIZES them. Every row is
    // routed to its planned group through a broadcast of the O(#files)
    // plan, the rewrite lands exactly ONE physical file per (partition,
    // group) — repartition by the pair puts each group in one task,
    // partitionBy splits the dirs — and the table is re-read from disk.
    // The summary oracle-pins EXECUTION, not intent: files_after counts
    // the files actually read back (input_file_name) and the oracle
    // asserts it equals the planned group count, while n_rows/sum_price
    // pin row equality through the rewrite. At 100 TB this is the
    // OPTIMIZE job shape: plan from O(#files) stats, then one shuffle
    // keyed by (part, group) whose parallelism is #groups — the rewrite
    // never routes data through the driver or a global sort.
    "compact_apply" -> { (s, d) =>
      val out = scratch("compact_apply", d)
      val data = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("part"))
        .withColumn("file_id", pmod(col("o_orderkey"), lit(20)).cast("long"))
      val files = data.groupBy("part", "file_id")
        .agg((count(lit(1)) * 120L).as("bytes"))
      val w = Window.partitionBy("part").orderBy("file_id")
      val plan = files.withColumn("cum", sum(col("bytes")).over(w))
        .select(col("part"), col("file_id"),
          floor((col("cum") - col("bytes")) / 65536L).as("rewrite_group"))
      val routed = data.join(broadcast(plan), Seq("part", "file_id"))
        .select("o_orderkey", "o_totalprice", "file_id", "part",
          "rewrite_group")
      // EXPLICIT partition count: repartition(cols) is REPARTITION_BY_COL,
      // which AQE coalesces to ~1 task at fixture bytes — that one task
      // then opens every group's parquet writer SERIALLY (~16 ms each;
      // measured 6.3 s). A pinned count keeps the rewrite as parallel as
      // the cluster, still one task (= one file) per (part, group).
      routed.repartition(s.sparkContext.defaultParallelism,
          col("part"), col("rewrite_group"))
        .write.mode("overwrite").partitionBy("part", "rewrite_group")
        .parquet(out)
      s.read.schema(routed.schema).parquet(out)
        // projected BEFORE the agg: Spark (correctly) refuses the
        // nondeterministic input_file_name() inside an aggregate argument
        .withColumn("fname", input_file_name())
        .groupBy("part")
        .agg(countDistinct(col("file_id")).as("n_files_before"),
          countDistinct(col("rewrite_group")).as("n_groups_planned"),
          countDistinct(col("fname")).as("files_after"),
          count(lit(1)).as("n_rows"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("part")
    },

    // vacuum EXECUTION twin of vacuum_plan (VERDICT r10 #5): the same
    // (month, key%20) file layout written as REAL generation dirs, the
    // copy-on-write rewrite applied (every file containing a %7-updated
    // key gets a gen=1 successor; its gen=0 ancestor is exactly the
    // orphan set vacuum_plan prices), then the vacuum EXECUTED: each
    // superseded gen=0 dir is deleted and the tree re-read naively. The
    // summary proves the deletion was exact — a surviving orphan double-
    // counts its file in n_gen0_live AND its rows in n_rows_live/
    // sum_price; an over-eager delete loses rows. Driver-side work is
    // the O(#files) changed-file list (the manifest-scale collect
    // zonemap_skip documents); data rows never touch the driver.
    "vacuum_apply" -> { (s, d) =>
      val out = scratch("vacuum_apply", d)
      // %5 file granularity (vs the planner's %20): this twin pays REAL
      // per-file costs, and this container's Hadoop local FS forks a
      // shell per file op (no native libhadoop — measured 111k forks /
      // 16 CPU-min of sys time at %20's 1600 dirs). The deletion
      // semantics proven are granularity-independent; a cluster with
      // native IO + store committers runs the %20 layout unchanged.
      val data = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("part"))
        .withColumn("file_id", pmod(col("o_orderkey"), lit(5)).cast("long"))
      val gen0 = data.withColumn("gen", lit(0L))
        .select("o_orderkey", "o_totalprice", "part", "file_id", "gen")
      // repartition on the dir keys with an EXPLICIT count: each
      // (part, file_id) lands in ONE task -> ONE file per generation dir
      // (the premise of the layout). Unpartitioned, every task writes a
      // sliver into every dir (measured 63 s at sf0.1 — 32 tasks × 1600
      // dirs ≈ 50k tiny files); repartition(cols) alone is
      // REPARTITION_BY_COL, which AQE coalesces to ~1 task at fixture
      // bytes, serializing 1600 parquet-writer open/closes (~26 s).
      gen0.repartition(s.sparkContext.defaultParallelism,
          col("part"), col("file_id"))
        .write.mode("overwrite").partitionBy("part", "file_id", "gen")
        .parquet(out)
      val changedFiles = data.groupBy("part", "file_id")
        .agg(max(when(col("o_orderkey") % 7 === 0, 1).otherwise(0))
          .as("chg"))
        .filter(col("chg") === 1).select("part", "file_id")
      val gen1 = data.join(broadcast(changedFiles), Seq("part", "file_id"))
        .withColumn("gen", lit(1L))
        .select("o_orderkey", "o_totalprice", "part", "file_id", "gen")
      gen1.repartition(s.sparkContext.defaultParallelism,
          col("part"), col("file_id"))
        .write.mode("append").partitionBy("part", "file_id", "gen")
        .parquet(out)
      val fs = new org.apache.hadoop.fs.Path(out)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // parallel orphan deletion: the O(#files) manifest collects to the
      // driver (zonemap_skip's documented shape), but the per-dir
      // deletes are independent IO — serial, 1600 dirs cost seconds;
      // a real lakehouse vacuums with a bulk-delete API the same way
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      try {
        changedFiles.collect().map { r =>
          pool.submit(new Runnable {
            def run(): Unit = {
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$out/part=${r.getString(0)}/file_id=${r.getLong(1)}" +
                  "/gen=0"), true)
              ()
            }
          })
        }.foreach(_.get())
      } finally pool.shutdown()
      s.read.schema(gen0.schema).parquet(out)
        .groupBy("part")
        .agg(countDistinct(col("file_id")).as("n_files"),
          countDistinct(when(col("gen") === 1, col("file_id")))
            .as("n_rewritten"),
          countDistinct(when(col("gen") === 0, col("file_id")))
            .as("n_gen0_live"),
          count(lit(1)).as("n_rows_live"),
          sum(when(col("o_orderkey") % 7 === 0, 1L).otherwise(0L))
            .as("n_updated_rows"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("part")
    },

    // z-order EXECUTION twin of zorder_cluster (completes the apply trio
    // next to compact_apply/vacuum_apply): rows land in their z-file by
    // VALUE (zval high nibble -> 16 files — a range split a sorted
    // writer produces, no global sort/row_number), the layout is written
    // for real, and the table is re-read from disk with
    // input_file_name() proving one physical file per planned z-file.
    // The per-file report is the zone-map a scan planner would read off
    // the rewritten table: both dimensions' min/max plus the normalized
    // bounding-box area (z-order's whole point — tight boxes in BOTH
    // ck and dy; lakehouse_clustering_depth grades the same layout at
    // the metadata level, this key proves the physical rewrite delivers
    // it). Same explicit repartition-count discipline as compact_apply:
    // hash on the file key keeps each dir single-writer without letting
    // AQE collapse the rewrite to one serial task.
    "zorder_apply" -> { (s, d) =>
      val out = scratch("zorder_apply", d)
      val z = zInputs(s, d).withColumn("zval", expr(mortonSpark))
        .withColumn("zfile", shiftright(col("zval"), 28).cast("long"))
        .select("o_orderkey", "ck", "dy", "zval", "zfile")
      z.repartition(s.sparkContext.defaultParallelism, col("zfile"))
        .write.mode("overwrite").partitionBy("zfile").parquet(out)
      s.read.schema(z.schema).parquet(out)
        .withColumn("fname", input_file_name())
        .groupBy("zfile")
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("fname")).as("n_physical_files"),
          min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
          min(col("dy")).as("dy_lo"), max(col("dy")).as("dy_hi"))
        .select(col("zfile"), col("n_rows"), col("n_physical_files"),
          col("ck_lo"), col("ck_hi"), col("dy_lo"), col("dy_hi"),
          round(((col("ck_hi") - col("ck_lo") + 1L)
              * (col("dy_hi") - col("dy_lo") + 1L)).cast("double")
            / (65536d * 65536d), 6).as("zone_area_share"))
        .orderBy("zfile")
    },

    // file-level Bloom index for POINT lookups (the companion to
    // zonemap_skip's range pruning — Parquet bloom filters / Delta bloom
    // indexes do exactly this): per file, a 63-bit two-hash Bloom mask
    // (bits 0..62 — DuckDB's checked << overflows at 1<<63, Spark wraps;
    // 63 keeps both engines in range)
    // over its keys (bit_or aggregate — mergeable, computed map-side),
    // then a probe-key set tests membership and each file reports how
    // many probes it must serve. Index build is one linear pass emitting
    // O(#files) masks; the probe join is #files × #probes on O(8-byte)
    // masks — metadata-scale. The hash family reuses the Count-Min LCG
    // rows so both engines compute identical bits in plain BIGINT.
    "bloom_index_prune" -> { (s, d) =>
      val (_, a0, b0) = Aggregates.CmsRows(0)
      val (_, a1, b1) = Aggregates.CmsRows(1)
      val p = Aggregates.CmsP
      def bitsOf(k: String): String =
        s"shiftleft(CAST(1 AS BIGINT), CAST((($a0 * $k + $b0) % $p) % 63 " +
          s"AS INT)) | shiftleft(CAST(1 AS BIGINT), " +
          s"CAST((($a1 * $k + $b1) % $p) % 63 AS INT))"
      val files = t(s, d, "orders").select(
        date_trunc("month", col("o_orderdate")).as("part"),
        pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"),
        col("o_orderkey").as("k"))
      val masks = files.withColumn("b", expr(bitsOf("k")))
        .groupBy("part", "file_id")
        .agg(count(lit(1)).as("n_keys"), expr("bit_or(b)").as("mask"))
      val probes = t(s, d, "orders")
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("pk")).distinct()
        .withColumn("pb", expr(bitsOf("pk")))
      masks.join(broadcast(probes),
          expr("(mask & pb) = pb"), "left")
        .groupBy("part", "file_id", "n_keys", "mask")
        .agg(coalesce(sum(when(col("pk").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("n_probe_hits"))
        .select(to_date(col("part")).as("part"), col("file_id"),
          col("n_keys"), col("mask"), col("n_probe_hits"),
          (col("n_probe_hits") > 0L).as("would_scan"))
        .orderBy("part", "file_id")
    },

    // data-quality constraint audit (the expectations/dbt-test/Delta-
    // constraint pass every ingestion pipeline gates on): NOT NULL,
    // UNIQUE, referential integrity, range, and domain checks across
    // four tables, one summary row per constraint with the violation
    // count. Each leg is one linear aggregate (the FK leg an anti join on
    // the key); the output is O(#constraints) however big the tables —
    // the report a 100 TB ingest job emits before publishing a snapshot.
    "constraint_check" -> { (s, d) =>
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val l = t(s, d, "lineitem")
      def leg(name: String, df: DataFrame, viol: org.apache.spark.sql.Column)
        : DataFrame =
        df.agg(count(lit(1)).as("n_checked"),
          coalesce(sum(when(viol, 1L).otherwise(0L)), lit(0L))
            .as("n_violations"))
          .select(lit(name).as("constraint_name"), col("n_checked"),
            col("n_violations"))
      val unique = o
        .agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("n_violations"))
        .select(lit("orders.o_orderkey UNIQUE").as("constraint_name"),
          col("n_checked"), col("n_violations"))
      val fk = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_violations"))
        .crossJoin(o.agg(count(lit(1)).as("n_checked")))
        .select(lit("orders.o_custkey FK customer").as("constraint_name"),
          col("n_checked"), col("n_violations"))
      Seq(
        leg("orders.o_orderkey NOT NULL", o, col("o_orderkey").isNull),
        unique, fk,
        leg("lineitem.l_discount IN [0,1]", l,
          !col("l_discount").between(0.0, 1.0)),
        leg("lineitem.l_quantity IN (0,100]", l,
          col("l_quantity") <= 0.0 || col("l_quantity") > 100.0),
        leg("events.event_type DOMAIN", events(s, d),
          !col("event_type").isin("click", "view", "purchase", "signup",
            "error")))
        .reduce(_ unionByName _)
        .withColumn("pass", col("n_violations") === 0L)
        .orderBy("constraint_name")
    },

    // partition layout health report (the third maintenance planner next
    // to compact_plan/vacuum_plan): per-partition file census — count,
    // bytes, min/max file size, and the max/avg skew factor that tells a
    // table maintainer which partitions straggle scans (one hot file
    // serializes the partition's split work). Same synthesized (month,
    // key%20) file stats; metadata-only O(#files) groupBy, zero data
    // bytes — plannable at 100 TB where #files ~ 10⁶.
    "partition_skew_audit" -> { (s, d) =>
      val files = t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("part"),
          pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"))
        .agg((count(lit(1)) * 120L).as("bytes"))
      files.groupBy("part")
        .agg(count(lit(1)).as("n_files"),
          sum(col("bytes")).as("total_bytes"),
          min(col("bytes")).as("min_file_bytes"),
          max(col("bytes")).as("max_file_bytes"))
        .select(to_date(col("part")).as("part"), col("n_files"),
          col("total_bytes"), col("min_file_bytes"), col("max_file_bytes"),
          round(col("max_file_bytes").cast("double")
            / (col("total_bytes").cast("double") / col("n_files")), 6)
            .as("skew"))
        .orderBy("part")
    },

    // merge-on-read positional deletes (the Iceberg v2 deletion-vector
    // read path, the copy-on-write alternative to vacuum_plan's
    // rewrites): the delete file records (file, row POSITION), not keys,
    // so appliers need no key lookup — just an anti join on position.
    // Files are the synthesized (month, o_orderkey%20) slices; position
    // is the rank a writer would have assigned (key order within file);
    // the delete vector marks the %7 change-feed rows. Output is the
    // per-file read audit (rows, applied deletes, live rows) readers
    // consult before scheduling splits. Position assignment and the
    // apply are (part, file_id)-partitioned windows/joins — per-file
    // work, never a global order, and the anti join moves (file, pos)
    // pairs, never row payloads.
    "delete_vector_apply" -> { (s, d) =>
      val w = Window.partitionBy("part", "file_id").orderBy("o_orderkey")
      val rows = t(s, d, "orders")
        .select(date_trunc("month", col("o_orderdate")).as("part"),
          pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"),
          col("o_orderkey"))
        .withColumn("pos", row_number().over(w).cast("long"))
      val dv = rows.filter(col("o_orderkey") % 7 === 0)
        .select(col("part").as("dp"), col("file_id").as("df"),
          col("pos").as("dpos"))
      val live = rows.join(dv,
          col("part") === col("dp") && col("file_id") === col("df")
            && col("pos") === col("dpos"), "left_anti")
        .groupBy("part", "file_id").agg(count(lit(1)).as("n_live"))
      rows.groupBy("part", "file_id").agg(count(lit(1)).as("n_rows"))
        .join(live, Seq("part", "file_id"), "left")
        .select(to_date(col("part")).as("part"), col("file_id"),
          col("n_rows"), coalesce(col("n_live"), lit(0L)).as("n_live"),
          (col("n_rows") - coalesce(col("n_live"), lit(0L)))
            .as("n_deleted"))
        .orderBy("part", "file_id")
    },

    // snapshot diff (CDC between two table versions): version B applies
    // the same deterministic change feed MERGE uses; the diff classifies
    // every key as added / removed / changed / unchanged with one
    // full-outer equi-join — the scale shape for "what changed between
    // snapshots" (a lakehouse would first prune unchanged files by
    // min/max stats; the per-key classify step is exactly this join).
    "snapshot_diff" -> { (s, d) =>
      val a = t(s, d, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val b = {
        val base = t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        val tagged = changes(base).withColumn("prio", lit(0))
          .unionByName(base.withColumn("prio", lit(1)))
        val w = Window.partitionBy("o_orderkey").orderBy("prio")
        tagged.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          // every 101st key is deleted in version B so the 'removed'
          // class is genuinely exercised (MERGE alone never removes)
          .filter(col("o_orderkey") % 101 =!= 0)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      }
      val av = a.select(col("o_orderkey").as("k"),
        col("o_orderstatus").as("st_a"), col("o_totalprice").as("pr_a"))
      val bv = b.select(col("o_orderkey").as("k2"),
        col("o_orderstatus").as("st_b"), col("o_totalprice").as("pr_b"))
      av.join(bv, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("o_orderkey"),
          when(col("k").isNull, "added")
            .when(col("k2").isNull, "removed")
            .when(col("st_a") =!= col("st_b")
              || col("pr_a") =!= col("pr_b"), "changed")
            .otherwise("unchanged").as("change"))
        .groupBy("change")
        .agg(count(lit(1)).as("n_keys"))
        .orderBy("change")
    },

    // ordered-changelog apply (the CDC consumer path, one step past
    // merge_upsert's single-batch SCD1): the log carries multiple
    // operations per key — initial insert (seq 0), update (seq 1),
    // delete (seq 2), re-insert (seq 3) — and the final state is
    // last-writer-wins by sequence number, honoring deletes. Plan: ONE
    // key-shuffle aggregate with per-column max_by(·, seq) — no window
    // sort, fully partial-aggregable, so at 100 TB the log streams
    // through map-side combines and only per-key states shuffle. Ties
    // are impossible by construction (each seq appears at most once per
    // key), so per-column arg-max picks one coherent row version.
    "cdc_apply" -> { (s, d) =>
      cdcLog(s, d).groupBy("o_orderkey")
        .agg(expr("max_by(op, seq)").as("last_op"),
          expr("max_by(o_custkey, seq)").as("o_custkey"),
          expr("max_by(o_orderstatus, seq)").as("o_orderstatus"),
          expr("max_by(o_totalprice, seq)").as("o_totalprice"))
        .filter(col("last_op") =!= "D")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // data-layout A/B eval: the SAME rows written under three value-range
    // layouts — natural (orderkey ranges, the as-ingested shape), sorted
    // by one column (ck ranges), and z-order (zval-prefix ranges) — each
    // cut into 32 files, scored by the mean normalized (ck × dy) zone
    // area and by how many files a mid-range ck probe must open. The
    // number a table owner reads before paying for a rewrite: z-order
    // trades a little single-column pruning for two-column pruning;
    // this table quantifies the trade on the actual data. File ids are
    // VALUE ranges (bit-prefixes / scaled buckets), not row ranks — no
    // global sort, no window; everything after the shared zInputs scan
    // is O(#layouts × #files).
    "layout_clustering_eval" -> { (s, d) =>
      val z = zInputs(s, d).withColumn("zval", expr(mortonSpark))
      val okb = broadcast(z.agg(min(col("o_orderkey")).as("k0"),
        max(col("o_orderkey")).as("k1")))
      val natural = z.crossJoin(okb)
        .select(lit("1_natural").as("layout"),
          floor((col("o_orderkey") - col("k0")).cast("double") * 32d
            / (col("k1") - col("k0") + 1L).cast("double")).cast("long")
            .as("file"),
          col("ck"), col("dy"))
      val sorted = z.select(lit("2_ck_sorted").as("layout"),
        shiftright(col("ck"), 11).as("file"), col("ck"), col("dy"))
      val zorder = z.select(lit("3_zorder").as("layout"),
        shiftright(col("zval"), 27).as("file"), col("ck"), col("dy"))
      natural.unionByName(sorted).unionByName(zorder)
        .groupBy("layout", "file")
        .agg(count(lit(1)).as("n_rows"),
          min(col("ck")).as("ckmin"), max(col("ck")).as("ckmax"),
          min(col("dy")).as("dymin"), max(col("dy")).as("dymax"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          round(sum((col("ckmax") - col("ckmin") + 1L)
              * (col("dymax") - col("dymin") + 1L)).cast("double")
            / (count(lit(1)).cast("double") * 65536d * 65536d), 6)
            .as("avg_zone_area_share"),
          sum(when(col("ckmax") >= 20000L && col("ckmin") < 24000L, 1L)
            .otherwise(0L)).as("files_hit_ck_probe"))
        .orderBy("layout")
    },

    // time travel over the changelog: the table's aggregate state AS OF
    // each commit sequence — what "SELECT … VERSION AS OF" costs a
    // lakehouse reader (replay ≤ S with last-writer-wins + deletes).
    // One broadcast of the 4-row cutoff grid fans the log out (grid ×
    // log, never log²); per cutoff the state collapses in the same
    // keyed max_by pass as cdc_apply and only O(#cutoffs) audit rows
    // ship: live keys, deleted keys, exact-decimal total, its double
    // projection. The version axis a snapshot-isolation debugger reads.
    "cdc_time_travel" -> { (s, d) =>
      val cuts = s.range(4).select(col("id").as("as_of_seq"))
      cdcLog(s, d).crossJoin(broadcast(cuts))
        .filter(col("seq") <= col("as_of_seq"))
        .groupBy("as_of_seq", "o_orderkey")
        .agg(expr("max_by(op, seq)").as("last_op"),
          expr("max_by(o_totalprice, seq)").as("o_totalprice"))
        .groupBy("as_of_seq")
        .agg(sum(when(col("last_op") =!= "D", 1L).otherwise(0L))
            .as("n_live"),
          sum(when(col("last_op") === "D", 1L).otherwise(0L))
            .as("n_deleted"),
          sum(when(col("last_op") =!= "D",
            Tables.money(col("o_totalprice"))).otherwise(lit(null)))
            .cast("decimal(18,2)").cast("double").as("total_price"))
        .orderBy("as_of_seq")
    },

    // incremental materialized-aggregate maintenance: the per-customer
    // order profile is kept as MERGEABLE state (count, exact-decimal sum,
    // min, max), so refreshing after a new partition lands costs one
    // aggregate over the DELTA plus a key-join merge with the stored
    // state — never a rescan of the base. The query runs the full
    // lifecycle: base state (orders before the cutoff), delta state
    // (orders after), merged = combine(base, delta), and a per-key
    // matches_full audit against an independent full recompute — all four
    // legs shuffle only on o_custkey. avg is derived at read time
    // (sum/count), the classic reason views store sums, not means. At
    // 100 TB the delta leg is O(new partition) and the merge moves only
    // O(distinct keys) state rows.
    "incremental_agg_merge" -> { (s, d) =>
      val cutoff = lit("1999-01-01").cast("timestamp")
      val o = t(s, d, "orders")
        .select(col("o_custkey"), money(col("o_totalprice")).as("p"),
          col("o_orderdate"))
      def state(df: DataFrame): DataFrame =
        df.groupBy("o_custkey").agg(count(lit(1)).as("n"),
          sum(col("p")).as("s"), min(col("p")).as("mn"),
          max(col("p")).as("mx"))
      val base = state(o.filter(col("o_orderdate") < cutoff))
        .withColumnsRenamed(Map("n" -> "bn", "s" -> "bs", "mn" -> "bmn",
          "mx" -> "bmx"))
      val delta = state(o.filter(col("o_orderdate") >= cutoff))
        .withColumnsRenamed(Map("n" -> "dn", "s" -> "ds", "mn" -> "dmn",
          "mx" -> "dmx"))
      val merged = base.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("bs"), lit(0).cast("decimal(18,2)"))
            + coalesce(col("ds"), lit(0).cast("decimal(18,2)")))
            .cast("double").as("total"),
          least(col("bmn"), col("dmn"))
            .as("mnd"),
          greatest(col("bmx"), col("dmx"))
            .as("mxd"))
      val full = state(o).select(col("o_custkey").as("k2"),
        col("n").as("fn"), col("s").cast("double").as("fs"),
        col("mn").as("fmn"), col("mx").as("fmx"))
      merged.join(full, col("o_custkey") === col("k2"))
        .select(col("o_custkey"), col("n_orders"), col("total"),
          col("mnd").cast("double").as("min_price"),
          col("mxd").cast("double").as("max_price"),
          (col("n_orders") === col("fn") && col("total") === col("fs")
            && col("mnd").cast("double") === col("fmn")
            && col("mxd").cast("double") === col("fmx")).as("matches_full"))
        .orderBy("o_custkey")
    },

    // Z-order clustering key: bit-interleave (custkey, orderdate) so a
    // range exchange on zval gives every output file a tight bounding box
    // in BOTH dimensions — min/max skipping then prunes either predicate.
    // The zval itself is a pure projection (32 codegen'd bit terms); the
    // clustering quality is pinned by PlanSpec-style assertions in
    // OperatorSpec (z-partition custkey span << date-sort custkey span).
    "zorder_cluster" -> ((s, d) =>
      zInputs(s, d)
        .withColumn("zval", expr(mortonSpark))
        .select("o_orderkey", "ck", "dy", "zval")
        .orderBy("zval", "o_orderkey")
        .limit(2000)),

    // incremental-refresh planner: map the CDC change set onto the
    // downstream table's partition grid (order month) and decide per
    // partition whether to MERGE (few changed rows dribble in) or
    // REBUILD (changes exceed 10% of the partition — rewriting wins
    // over per-row merges) — the little planner every incremental
    // materialization runs before touching storage. Inputs are the
    // SAME synthetic change feed `cdc_apply`/`snapshot_diff` use
    // (single definition, can't drift); everything after the one
    // changed-keys join is O(#months): counts, a threshold CASE, and
    // the estimated rewrite volume the scheduler budgets against.
    // Inserted keys (no month yet) plan into their own 'new-partition'
    // append row.
    "lakehouse_incremental_plan" -> { (s, d) =>
      val base = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice")
      val months = t(s, d, "orders")
        .select(to_date(date_trunc("month", col("o_orderdate")))
          .as("month"), col("o_orderkey"))
      val changed = changes(base).select(col("o_orderkey"))
      val perMonth = months.groupBy("month")
        .agg(count(lit(1)).as("n_rows"))
      val hits = changed.join(months, Seq("o_orderkey"), "left")
        .groupBy(coalesce(col("month"),
          lit("9999-01-01").cast("date")).as("month"))
        .agg(count(lit(1)).as("n_changed"))
      hits.join(perMonth, Seq("month"), "left")
        .select(col("month"), col("n_changed"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          when(col("n_rows").isNull, "append_new_partition")
            .when(col("n_changed").cast("double")
              > col("n_rows").cast("double") * 0.1, "rebuild")
            .otherwise("merge").as("action"),
          when(col("n_rows").isNotNull
              && col("n_changed").cast("double")
                > col("n_rows").cast("double") * 0.1, col("n_rows"))
            .otherwise(col("n_changed")).as("rows_to_write"))
        .orderBy("month")
    },

    // clustering-depth audit: the metadata-level proof that Z-ordering
    // tightens zone maps, read the way OPTIMIZE reports it. Both
    // candidate layouts assign rows to 16 "files" by RANGE-chunking
    // their own sort key (how a sorted writer splits; fully parallel —
    // no global row_number anywhere): naive chunks on o_orderkey, the
    // z-layout on the morton code. Per (layout, dimension) the report
    // then reads ONLY file-level min/max metadata: total zone width,
    // mean width, point-depth = Σwidth/65536 (expected #files a point
    // lookup on that dimension must open), and the overlapping file-pair
    // count (16² cells, O(1)). All integer arithmetic except the two
    // rounded divisions; the quality spec pins z beating naive on the
    // date dimension without giving up the key dimension entirely.
    "lakehouse_clustering_depth" -> { (s, d) =>
      val z = zInputs(s, d).withColumn("zval", expr(mortonSpark))
      val stats = z.agg(min("o_orderkey").as("k0"),
        max("o_orderkey").as("k1"))
      val filed = z.crossJoin(broadcast(stats))
        .withColumn("f_naive", expr(
          "CAST((o_orderkey - k0) * 16 DIV (k1 - k0 + 1) AS BIGINT)"))
        .withColumn("f_z", expr("CAST(zval DIV 268435456 AS BIGINT)"))
      def zones(fileCol: String, name: String): DataFrame = {
        val fb = filed.groupBy(col(fileCol).as("file"))
          .agg(min("ck").as("ck_lo"), max("ck").as("ck_hi"),
            min("dy").as("dy_lo"), max("dy").as("dy_hi"))
        fb.select(lit(name).as("layout"), lit("ck").as("dim"),
            col("file"), col("ck_lo").as("lo"), col("ck_hi").as("hi"))
          .unionAll(fb.select(lit(name).as("layout"), lit("dy").as("dim"),
            col("file"), col("dy_lo").as("lo"), col("dy_hi").as("hi")))
      }
      val zn = graft.plans.ScopedMemo(s, s"layout_zones#$d")(
        zones("f_naive", "naive").unionAll(zones("f_z", "zorder")))
      val agg = zn.groupBy("layout", "dim")
        .agg(count(lit(1)).as("n_files"),
          sum(col("hi") - col("lo") + 1L).as("sum_width"))
      val ov = zn.join(zn.select(col("layout"), col("dim"),
            col("file").as("file2"), col("lo").as("lo2"),
            col("hi").as("hi2")), Seq("layout", "dim"))
        .filter(col("file") < col("file2")
          && col("lo") <= col("hi2") && col("lo2") <= col("hi"))
        .groupBy("layout", "dim")
        .agg(count(lit(1)).as("n_overlap_pairs"))
      agg.join(ov, Seq("layout", "dim"), "left")
        .select(col("layout"), col("dim"), col("n_files"),
          col("sum_width"),
          round(col("sum_width").cast("double") / col("n_files"), 6)
            .as("avg_width"),
          round(col("sum_width").cast("double") / 65536d, 6)
            .as("point_depth"),
          coalesce(col("n_overlap_pairs"), lit(0L))
            .as("n_overlap_pairs"))
        .orderBy("layout", "dim")
    }
  )

  def oracle: Map[String, String] = Map(
    // the zone-map-pruned scan must produce exactly the full-scan answer
    "zonemap_skip" ->
      s"""SELECT l_returnflag, count(*) AS n_lines,
         |${sql.moneySum("l_quantity")} AS sum_qty
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
         |  AND l_shipdate <  TIMESTAMP '1995-09-01 00:00:00'
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the manifest-planned scan must produce exactly the full-scan answer
    "manifest_read" ->
      s"""SELECT o_orderstatus, count(*) AS n_orders,
         |${sql.moneySum("o_totalprice")} AS revenue
         |FROM orders
         |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
         |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // n_rows via scalar subquery (NOT a cross join + GROUP BY, which
    // yields zero rows on an empty table while Spark's df.agg yields one
    // row per column — the op/oracle pair stays equivalent on any input)
    "table_profile" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey' AS col_name,
        |    (SELECT count(*) FROM orders) AS n_rows,
        |    count(DISTINCT o_custkey) AS ndv,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_v,
        |    CAST(max(o_custkey) AS VARCHAR) AS max_v
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_orderdate),
        |    CAST(min(o_orderdate) AS VARCHAR),
        |    CAST(max(o_orderdate) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR),
        |    CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        |  FROM orders
        |) ORDER BY col_name""".stripMargin,
    // DuckDB cannot reproduce Spark's HLL estimate, so the oracle pins the
    // exact columns and asserts Spark's bound boolean came out true (the
    // agg_approx_distinct pattern)
    "table_profile_approx" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey' AS col_name,
        |    (SELECT count(*) FROM orders) AS n_rows,
        |    count(DISTINCT o_custkey) AS ndv, true AS within_bound,
        |    CAST(min(o_custkey) AS VARCHAR) AS min_v,
        |    CAST(max(o_custkey) AS VARCHAR) AS max_v
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_orderdate), true,
        |    CAST(min(o_orderdate) AS VARCHAR),
        |    CAST(max(o_orderdate) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_orderstatus), true,
        |    CAST(min(o_orderstatus) AS VARCHAR),
        |    CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', (SELECT count(*) FROM orders),
        |    count(DISTINCT o_totalprice), true,
        |    CAST(min(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR),
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
        |  FROM orders
        |) ORDER BY col_name""".stripMargin,
    "compact_plan" ->
      """WITH f AS (
        |  SELECT date_trunc('month', o_orderdate) AS part,
        |    o_orderkey % 20 AS file_id, count(*) * 120 AS bytes
        |  FROM orders GROUP BY 1, 2),
        |c AS (
        |  SELECT part, file_id, bytes,
        |    sum(bytes) OVER (PARTITION BY part ORDER BY file_id) AS cum
        |  FROM f)
        |SELECT CAST(part AS DATE) AS part, file_id, bytes,
        |  CAST(floor((cum - bytes) / 65536) AS BIGINT) AS rewrite_group
        |FROM c ORDER BY part, file_id""".stripMargin,
    // vacuum twin: same file synthesis as compact_plan, same %7 change
    // feed as the MERGE family
    "vacuum_plan" ->
      """WITH f AS (
        |  SELECT date_trunc('month', o_orderdate) AS part,
        |    o_orderkey % 20 AS file_id, count(*) * 120 AS bytes,
        |    CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_changed
        |  FROM orders GROUP BY 1, 2)
        |SELECT CAST(part AS DATE) AS part, file_id,
        |  bytes AS reclaim_bytes, n_changed
        |FROM f WHERE n_changed > 0
        |ORDER BY part, file_id""".stripMargin,
    // execution twin: files_after is the oracle's own planned group count
    // — the Spark side reports the PHYSICAL file count read back, so a
    // rewrite that splits or merges differently than planned hash-fails
    "compact_apply" ->
      s"""WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
         |    o_orderkey % 20 AS file_id, count(*) * 120 AS bytes
         |  FROM orders GROUP BY 1, 2),
         |pl AS (
         |  SELECT part, file_id,
         |    CAST(floor((sum(bytes) OVER (PARTITION BY part
         |      ORDER BY file_id) - bytes) / 65536) AS BIGINT)
         |      AS rewrite_group
         |  FROM f),
         |su AS (
         |  SELECT part, count(DISTINCT file_id) AS n_files_before,
         |    count(DISTINCT rewrite_group) AS n_groups_planned
         |  FROM pl GROUP BY part),
         |dt AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
         |    count(*) AS n_rows,
         |    ${sql.moneySum("o_totalprice")} AS sum_price
         |  FROM orders GROUP BY 1)
         |SELECT su.part, n_files_before, n_groups_planned,
         |  n_groups_planned AS files_after, n_rows, sum_price
         |FROM su JOIN dt ON su.part = dt.part
         |ORDER BY su.part""".stripMargin,
    // execution twin: a surviving orphan would double-count rewritten
    // files in n_gen0_live and their rows in n_rows_live/sum_price
    "vacuum_apply" ->
      s"""WITH f AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
         |    o_orderkey % 5 AS file_id,
         |    max(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS chg
         |  FROM orders GROUP BY 1, 2),
         |fp AS (
         |  SELECT part, count(*) AS n_files,
         |    CAST(sum(chg) AS BIGINT) AS n_rewritten
         |  FROM f GROUP BY part),
         |dt AS (
         |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
         |    count(*) AS n_rows_live,
         |    CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_updated_rows,
         |    ${sql.moneySum("o_totalprice")} AS sum_price
         |  FROM orders GROUP BY 1)
         |SELECT fp.part, n_files, n_rewritten,
         |  n_files - n_rewritten AS n_gen0_live,
         |  n_rows_live, n_updated_rows, sum_price
         |FROM fp JOIN dt ON fp.part = dt.part
         |ORDER BY fp.part""".stripMargin,
    // execution twin: n_physical_files pinned to 1 per z-file — a
    // multi-writer dir (or a lost one) breaks the hash/row match
    "zorder_apply" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey AS ckr,
         |    CAST(datediff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dyr
         |  FROM orders),
         |st AS (SELECT min(ckr) AS ck0, max(ckr) AS ck1,
         |       min(dyr) AS dy0, max(dyr) AS dy1 FROM b),
         |z AS (
         |  SELECT o_orderkey,
         |    CAST(floor((ckr - ck0) * 65535.0 / (ck1 - ck0)) AS BIGINT)
         |      AS ck,
         |    CAST(floor((dyr - dy0) * 65535.0 / (dy1 - dy0)) AS BIGINT)
         |      AS dy
         |  FROM b CROSS JOIN st),
         |zf AS (
         |  SELECT o_orderkey, ck, dy,
         |    CAST(($mortonDuck >> 28) AS BIGINT) AS zfile
         |  FROM z)
         |SELECT zfile, count(*) AS n_rows,
         |  CAST(1 AS BIGINT) AS n_physical_files,
         |  min(ck) AS ck_lo, max(ck) AS ck_hi,
         |  min(dy) AS dy_lo, max(dy) AS dy_hi,
         |  round(CAST((max(ck) - min(ck) + 1) * (max(dy) - min(dy) + 1)
         |      AS DOUBLE) / (65536.0 * 65536.0), 6) AS zone_area_share
         |FROM zf GROUP BY zfile ORDER BY zfile""".stripMargin,

    // same positional semantics: the delete vector addresses (file, pos)
    // from the same rank assignment, applied via NOT EXISTS
    "delete_vector_apply" ->
      """WITH r AS (
        |  SELECT date_trunc('month', o_orderdate) AS part,
        |    o_orderkey % 20 AS file_id, o_orderkey,
        |    row_number() OVER (
        |      PARTITION BY date_trunc('month', o_orderdate),
        |        o_orderkey % 20
        |      ORDER BY o_orderkey) AS pos
        |  FROM orders),
        |dv AS (SELECT part, file_id, pos FROM r WHERE o_orderkey % 7 = 0),
        |live AS (
        |  SELECT part, file_id, count(*) AS n_live FROM r
        |  WHERE NOT EXISTS (SELECT 1 FROM dv
        |    WHERE dv.part = r.part AND dv.file_id = r.file_id
        |      AND dv.pos = r.pos)
        |  GROUP BY 1, 2),
        |tot AS (SELECT part, file_id, count(*) AS n_rows FROM r
        |        GROUP BY 1, 2)
        |SELECT CAST(tot.part AS DATE) AS part, tot.file_id, tot.n_rows,
        |  COALESCE(live.n_live, 0) AS n_live,
        |  tot.n_rows - COALESCE(live.n_live, 0) AS n_deleted
        |FROM tot LEFT JOIN live
        |  ON live.part = tot.part AND live.file_id = tot.file_id
        |ORDER BY part, tot.file_id""".stripMargin,
    "snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 100.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 = 0),
        |ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 97 = 0),
        |src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |b AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM base
        |  WHERE NOT EXISTS (SELECT 1 FROM src s
        |                    WHERE s.o_orderkey = base.o_orderkey)),
        |bd AS (SELECT * FROM b WHERE o_orderkey % 101 <> 0),
        |a AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |d AS (
        |  SELECT CASE
        |    WHEN a.o_orderkey IS NULL THEN 'added'
        |    WHEN b.o_orderkey IS NULL THEN 'removed'
        |    WHEN a.o_orderstatus <> b.o_orderstatus
        |      OR a.o_totalprice <> b.o_totalprice THEN 'changed'
        |    ELSE 'unchanged' END AS change
        |  FROM a FULL OUTER JOIN bd b ON a.o_orderkey = b.o_orderkey)
        |SELECT change, count(*) AS n_keys
        |FROM d GROUP BY change ORDER BY change""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
        |    o_totalprice + 100.0 AS o_totalprice
        |  FROM base WHERE o_orderkey % 7 = 0),
        |ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    'N' AS o_orderstatus, o_totalprice
        |  FROM base WHERE o_orderkey % 97 = 0),
        |src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM src
        |UNION ALL
        |SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice
        |FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM src s
        |                  WHERE s.o_orderkey = b.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "scd2_validity_audit" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type),
        |dim AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    ts AS valid_from, lead(ts) OVER w AS valid_to
        |  FROM ch
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |nx AS (
        |  SELECT user_id, valid_to,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY version) AS next_from
        |  FROM dim),
        |pk AS (
        |  SELECT user_id, count(*) AS n_versions,
        |    sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS n_open,
        |    sum(CASE WHEN next_from IS NOT NULL AND valid_to > next_from
        |      THEN 1 ELSE 0 END) AS n_overlaps,
        |    sum(CASE WHEN next_from IS NOT NULL AND valid_to < next_from
        |      THEN 1 ELSE 0 END) AS n_gaps
        |  FROM nx GROUP BY 1)
        |SELECT count(*) AS n_keys,
        |  CAST(sum(n_versions) AS BIGINT) AS n_versions,
        |  CAST(sum(n_overlaps) AS BIGINT) AS n_overlaps,
        |  CAST(sum(n_gaps) AS BIGINT) AS n_gaps,
        |  CAST(sum(CASE WHEN n_open = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_keys_one_open,
        |  (CAST(sum(n_overlaps) AS BIGINT) = 0
        |    AND CAST(sum(n_gaps) AS BIGINT) = 0
        |    AND CAST(sum(CASE WHEN n_open = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) = count(*)) AS chain_valid
        |FROM pk""".stripMargin,

    "scd2_history" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version, event_type,
        |  ts AS valid_from, lead(ts) OVER w AS valid_to
        |FROM ch
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,
    "bloom_index_prune" -> {
      val (_, a0, b0) = Aggregates.CmsRows(0)
      val (_, a1, b1) = Aggregates.CmsRows(1)
      val p = Aggregates.CmsP
      def bitsOf(k: String): String =
        s"((CAST(1 AS BIGINT) << CAST((($a0 * $k + $b0) % $p) % 63 " +
          s"AS INTEGER)) | (CAST(1 AS BIGINT) << " +
          s"CAST((($a1 * $k + $b1) % $p) % 63 AS INTEGER)))"
      s"""WITH files AS (
         |  SELECT date_trunc('month', o_orderdate) AS part,
         |    CAST(o_orderkey % 20 AS BIGINT) AS file_id,
         |    o_orderkey AS k, ${bitsOf("o_orderkey")} AS b
         |  FROM orders),
         |masks AS (
         |  SELECT part, file_id, count(*) AS n_keys, bit_or(b) AS mask
         |  FROM files GROUP BY 1, 2),
         |probes AS (
         |  SELECT DISTINCT o_orderkey AS pk, ${bitsOf("o_orderkey")} AS pb
         |  FROM orders WHERE o_orderkey % 97 = 0)
         |SELECT CAST(m.part AS DATE) AS part, m.file_id, m.n_keys, m.mask,
         |  CAST(COALESCE(sum(CASE WHEN p.pk IS NOT NULL THEN 1 ELSE 0
         |    END), 0) AS BIGINT) AS n_probe_hits,
         |  CAST(COALESCE(sum(CASE WHEN p.pk IS NOT NULL THEN 1 ELSE 0
         |    END), 0) AS BIGINT) > 0 AS would_scan
         |FROM masks m LEFT JOIN probes p ON (m.mask & p.pb) = p.pb
         |GROUP BY 1, 2, 3, 4
         |ORDER BY part, file_id""".stripMargin
    },
    "constraint_check" ->
      """WITH legs AS (
        |  SELECT 'orders.o_orderkey NOT NULL' AS constraint_name,
        |    count(*) AS n_checked,
        |    CAST(COALESCE(sum(CASE WHEN o_orderkey IS NULL THEN 1
        |      ELSE 0 END), 0) AS BIGINT) AS n_violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.o_orderkey UNIQUE', count(*),
        |    count(*) - count(DISTINCT o_orderkey)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders.o_custkey FK customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_discount IN [0,1]', count(*),
        |    CAST(COALESCE(sum(CASE WHEN NOT (l_discount BETWEEN 0.0
        |      AND 1.0) THEN 1 ELSE 0 END), 0) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem.l_quantity IN (0,100]', count(*),
        |    CAST(COALESCE(sum(CASE WHEN l_quantity <= 0.0
        |      OR l_quantity > 100.0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events.event_type DOMAIN', count(*),
        |    CAST(COALESCE(sum(CASE WHEN event_type NOT IN ('click',
        |      'view', 'purchase', 'signup', 'error') THEN 1 ELSE 0 END),
        |      0) AS BIGINT)
        |  FROM events)
        |SELECT constraint_name, n_checked, n_violations,
        |  n_violations = 0 AS pass
        |FROM legs ORDER BY constraint_name""".stripMargin,
    "partition_skew_audit" ->
      """WITH files AS (
        |  SELECT date_trunc('month', o_orderdate) AS part,
        |    CAST(o_orderkey % 20 AS BIGINT) AS file_id,
        |    count(*) * 120 AS bytes
        |  FROM orders GROUP BY 1, 2)
        |SELECT CAST(part AS DATE) AS part, count(*) AS n_files,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  min(bytes) AS min_file_bytes, max(bytes) AS max_file_bytes,
        |  round(CAST(max(bytes) AS DOUBLE)
        |    / (CAST(sum(bytes) AS DOUBLE) / count(*)), 6) AS skew
        |FROM files GROUP BY part ORDER BY part""".stripMargin,
    // same zInputs scaling + morton twin; same bit-prefix/bucket files
    "layout_clustering_eval" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey AS ckr,
         |    CAST(datediff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dyr
         |  FROM orders),
         |st AS (SELECT min(ckr) AS ck0, max(ckr) AS ck1,
         |       min(dyr) AS dy0, max(dyr) AS dy1 FROM b),
         |z0 AS (
         |  SELECT o_orderkey,
         |    CAST(floor((ckr - ck0) * 65535.0 / (ck1 - ck0)) AS BIGINT)
         |      AS ck,
         |    CAST(floor((dyr - dy0) * 65535.0 / (dy1 - dy0)) AS BIGINT)
         |      AS dy
         |  FROM b CROSS JOIN st),
         |z AS (SELECT o_orderkey, ck, dy, $mortonDuck AS zval FROM z0),
         |kb AS (SELECT min(o_orderkey) AS k0, max(o_orderkey) AS k1
         |       FROM z),
         |tagged AS (
         |  SELECT '1_natural' AS layout,
         |    CAST(floor(CAST(o_orderkey - k0 AS DOUBLE) * 32
         |      / CAST(k1 - k0 + 1 AS DOUBLE)) AS BIGINT) AS file,
         |    ck, dy
         |  FROM z CROSS JOIN kb
         |  UNION ALL
         |  SELECT '2_ck_sorted', ck >> 11, ck, dy FROM z
         |  UNION ALL
         |  SELECT '3_zorder', zval >> 27, ck, dy FROM z),
         |pf AS (
         |  SELECT layout, file, count(*) AS n_rows,
         |    min(ck) AS ckmin, max(ck) AS ckmax,
         |    min(dy) AS dymin, max(dy) AS dymax
         |  FROM tagged GROUP BY 1, 2)
         |SELECT layout, CAST(count(*) AS BIGINT) AS n_files,
         |  round(CAST(sum((ckmax - ckmin + 1) * (dymax - dymin + 1))
         |      AS DOUBLE)
         |    / (CAST(count(*) AS DOUBLE) * 65536 * 65536), 6)
         |    AS avg_zone_area_share,
         |  CAST(sum(CASE WHEN ckmax >= 20000 AND ckmin < 24000
         |    THEN 1 ELSE 0 END) AS BIGINT) AS files_hit_ck_probe
         |FROM pf GROUP BY layout ORDER BY layout""".stripMargin,

    // same log construction + the same keyed arg_max replay, per cutoff
    "cdc_time_travel" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_totalprice, 0 AS seq, 'I' AS op FROM snap
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 50.0, 1, 'U'
        |  FROM snap WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 2, 'D'
        |  FROM snap WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 3, 'I'
        |  FROM snap WHERE o_orderkey % 20 = 0),
        |cuts AS (SELECT unnest(generate_series(0, 3)) AS as_of_seq),
        |st AS (
        |  SELECT c.as_of_seq, l.o_orderkey,
        |    arg_max(l.op, l.seq) AS last_op,
        |    arg_max(l.o_totalprice, l.seq) AS o_totalprice
        |  FROM log l CROSS JOIN cuts c
        |  WHERE l.seq <= c.as_of_seq
        |  GROUP BY 1, 2)
        |SELECT CAST(as_of_seq AS BIGINT) AS as_of_seq,
        |  CAST(sum(CASE WHEN last_op <> 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_live,
        |  CAST(sum(CASE WHEN last_op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted,
        |  CAST(CAST(sum(CASE WHEN last_op <> 'D'
        |      THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |    AS DECIMAL(18,2)) AS DOUBLE) AS total_price
        |FROM st GROUP BY 1 ORDER BY as_of_seq""".stripMargin,

    "cdc_apply" ->
      """WITH snap AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders),
        |log AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |    0 AS seq, 'I' AS op FROM snap
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 50.0, 1, 'U'
        |  FROM snap WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, 2, 'D'
        |  FROM snap WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'R', o_totalprice, 3, 'I'
        |  FROM snap WHERE o_orderkey % 20 = 0),
        |fin AS (
        |  SELECT o_orderkey, arg_max(op, seq) AS last_op,
        |    arg_max(o_custkey, seq) AS o_custkey,
        |    arg_max(o_orderstatus, seq) AS o_orderstatus,
        |    arg_max(o_totalprice, seq) AS o_totalprice
        |  FROM log GROUP BY o_orderkey)
        |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM fin WHERE last_op <> 'D' ORDER BY o_orderkey""".stripMargin,
    "incremental_agg_merge" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        |    o_orderdate
        |  FROM orders),
        |b AS (
        |  SELECT o_custkey, count(*) AS bn, sum(p) AS bs, min(p) AS bmn,
        |    max(p) AS bmx
        |  FROM o WHERE o_orderdate < TIMESTAMP '1999-01-01'
        |  GROUP BY o_custkey),
        |dl AS (
        |  SELECT o_custkey, count(*) AS dn, sum(p) AS ds, min(p) AS dmn,
        |    max(p) AS dmx
        |  FROM o WHERE o_orderdate >= TIMESTAMP '1999-01-01'
        |  GROUP BY o_custkey),
        |m AS (
        |  SELECT COALESCE(b.o_custkey, dl.o_custkey) AS o_custkey,
        |    COALESCE(bn, 0) + COALESCE(dn, 0) AS n_orders,
        |    CAST(COALESCE(bs, 0) + COALESCE(ds, 0) AS DOUBLE) AS total,
        |    CAST(least(bmn, dmn) AS DOUBLE) AS min_price,
        |    CAST(greatest(bmx, dmx) AS DOUBLE) AS max_price
        |  FROM b FULL OUTER JOIN dl ON b.o_custkey = dl.o_custkey),
        |f AS (
        |  SELECT o_custkey, count(*) AS fn, CAST(sum(p) AS DOUBLE) AS fs,
        |    CAST(min(p) AS DOUBLE) AS fmn, CAST(max(p) AS DOUBLE) AS fmx
        |  FROM o GROUP BY o_custkey)
        |SELECT m.o_custkey, m.n_orders, m.total, m.min_price, m.max_price,
        |  (m.n_orders = f.fn AND m.total = f.fs AND m.min_price = f.fmn
        |    AND m.max_price = f.fmx) AS matches_full
        |FROM m JOIN f ON m.o_custkey = f.o_custkey
        |ORDER BY m.o_custkey""".stripMargin,
    "zorder_cluster" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey AS ckr,
         |    CAST(datediff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dyr
         |  FROM orders),
         |st AS (SELECT min(ckr) AS ck0, max(ckr) AS ck1,
         |       min(dyr) AS dy0, max(dyr) AS dy1 FROM b),
         |z AS (
         |  SELECT o_orderkey,
         |    CAST(floor((ckr - ck0) * 65535.0 / (ck1 - ck0)) AS BIGINT)
         |      AS ck,
         |    CAST(floor((dyr - dy0) * 65535.0 / (dy1 - dy0)) AS BIGINT)
         |      AS dy
         |  FROM b CROSS JOIN st)
         |SELECT o_orderkey, ck, dy, $mortonDuck AS zval
         |FROM z ORDER BY zval, o_orderkey LIMIT 2000""".stripMargin,

    // the change feed is restated inline (updates: every 7th key;
    // inserts: every 97th key offset by 10M) — the same definition the
    // cdc_apply/snapshot_diff oracles use
    "lakehouse_incremental_plan" ->
      """WITH ch AS (
        |  SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 FROM orders
        |  WHERE o_orderkey % 97 = 0),
        |mo AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE)
        |    AS month, o_orderkey
        |  FROM orders),
        |pm AS (SELECT month, count(*) AS n_rows FROM mo GROUP BY 1),
        |h AS (
        |  SELECT COALESCE(mo.month, DATE '9999-01-01') AS month,
        |    count(*) AS n_changed
        |  FROM ch LEFT JOIN mo ON mo.o_orderkey = ch.o_orderkey
        |  GROUP BY 1)
        |SELECT h.month, h.n_changed,
        |  COALESCE(pm.n_rows, 0) AS n_rows,
        |  CASE WHEN pm.n_rows IS NULL THEN 'append_new_partition'
        |       WHEN CAST(h.n_changed AS DOUBLE)
        |         > CAST(pm.n_rows AS DOUBLE) * 0.1 THEN 'rebuild'
        |       ELSE 'merge' END AS action,
        |  CASE WHEN pm.n_rows IS NOT NULL
        |      AND CAST(h.n_changed AS DOUBLE)
        |        > CAST(pm.n_rows AS DOUBLE) * 0.1 THEN pm.n_rows
        |    ELSE h.n_changed END AS rows_to_write
        |FROM h LEFT JOIN pm ON pm.month = h.month
        |ORDER BY h.month""".stripMargin,

    "lakehouse_clustering_depth" ->
      s"""WITH b AS (
         |  SELECT o_orderkey, o_custkey AS ckr,
         |    CAST(datediff('day', DATE '1970-01-01',
         |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dyr
         |  FROM orders),
         |st AS (SELECT min(ckr) AS ck0, max(ckr) AS ck1,
         |       min(dyr) AS dy0, max(dyr) AS dy1 FROM b),
         |zin AS (
         |  SELECT o_orderkey,
         |    CAST(floor((ckr - ck0) * 65535.0 / (ck1 - ck0)) AS BIGINT)
         |      AS ck,
         |    CAST(floor((dyr - dy0) * 65535.0 / (dy1 - dy0)) AS BIGINT)
         |      AS dy
         |  FROM b CROSS JOIN st),
         |z AS (SELECT o_orderkey, ck, dy, $mortonDuck AS zval FROM zin),
         |ks AS (SELECT min(o_orderkey) AS k0, max(o_orderkey) AS k1
         |       FROM z),
         |filed AS (
         |  SELECT ck, dy,
         |    CAST((o_orderkey - k0) * 16 // (k1 - k0 + 1) AS BIGINT)
         |      AS f_naive,
         |    CAST(zval // 268435456 AS BIGINT) AS f_z
         |  FROM z CROSS JOIN ks),
         |zn AS (
         |  SELECT layout, dim, file, lo, hi FROM (
         |    SELECT 'naive' AS layout, 'ck' AS dim, f_naive AS file,
         |      min(ck) AS lo, max(ck) AS hi FROM filed GROUP BY 3
         |    UNION ALL
         |    SELECT 'naive', 'dy', f_naive, min(dy), max(dy)
         |    FROM filed GROUP BY 3
         |    UNION ALL
         |    SELECT 'zorder', 'ck', f_z, min(ck), max(ck)
         |    FROM filed GROUP BY 3
         |    UNION ALL
         |    SELECT 'zorder', 'dy', f_z, min(dy), max(dy)
         |    FROM filed GROUP BY 3) u),
         |agg AS (
         |  SELECT layout, dim, count(*) AS n_files,
         |    CAST(sum(hi - lo + 1) AS BIGINT) AS sum_width
         |  FROM zn GROUP BY 1, 2),
         |ov AS (
         |  SELECT a.layout, a.dim, count(*) AS n_overlap_pairs
         |  FROM zn a JOIN zn b
         |    ON a.layout = b.layout AND a.dim = b.dim
         |    AND a.file < b.file AND a.lo <= b.hi AND b.lo <= a.hi
         |  GROUP BY 1, 2)
         |SELECT g.layout, g.dim, g.n_files, g.sum_width,
         |  round(CAST(g.sum_width AS DOUBLE) / g.n_files, 6) AS avg_width,
         |  round(CAST(g.sum_width AS DOUBLE) / 65536, 6) AS point_depth,
         |  COALESCE(o.n_overlap_pairs, 0) AS n_overlap_pairs
         |FROM agg g LEFT JOIN ov o
         |  ON o.layout = g.layout AND o.dim = g.dim
         |ORDER BY g.layout, g.dim""".stripMargin
  )
}

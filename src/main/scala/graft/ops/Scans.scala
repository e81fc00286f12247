package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scans, format conversions and compressed writes — the reference
  * ecosystem's namesake capability ("data compression and format
  * conversion", reference `pyproject.toml:7`), re-expressed as Spark
  * sources/sinks (SURVEY.md §2B "Scans / sources / sinks").
  */
object Scans {
  import Tables._

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NOTE: (l_orderkey, l_linenumber) is NOT unique in the fixtures
    // (~20% duplicate pairs) — row-level lineitem queries must ORDER BY
    // every output column so ties are identical tuples (full rows are
    // unique), making row order well-defined on both engines
    "scan_parquet" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice")),

    // parquet -> csv (explicit schema on re-read) -> verify content survives
    "scan_csv" -> { (s, d) =>
      val out = scratch("scan_csv", d)
      val nation = t(s, d, "nation")
      nation.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(nation.schema).option("header", "true").csv(out)
        .orderBy("n_nationkey")
    },

    // parquet -> json-lines -> re-read with the original schema
    "scan_json" -> { (s, d) =>
      val out = scratch("scan_json", d)
      val cust = t(s, d, "customer")
      cust.write.mode("overwrite").json(out)
      s.read.schema(cust.schema).json(out).orderBy("c_custkey")
    },

    // full conversion job: parquet -> gzip csv -> re-read -> aggregate
    "convert_parquet_csv" -> { (s, d) =>
      val out = scratch("convert_parquet_csv", d)
      val li = t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      // r14 (guide §6): gzip is UNSPLITTABLE — the write's file count is
      // the re-read's maximum parallelism, and the parquet scan handed
      // this job only 2 input splits, so both the gzip compression and
      // the whole read-back ran 2-wide on a 32-core session (measured
      // 2.2 s, ~half of it the serial gzip legs). Fan the write out to
      // the session's parallelism: same rows, same aggregate, one file
      // per core instead of one gzip stream per input split. The knob is
      // core-count-derived, not a constant, so cluster deployments scale
      // it automatically.
      li.repartition(s.sparkContext.defaultParallelism)
        .write.mode("overwrite").option("compression", "gzip")
        .option("header", "true").csv(out)
      s.read.schema(li.schema).option("header", "true").csv(out)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), moneySum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    "convert_parquet_json" -> { (s, d) =>
      val out = scratch("convert_parquet_json", d)
      val ord = t(s, d, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      ord.write.mode("overwrite").option("compression", "gzip").json(out)
      s.read.schema(ord.schema).json(out)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")
    },

    // XML round-trip via Spark 4's NATIVE xml source (spark-xml was folded
    // into core in 4.0): row-tagged records out, schema-pinned read back,
    // aggregate — the config/feed-interchange format the reference
    // ecosystem's conversion jobs meet in the wild
    "convert_parquet_xml" -> { (s, d) =>
      val out = scratch("convert_parquet_xml", d)
      val cust = t(s, d, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      cust.write.mode("overwrite").option("rowTag", "customer").xml(out)
      s.read.schema(cust.schema).option("rowTag", "customer").xml(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy("c_mktsegment")
    },

    // compression codec round-trip: zstd parquet must be value-identical
    "write_compressed" -> { (s, d) =>
      val out = scratch("write_compressed", d)
      t(s, d, "part").write.mode("overwrite")
        .option("compression", "zstd").parquet(out)
      s.read.parquet(out)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size",
          "p_retailprice")
        .orderBy("p_partkey")
    },

    // parquet -> ORC (zlib) round-trip: the third columnar format Spark
    // ships a native vectorized reader for
    "convert_parquet_orc" -> { (s, d) =>
      val out = scratch("convert_parquet_orc", d)
      t(s, d, "supplier").write.mode("overwrite")
        .option("compression", "zlib").orc(out)
      s.read.orc(out)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .orderBy("s_suppkey")
    },

    // hive-style partitioned write + partition-pruned read-back: the scan
    // only lists/reads the o_year=1997 directory (PartitionFilters in the
    // plan — PlanSpec pins this)
    "write_partitioned" -> { (s, d) =>
      val out = scratch("write_partitioned", d)
      val withYear = t(s, d, "orders")
        .withColumn("o_year", year(col("o_orderdate")))
      withYear.write.mode("overwrite").partitionBy("o_year").parquet(out)
      // explicit schema on read-back: an empty partitioned write leaves no
      // files to infer from, and production read paths declare schemas
      s.read.schema(withYear.schema).parquet(out)
        .filter(col("o_year") === 1997)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_year")
        .orderBy("o_orderkey")
    },

    // raw text-lines source: one doc per line out, `spark.read.text` back,
    // then aggregate over the lines — the log-file / corpus-dump format
    // (fixture docs are single-line so the round-trip is lossless)
    // malformed-record handling: a CSV with planted corrupt rows read in
    // PERMISSIVE mode — bad rows land in _corrupt_record instead of
    // failing the job (the only sane default for a 100 TB ingest where
    // some files WILL be damaged). The aggregate proves good rows parse
    // fully while corrupt ones are quarantined and countable.
    "scan_csv_malformed" -> { (s, d) =>
      import org.apache.spark.sql.types._
      val out = scratch("scan_csv_malformed", d)
      val good = t(s, d, "nation")
        .select(concat_ws(",", col("n_nationkey"), col("n_name"),
          col("n_regionkey")).as("value"))
      // the corruption sits in n_regionkey — the column the aggregate
      // actually reads. (First cut corrupted n_nationkey only, and CSV
      // column pruning meant the parser never touched it: the "corrupt"
      // rows read back clean. Malformedness is judged per PARSED column.)
      val bad = s.range(3).select(
        concat(lit("99,corrupt_"), col("id"), lit(",notanint")).as("value"))
      good.unionAll(bad).coalesce(1).write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType),
        StructField("_corrupt_record", StringType)))
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(out)
        .agg(count(col("n_regionkey")).as("n_parsed"),
          count(col("_corrupt_record")).as("n_corrupt"),
          sum(col("n_regionkey")).cast("long").as("sum_region"))
    },

    // schema evolution read: two parquet batches with different schemas
    // (v2 adds a column) merged by mergeSchema — the lakehouse
    // add-a-column path. Spark resolves the union schema from footers
    // only (no data pass); v1 rows surface NULL for the added column.
    // The aggregate proves rows from both schema generations coexist.
    "schema_evolution" -> { (s, d) =>
      val out = scratch("schema_evolution", d)
      val ord = t(s, d, "orders")
      ord.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$out/batch=1")
      ord.filter(col("o_orderkey") % 2 =!= 0)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(s"$out/batch=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("batch").cast("long").as("batch"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L))
            .as("n_missing_priority"),
          moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("batch")
    },

    "scan_text" -> { (s, d) =>
      val out = scratch("scan_text", d)
      t(s, d, "documents").select(col("text"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .agg(count(lit(1)).as("n_lines"),
          sum(length(col("value"))).cast("long").as("n_chars"),
          sum(size(split(col("value"), " "))).cast("long").as("n_words"))
    },

    // custom DataSource V2 connector (graft.sources.SynthEventsSource):
    // partition-aware deterministic generator, aggregated and checked
    // against the same arithmetic reproduced in the DuckDB oracle
    "source_custom_v2" -> ((s, _) =>
      s.read.format("graft.sources.SynthEventsSource")
        .option("rows", 4000).option("partitions", 8).load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          moneySum(col("value")).as("sum_val"),
          max(col("event_id")).as("max_id"))
        .orderBy("event_type")),

    // DSv2 pushdown: the event_id range predicate prunes generator
    // partitions at planning time (SupportsPushDownFilters) and the
    // 2-of-4-column projection reaches the reader
    // (SupportsPushDownRequiredColumns) — PlanSpec pins both via the
    // scan's description. The V2 contract every 100 TB connector needs.
    "source_pushdown_v2" -> ((s, _) =>
      s.read.format("graft.sources.SynthEventsSource")
        .option("rows", 4000).option("partitions", 8).load()
        .filter(col("event_id") >= 1000 && col("event_id") < 2000)
        .select("event_id", "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), max(col("event_id")).as("max_id"))
        .orderBy("event_type")),

    // DSv2 WRITE connector: push customer keys through the StatsSink's
    // per-partition writers + two-phase commit, then read back the
    // driver-committed stats file. The oracle recomputes the same
    // count/sum directly from the table, so a sink that dropped or
    // double-counted a partition (the failure the commit protocol
    // exists to prevent) hash-mismatches.
    "sink_custom_v2" -> { (s, d) =>
      val out = scratch("sink_custom_v2", d) + "/stats.json"
      t(s, d, "customer").select(col("c_custkey"))
        .write.format("graft.sources.StatsSink")
        .option("path", out).mode("append").save()
      s.read.schema("n_rows LONG, sum_key LONG").json(out)
        .select("n_rows", "sum_key")
    },

    // schema inference on an untyped csv covering Spark's full inference
    // lattice (int / bigint / double / string / date / timestamp /
    // boolean); emits (column_name, inferred_type) rows, oracle-checked
    // against the declared expectation (a wrong inference — e.g. bigint
    // collapsing to int, or dates read as strings — hash-mismatches)
    "schema_inference" -> { (s, d) =>
      val out = scratch("schema_inference", d)
      t(s, d, "nation")
        .select(
          col("n_nationkey").cast("int").as("id_int"),
          // + 3e9 forces values past Int.MaxValue so inference must widen
          (col("n_nationkey").cast("bigint") + lit(3000000000L)).as("id_big"),
          round(col("n_regionkey").cast("double") / 3.0, 6).as("ratio"),
          col("n_name").as("name"),
          to_date(lit("2024-03-01")).as("d"),
          to_timestamp(lit("2024-03-01 12:34:56")).as("ts"),
          (col("n_nationkey") % 2 === 0).as("flag"))
        .write.mode("overwrite").option("header", "true").csv(out)
      val inferred = s.read.option("header", "true")
        .option("inferSchema", "true").csv(out).schema
      import s.implicits._
      inferred.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
        .toDF("col_name", "inferred_type").orderBy("col_name")
    }
  )

  def oracle: Map[String, String] = Map(
    // the 3 corrupt rows are planted by construction; the oracle mirrors
    // the logical outcome (all real rows parse, corrupt rows quarantined)
    "scan_csv_malformed" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_parsed,
        |  CAST(3 AS BIGINT) AS n_corrupt,
        |  CAST(sum(n_regionkey) AS BIGINT) AS sum_region
        |FROM nation""".stripMargin,
    // mirrors the two-batch construction logically (the file round-trip
    // is the Spark-side subject under test, like the convert_* ops)
    "schema_evolution" ->
      s"""WITH m AS (
         |  SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS batch,
         |    CAST(NULL AS VARCHAR) AS pri
         |  FROM orders WHERE o_orderkey % 2 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_totalprice, 2, o_orderpriority
         |  FROM orders WHERE o_orderkey % 2 <> 0)
         |SELECT batch, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN pri IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_missing_priority,
         |  ${sql.moneySum("o_totalprice")} AS sum_price
         |FROM m GROUP BY batch ORDER BY batch""".stripMargin,
    "scan_parquet" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""
        .stripMargin,
    "scan_csv" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "scan_json" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "convert_parquet_csv" ->
      s"""SELECT l_returnflag, count(*) AS cnt,
         |${sql.moneySum("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "convert_parquet_json" ->
      s"""SELECT o_orderpriority, count(*) AS cnt,
         |${sql.moneySum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "convert_parquet_xml" ->
      s"""SELECT c_mktsegment, count(*) AS cnt,
         |${sql.moneySum("c_acctbal")} AS sum_bal
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""
        .stripMargin,
    "write_compressed" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part ORDER BY p_partkey""".stripMargin,
    "convert_parquet_orc" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "write_partitioned" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |CAST(year(o_orderdate) AS INT) AS o_year
        |FROM orders WHERE year(o_orderdate) = 1997
        |ORDER BY o_orderkey""".stripMargin,
    "scan_text" ->
      """SELECT count(*) AS n_lines,
        |CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words
        |FROM documents""".stripMargin,
    // pins the expected inference result per column (the Spark side is the
    // system under test; the oracle is the declared type expectation)
    "schema_inference" ->
      """SELECT * FROM (VALUES
        |  ('d', 'date'), ('flag', 'boolean'), ('id_big', 'bigint'),
        |  ('id_int', 'int'), ('name', 'string'), ('ratio', 'double'),
        |  ('ts', 'timestamp')) AS t(col_name, inferred_type)
        |ORDER BY col_name""".stripMargin,
    // mirrors SynthEventsSource's row formulas over generate_series
    "sink_custom_v2" ->
      """SELECT count(*) AS n_rows,
        |CAST(sum(c_custkey) AS BIGINT) AS sum_key
        |FROM customer""".stripMargin,
    "source_pushdown_v2" ->
      """WITH ids AS (SELECT unnest(generate_series(1000, 1999)) AS id),
        |rows_ AS (SELECT id AS event_id,
        |  ['click','view','purchase','signup','error'][CAST(id % 5 AS INT) + 1]
        |    AS event_type
        |FROM ids)
        |SELECT event_type, count(*) AS cnt, max(event_id) AS max_id
        |FROM rows_ GROUP BY event_type ORDER BY event_type""".stripMargin,
    "source_custom_v2" ->
      """WITH ids AS (SELECT unnest(generate_series(0, 3999)) AS id),
        |rows_ AS (SELECT id AS event_id,
        |  ['click','view','purchase','signup','error'][CAST(id % 5 AS INT) + 1]
        |    AS event_type,
        |  ((id * 37) % 10000) / 100.0 AS value
        |FROM ids)
        |SELECT event_type, count(*) AS cnt,
        |CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val,
        |max(event_id) AS max_id
        |FROM rows_ GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}

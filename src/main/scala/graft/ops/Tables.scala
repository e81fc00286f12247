package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixture-table loaders + determinism helpers shared by every operator.
  *
  * Determinism contract (SURVEY.md §7.4): money columns are doubles that hold
  * exact 2-decimal values, so `DECIMAL(18,2)` casts are lossless in both Spark
  * and DuckDB; all double *sums* go through decimal (exact, associative) and
  * are cast back to double only at the very end, so partition/merge order can
  * never change a result bit.
  */
object Tables {

  /** Read one fixture table: `{sfDir}/{name}.parquet`. */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The document corpus spread across the cluster's cores.
    *
    * The fixture file is ONE parquet row group, so a plain scan yields ONE
    * input partition and every CPU-heavy derivation downstream (shingling,
    * MinHash banding, SimHash, TF vectors) runs single-threaded while the
    * other 31 cores idle — measured 5-20s swings on the dedup pipeline at
    * sf0.1. At 100 TB the corpus arrives in thousands of natural splits and
    * this repartition would be a no-op-sized decision; locally it is the
    * difference between using the cluster and using one core. The shuffle
    * moves the raw text once (~1.5 MB at sf0.1) — far cheaper than
    * serializing all downstream compute.
    */
  def corpus(spark: SparkSession, sfDir: String): DataFrame =
    t(spark, sfDir, "documents")
      .repartition(spark.sparkContext.defaultParallelism)

  /** Scratch dir for in-job write/read round-trips; keyed by (query, sf) so
    * concurrent scale factors never collide. Lives under target/ (ours).
    * Single definition — the scratch-path convention must not fork.
    */
  def scratch(key: String, sfDir: String): String = {
    val sf = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/tmp/$key/$sf"
  }

  /** `events.ts` has shipped in two physical parquet encodings across fixture
    * generations, so the loader adapts to whatever the scan reports rather
    * than hard-depending on one:
    *
    *  - TIMESTAMP(NANOS): Spark 4.x cannot read it natively; with the
    *    `nanosAsLong` conf (set in [[graft.Sessions]] — the one definition
    *    site every entry point goes through) it arrives as LongType nanos,
    *    which we truncate to microseconds exactly as DuckDB does
    *    (BASELINE.md "known parity hazard").
    *  - timestamp[us] (isAdjustedToUTC=false): arrives as TIMESTAMP_NTZ;
    *    cast to the session TimestampType (session TZ is pinned UTC, so the
    *    wall-clock values are preserved and match DuckDB's naive TIMESTAMP).
    *
    * Either way downstream operators always see a session-UTC TimestampType
    * `ts` column.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = t(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }

  /** Exact money value: lossless on the 2-decimal fixture doubles. */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Small exact factor like (1 - l_discount); bounded so decimal products
    * stay within precision 38 in BOTH engines.
    */
  def frac(c: Column): Column = c.cast(DecimalType(8, 2))

  /** Order-insensitive sum of a money double: exact decimal sum, emitted as
    * double. Mirror in DuckDB: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE).
    */
  def moneySum(c: Column): Column = sum(money(c)).cast("double")

  /** Deterministic average: exact decimal sum divided (in IEEE double) by the
    * row count. Mirror: CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE)/count(*).
    */
  def moneyAvg(c: Column): Column =
    sum(money(c)).cast("double") / count(lit(1))

  /** l_extendedprice * (1 - l_discount) as an exact decimal. */
  def discPrice(price: Column, discount: Column): Column =
    money(price) * frac(lit(1) - money(discount))

  /** SQL fragments for the DuckDB oracle, kept adjacent so the two sides
    * cannot drift apart.
    */
  object sql {
    def money(c: String): String = s"CAST($c AS DECIMAL(18,2))"
    def moneySum(c: String): String = s"CAST(sum(${money(c)}) AS DOUBLE)"
    def moneyAvg(c: String): String = s"${moneySum(c)} / count(*)"
    def discPrice(p: String, d: String): String =
      s"${money(p)} * CAST(1 - ${money(d)} AS DECIMAL(8,2))"
    /** The TPC-H revenue term `sum(l_extendedprice * (1-l_discount))`. */
    val moneyVol: String =
      s"CAST(sum(${discPrice("l_extendedprice", "l_discount")}) AS DOUBLE)"
  }
}

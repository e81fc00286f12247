package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic event generator with
  * REAL scan pushdown — the two properties that matter at 100 TB:
  *
  *   - *partition-aware*: N input partitions each produce their
  *     deterministic slice with no coordination, exactly how a real
  *     connector parallelizes reads across executors;
  *   - *pushdown-aware*: `event_id` range predicates tighten the generated
  *     range itself ([[SupportsPushDownFilters]]) — partitions falling
  *     entirely outside the bound are never planned, the source-side
  *     analogue of partition pruning in a range-partitioned store — and
  *     column pruning ([[SupportsPushDownRequiredColumns]]) makes readers
  *     materialize only requested fields, the V2 contract behind
  *     ReadSchema pruning on file sources.
  *
  * Row i (globally numbered): user_id = i % 50,
  * event_type = types[i % 5], value = ((i * 37) % 10000) / 100.0 — plain
  * integer arithmetic so an SQL oracle can reproduce it exactly.
  *
  * Usage:
  * `spark.read.format("graft.sources.SynthEventsSource")
  *   .option("rows", 4000).option("partitions", 8).load()`
  */
class SynthEventsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthEventsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table =
    new SynthTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SynthEventsSource {
  val Types: Array[String] =
    Array("click", "view", "purchase", "signup", "error")

  val schema: StructType = new StructType()
    .add("event_id", LongType, nullable = false)
    .add("user_id", LongType, nullable = false)
    .add("event_type", StringType, nullable = false)
    .add("value", DoubleType, nullable = false)
}

private class SynthTable(rows: Long, partitions: Int)
  extends Table with SupportsRead {
  override def name(): String = s"synth_events($rows, $partitions)"
  override def schema(): StructType = SynthEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, partitions)
}

/** Accumulates pushdown state during optimization, then freezes into a
  * [[SynthScan]]. Only `event_id` comparisons are claimed (they map onto
  * the generator's global row number, so they bound the range exactly);
  * everything else is returned as residual for Spark to evaluate — the
  * correct V2 division of labor.
  */
private class SynthScanBuilder(rows: Long, partitions: Int)
  extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = SynthEventsSource.schema

  private def idBound(f: Filter): Boolean = f match {
    case EqualTo("event_id", v: Long) =>
      lo = math.max(lo, v); hi = math.min(hi, v + 1); true
    case GreaterThan("event_id", v: Long) =>
      lo = math.max(lo, v + 1); true
    case GreaterThanOrEqual("event_id", v: Long) =>
      lo = math.max(lo, v); true
    case LessThan("event_id", v: Long) =>
      hi = math.min(hi, v); true
    case LessThanOrEqual("event_id", v: Long) =>
      hi = math.min(hi, v + 1); true
    case IsNotNull(_) => true // schema is non-nullable: vacuously true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition(idBound)
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new SynthScan(rows, partitions, lo, hi, required, pushed)
}

private class SynthScan(rows: Long, partitions: Int, lo: Long, hi: Long,
  required: StructType, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces the pushdown outcome in `explain` — what PlanSpec pins
  override def description(): String =
    s"synth_events range=[$lo,$hi) " +
      s"cols=[${required.fieldNames.mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]"

  /** The ORIGINAL [0, rows) boundaries, clamped to the pushed range;
    * partitions entirely outside it are dropped — a range predicate
    * prunes work at planning time, before any task launches.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).iterator.map { p =>
      val start = math.max(p * per, lo)
      val end = math.min(math.min((p + 1) * per, rows), hi)
      SynthPartition(start, end)
    }.filter(sp => sp.start < sp.end)
      .map(identity[InputPartition]).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private case class SynthPartition(start: Long, end: Long)
  extends InputPartition

private class SynthReaderFactory(fields: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    // per-field generators resolved ONCE per partition, in the pruned
    // schema's order — the reader materializes exactly what was asked for
    val gens: Array[Long => Any] = fields.map {
      case "event_id" => (i: Long) => i
      case "user_id" => (i: Long) => i % 50L
      case "event_type" => (i: Long) =>
        UTF8String.fromString(SynthEventsSource.Types((i % 5L).toInt))
      case "value" => (i: Long) => ((i * 37L) % 10000L) / 100.0
      case other => sys.error(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(gens.map(g => g(i)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

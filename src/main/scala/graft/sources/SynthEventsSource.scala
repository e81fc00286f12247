package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic event generator.
  *
  * Demonstrates the engine-side source extension surface (TableProvider →
  * Table → ScanBuilder → Batch → partition readers) with the property that
  * matters at 100 TB: the generator is *partition-aware* — N input
  * partitions each produce their deterministic slice with no coordination,
  * exactly how a real connector parallelizes reads across executors.
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
    new SynthScan(rows, partitions)
}

private class SynthScan(rows: Long, partitions: Int)
  extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SynthEventsSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val per = (rows + partitions - 1) / partitions
    (0 until partitions).map { p =>
      val start = p * per
      val end = math.min(start + per, rows)
      SynthPartition(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory
}

private case class SynthPartition(start: Long, end: Long)
  extends InputPartition

private class SynthReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow = InternalRow(
        i,
        i % 50L,
        UTF8String.fromString(
          SynthEventsSource.Types((i % 5L).toInt)),
        ((i * 37L) % 10000L) / 100.0)
      override def close(): Unit = ()
    }
  }
}

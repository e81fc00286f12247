package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 WRITE connector: per-partition stats accumulation with a
  * driver-side two-phase commit.
  *
  * The write-side twin of [[SynthEventsSource]]: each executor-side
  * [[DataWriter]] folds its partition's rows into (count, sum of the first
  * long column) with no coordination; the per-partition results travel to
  * the driver as [[WriterCommitMessage]]s, and only `commit()` — which
  * runs exactly once, after every task has succeeded — makes the result
  * visible (a JSON stats file at `path`). A failed/retried task's writer
  * is aborted and its message dropped, so speculative or re-executed
  * tasks can never double-count: exactly the commit discipline every real
  * sink (parquet committer, JDBC, object-store) needs at 1000-executor
  * scale.
  *
  * Usage:
  * `df.write.format("graft.sources.StatsSink").option("path", f)
  *   .mode("append").save()` — first column must be LONG.
  */
class StatsSink extends TableProvider {
  // writes take the incoming DataFrame's schema (there is nothing to infer)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def getTable(schema: StructType, partitioning: Array[Transform],
    properties: util.Map[String, String]): Table =
    new StatsSinkTable(schema, properties.get("path"))
}

private class StatsSinkTable(writeSchema: StructType, path: String)
  extends Table with SupportsWrite {
  override def name(): String = s"stats_sink($path)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new StatsBatchWrite(path)
      }
    }
}

private case class StatsMessage(count: Long, sum: Long)
  extends WriterCommitMessage

private class StatsBatchWrite(path: String) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo)
    : DataWriterFactory = new StatsWriterFactory

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val stats = messages.map(_.asInstanceOf[StatsMessage])
    val n = stats.map(_.count).sum
    val s = stats.map(_.sum).sum
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p,
      s"""{"n_rows": $n, "sum_key": $s, "partitions": ${stats.length}}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class StatsWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
    : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var count = 0L
    private var sum = 0L
    override def write(row: InternalRow): Unit = {
      count += 1
      sum += row.getLong(0)
    }
    override def commit(): WriterCommitMessage = StatsMessage(count, sum)
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}

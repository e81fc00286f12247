package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Robustness sweep: every registered query must run (not throw) on
  * zero-row inputs with the fixture schemas — the degenerate-partition /
  * empty-source case any 100 TB pipeline hits constantly.
  */
class EmptyInputSpec extends SparkSpec {

  private val emptySf = "/root/repo/target/tmp/empty_sf"

  private lazy val prepared: String = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    if (!Files.exists(Paths.get(s"$emptySf/_READY"))) {
      tables.foreach { name =>
        // read raw (events.ts stays Long-nanos like the fixture) and keep
        // the schema with zero rows
        spark.read.parquet(s"$sf/$name.parquet").limit(0)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$emptySf/$name.parquet")
      }
      Files.createFile(Paths.get(s"$emptySf/_READY"))
    }
    emptySf
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name tolerates empty inputs") {
      val df = fn(spark, prepared)
      assert(df.count() >= 0)
    }
  }

  test("empty-input flagship aggregates to zero rows, not a crash") {
    val rows = graft.ops.Aggregates.q1(spark, prepared).collect()
    assert(rows.isEmpty)
  }
}

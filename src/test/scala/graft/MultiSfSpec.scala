package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Pins the concurrent-scale-factor contract: queries that register temp
  * views (SQL-expressed ops) or memoize per-(session, sf) state (the dedup
  * sketch caches) key that state by the sf dir, so interleaving two scale
  * factors on ONE session must not clobber either. A regression here is
  * silent wrong-answers (a view from dir B serving dir A's query), which is
  * why the assertion is round-trip equality, not just "runs".
  */
class MultiSfSpec extends SparkSpec {

  private val dirB = "/root/repo/target/tmp/multi_sf_b"

  /** A second "scale factor": the fixture tables with half the rows, so
    * every checked query provably returns different results than on `sf`.
    */
  private lazy val prepared: String = {
    if (!Files.exists(Paths.get(s"$dirB/_READY"))) {
      Seq("region", "nation", "customer", "orders", "lineitem", "documents")
        .foreach { n =>
          val full = spark.read.parquet(s"$sf/$n.parquet")
          val keyCol = full.columns.head
          full.filter(col(keyCol) % 2 === 0)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$dirB/$n.parquet")
        }
      Files.createFile(Paths.get(s"$dirB/_READY"))
    }
    dirB
  }

  private val checked = Seq(
    "agg_rollup",          // sf-suffixed temp view
    "agg_grouping_sets",   // sf-suffixed temp view
    "join_anti_nullaware", // sf-suffixed temp views (round-6 fix)
    "dedup_minhash")       // per-(session, sf) memoized sketch caches

  checked.foreach { name =>
    test(s"$name survives interleaved scale factors on one session") {
      def run(dir: String): Seq[String] =
        SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq
      val a1 = run(sf)
      val b = run(prepared)
      val a2 = run(sf)
      assert(a1 == a2,
        s"$name: rerun after another sf changed the result (state clobber)")
      assert(a1 != b,
        s"$name: half-sized fixture returned identical rows — the second " +
          "dir was not actually read")
    }
  }
}

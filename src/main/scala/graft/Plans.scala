package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: dumps `explain("formatted")` for every query (or a named
  * subset) so pushdown / broadcast / codegen properties can be inspected —
  * the "iterate until it's the plan you'd want" loop from the build brief.
  *
  * Usage: runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = args.drop(1).toSet
    val spark = Sessions.local(4, appName = "graft-plans")
    spark.sparkContext.setLogLevel("ERROR")
    // plan dumps want the untruncated text (Sessions caps the plan-string
    // length for the bench's AQE-update path; see Sessions.scala)
    try spark.conf.set("spark.sql.maxPlanStringLength", 134217728)
    catch { case _: Throwable => () }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
      .foreach { case (name, fn) =>
        println(s"\n===== $name =====")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"(failed: ${e.getMessage})") }
      }
    spark.stop()
  }
}

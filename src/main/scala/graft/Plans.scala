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
    // plan dumps want long untruncated text (Sessions caps the plan-string
    // length for the bench's AQE-update path). ADVICE r13 #4: the old
    // runtime `spark.conf.set` sat under a swallow-all catch, so on any
    // Spark version where this conf is static the dump would silently
    // truncate at the Sessions default and the before/after artifacts
    // would lie. Setting it at builder time is correct on every version
    // and leaves nothing swallowed; 8 MiB bounds a runaway dump while
    // comfortably holding the largest real plan (betweenness ≈ 3.8 MB).
    val spark = Sessions.local(4, appName = "graft-plans",
      extraConf = Map(
        "spark.sql.maxPlanStringLength" ->
          sys.env.getOrElse("SPARK_GRAFT_MAX_PLAN_STR", "8388608"),
        // SPARK_GRAFT_HIDE_CACHED=false dumps the FULL nested cache
        // trees (each memo's build plan inline) instead of the bench's
        // walk-opaque MemoScan leaves — the form that shows what each
        // memoized kernel executes (e.g. the betweenness layer
        // exclusions live inside the l2/l3 memo builds)
        "spark.graft.hideCachedPlanTrees" ->
          sys.env.getOrElse("SPARK_GRAFT_HIDE_CACHED", "true")))
    spark.sparkContext.setLogLevel("ERROR")
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

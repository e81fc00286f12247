ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ainddatatransformationspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Plan-shape suites (PlanSpec, GraphModeSpec) flip session-global confs
// (broadcastState, autoBroadcastJoinThreshold, adaptive.enabled) on the
// shared SparkSession; conf-restore in `finally` does not protect a
// CONCURRENT suite reading the session mid-window. Forked tests already
// run sequentially (testForkedParallel defaults false) — pin both
// explicitly so a future build tweak can't reintroduce the race.
Test / parallelExecution := false
Test / testForkedParallel := false
run / fork := true
// Pass the forked JVM's stdout through UNPREFIXED: sbt's default logger
// wraps every forked-process line in "[info] ", which breaks any consumer
// that expects Bench/Verify's machine-readable JSON line verbatim (the
// bench summary parsed as null two rounds running because of the prefix).
// stderr still goes through the logger — human chatter stays separated.
run / outputStrategy := Some(StdoutOutput)
// ...and keep sbt's own "[success] Total time: ..." epilogue off stdout so
// the program's final line IS the final line a last-line parser sees.
// (Exit status still reports success/failure.)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g GC-thrashes once ~90 queries' plans/caches accumulate in one JVM
  // (measured 10-12s stragglers at sf0.1); 16g keeps full GCs out of the
  // bench. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

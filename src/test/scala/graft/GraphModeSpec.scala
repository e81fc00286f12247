package graft

import org.apache.spark.sql.DataFrame

/** Result-equivalence gate for the conf-gated graph state-join strategy
  * (VERDICT r9 #1): every key in the iterative family must return
  * IDENTICAL rows under `spark.graft.graph.broadcastState=true` (the
  * entity-graph broadcast form, the default and the form the DuckDB
  * oracle certifies) and `=false` (the billion-node shuffle form, run
  * here with the auto-broadcast threshold off so Catalyst cannot
  * re-broadcast on fixture-scale stats). Equality to the oracle-green
  * default IS oracle equivalence for the flipped form.
  *
  * `auto` is covered as a mode-validity check (it must pick ONE of the
  * two proven forms — the stats check only selects between them).
  */
class GraphModeSpec extends SparkSpec {

  private val familyKeys = Seq(
    "graph_pagerank", "graph_hits", "graph_label_prop",
    "graph_modularity", "graph_bfs_layers", "graph_kcore_peel",
    "graph_closeness_sampled", "graph_degree_assortativity",
    "graph_rich_club", "graph_avg_neighbor_degree",
    "graph_betweenness_sampled")

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withMode[A](mode: Option[String], bcastOff: Boolean)(
      f: => A): A = {
    val c = spark.conf
    val keys = Seq(graft.ops.Graph.StateModeKey,
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      mode match {
        case Some(m) => c.set(graft.ops.Graph.StateModeKey, m)
        case None => c.unset(graft.ops.Graph.StateModeKey)
      }
      if (bcastOff) c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      f
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("every iterative-family key returns identical rows under the " +
      "broadcast (default) and shuffle (broadcastState=false) forms") {
    familyKeys.foreach { key =>
      val base = withMode(None, bcastOff = false) {
        rows(SparkEntry.queries(key)(spark, sf))
      }
      val flipped = withMode(Some("false"), bcastOff = true) {
        rows(SparkEntry.queries(key)(spark, sf))
      }
      assert(base == flipped,
        s"$key diverged between broadcast and shuffle state forms: " +
          s"base=${base.take(3)}... flipped=${flipped.take(3)}...")
    }
  }

  test("broadcastState=auto resolves to a working plan and matches the " +
      "default results (stats check only selects between proven forms)") {
    val key = "graph_pagerank"
    val base = withMode(None, bcastOff = false) {
      rows(SparkEntry.queries(key)(spark, sf))
    }
    val auto = withMode(Some("auto"), bcastOff = false) {
      rows(SparkEntry.queries(key)(spark, sf))
    }
    assert(base == auto)
  }

  test("familyKeys covers every stateSide call site (two-way source pin: " +
      "a new iterative key adopting the conf cannot skip this gate)") {
    val src = scala.io.Source.fromFile(
      "/root/repo/src/main/scala/graft/ops/Graph.scala", "UTF-8")
    val callSites =
      try src.getLines().count(_.contains("val st = stateSide(s) _"))
      finally src.close()
    assert(callSites == familyKeys.size,
      s"Graph.scala has $callSites `val st = stateSide(s) _` call sites " +
        s"but GraphModeSpec.familyKeys lists ${familyKeys.size} keys — " +
        "add the new key to familyKeys (result-equivalence gate) or " +
        "explain the discrepancy here")
  }

  test("an invalid broadcastState value fails loudly, not silently") {
    withMode(Some("sometimes"), bcastOff = false) {
      intercept[IllegalArgumentException] {
        SparkEntry.queries("graph_pagerank")(spark, sf)
      }
    }
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale probe (VERDICT r8 #7): measure the sf0.1 → ~sf1.0
  * runtime slope of the five slowest query families to confirm the
  * sub-quadratic shapes SCALE.md argues from plan structure. A 10×
  * input with ~linear cost should land near 10×; ≥ ~30× flags a hidden
  * quadratic (the families mix corpus-linear kernels with vocab-/graph-
  * sized stages, so the honest expectation is linear-ish with a
  * sublinear tail, not exactly 10.0).
  *
  * The ~sf1.0 input is synthesized into `target/scale_sf1` as 10
  * STRUCTURALLY DISJOINT replicas of the sf0.1 fixture — the shape a
  * 10× corpus actually has, chosen so each query's SEMANTIC output
  * scales linearly and any super-linear runtime is the ENGINE's, not
  * the data's:
  *  - `documents`: doc_ids shifted per replica and every token salted
  *    with the replica tag, so replicas share no shingles — near-dup
  *    pairs grow 10× (NOT 100×: un-salted replicas would make every doc
  *    a 10-way exact duplicate and quadratically inflate pair counts,
  *    measuring a semantic change instead of scale), and the vocabulary
  *    grows with the corpus (the Heaps-law reality agg_countmin's
  *    dense-id path must survive).
  *  - `orders`/`lineitem`: order/customer/supplier keys shifted per
  *    replica — the trade graph becomes 10 disjoint copies (V ×10,
  *    E ×10, same diameter), the exact reference for detecting a
  *    super-linear term in the O(V) broadcast-round graph queries.
  *  - dimension tables (`part`, `nation`, `region`, `customer`,
  *    `supplier`) ship unreplicated: catalogs don't grow 10× when
  *    volume does, and basket_rules' brand dimension staying fixed is
  *    precisely what keeps its in-row pair enumeration bounded.
  *
  * Usage: `runMain graft.ScaleProbe [sfDir] [replicas]` — prints one
  * JSON line with per-key seconds at both scales and the ratio.
  * Results land in SCALE.md's "measured slopes" table.
  */
object ScaleProbe {
  /** Every family ≥ ~2 s at sf0.1 (VERDICT r10 #7), one representative
    * per memo family where several keys share a kernel. Deliberately
    * EXCLUDED: `embedding_hubness`/`embedding_knn_graph` — the all-
    * vectors kNN build over a FIXED 16-cell codebook is N²/K by design;
    * a real deployment grows K with N (cell size constant), which the
    * probe cannot model without changing the query. The bounded-query
    * ANN paths (`sim_ivf_nprobe_sweep`) and the banded/linear embedding
    * kernels ARE measured.
    */
  val Keys = Seq(
    // corpus/text + dedup pair-kernel families (documents replicated,
    // tokens replica-salted)
    "agg_countmin", "corpus_dedup_survivorship", "dedup_method_overlap",
    "dedup_lsh_audit", "dedup_threshold_sweep", "dedup_containment",
    "dedup_ngram_jaccard", "contamination_source_matrix",
    // r12b: weighted-Jaccard blocking (salted replicas keep first-token
    // blocks disjoint, so pairs grow linearly — a REAL 10x corpus over a
    // fixed vocab grows blocks instead, the documented editdist_blocked
    // caveat); the lexicon router is map-only and rides along as the
    // cheap-filter baseline
    "dedup_weighted_jaccard", "text_domain_classify",
    // trade-graph iterative rounds (keys shifted -> 10 disjoint graphs;
    // betweenness's 4 global seeds all land in replica 0 — the probe
    // measures the frontier joins scanning a 10x edge table)
    "graph_hits", "graph_pagerank", "graph_label_prop",
    "graph_bfs_layers", "graph_kcore_peel", "graph_avg_neighbor_degree",
    "graph_betweenness_sampled",
    // char-trigram LM: replica-salted tokens grow the trigram vocab
    // with the corpus (the Heaps-law shape the broadcast dim must survive)
    "text_char_trigram_langid",
    // relational/lakehouse over replicated orders/lineitem
    // (customer_pareto_front joined at r13 once its dominance pass became
    // the binned prefix-max form — the quadratic anti-join it replaced
    // could never have passed the slope gate)
    "customer_pareto_front",
    "basket_rules", "q7_nation_volume", "q21_waiting_supplier",
    "supplier_cr4", "convert_parquet_csv", "lakehouse_clustering_depth",
    "stream_cdc_apply",
    // events-based state machines (users/event ids shifted)
    "events_markov_stationary",
    // embedding kernels with linear shapes (vectors replicated with a
    // per-replica dimension rotation -> decorrelated replicas)
    "sim_ivf_nprobe_sweep", "embedding_sign_lsh", "embedding_pca_power",
    "embedding_pq",
    // r13: the farthest-point traversal after its per-round ScopedMemo
    // pin (k corpus scans — the O(k²) re-evaluation it replaced would
    // have shown here as a super-linear constant), plus the two r12c
    // keys VERDICT asked onto the probe (cheap, but the slope row
    // documents the shapes: hash-bucketed holdout is one pass, the
    // VALUES CTE is O(1) dim + linear join)
    "sample_kcenter", "sample_group_holdout", "sql_values_cte")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val keys = if (args.length > 2) args.drop(2).toSeq else Keys
    val scaleDir = "/root/repo/target/scale_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt, appName = "graft-scale-probe")

    synthesize(spark, sfDir, scaleDir, replicas)

    def time(f: => Unit): Double = {
      // measurement isolation: drop cached blocks AND the DfLru memos
      // pointing at them, so no key pays (or dodges) another key's cache
      // state — the first probe run charged basket_rules 73 s for GC
      // pressure from four other keys' accumulated caches (isolated: 17 s).
      // catalog.clearCache only covers SQL-cached Datasets; the memoized
      // kernels localCheckpoint via raw RDD persists, which must be freed
      // explicitly or they leak once their memo is dropped (measured: the
      // leak re-inflated later keys 4-6x through storage-eviction churn)
      spark.catalog.clearCache()
      graft.plans.DfLru.clearAll()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    // codegen/JIT warm-up at sf0.01 so the sf0.1 timings don't eat it
    val warmDir = sfDir.replace("sf0.1", "sf0.01")
    keys.foreach { k =>
      SparkEntry.queries(k)(spark, warmDir).write
        .format("noop").mode("overwrite").save()
    }
    val rows = keys.map { k =>
      val small = time {
        SparkEntry.queries(k)(spark, sfDir).write
          .format("noop").mode("overwrite").save()
      }
      val big = time {
        SparkEntry.queries(k)(spark, scaleDir).write
          .format("noop").mode("overwrite").save()
      }
      (k, small, big, big / small)
    }
    spark.stop()
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val body = rows.map { case (k, s, b, r) =>
      s""""$k":{"sf01_sec":${num(s)},"x10_sec":${num(b)},"ratio":${num(r)}}"""
    }.mkString(",")
    println(s"""{"metric":"scale_slope","replicas":$replicas,$body}""")
    // the slope GATE (VERDICT r10 #7): a ratio above 1.5x linear in the
    // replica count flags a hidden super-linear term — exit nonzero so
    // the probe can run as a scripted check, not just a report
    val bad = rows.filter(_._4 > 1.5 * replicas)
    require(bad.isEmpty,
      s"super-linear slope(s): ${bad.map(r => s"${r._1}=${r._4}").mkString(", ")}")
  }

  /** Write the replicated dataset; skipped if already present with the
    * same replica count (marker file).
    */
  def synthesize(s: SparkSession, sfDir: String, outDir: String,
      replicas: Int): Unit = {
    // v2: events + embeddings joined the replicated set (r11)
    val marker = new java.io.File(s"$outDir/.replicas_v2_$replicas")
    if (marker.exists()) return
    val out = new org.apache.hadoop.fs.Path(outDir)
    val fs = out.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(out, true)

    def rep(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = s.read.parquet(s"$sfDir/$name.parquet")
      (0 until replicas).map(i => f(base, i)).reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
    def copy(name: String): Unit =
      s.read.parquet(s"$sfDir/$name.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // key shifts use fixed strides comfortably above every fixture max
    val D = 1000000L; val OK = 10000000L; val CK = 1000000L
    val SK = 1000000L
    rep("documents") { (df, i) =>
      df.select((col("doc_id") + lit(i * D)).as("doc_id"),
        // salt every token with the replica tag (cross-replica Jaccard 0)
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit(s"~r$i"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    rep("orders") { (df, i) =>
      df.select((col("o_orderkey") + lit(i * OK)).as("o_orderkey"),
        (col("o_custkey") + lit(i * CK)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }
    rep("lineitem") { (df, i) =>
      df.select((col("l_orderkey") + lit(i * OK)).as("l_orderkey"),
        col("l_partkey"),
        (col("l_suppkey") + lit(i * SK)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }
    // events: ids/users shifted, calendar unchanged — the same windows
    // serve 10× concurrent users, the load shape a 10× product has
    val EV = 100000000L; val U = 1000000L
    rep("events") { (df, i) =>
      df.select((col("event_id") + lit(i * EV)).as("event_id"), col("ts"),
        (col("user_id") + lit(i * U)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    // embeddings: ids shifted + dims CYCLICALLY ROTATED per replica —
    // rotation preserves each replica's internal neighbor structure
    // (norms/dots invariant) while decorrelating replicas, so ANN
    // candidate sets grow linearly instead of every vector gaining 9
    // exact duplicates (which would measure a semantic change, the same
    // reason documents are token-salted). Queries/centroids stay the
    // replica-0 ids: fixed query count over a 10× corpus.
    val VK = 1000000L
    rep("embeddings") { (df, i) =>
      val shift = (i * 7) % 64
      val rot =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      df.select((col("vec_id") + lit(i * VK)).as("vec_id"),
        rot.as("embedding"), col("label"))
    }
    Seq("customer", "supplier", "part", "nation", "region").foreach(copy)
    marker.getParentFile.mkdirs()
    marker.createNewFile()
    ()
  }
}

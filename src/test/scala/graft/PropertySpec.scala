package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-based invariants (SURVEY.md §5.2 item 4) over seeded random
  * inputs — deterministic across runs (fixed seed), 20 trials each.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private def trials = 1 to 20

  test("dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    for (_ <- trials) {
      val texts = List.fill(rnd.nextInt(30) + 1)(
        List.fill(rnd.nextInt(5) + 1)(rnd.nextPrintableChar().toString)
          .mkString(if (rnd.nextBoolean()) " " else "  "))
      val df = texts.toDF("text")
        .withColumn("norm",
          regexp_replace(lower(trim(col("text"))), "\\s+", " "))
        .select("norm").distinct()
      val once = df.collect().map(_.getString(0)).sorted.toSeq
      val twice = df.distinct().collect().map(_.getString(0)).sorted.toSeq
      assert(once == twice)
    }
  }

  test("top-k is a prefix of the full sort") {
    for (_ <- trials) {
      val xs = List.fill(30)(rnd.nextInt(2001) - 1000)
      val k = rnd.nextInt(10) + 1
      val df = xs.zipWithIndex.toDF("v", "id")
      val full = df.orderBy(col("v").desc, col("id")).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      val topk = df.orderBy(col("v").desc, col("id")).limit(k).collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(topk == full.take(k))
    }
  }

  test("TopKPerKey == row_number window on random keyed data, random k") {
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(400) + 50
      val k = rnd.nextInt(5) + 1
      val rows = List.fill(n)(
        (rnd.nextInt(8).toLong, rnd.nextLong(), rnd.nextInt(100).toDouble))
      val df = rows.toDF("key", "id", "score")
        // spread across partitions so both the partial phase and the
        // final merge genuinely run
        .repartition(4)
      val native = graft.plans.TopKPerKey.topK(df, Seq(col("key")),
          Seq(col("score").desc, col("id")), k)
        .orderBy(col("key"), col("score").desc, col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("score").desc, col("id"))
      val window = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy(col("key"), col("score").desc, col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(native.sameElements(window), s"k=$k n=$n")
    }
  }

  test("RewriteBinnedRangeJoin == brute force on random SIGNED keys") {
    // the naive abs-range join goes through the auto-binning rewrite in
    // this session (GraftExtensions is active); negative keys exercise
    // the Pmod floor-division bin path the fixture's positive
    // timestamps never reach
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(120) + 20
      val width = (rnd.nextInt(50) + 1).toLong
      val rows = List.tabulate(n)(i =>
        (i.toLong, rnd.nextLong() % 500L)) // signed values in [-499, 499]
      val df = rows.toDF("id", "v").repartition(3)
      val a = df.select(col("id").as("id_a"), col("v").as("v_a"))
      val b = df.select(col("id").as("id_b"), col("v").as("v_b"))
      val joined = a.join(b, col("id_a") < col("id_b")
          && abs(col("v_a") - col("v_b")) <= lit(width))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia < ib && math.abs(va - vb) <= width
      } yield (ia, ib)).toSet
      assert(joined == brute,
        s"width=$width missing=${brute -- joined} extra=${joined -- brute}")
    }
  }

  test("RewriteIntervalJoin == brute force on random signed starts and " +
      "points") {
    // the naive p >= s AND p < s + C join goes through the interval
    // auto-binning rewrite in this session (GraftExtensions active);
    // signed values exercise the negative-bin floor path
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(120) + 20
      val width = (rnd.nextInt(50) + 1).toLong
      val rows = List.tabulate(n)(i => (i.toLong, rnd.nextLong() % 500L))
      val df = rows.toDF("id", "v").repartition(3)
      val iv = df.select(col("id").as("iv_id"), col("v").as("s"))
      val pts = df.select(col("id").as("pt_id"), col("v").as("p"))
      val joined = iv.join(pts,
          col("p") >= col("s") && col("p") < col("s") + lit(width))
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ii, s) <- rows; (pi, p) <- rows
        if p >= s && p < s + width
      } yield (ii, pi)).toSet
      assert(joined == brute,
        s"width=$width missing=${brute -- joined} extra=${joined -- brute}")
    }
  }

  test("binned interval-overlap construction == brute force on signed " +
      "intervals, each pair exactly once") {
    // the join_interval_overlap shape, generically: bin width >= both
    // sides' max interval length, endpoint-bin explode (<=2 bins each),
    // pair dedup via the overlap-start bin — no distinct, no pair scan.
    // Signed starts exercise the truncating-div bins (monotone, spacing
    // >= w, so the <=2-bin cover holds on both sides of zero).
    for (_ <- 1 to 10) {
      val n = rnd.nextInt(80) + 20
      val w = (rnd.nextInt(40) + 2).toLong
      def mk() = List.tabulate(n)(i => (i.toLong,
        rnd.nextLong() % 500L, (rnd.nextInt(w.toInt) + 1).toLong))
      val ar = mk(); val br = mk()
      val a = ar.toDF("a_id", "as_v", "a_len")
        .select(col("a_id"), col("as_v"),
          (col("as_v") + col("a_len")).as("ae_v")).repartition(3)
      val b = br.toDF("b_id", "bs_v", "b_len")
        .select(col("b_id"), col("bs_v"),
          (col("bs_v") + col("b_len")).as("be_v")).repartition(3)
      val aB = a.withColumn("bin", explode(array_distinct(array(
        expr(s"as_v div $w"), expr(s"(ae_v - 1) div $w")))))
      val bB = b.withColumn("bin", explode(array_distinct(array(
        expr(s"bs_v div $w"), expr(s"(be_v - 1) div $w")))))
      val got = aB.join(bB, Seq("bin"))
        .filter(col("as_v") < col("be_v") && col("bs_v") < col("ae_v"))
        .filter(col("bin") === expr(s"greatest(as_v, bs_v) div $w"))
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val gotSet = got.toSet
      assert(got.size == gotSet.size, s"w=$w a pair joined twice")
      val brute = (for {
        (ai, as0, al) <- ar; (bi, bs0, bl) <- br
        if as0 < bs0 + bl && bs0 < as0 + al
      } yield (ai, bi)).toSet
      assert(gotSet == brute,
        s"w=$w missing=${brute -- gotSet} extra=${gotSet -- brute}")
    }
  }

  test("RewriteBinnedRangeJoin == brute force on wrap-zone keys at the " +
      "Long domain edges") {
    // keys within `width` of Long.MinValue/MaxValue: the former
    // `e - pmod(e, w)` bin form overflowed its subtract here (ANSI:
    // runtime error; legacy: a far-wrong bin, silently dropping
    // qualifying pairs); the CASE-on-remainder-sign bin must not.
    // Brute force compares through BigInt — the Long difference itself
    // is unrepresentable for cross-edge pairs.
    for (_ <- 1 to 5) {
      val width = (rnd.nextInt(9) + 1).toLong
      val vals = List(Long.MinValue, Long.MinValue + 1,
        Long.MinValue + width, Long.MaxValue, Long.MaxValue - 1,
        Long.MaxValue - width, -width, -1L, 0L, 1L, width,
        rnd.nextLong() % 1000L)
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v").repartition(3)
      val a = df.select(col("id").as("id_a"), col("v").as("v_a"))
      val b = df.select(col("id").as("id_b"), col("v").as("v_b"))
      val joined = a.join(b, col("id_a") < col("id_b")
          && abs(col("v_a") - col("v_b")) <= lit(width))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia < ib && (BigInt(va) - BigInt(vb)).abs <= width
      } yield (ia, ib)).toSet
      assert(joined == brute,
        s"width=$width missing=${brute -- joined} extra=${joined -- brute}")
    }
  }

  test("containment flags a planted doc-in-doc pair that Jaccard misses") {
    // B = 200 distinct words; A = a 30-word contiguous slice of B. Every
    // shingle of A is a shingle of B, so containment(A in B) == 1, while
    // Jaccard = 28/198 << 0.8 — the size-skewed duplication regime
    // dedup_containment exists for (the fixture's planted near-dups are
    // all similar-length, so this regime needs planting).
    val words = (1 to 200).map(i => s"w$i")
    val docs = Seq(
      (0L, words.mkString(" "), "en", "s", 0L),
      (1L, words.slice(50, 80).mkString(" "), "en", "s", 0L),
      (2L, (1 to 40).map(i => s"z$i").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = "target/tmp/containment_prop"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = SparkEntry.queries("dedup_containment")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val jac = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // A (doc 1) is fully contained in B (doc 0): contain_ba == 1.0
    assert(cont.length == 1, cont.mkString(", "))
    val (a, b, ab, ba) = cont.head
    assert((a, b, ba) == (0L, 1L, 1.0), cont.mkString(", "))
    assert(math.abs(ab - 28.0 / 198) < 1e-6, ab.toString)
    assert(!jac.contains((0L, 1L)), jac.mkString(", "))
  }

  test("MG heavy hitters == brute force on skewed data with a planted " +
      "hitter, and candidates prune") {
    // the regime the sketch exists for: one value at ~30%, a second at
    // ~10%, the rest spread thin over a 1000-value tail (the fixture
    // corpus is flat, so this is where the MG guarantee gets exercised)
    for (_ <- 1 to 5) {
      val k = rnd.nextInt(12) + 4 // 4..15 counters
      val n = 3000
      val values = List.fill(n) {
        val r = rnd.nextDouble()
        if (r < 0.30) "hot"
        else if (r < 0.40) "warm"
        else s"tail_${rnd.nextInt(1000)}"
      }
      val df = values.toDF("word").repartition(5)
      val got = graft.ops.TextOps.heavyHitters(df, k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val exact = values.groupBy(identity).view.mapValues(_.size.toLong)
      val expected = exact.filter(_._2 > n.toDouble / k).toMap
      assert(got == expected, s"k=$k got=$got expected=$expected")
      // the planted 30% hitter must clear any k >= 4 threshold
      assert(got.contains("hot"))
    }
  }

  test("union-all cardinality is additive; union-distinct is set union") {
    for (_ <- trials) {
      val a = List.fill(rnd.nextInt(40))(rnd.nextInt(21))
      val b = List.fill(rnd.nextInt(40))(rnd.nextInt(21))
      val da = a.toDF("v")
      val db = b.toDF("v")
      assert(da.unionAll(db).count() == a.size + b.size)
      assert(da.union(db).distinct().count() == (a.toSet ++ b.toSet).size)
    }
  }

  test("minhash signatures are order-insensitive (set semantics)") {
    for (_ <- trials) {
      val shingles = List.fill(rnd.nextInt(50) + 1)(
        rnd.alphanumeric.take(rnd.nextInt(8) + 1).mkString)
      val df = shingles.toDF("sh")
      val sig1 = df.agg(min(xxhash64(col("sh"), lit(0))),
        min(xxhash64(col("sh"), lit(1)))).collect()(0)
      val sig2 = df.orderBy(col("sh").desc).agg(
        min(xxhash64(col("sh"), lit(0))),
        min(xxhash64(col("sh"), lit(1)))).collect()(0)
      assert(sig1 == sig2)
    }
  }

  test("hash_tf_vec is additive and permutation-invariant on random tokens") {
    graft.functions.HashTfVec.register(spark)
    for (_ <- trials) {
      val toks = List.fill(rnd.nextInt(60) + 1)(
        rnd.alphanumeric.take(rnd.nextInt(10) + 1).mkString)
      val (a, b) = toks.splitAt(rnd.nextInt(toks.length))
      def vec(ts: Seq[String]): Seq[Double] =
        Seq(ts).toDF("toks").select(expr("hash_tf_vec(toks)"))
          .collect()(0).getSeq[Double](0)
      val whole = vec(toks)
      // additivity: vec(a ++ b) == vec(a) + vec(b) elementwise
      val parts = vec(a).zip(vec(b)).map { case (x, y) => x + y }
      assert(whole == parts)
      // permutation invariance: shuffled token order, same vector
      assert(vec(rnd.shuffle(toks)) == whole)
      // mass conservation: |v|_1 <= n tokens (equality iff no cancellation)
      assert(whole.map(math.abs).sum <= toks.length.toDouble)
    }
  }

  test("connected components converge on a 1000-node chain (diameter 999) " +
      "within the iteration cap") {
    // worst case for plain min-label propagation: one long path, so the
    // min label must travel the full diameter. Pointer doubling must bring
    // this under the 32-iteration converge-or-throw cap (plain propagation
    // would need 999 rounds and throw).
    val n = 1000L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val edges = chain
      .union(chain.select(col("doc_b"), col("doc_a")))
      .toDF("src", "dst")
      .cache()
    try {
      val labels = graft.ops.Dedup.connectedComponents(spark, edges)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(labels.length == n)
      assert(labels.forall(_._2 == 0L),
        s"non-min labels: ${labels.filter(_._2 != 0L).take(5).toSeq}")
    } finally edges.unpersist()
  }

  test("reliable checkpoint mode refuses to run without a checkpoint dir") {
    // declared BEFORE the end-to-end reliable test: setCheckpointDir has
    // no unset API, so this must run while the shared context is still
    // dir-less. The guard keeps it vacuously green if another suite set
    // one first.
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      spark.conf.set(graft.ops.Dedup.ReliableCheckpointKey, "true")
      try {
        import spark.implicits._
        val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
        val e = intercept[IllegalArgumentException] {
          graft.ops.Dedup.connectedComponents(spark, edges)
        }
        assert(e.getMessage.contains(graft.ops.Dedup.ReliableCheckpointKey))
      } finally spark.conf.set(graft.ops.Dedup.ReliableCheckpointKey, "false")
    }
  }

  test("connected components run end-to-end through the RELIABLE " +
      "checkpoint path (the cluster/preemption deployment mode)") {
    val ckDir = "/root/repo/target/tmp/reliable_ck"
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    sc.setCheckpointDir(ckDir)
    spark.conf.set(graft.ops.Dedup.ReliableCheckpointKey, "true")
    try {
      // two components incl. a chain — several rounds, each reliably
      // checkpointed; the answer must be identical to the local path
      val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      val df = pairs.toDF("doc_a", "doc_b")
      val edges = df.union(df.select(col("doc_b"), col("doc_a")))
        .toDF("src", "dst").cache()
      try {
        val got = graft.ops.Dedup.connectedComponents(spark, edges)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
          10L -> 10L, 11L -> 10L))
        // the gate actually engaged: reliable checkpoints leave RDD
        // checkpoint files under the configured dir
        val wrote = new java.io.File(ckDir).listFiles()
        assert(wrote != null && wrote.nonEmpty,
          "no checkpoint files written — the reliable path did not run")
      } finally edges.unpersist()
    } finally {
      spark.conf.set(graft.ops.Dedup.ReliableCheckpointKey, "false")
      prevDir.foreach(sc.setCheckpointDir)
    }
  }

  test("connected components match driver-side union-find on random graphs") {
    for (_ <- 1 to 5) {
      val n = rnd.nextInt(80) + 20
      val m = rnd.nextInt(2 * n) + 1
      val pairs = List.fill(m) {
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2).distinct
      if (pairs.nonEmpty) {
        // driver-side union-find ground truth
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        val expected = nodes.map(v =>
          v -> nodes.filter(u => find(u.toInt) == find(v.toInt)).min).toMap
        val df = pairs.toDF("doc_a", "doc_b")
        val edges = df.union(df.select(col("doc_b"), col("doc_a")))
          .toDF("src", "dst").cache()
        try {
          val got = graft.ops.Dedup.connectedComponents(spark, edges)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
          assert(got == expected)
        } finally edges.unpersist()
      }
    }
  }

  test("jaccard via minhash estimate is monotone-consistent at the extremes") {
    // identical sets => identical signatures; disjoint random sets almost
    // surely differ in at least one of 16 permutations
    val a = (1 to 40).map(i => s"tok$i")
    val da = a.toDF("sh")
    val sigs = (0 until 16).map(p => min(xxhash64(col("sh"), lit(p))))
    val s1 = da.agg(sigs.head, sigs.tail: _*).collect()(0).toSeq
    val s2 = da.agg(sigs.head, sigs.tail: _*).collect()(0).toSeq
    assert(s1 == s2)
    val db = (1 to 40).map(i => s"other$i").toDF("sh")
    val s3 = db.agg(sigs.head, sigs.tail: _*).collect()(0).toSeq
    assert(s1 != s3)
  }

  test("priority sampling is scale-invariant in the weights and favors " +
    "heavy rows") {
    // priority = w/u: multiplying every weight by a constant scales every
    // priority identically, so the drawn SET cannot change — the rank
    // statistic only sees ratios. (Guards the w*2^32 double-exactness
    // assumption too: a lossy product would break the invariance.)
    val dir = "target/tmp/priority_prop"
    for (t <- 1 to 3) {
      val docs = (0L until 200L).map { i =>
        (i, s"doc $i text", "en", "s", (rnd.nextInt(900) + 1).toLong * t)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val base = SparkEntry.queries("sample_priority")(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      docs.withColumn("n_chars", col("n_chars") * 7)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val scaled = SparkEntry.queries("sample_priority")(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(base == scaled, s"trial $t: weight scaling changed the sample")
    }
    // weight-proportionality, deterministically: give one doc ~all the
    // corpus weight mass and it must be drawn
    val skew = (0L until 200L).map { i =>
      (i, s"doc $i", "en", "s", if (i == 77L) 1000000L else 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    skew.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val drawn = SparkEntry.queries("sample_priority")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(drawn.contains(77L), "the dominant-weight doc was not drawn")
  }

  test("an exact duplicate doc scores zero n-gram novelty") {
    val dir = "target/tmp/novelty_prop"
    val words = (1 to 60).map(i => s"w${rnd.nextInt(500)}")
    val docs = Seq(
      (0L, words.mkString(" "), "en", "s", 60L),
      (1L, words.mkString(" "), "en", "s", 60L), // doc 0 verbatim
      (2L, (1 to 40).map(i => s"fresh$i").mkString(" "), "en", "s", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val nov = SparkEntry.queries("text_ngram_novelty")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nov(0L) == 1.0, s"first occurrence must be fully novel: $nov")
    assert(nov(1L) == 0.0, s"verbatim duplicate must score 0: $nov")
    assert(nov(2L) == 1.0, s"disjoint doc must be fully novel: $nov")
  }
}

package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Per-operator smoke + semantics on sf0.001. The DuckDB oracle (driver t2 /
  * tools/check.py) is the deep correctness gate for `oracleSql` keys; this
  * spec pins every query runnable end-to-end plus targeted assertions for
  * the non-SQL-expressible ops.
  */
class OperatorSpec extends SparkSpec {

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // Output-schema contract (r8 post-mortem): a DECIMAL wider than 20
      // digits in a FINAL projection is banned. graph_hits' decimal(38,0)
      // score was the registry's only such column and the one key the
      // external hash check disagreed on while the local replica matched —
      // wide decimals are where engines' value/hash representations
      // diverge. Keep them internal; ship string/double/narrow-decimal.
      val wide = df.schema.fields.collect {
        case f if f.dataType.isInstanceOf[
            org.apache.spark.sql.types.DecimalType] &&
          f.dataType.asInstanceOf[
            org.apache.spark.sql.types.DecimalType].precision > 20 =>
          s"${f.name}:${f.dataType.simpleString}"
      }
      assert(wide.isEmpty,
        s"output column(s) with decimal precision > 20: " +
          s"${wide.mkString(", ")} — cast to string/double in the final " +
          "projection (SURVEY §7.4)")
      assert(df.count() >= 0)
    }
  }

  test("entry flagship returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("approx_count_distinct lands within the published HLL++ bound") {
    // the query itself now carries the accuracy claim (within_bound); the
    // exact count doubles as the sanity anchor
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_parts"),
        r.getAs[Boolean]("within_bound")))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exact, ok) =>
      assert(exact > 0, flag)
      assert(ok, s"$flag: approx outside 15% of exact $exact")
    }
  }

  test("StatsSink commits exact per-partition stats across many writers") {
    import spark.implicits._
    val out = "/root/repo/target/tmp/stats_sink_spec/stats.json"
    val n = 1000L
    (0L until n).toDF("k").repartition(8)
      .write.format("graft.sources.StatsSink")
      .option("path", out).mode("append").save()
    val row = spark.read
      .schema("n_rows LONG, sum_key LONG, partitions LONG").json(out)
      .collect()(0)
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == n * (n - 1) / 2) // exact, no double-counting
    assert(row.getLong(2) == 8L) // one commit message per partition
  }

  test("schema_inference recovers the full CSV inference lattice") {
    val m = SparkEntry.queries("schema_inference")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map(
      "id_int" -> "int", "id_big" -> "bigint", "ratio" -> "double",
      "name" -> "string", "d" -> "date", "ts" -> "timestamp",
      "flag" -> "boolean"))
  }

  test("sim_pairs_lsh equals brute force over the same doc vectors") {
    val vecs = graft.ops.Similarity.docVectors(spark, sf)
    val b = vecs.select(col("doc_id").as("doc_b"), col("v").as("v2"))
    val exact = vecs.join(b, col("doc_id") < col("doc_b"))
      .withColumn("cos", expr("round(cosine_sim(v, v2), 6)"))
      .filter(col("cos") >= graft.ops.Similarity.DocCosineThreshold)
      .select("doc_id", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("sim_pairs_lsh")(spark, sf)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(exact.nonEmpty, "fixture must contain planted near-dup docs")
    assert(lsh.subsetOf(exact), s"false positives: ${lsh -- exact}")
    assert(lsh == exact, s"missed pairs: ${exact -- lsh}")
  }

  test("sim_pairs_lsh candidate set prunes the pair space hard") {
    import graft.ops.{Dedup, Similarity}
    val n = Dedup.shingled(spark, sf).filter(size(col("shingles")) > 0)
      .count()
    // the query's OWN candidate stage, not a re-implementation that could
    // drift from it
    val cands = Similarity.lshCandidates(spark, sf).count()
    val allPairs = n * (n - 1) / 2
    assert(cands.toDouble / allPairs < 0.01,
      s"candidates $cands of $allPairs pairs — banding isn't pruning")
  }

  test("sample_hash membership is independent of scan partitioning") {
    val base = SparkEntry.queries("sample_hash")(spark, sf)
      .collect().map(_.toSeq).toSeq
    // force a radically different file-split layout: membership and order
    // must not move, because the hash depends only on row content
    val conf = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "65536")
      val split = SparkEntry.queries("sample_hash")(spark, sf)
        .collect().map(_.toSeq).toSeq
      assert(split == base)
    } finally spark.conf.set(conf, old)
    assert(base.nonEmpty)
  }

  test("sample_reservoir draws exactly k, independent of partitioning") {
    val base = SparkEntry.queries("sample_reservoir")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(base.length == 100, s"expected exactly k=100, got ${base.length}")
    // same priority pipeline over a radically different partitioning: the
    // draw depends only on key content, so the k rows cannot move
    val split = Tables.t(spark, sf, "documents").repartition(17)
      .select(col("doc_id"), col("source"),
        md5(col("doc_id").cast("string")).as("priority"))
      .orderBy("priority", "doc_id").limit(100)
      .collect().map(_.toSeq).toSeq
    assert(split == base)
  }

  test("join_bloom probe prunes the fact side and matches the plain join") {
    graft.functions.BloomContains.register(spark)
    val dim = Tables.t(spark, sf, "supplier")
      .filter(col("s_nationkey") < 5).select("s_suppkey", "s_nationkey")
    val b64 = graft.functions.BloomContains.toB64(
      dim.stat.bloomFilter("s_suppkey", math.max(dim.count(), 1L), 0.001))
    val li = Tables.t(spark, sf, "lineitem")
    val total = li.count()
    val passed = li.filter(expr(s"bloom_contains(l_suppkey, '$b64')")).count()
    // the probe must drop most fact rows BEFORE the join (the dim keeps
    // ~5% of suppliers; fpp adds ~0.1%)
    assert(passed.toDouble / total < 0.25,
      s"bloom passed $passed of $total fact rows — not pruning")
    assert(passed > 0, "vacuous probe: nothing qualifies")
    val pruned = SparkEntry.queries("join_bloom")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = li.join(dim, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_lines"),
        Tables.moneySum(col("l_extendedprice")).as("revenue"))
      .orderBy("s_nationkey").collect().map(_.toSeq).toSeq
    assert(pruned == plain)
  }

  test("zonemap_skip reads a small fraction of the files and matches the " +
      "full scan") {
    val (_, zmap) = Lakehouse.ensureZoned(spark, sf)
    val lo = to_timestamp(lit("1995-06-01 00:00:00"))
    val hi = to_timestamp(lit("1995-09-01 00:00:00"))
    val zm = spark.read.parquet(zmap)
    val totalFiles = zm.count()
    val survivors = zm.filter(!(col("hi") < lo || col("lo") >= hi)).count()
    assert(survivors >= 1 && survivors <= totalFiles / 4,
      s"$survivors of $totalFiles files survive — zone map isn't skipping")
    val pruned = SparkEntry.queries("zonemap_skip")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val full = Tables.t(spark, sf, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        Tables.moneySum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    assert(pruned == full)
  }

  test("manifest_read plans from the JSON manifest: few files scanned, " +
      "answer equals the full-scan filter") {
    val lo = to_timestamp(lit("1995-01-01 00:00:00"))
    val hi = to_timestamp(lit("1995-07-01 00:00:00"))
    val df = SparkEntry.queries("manifest_read")(spark, sf)
    // the scan's file list must be the manifest's surviving sliver, not
    // the directory listing (a ~6-month slice of ~7 years ⇒ a small
    // fraction of the 16 range-clustered files)
    val scanned = df.inputFiles.count(_.contains("manifest_data_v1"))
    assert(scanned >= 1 && scanned <= Lakehouse.ManifestFiles / 2,
      s"$scanned of ${Lakehouse.ManifestFiles} files scanned")
    val pruned = df.collect().map(_.toSeq).toSeq
    val full = Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        Tables.moneySum(col("o_totalprice")).as("revenue"))
      .orderBy("o_orderstatus").collect().map(_.toSeq).toSeq
    assert(pruned == full)
  }

  test("text_heavy_hitters is non-vacuous on the corpus") {
    val hh = SparkEntry.queries("text_heavy_hitters")(spark, sf).collect()
    assert(hh.nonEmpty, "no word above n/64 — threshold vacuous at this sf")
  }

  test("join_range_auto (rewritten) equals the hand-binned range join") {
    val auto = SparkEntry.queries("join_range_auto")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val manual = SparkEntry.queries("join_range_binned")(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto.nonEmpty, "vacuous: no pairs within the range at this sf")
    assert(auto == manual,
      s"missing: ${manual -- auto} extra: ${auto -- manual}")
  }

  test("dedup_connected keepers are stable under different shuffle widths") {
    val base = SparkEntry.queries("dedup_connected")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val conf = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "13")
      val wide = SparkEntry.queries("dedup_connected")(spark, sf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(wide == base)
    } finally spark.conf.set(conf, old)
    // every keeper must itself be a node whose keeper is itself (a root):
    // labels converged, no dangling intermediate labels
    val m = base.toMap
    assert(base.nonEmpty)
    base.foreach { case (_, k) => assert(m(k) == k, s"non-root keeper $k") }
  }

  test("dedup_embedding's LSH pair source equals brute-force set cosine " +
      "and actually prunes") {
    // brute force, no LSH: every ordered doc pair, exact shingle-set cosine
    val sh = graft.ops.Dedup.shingled(spark, sf)
      .filter(size(col("shingles")) > 0)
    val n = sh.count()
    val b = sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    val exact = sh.join(b, col("doc_id") < col("doc_b"))
      .withColumn("c", size(array_intersect(col("shingles"), col("sh_b"))))
      .withColumn("cos", expr(
        "round(c / sqrt(CAST(size(shingles) AS DOUBLE) * size(sh_b)), 6)"))
      .filter(col("cos") >= graft.ops.Similarity.DocCosineThreshold)
      .select(col("doc_id"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cands = graft.ops.Dedup.candidateOverlaps(spark, sf).cache()
    try {
      val pruned = cands
        .withColumn("cos", expr(
          "round(c / sqrt(CAST(na AS DOUBLE) * nb), 6)"))
        .filter(col("cos") >= graft.ops.Similarity.DocCosineThreshold)
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pruned == exact, s"missed: ${exact -- pruned} " +
        s"false: ${pruned -- exact}")
      assert(exact.nonEmpty)
      // the operating point must PRUNE: candidates well under 1% of N^2/2
      // (the thing the old embedding-table tau=0.4 variant could not do)
      val ratio = cands.count().toDouble / (n.toDouble * (n - 1) / 2)
      assert(ratio < 0.01, s"candidate ratio $ratio")
    } finally cands.unpersist()
  }

  test("sim_topk_ivf reaches >= 70% recall of exact top-k on its queries") {
    val ivf = SparkEntry.queries("sim_topk_ivf")(spark, sf)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recompute exact top-k for the ivf query range [10, 20)
    val vecs = Tables.t(spark, sf, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    import org.apache.spark.sql.expressions.Window
    val q = vecs.filter(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    val exact = q.crossJoin(vecs).filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr(
        """aggregate(zip_with(qv, v, (x, y) -> x * y), CAST(0 AS DOUBLE),
          |  (acc, x) -> acc + x)
          |/ (sqrt(aggregate(qv, CAST(0 AS DOUBLE), (a, x) -> a + x * x))
          |   * sqrt(aggregate(v, CAST(0 AS DOUBLE), (a, x) -> a + x * x)))"""
          .stripMargin))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall $recall") // measured 0.78 at sf0.01/0.1
    assert(ivf.nonEmpty)
  }

  test("text_fingerprint is stable and within-doc deduplicated") {
    val fp = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fp.nonEmpty)
    assert(fp.distinct.length == fp.length) // array_distinct held
    val fp2 = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(fp.toSeq == fp2.toSeq) // deterministic across runs
  }

  test("multimodal_decode parses real RIFF/WAVE headers") {
    val rows = SparkEntry.queries("multimodal_decode")(spark, sf).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("audio_format") == 1) // PCM
      assert(r.getAs[Int]("n_channels") == (1 + id % 2).toInt)
      assert(r.getAs[Long]("sample_rate") == 8000L * (1 + id % 3))
      assert(r.getAs[Int]("block_align") ==
        r.getAs[Int]("n_channels") * 2)
      assert(r.getAs[Long]("byte_rate") ==
        r.getAs[Long]("sample_rate") * r.getAs[Int]("block_align"))
      // container size accounts for the junk LIST chunk on every 5th doc
      val junk = if (id % 5 == 0) 12 else 0
      assert(r.getAs[Long]("n_bytes") ==
        44 + r.getAs[Long]("data_bytes") + junk)
      assert(r.getAs[Long]("riff_size") == r.getAs[Long]("n_bytes") - 8)
    }
    // parser rejects corrupt containers instead of zeroing
    val wav = Multimodal.synthWav(7L, "hello world")
    val parsed = Multimodal.parseWav(7L, wav)
    assert(parsed.data_bytes == 11L * parsed.block_align)
    wav(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.parseWav(7L, wav))
  }

  test("dedup_simhash covers the minhash near-dup pairs") {
    val mh = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = SparkEntry.queries("dedup_simhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val covered = (mh & sh).size.toDouble / math.max(mh.size, 1)
    assert(covered >= 0.8, s"simhash covered $covered of minhash pairs")
  }

  test("dedup_ngram_jaccard equals dedup_minhash (LSH recall check)") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact, s"missed: ${exact -- lsh}, extra: ${lsh -- exact}")
  }

  test("dedup_minhash finds all planted near-duplicate pairs (J >= 0.9)") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, sf).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getAs[Double]("jac") >= 0.8))
  }

  test("join_asof: every matched click precedes its purchase") {
    val rows = SparkEntry.queries("join_asof")(spark, sf)
      .filter(col("last_click_ts").isNotNull).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getTimestamp(3).after(r.getTimestamp(2)))
    }
  }

  test("text_pii_scrub leaves no digits or emails in the clean column") {
    val rows = SparkEntry.queries("text_pii_scrub")(spark, sf)
      .select("clean").collect().map(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { s =>
      assert(!s.exists(_.isDigit), s"digits survived the scrub: $s")
      assert(!s.contains("@"), s"email survived the scrub: $s")
      assert(s.contains("<EMAIL>") && s.contains("<IP>"), s)
    }
  }

  test("zorder_cluster: z-ranged files bound custkey far tighter than " +
      "date-sort") {
    // the point of Z-ordering: range-partition by zval and EVERY partition
    // gets a tight bounding box in BOTH dimensions, so min/max skipping
    // prunes custkey predicates too — a date-sorted layout leaves the
    // custkey span of every file at ~the full domain
    val z = Lakehouse.zInputs(spark, sf)
      .withColumn("zval", expr(Lakehouse.mortonSpark))
    def avgCkSpan(sortCol: String): Double = {
      val spans = z.repartitionByRange(32, col(sortCol))
        .select(col("ck"), spark_partition_id().as("pid"))
        .groupBy("pid").agg((max("ck") - min("ck")).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length
    }
    val zSpan = avgCkSpan("zval")
    val dSpan = avgCkSpan("dy")
    assert(zSpan < 0.5 * dSpan,
      s"z-layout custkey span $zSpan not tighter than date-sort $dSpan")
  }

  test("win_topk_native equals the row_number window formulation") {
    val native = SparkEntry.queries("win_topk_native")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val window = SparkEntry.queries("win_topk_group")(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc,
        col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(native.sameElements(window),
      s"native=${native.take(3).mkString(",")} window=${window.take(3).mkString(",")}")
  }

  test("shard_balance conserves docs and lands within 10% of perfect") {
    val rows = SparkEntry.queries("shard_balance")(spark, sf).collect()
    assert(rows.length == TrainPrep.BalanceShards)
    assert(rows.map(_.getAs[Long]("shard")).toSet ==
      (0L until TrainPrep.BalanceShards).toSet)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val skew = r.getAs[Double]("skew")
      assert(skew > 0.9 && skew < 1.1,
        s"shard ${r.getAs[Long]("shard")} skew $skew") // measured [0.96, 1.02]
    }
  }

  test("curriculum_order fills all 4 phases, monotone within bucket") {
    val rows = SparkEntry.queries("curriculum_order")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("rn"),
        r.getAs[Long]("phase"), r.getAs[Double]("score")))
    assert(rows.map(_._3).toSet == Set(1L, 2L, 3L, 4L))
    rows.groupBy(_._1).values.foreach { b =>
      val byRank = b.sortBy(_._2)
      // rank follows the score order and phase never decreases with rank
      assert(byRank.map(_._4).sameElements(byRank.map(_._4).sorted))
      assert(byRank.map(_._3).sameElements(byRank.map(_._3).sorted))
    }
  }

  test("dedup_incremental covers the whole batch; verdicts match pairs") {
    val rows = SparkEntry.queries("dedup_incremental")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_dups"),
        r.getAs[Boolean]("is_dup")))
    val batch = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(rows.length == batch)
    rows.foreach { case (id, n, dup) => assert(dup == (n > 0), s"doc $id") }
    // every crossing LSH pair must surface as a flagged batch doc
    val crossing = SparkEntry.queries("dedup_minhash")(spark, sf)
      .collect().flatMap { r =>
        val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
        if (a % 5 == 0 && b % 5 != 0) Some(a)
        else if (b % 5 == 0 && a % 5 != 0) Some(b) else None
      }.toSet
    val flagged = rows.filter(_._3).map(_._1).toSet
    assert(crossing == flagged,
      s"verdicts drifted from the pair graph: " +
        s"${((crossing diff flagged) ++ (flagged diff crossing)).take(5)}")
  }

  test("sim_recall_eval mean recall >= 0.7 (the sim_topk_ivf pin)") {
    val rows = SparkEntry.queries("sim_recall_eval")(spark, sf).collect()
    assert(rows.length == 10)
    val mean = rows.map(_.getAs[Double]("recall")).sum / rows.length
    assert(mean >= 0.7, s"mean recall $mean") // measured 0.76
    rows.foreach(r => assert(r.getAs[Long]("n_exact") == Similarity.TopK))
  }

  test("text_vocab_coverage is monotone and saturates at 1.0") {
    val rows = SparkEntry.queries("text_vocab_coverage")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("vocab_size"), r.getAs[Long]("n_vocab_used"),
        r.getAs[Double]("coverage")))
    assert(rows.map(_._1).sameElements(Array(1L, 2L, 4L, 8L, 16L, 32L, 64L)))
    val cov = rows.map(_._3)
    assert(cov.sameElements(cov.sorted), "coverage must be nondecreasing")
    assert(cov.last == 1.0)
    // sizes past the true vocabulary report the real cutoff, not the ask
    assert(rows.last._2 == rows.map(_._2).max)
  }

  test("tokenizer_bpe_pairs ranks by weighted count, pairs are 2 chars") {
    val rows = SparkEntry.queries("tokenizer_bpe_pairs")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[String]("pair"),
        r.getAs[Long]("n_occ")))
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_._2.length == 2))
    assert(rows.map(-_._3).sameElements(rows.map(-_._3).sorted),
      "n_occ must be nonincreasing in rank")
  }

  test("graph_clustering_coeff stays in [0,1]; deg-1 nodes score 0") {
    val rows = SparkEntry.queries("graph_clustering_coeff")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
        r.getAs[Double]("clustering")))
    assert(rows.nonEmpty)
    rows.foreach { case (deg, tri, c) =>
      assert(c >= 0.0 && c <= 1.0, s"deg=$deg tri=$tri c=$c")
      if (deg < 2) assert(c == 0.0 && tri == 0)
    }
  }

  test("cdc_apply honors deletes, re-inserts, and last-writer-wins") {
    val rows = SparkEntry.queries("cdc_apply")(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("o_orderstatus"))
      .toMap
    val keys = Tables.t(spark, sf, "orders").select("o_orderkey")
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      if (k % 20 == 0) assert(rows.get(k).contains("R"), s"key $k")
      else if (k % 10 == 0) assert(!rows.contains(k), s"key $k not deleted")
      else if (k % 5 == 0) assert(rows.get(k).contains("U"), s"key $k")
      else assert(rows.contains(k), s"base key $k lost")
    }
  }

  test("incremental_agg_merge: merged state always matches full recompute") {
    val rows = SparkEntry.queries("incremental_agg_merge")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("matches_full"),
      s"merge drifted from recompute at custkey ${r.getAs[Long]("o_custkey")}"))
  }

  test("graph_kcore_peel removes low-degree nodes but keeps a core") {
    val core = SparkEntry.queries("graph_kcore_peel")(spark, sf).collect()
    val all = graft.ops.Graph.edges(spark, sf)
      .select("src").distinct().count()
    assert(core.nonEmpty && core.length < all,
      s"peel must strictly shrink the graph: ${core.length} of $all")
    // suppliers are the high-degree side of the bipartite trade graph —
    // the peel should never remove all of them
    assert(core.exists(_.getAs[String]("kind") == "supplier"))
  }

  test("graph_bfs_layers: seeds at 0, bipartite parity of layers") {
    val rows = SparkEntry.queries("graph_bfs_layers")(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[String]("kind"),
        r.getAs[Long]("dist")))
    assert(rows.nonEmpty)
    rows.foreach { case (node, kind, dist) =>
      assert(dist >= 0 && dist <= graft.ops.Graph.BfsRounds)
      if (dist == 0)
        assert(kind == "customer" && node % 100 == 0, s"bad seed $node")
      // trade graph is bipartite: odd hops land on suppliers, even on
      // customers
      assert((dist % 2 == 1) == (kind == "supplier"), s"$node at $dist")
    }
  }

  test("events_growth_accounting reconciles the MAU identity") {
    val acc = SparkEntry.queries("events_growth_accounting")(spark, sf)
      .collect()
      .map(r => (r.getAs[java.sql.Date]("wk").toString,
        r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
      .sortBy(_._1)
    val active = Tables.events(spark, sf)
      .select(col("user_id"), to_date(date_trunc("week", col("ts")))
        .as("wk")).distinct()
      .groupBy("wk").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("wk").toString
        -> r.getAs[Long]("n")).toMap
    var prev = 0L
    acc.foreach { case (wk, nw, ret, res, ch) =>
      val a = active.getOrElse(wk, 0L)
      assert(a == prev + nw + res - ch,
        s"week $wk: $a != $prev + $nw + $res - $ch")
      assert(ret <= prev)
      prev = a
    }
  }

  test("events_streaks: streak bounds and totals") {
    val rows = SparkEntry.queries("events_streaks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (st, days) = (r.getAs[Long]("longest_streak"),
        r.getAs[Long]("n_active_days"))
      assert(st >= 1 && st <= days)
    }
  }

  test("agg_countmin never underestimates (the CMS guarantee)") {
    val rows = SparkEntry.queries("agg_countmin")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact"))
      assert(r.getAs[Long]("overestimate") >= 0)
    }
  }

  test("sim_mmr_rerank picks are distinct, rank-1 is the top candidate") {
    val rows = SparkEntry.queries("sim_mmr_rerank")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("rel")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 4)
    byQ.foreach { case (q, picks) =>
      assert(picks.length == 4, s"query $q")
      assert(picks.map(_._3).distinct.length == 4, s"dup pick in query $q")
      val first = picks.find(_._2 == 1L).get
      assert(first._4 == picks.map(_._4).max,
        s"rank-1 of query $q is not the max-relevance pick")
    }
  }

  test("text_heaps_fit: vocab curve is monotone, beta in (0, 1]") {
    val rows = SparkEntry.queries("text_heaps_fit")(spark, sf).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("vocab"), r.getAs[Double]("beta")))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val vs = rows.map(_._3)
    assert(vs.sameElements(vs.sorted), "vocab must be nondecreasing")
    val ts = rows.map(_._2)
    assert(ts.sameElements(ts.sorted), "token counts must be nondecreasing")
    // sublinear growth: beta in [0, 1] — the fixture's flat ~31-word
    // vocabulary saturates by the first checkpoint, so the slope can be
    // exactly 0 at sf0.001 (vocab constant while tokens grow)
    assert(rows.head._4 >= 0.0 && rows.head._4 <= 1.0,
      s"beta ${rows.head._4}")
  }

  test("stream_cdc_apply micro-batched state equals one-shot cdc_apply") {
    val streamed = SparkEntry.queries("stream_cdc_apply")(spark, sf)
      .collect().map(_.toSeq).toSet
    val oneShot = SparkEntry.queries("cdc_apply")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(streamed == oneShot,
      s"state drifted: ${(streamed diff oneShot).take(3)} / " +
        s"${(oneShot diff streamed).take(3)}")
  }

  test("events_interarrival: gap count conservation, cv non-negative") {
    val rows = SparkEntry.queries("events_interarrival")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val totalGaps = rows.map(_.getAs[Long]("n_gaps")).sum
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf).select("user_id")
      .distinct().count()
    assert(totalGaps == nEvents - nUsers,
      s"$totalGaps gaps from $nEvents events / $nUsers users")
    rows.foreach { r =>
      assert(r.getAs[Double]("cv") >= 0.0)
      assert(r.getAs[Long]("min_gap_us") <= r.getAs[Long]("max_gap_us"))
    }
  }

  test("events_velocity: every flagged cell clears both thresholds") {
    SparkEntry.queries("events_velocity")(spark, sf).collect().foreach {
      r =>
        assert(r.getAs[Long]("n") >= 3)
        assert(r.getAs[Double]("spike_factor") >= 2.5)
    }
  }

  test("partition_skew_audit: skew >= 1, bytes reconcile to row count") {
    val rows = SparkEntry.queries("partition_skew_audit")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("skew") >= 1.0)
      assert(r.getAs[Long]("min_file_bytes") <= r.getAs[Long]("max_file_bytes"))
    }
    val total = rows.map(_.getAs[Long]("total_bytes")).sum
    assert(total == Tables.t(spark, sf, "orders").count() * 120L)
  }

  test("constraint_check: every constraint passes on the clean fixture") {
    val rows = SparkEntry.queries("constraint_check")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"${r.getAs[String]("constraint_name")}: " +
          s"${r.getAs[Long]("n_violations")} violations")
      assert(r.getAs[Long]("n_checked") > 0)
    }
  }

  test("graph_degree_assortativity: bipartite hub graph is disassortative") {
    val rows = SparkEntry.queries("graph_degree_assortativity")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head.getAs[Double]("assortativity")
    assert(r >= -1.0 && r < 0.0,
      s"customer-supplier edges pair low with high degree, expected r < 0, got $r")
  }

  test("events_stickiness: DAU <= WAU, ratio in (0, 1]") {
    val rows = SparkEntry.queries("events_stickiness")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0)
    }
  }

  test("win_rolling_slope: one row per event, no slope before 2 points") {
    val rows = SparkEntry.queries("win_rolling_slope")(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    rows.foreach { r =>
      if (r.getAs[Long]("rn") == 1L) assert(r.isNullAt(r.fieldIndex("slope5")))
      else assert(!r.isNullAt(r.fieldIndex("slope5")))
    }
  }

  test("bloom_index_prune: no false negatives, and the index prunes") {
    val rows = SparkEntry.queries("bloom_index_prune")(spark, sf).collect()
    assert(rows.nonEmpty)
    // ground truth: which files actually contain a probe key
    val truth = Tables.t(spark, sf, "orders")
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("part"),
        pmod(col("o_orderkey"), lit(20)).cast("long").as("file_id"),
        (col("o_orderkey") % 97 === 0).as("hit"))
      .groupBy("part", "file_id")
      .agg(max(col("hit")).as("has_probe"))
      .collect()
      .map(r => (r.getAs[java.sql.Date]("part").toString,
        r.getAs[Long]("file_id")) -> r.getAs[Boolean]("has_probe"))
      .toMap
    var scanned = 0
    rows.foreach { r =>
      val key = (r.getAs[java.sql.Date]("part").toString,
        r.getAs[Long]("file_id"))
      val would = r.getAs[Boolean]("would_scan")
      if (truth(key)) assert(would, s"false negative at $key")
      if (would) scanned += 1
    }
    assert(scanned < rows.length,
      s"bloom index pruned nothing: $scanned of ${rows.length} files scan")
  }

  test("basket_rules: metrics well-formed, support floor respected") {
    val rows = SparkEntry.queries("basket_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_n") >= 5)
      val c = r.getAs[Double]("confidence")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
    }
  }

  test("win_ewma stays inside the running value envelope") {
    val rows = SparkEntry.queries("win_ewma")(spark, sf).collect()
    assert(rows.length == Tables.events(spark, sf).count())
    val vals = rows.map(_.getAs[Double]("value"))
    val (lo, hi) = (vals.min, vals.max)
    rows.foreach { r =>
      val e = r.getAs[Double]("ewma")
      assert(e >= lo - 1e-6 && e <= hi + 1e-6, s"ewma $e outside [$lo, $hi]")
    }
  }

  test("text_template_mining masks rare slots and groups duplicates") {
    val rows = SparkEntry.queries("text_template_mining")(spark, sf)
      .collect()
    assert(rows.nonEmpty, "no templates with n_docs >= 2 — threshold broke")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2)
      assert(r.getAs[Long]("n_chunks") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("template").split(" ").length == 8)
    }
    assert(rows.exists(_.getAs[String]("template").contains("<*>")),
      "no template has a masked slot — the top-10 keep mask is dead")
  }

  test("orders_backlog: nonnegative, reconciles to the totals") {
    val rows = SparkEntry.queries("orders_backlog")(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("month").toString,
        r.getAs[Long]("n_opened"), r.getAs[Long]("n_closed"),
        r.getAs[Long]("backlog"))).sortBy(_._1)
    assert(rows.nonEmpty)
    // an order can only close at-or-after its open month, so the running
    // balance can never dip negative
    rows.foreach { case (m, _, _, b) => assert(b >= 0, s"month $m: $b") }
    assert(rows.last._4 ==
      rows.map(_._2).sum - rows.map(_._3).sum)
  }

  test("trend_revenue_monthly: growth defined exactly past the lag horizon") {
    val rows = SparkEntry.queries("trend_revenue_monthly")(spark, sf)
      .collect()
    assert(rows.length >= 13, "needs more than a year of months")
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("revenue") > 0.0)
      assert(r.isNullAt(r.fieldIndex("mom_growth")) == (i == 0))
      assert(r.isNullAt(r.fieldIndex("yoy_growth")) == (i < 12))
    }
  }

  test("multimodal_quality_gate rules split the corpus, keep == conj") {
    val rows = SparkEntry.queries("multimodal_quality_gate")(spark, sf)
      .collect()
    assert(rows.length == Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rule_consistent"),
        s"container consistency failed at doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("keep") ==
        (r.getAs[Boolean]("rule_duration") && r.getAs[Boolean]("rule_rate")
          && r.getAs[Boolean]("rule_consistent")))
    }
    val kept = rows.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < rows.length,
      s"gate must split the corpus: $kept of ${rows.length}")
  }

  test("text_lang_confusion shares sum to 1 per actual, counts conserve") {
    val rows = SparkEntry.queries("text_lang_confusion")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("actual"), r.getAs[Long]("n_docs"),
        r.getAs[Double]("share")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (a, cells) =>
      val s = cells.map(_._3).sum
      assert(math.abs(s - 1.0) < 1e-4, s"actual $a shares sum to $s")
    }
    assert(rows.map(_._2).sum ==
      Tables.t(spark, sf, "documents").count())
  }

  test("seq_len_histogram: power-of-two buckets, doc counts conserve") {
    val rows = SparkEntry.queries("seq_len_histogram")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert((b & (b - 1)) == 0, s"bucket $b is not a power of two")
    }
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables.t(spark, sf, "documents").count())
  }

  test("corpus_gini stays in [0, 1)") {
    val r = SparkEntry.queries("corpus_gini")(spark, sf).collect().head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0, s"gini $g")
    assert(r.getAs[Long]("n_sources") == 20)
  }

  test("join_temporal_dim: one row per purchase, never a future segment") {
    val rows = SparkEntry.queries("join_temporal_dim")(spark, sf).collect()
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.length == nPurch)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dim_version")),
        s"purchase ${r.getAs[Long]("event_id")} got no segment")
      assert(!r.getAs[java.sql.Timestamp]("dim_valid_from")
        .after(r.getAs[java.sql.Timestamp]("ts")),
        s"future segment served at ${r.getAs[Long]("event_id")}")
    }
  }

  test("dedup_cluster_stats reconciles with the component labels") {
    val stats = SparkEntry.queries("dedup_cluster_stats")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("cluster_size"), r.getAs[Long]("n_clusters"),
        r.getAs[Long]("n_docs_removable")))
    assert(stats.nonEmpty)
    stats.foreach { case (sz, n, rem) =>
      assert(sz >= 2, "a labeled component has at least one edge")
      assert(rem == n * (sz - 1))
    }
    val labels = SparkEntry.queries("dedup_connected")(spark, sf).collect()
    val nDocs = labels.length.toLong
    val nClusters = labels.map(_.getAs[Long]("keeper")).distinct.length
    assert(stats.map(t => t._1 * t._2).sum == nDocs)
    assert(stats.map(_._2).sum == nClusters)
    assert(stats.map(_._3).sum == nDocs - nClusters)
  }

  test("cohort_ltv curves start at offset 0 and never decrease") {
    val rows = SparkEntry.queries("cohort_ltv")(spark, sf).collect()
      .map(r => (r.getAs[Int]("cohort_year"), r.getAs[Long]("year_offset"),
        r.getAs[Double]("ltv_per_customer")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cy, cells) =>
      val sorted = cells.sortBy(_._2)
      assert(sorted.head._2 == 0L, s"cohort $cy has no offset-0 cell")
      val ltv = sorted.map(_._3)
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a },
        s"cohort $cy LTV decreased: ${ltv.mkString(", ")}")
    }
  }

  test("supplier_hhi sits in the (1/n, 1] concentration band") {
    val rows = SparkEntry.queries("supplier_hhi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))
      assert(h <= 1.0 + 1e-9)
      assert(h >= 1.0 / n - 1e-6,
        s"${r.getAs[String]("p_type")}: hhi $h below the 1/$n floor")
    }
  }

  test("events_first_touch precedes last-touch on every purchase") {
    val first = SparkEntry.queries("events_first_touch")(spark, sf)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("touch_id")),
          r.getAs[java.lang.Long]("age_us"))).toMap
    val last = SparkEntry.queries("events_attribution")(spark, sf)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Long]("touch_id")),
          r.getAs[java.lang.Long]("gap_us"))).toMap
    assert(first.keySet == last.keySet)
    first.foreach { case (id, (ft, age)) =>
      val (lt, gap) = last(id)
      assert(ft.isDefined == lt.isDefined, s"purchase $id")
      if (ft.isDefined)
        assert(age >= gap, s"purchase $id: first-touch age $age < " +
          s"last-touch gap $gap")
    }
  }

  test("win_rolling_median stays inside the value envelope") {
    val rows = SparkEntry.queries("win_rolling_median")(spark, sf)
      .collect()
    assert(rows.length == Tables.events(spark, sf).count())
    val vals = rows.map(_.getAs[Double]("value"))
    val (lo, hi) = (vals.min, vals.max)
    var defined = 0
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("median5"))) {
        defined += 1
        val m = r.getAs[Double]("median5")
        assert(m >= lo && m <= hi)
      }
    }
    assert(defined > 0)
  }

  test("agg_weighted_avg lands inside the discount range") {
    SparkEntry.queries("agg_weighted_avg")(spark, sf).collect().foreach {
      r =>
        val wa = r.getAs[Double]("weighted_avg_discount")
        assert(wa >= 0.0 && wa <= 0.1 + 1e-9,
          s"${r.getAs[String]("l_returnflag")}: $wa outside fixture range")
    }
  }

  test("orders_size_dist shares sum to 1 and orders conserve") {
    val rows = SparkEntry.queries("orders_size_dist")(spark, sf).collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
    assert(rows.map(_.getAs[Long]("n_orders_at")).sum ==
      Tables.t(spark, sf, "lineitem").select("l_orderkey")
        .distinct().count())
  }

  test("text_hapax_stats ratios are consistent with the vocab") {
    val r = SparkEntry.queries("text_hapax_stats")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_vocab") > 0)
    assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_vocab"))
    val hr = r.getAs[Double]("hapax_ratio")
    assert(hr >= 0.0 && hr <= 1.0)
    val ttr = r.getAs[Double]("corpus_ttr")
    assert(ttr > 0.0 && ttr <= 1.0)
  }

  test("inventory_abc_class partitions all parts and shares sum to 1") {
    val rows = SparkEntry.queries("inventory_abc_class")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("cls")).toSet.subsetOf(Set("A", "B", "C")))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    assert(rows.map(_.getAs[Long]("n_parts")).sum ==
      Tables.t(spark, sf, "lineitem").select("l_partkey").distinct().count())
    // A-class heads must out-earn the C tail per part by construction
    val byCls = rows.map(r => r.getAs[String]("cls") ->
      (r.getAs[Double]("revenue") / r.getAs[Long]("n_parts"))).toMap
    assert(byCls("A") > byCls("C"))
  }

  test("ship_delay_stats covers every line with ordered quantiles") {
    val rows = SparkEntry.queries("ship_delay_stats")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_lines")).sum ==
      Tables.t(spark, sf, "lineitem").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_delay") <= r.getAs[Double]("p90_delay"))
      assert(r.getAs[Double]("p90_delay") <= r.getAs[Long]("max_delay"))
    }
  }

  test("orders_repeat_intervals conserves gaps and shares") {
    val rows = SparkEntry.queries("orders_repeat_intervals")(spark, sf)
      .collect()
    val orders = Tables.t(spark, sf, "orders")
    val expected = orders.count() -
      orders.select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum == expected)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("price_index_monthly anchors the base month at 1.0") {
    val rows = SparkEntry.queries("price_index_monthly")(spark, sf)
      .orderBy("month").collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.head.getAs[Double]("price_index") - 1.0) < 1e-9)
    rows.foreach(r => assert(r.getAs[Double]("price_index") > 0.0))
  }

  test("events_calendar_profile grid is bounded and conserves volume") {
    val rows = SparkEntry.queries("events_calendar_profile")(spark, sf)
      .collect()
    assert(rows.length <= 168)
    rows.foreach { r =>
      val dow = r.getAs[Int]("dow"); val hr = r.getAs[Int]("hr")
      assert(dow >= 0 && dow <= 6 && hr >= 0 && hr <= 23)
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count())
  }

  test("text_pmi_collocations ranks at most 50 frequent pairs") {
    val rows = SparkEntry.queries("text_pmi_collocations")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach(r => assert(r.getAs[Long]("c12") >= 5))
    val pmis = rows.map(_.getAs[Double]("pmi"))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b })
  }

  test("dedup_editdist_blocked emits ordered in-budget pairs") {
    val rows = SparkEntry.queries("dedup_editdist_blocked")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("head_dist") <= 12)
    }
  }

  test("embedding_outlier_dist flags a strict, non-empty minority") {
    val rows = SparkEntry.queries("embedding_outlier_dist")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("z") > 2.0))
    assert(rows.length <
      Tables.t(spark, sf, "embeddings").count() / 10)
  }

  test("events_anomaly_seasonal ranks 20 cells by descending z") {
    val rows = SparkEntry.queries("events_anomaly_seasonal")(spark, sf)
      .collect()
    assert(rows.length == 20)
    val zs = rows.map(_.getAs[Double]("z"))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b })
    assert(zs.head > 0)
  }

  test("customer_segment_migration row shares sum to 1 per origin") {
    val rows = SparkEntry.queries("customer_segment_migration")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("seg_from")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("row_share")).sum - 1.0)
        < 1e-4)
    }
  }

  test("dedup_threshold_sweep counts are monotone in the threshold") {
    val rows = SparkEntry.queries("dedup_threshold_sweep")(spark, sf)
      .orderBy("thr").collect()
    assert(rows.nonEmpty)
    val np = rows.map(_.getAs[Long]("n_pairs"))
    val nd = rows.map(_.getAs[Long]("n_docs"))
    assert(np.zip(np.tail).forall { case (a, b) => a >= b })
    assert(nd.zip(nd.tail).forall { case (a, b) => a >= b })
  }

  test("sample_balanced_class equalizes every language") {
    val rows = SparkEntry.queries("sample_balanced_class")(spark, sf)
      .collect()
    val byLang = rows.groupBy(_.getAs[String]("lang")).map(_._2.length)
    assert(byLang.toSet.size == 1)
    val langs = Tables.t(spark, sf, "documents")
      .select("lang").distinct().count()
    assert(byLang.size.toLong == langs)
  }

  test("text_source_divergence is non-negative and per-source") {
    val rows = SparkEntry.queries("text_source_divergence")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("jsd") >= 0.0)
      // JSD is bounded by ln(2)
      assert(r.getAs[Double]("jsd") <= 0.6932)
      assert(r.getAs[Long]("n_tokens") > 0)
    }
  }

  test("part_substitutes pairs are cross-brand within the price band") {
    val rows = SparkEntry.queries("part_substitutes")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pk_a") < r.getAs[Long]("pk_b"))
      val (pa, pb) = (r.getAs[Double]("price_a"), r.getAs[Double]("price_b"))
      assert(math.abs(pa - pb) <= 0.002 * math.max(pa, pb) + 1e-9)
    }
  }

  test("events_concurrent_peak is positive and bounded by daily actives") {
    val rows = SparkEntry.queries("events_concurrent_peak")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val dailyActives = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("actives"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString
        -> r.getAs[Long]("actives")).toMap
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_concurrent")
      assert(peak >= 1)
      assert(peak <= dailyActives(r.getAs[java.sql.Date]("day").toString))
    }
  }

  test("events_user_gini sits in [0, 1)") {
    val r = SparkEntry.queries("events_user_gini")(spark, sf)
      .collect().head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    assert(r.getAs[Long]("n_users") > 0)
  }

  test("events_forecast_baseline scores every type with finite errors") {
    val rows = SparkEntry.queries("events_forecast_baseline")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cells") > 0)
      assert(r.getAs[Double]("mape") >= 0.0)
      assert(!r.getAs[Double]("mape").isNaN)
    }
  }

  test("graph_component_density densities are in (0, 1]") {
    val rows = SparkEntry.queries("graph_component_density")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_nodes"); val e = r.getAs[Long]("n_edges")
      assert(n >= 2)
      assert(e >= n - 1) // connected
      assert(e <= n * (n - 1) / 2) // simple graph
      val dN = r.getAs[Double]("density")
      assert(dN > 0.0 && dN <= 1.0)
    }
  }

  test("dedup_substring flags the near-dup region, not the background") {
    val flagged = SparkEntry.queries("dedup_substring")(spark, sf)
      .filter(col("flag_dup")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val pairDocs = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
      .collect().map(_.getLong(0)).toSet
    val n = Tables.t(spark, sf, "documents").count()
    assert(flagged.nonEmpty && flagged.size < n,
      s"flag_dup must split the corpus: ${flagged.size} of $n")
    assert(pairDocs.subsetOf(flagged),
      s"near-dup docs not flagged: ${(pairDocs -- flagged).take(5)}")
  }

  test("events_power_pareto shares are ordered and pareto_k is sane") {
    val r = SparkEntry.queries("events_power_pareto")(spark, sf)
      .collect().head
    val (t1, t10) = (r.getAs[Double]("top1pct_share"),
      r.getAs[Double]("top10pct_share"))
    assert(t1 > 0.0 && t1 <= t10 && t10 <= 1.0)
    // top 10% of users must carry at least 10% of events (sorted desc)
    assert(t10 >= 0.1 - 1e-9)
    val k = r.getAs[Long]("pareto_k")
    assert(k >= 1 && k <= r.getAs[Long]("n_users"))
  }

  test("discount_uplift baseline level has uplift exactly 1") {
    val rows = SparkEntry.queries("discount_uplift")(spark, sf).collect()
    assert(rows.nonEmpty)
    val zero = rows.find(_.getAs[Int]("disc_pct") == 0)
    assert(zero.isDefined, "no zero-discount baseline level in fixtures")
    assert(zero.get.getAs[Double]("qty_uplift") == 1.0)
    rows.foreach(r => assert(r.getAs[Double]("avg_qty") > 0.0))
  }

  test("nation_trade_balance balances sum to ~zero corpus-wide") {
    val rows = SparkEntry.queries("nation_trade_balance")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // every discounted lineitem dollar is exported by exactly one nation
    // and imported by exactly one, so the global net must cancel
    val net = rows.map(_.getAs[Double]("balance")).sum
    val gross = rows.map(_.getAs[Double]("exports")).sum
    assert(math.abs(net) < 1e-4 * gross + 0.01, s"net $net vs gross $gross")
  }

  test("win_rolling_corr values are valid correlations") {
    val rows = SparkEntry.queries("win_rolling_corr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr10"))) {
        val c = r.getAs[Double]("corr10")
        assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"corr $c")
      }
    }
  }

  test("text_doc_perplexity ranks docs by descending surprise") {
    val rows = SparkEntry.queries("text_doc_perplexity")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val nlls = rows.map(_.getAs[Double]("avg_nll"))
    assert(nlls.forall(_ > 0.0))
    assert(nlls.zip(nlls.tail).forall { case (a, b) => a >= b },
      "avg_nll not descending")
  }

  test("embedding_sign_lsh codes partition the corpus into 16-bit buckets") {
    val rows = SparkEntry.queries("embedding_sign_lsh")(spark, sf).collect()
    assert(rows.nonEmpty)
    var total = 0L
    rows.foreach { r =>
      val code = r.getAs[Long]("code"); val n = r.getAs[Long]("n_vecs")
      assert(code >= 0 && code < 65536, s"code $code outside 16 bits")
      assert(n >= 1)
      assert(r.getAs[Long]("pairs") == n * (n - 1) / 2)
      total += n
    }
    val nVecs = Tables.t(spark, sf, "embeddings").count()
    assert(total <= nVecs)
  }

  test("user_feature_matrix features are internally consistent") {
    val rows = SparkEntry.queries("user_feature_matrix")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("active_days"))
      assert(r.getAs[Long]("active_days") >= 1)
      assert(r.getAs[Long]("recency_days") >= 0)
      assert(r.getAs[Long]("tenure_days") >= 0)
      assert(r.getAs[Double]("events_per_active_day") >= 1.0)
    }
  }

  test("join_asof_forward matches are at-or-after the purchase") {
    val rows = SparkEntry.queries("join_asof_forward")(spark, sf).collect()
    assert(rows.nonEmpty)
    val matched = rows.filter(!_.isNullAt(3))
    assert(matched.nonEmpty, "no forward click matches at all")
    matched.foreach { r =>
      assert(!r.getAs[java.sql.Timestamp]("next_click_ts")
        .before(r.getAs[java.sql.Timestamp]("ts")))
    }
  }

  test("agg_bitmap_distinct bitmap counts equal countDistinct everywhere") {
    val rows = SparkEntry.queries("agg_bitmap_distinct")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("bitmap_exact"),
        s"${r.getAs[String]("event_type")}: bitmap " +
          s"${r.getAs[Long]("n_distinct_bitmap")} != exact " +
          s"${r.getAs[Long]("n_distinct_exact")}")
      assert(r.getAs[Long]("n_words") <= r.getAs[Long]("n_distinct_exact"))
    }
  }

  test("events_conversion_latency percentiles are ordered") {
    val rows = SparkEntry.queries("events_conversion_latency")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90) = (r.getAs[Double]("p50_s"), r.getAs[Double]("p90_s"))
      assert(p50 >= 0.0 && p50 <= p90)
      assert(r.getAs[Double]("mean_s") >= 0.0)
      val h = r.getAs[Int]("purchase_hour")
      assert(h >= 0 && h <= 23)
    }
  }

  test("events_coverage_spans never exceeds naive session-sum time") {
    val spans = SparkEntry.queries("events_coverage_spans")(spark, sf)
      .collect()
    assert(spans.nonEmpty)
    val nEvents = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    spans.foreach { r =>
      val covered = r.getAs[Long]("covered_s")
      val n = nEvents(r.getAs[Long]("user_id"))
      // each event contributes at most its full 1800 s interval
      assert(covered >= 1800 && covered <= n * 1800L)
      assert(r.getAs[Long]("max_span_s") <= covered)
      assert(r.getAs[Long]("n_spans") <= n)
    }
  }

  test("supplier_delay_rank is ascending with the volume floor applied") {
    val rows = SparkEntry.queries("supplier_delay_rank")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val delays = rows.map(_.getAs[Double]("avg_delay_days"))
    assert(delays.zip(delays.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getAs[Long]("n_lines") >= 20))
  }

  test("tokenizer_bpe_merge retires the merged pair from the pair table") {
    val topBefore = SparkEntry.queries("tokenizer_bpe_pairs")(spark, sf)
      .collect().head.getAs[String]("pair")
    val after = SparkEntry.queries("tokenizer_bpe_merge")(spark, sf)
      .collect()
    assert(after.nonEmpty && after.length <= 20)
    val retired = topBefore.substring(0, 1) + " " + topBefore.substring(1)
    after.foreach { r =>
      assert(r.getAs[String]("pair") != retired,
        s"merged pair '$retired' still counted post-merge")
      assert(r.getAs[Long]("n_occ") > 0)
    }
    // the merged symbol must now participate in at least one new pair
    assert(after.exists(_.getAs[String]("pair").split(" ")
      .contains(topBefore)),
      s"merged symbol '$topBefore' absent from all post-merge pairs")
  }

  test("events_ab_did grid is consistent with its DiD estimate") {
    val r = SparkEntry.queries("events_ab_did")(spark, sf).collect().head
    Seq("n_a_pre", "n_a_post", "n_b_pre", "n_b_post")
      .foreach(c => assert(r.getAs[Long](c) > 0, s"$c empty cell"))
    val did = (r.getAs[Double]("rate_b_post") - r.getAs[Double]("rate_b_pre")) -
      (r.getAs[Double]("rate_a_post") - r.getAs[Double]("rate_a_pre"))
    assert(math.abs(did - r.getAs[Double]("did")) < 1e-5)
  }

  test("graph_modularity is a valid Newman score") {
    val r = SparkEntry.queries("graph_modularity")(spark, sf)
      .collect().head
    val q = r.getAs[Double]("modularity")
    // Newman bounds: -0.5 <= Q < 1
    assert(q >= -0.5 && q < 1.0, s"Q=$q")
    assert(r.getAs[Long]("n_communities") >= 1)
    assert(r.getAs[Long]("m_edges") > 0)
  }

  test("agg_kmv_intersect estimates bracket the exact counts sanely") {
    val r = SparkEntry.queries("agg_kmv_intersect")(spark, sf)
      .collect().head
    val (na, nb) = (r.getAs[Long]("n_a_exact"), r.getAs[Long]("n_b_exact"))
    val nc = r.getAs[Long]("n_common_exact")
    assert(na > 0 && nb > 0)
    assert(nc <= math.min(na, nb))
    // KMV with K=8 is coarse; assert the estimates are positive and
    // within an order of magnitude (exactness is the oracle's job)
    Seq("est_a" -> na, "est_b" -> nb).foreach { case (c, exact) =>
      val est = r.getAs[Double](c)
      assert(est > 0 && est < exact * 10.0 + 10, s"$c=$est vs $exact")
    }
    assert(r.getAs[Double]("est_common") >= 0.0)
  }

  test("events_bot_filter emits every user and flags a strict subset") {
    val rows = SparkEntry.queries("events_bot_filter")(spark, sf).collect()
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length == nUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("burst_max") >= 1)
      assert(r.getAs[Long]("burst_max") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Double]("events_per_active_day") >= 1.0)
    }
    assert(rows.count(_.getAs[Boolean]("is_bot")) < rows.length,
      "every user flagged as bot — thresholds degenerate")
  }

  test("train_pair_manifest enforces every gate it claims") {
    val rows = SparkEntry.queries("train_pair_manifest")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("lang") == "en")
      val n = r.getAs[Long]("n_chars")
      assert(n >= 100 && n <= 500)
      val norm2 = r.getAs[Double]("norm2")
      assert(norm2 >= 0.98 && norm2 <= 1.02)
      assert(Set("train", "val").contains(r.getAs[String]("split")))
    }
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.contains("train"), "empty train split")
  }

  test("agg_equidepth_hist buckets tile the value range in order") {
    val rows = SparkEntry.queries("agg_equidepth_hist")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables.t(spark, sf, "orders").count())
    rows.foreach(r => assert(r.getAs[Double]("lo") <= r.getAs[Double]("hi")))
    // consecutive buckets must not overlap
    rows.sortBy(_.getAs[Int]("bucket")).sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("lo") + 0.011)
      case _ =>
    }
  }

  test("events_markov_stationary is a near-probability-vector") {
    val rows = SparkEntry.queries("events_markov_stationary")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Double]("stationary_p"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    // mass is preserved up to rounding of the 9-decimal terms
    assert(math.abs(ps.sum - 1.0) < 1e-3, s"sum=${ps.sum}")
  }

  test("dedup_canonical_pick keepers are real members with max length") {
    val rows = SparkEntry.queries("dedup_canonical_pick")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val chars = Tables.t(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2) // clusters come from pairs
      val keeper = r.getAs[Long]("keeper_id")
      assert(chars(keeper) == r.getAs[Long]("keeper_chars"))
      assert(r.getAs[Long]("total_chars") >= r.getAs[Long]("keeper_chars"))
    }
  }

  test("dedup_source_matrix pair totals equal the near-dup pair count") {
    val rows = SparkEntry.queries("dedup_source_matrix")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    val nPairs = SparkEntry.queries("dedup_minhash")(spark, sf).count()
    assert(total == nPairs, s"matrix total $total != pair count $nPairs")
    rows.foreach(r => assert(r.getAs[String]("source_x")
      <= r.getAs[String]("source_y")))
  }

  test("events_retention_halflife reports a usable decay fit") {
    val r = SparkEntry.queries("events_retention_halflife")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_points") >= 2, "not enough curve points")
    val slope = r.getAs[Double]("slope")
    if (slope < 0) {
      val hl = r.getAs[Double]("halflife_weeks")
      assert(hl > 0, s"negative slope $slope must yield positive hl, got $hl")
    } else assert(r.isNullAt(r.fieldIndex("halflife_weeks")))
  }

  test("events_lifecycle_stage shares partition the user base") {
    val rows = SparkEntry.queries("events_lifecycle_stage")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    val validStages = Set("active", "cooling", "lapsed", "churned")
    rows.foreach(r => assert(validStages(r.getAs[String]("stage"))))
    assert(rows.length >= 2, "hour windows failed to split the user base")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  // (the r8 "recall monotone in nprobe" pin moved into the two-codebook
  // sweep test below when the learned leg landed in r11)

  test("events_error_budget cumulative burn is a running blend") {
    val rows = SparkEntry.queries("events_error_budget")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Double]("err_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(r.getAs[Double]("burn") - rate / 0.25) < 1e-3)
      assert(r.getAs[Long]("n_errors") <= r.getAs[Long]("n_total"))
    }
    // final cumulative burn equals the corpus-wide rate over the SLO
    val totE = rows.map(_.getAs[Long]("n_errors")).sum.toDouble
    val totN = rows.map(_.getAs[Long]("n_total")).sum.toDouble
    assert(math.abs(rows.last.getAs[Double]("cum_burn")
      - totE / totN / 0.25) < 1e-3)
  }

  test("part_assortment_gaps lists exactly the absent grid cells") {
    val gaps = SparkEntry.queries("part_assortment_gaps")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val p = Tables.t(spark, sf, "part")
    val nBrands = p.select("p_brand").distinct().count()
    val nTypes = p.select("p_type").distinct().count()
    val nSizes = p.select("p_size").distinct().count()
    val existing = p.select("p_brand", "p_type", "p_size").distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSet
    assert(gaps.nonEmpty, "no gaps — grid degenerate at this SF")
    assert(gaps.size == nBrands * nTypes * nSizes - existing.size)
    assert(gaps.intersect(existing).isEmpty)
  }

  test("embedding_hubness histogram covers every vector once") {
    val rows = SparkEntry.queries("embedding_hubness")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val nVecs = Tables.t(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == nVecs)
    // total in-degree equals total out-degree (≤ K per query)
    val totalIn = rows
      .map(r => r.getAs[Long]("k_occ") * r.getAs[Long]("n_vectors")).sum
    val edges = SparkEntry.queries("embedding_knn_graph")(spark, sf)
      .count()
    assert(totalIn == edges)
  }

  test("trend_revenue_drawdown peak and drawdown are consistent") {
    val rows = SparkEntry.queries("trend_revenue_drawdown")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    var runningPeak = Double.MinValue
    rows.foreach { r =>
      val (rev, peak) = (r.getAs[Double]("revenue"), r.getAs[Double]("peak"))
      runningPeak = math.max(runningPeak, rev)
      assert(math.abs(peak - runningPeak) < 0.02, s"peak $peak vs $runningPeak")
      val dd = r.getAs[Double]("drawdown")
      assert(dd >= 0.0 && dd <= 1.0)
      assert(r.getAs[Double]("max_drawdown") >= dd - 1e-9)
    }
  }

  test("orders_status_trend shares sum to 1 within each month") {
    val rows = SparkEntry.queries("orders_status_trend")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("month").toString)
      .foreach { case (m, rs) =>
        val s = rs.map(_.getAs[Double]("share")).sum
        assert(math.abs(s - 1.0) < 1e-4, s"month $m shares sum $s")
      }
  }

  test("dedup_pair_similarity_hist buckets are disjoint and ordered") {
    val rows = SparkEntry.queries("dedup_pair_similarity_hist")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("bucket_lo")
      assert(r.getAs[Double]("min_jac") >= lo - 1e-9)
      assert(r.getAs[Double]("max_jac") < lo + 0.05 + 1e-9)
      assert(r.getAs[Long]("n_pairs") >= 1)
    }
    // the >= 0.8 near-dup pairs must appear in the top bins
    val nearDup = rows.filter(_.getAs[Double]("bucket_lo") >= 0.8 - 1e-9)
      .map(_.getAs[Long]("n_pairs")).sum
    val verified = SparkEntry.queries("dedup_minhash")(spark, sf).count()
    assert(nearDup >= verified)
  }

  test("sample_dedup_weight clusters contribute exactly one unit each") {
    val rows = SparkEntry.queries("sample_dedup_weight")(spark, sf)
      .collect()
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.length == n)
    rows.foreach { r =>
      val cs = r.getAs[Long]("cluster_size")
      assert(cs >= 1)
      assert(math.abs(r.getAs[Double]("weight") - 1.0 / cs) < 1e-5)
    }
    // total weight = #clusters + #singletons (each cluster sums to ~1)
    val clustered = rows.filter(_.getAs[Long]("cluster_size") > 1)
    assert(clustered.nonEmpty, "no near-dup clusters weighted")
  }

  test("graph_rich_club density is a valid fraction at every k") {
    val rows = SparkEntry.queries("graph_rich_club")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(4L, 8L, 16L))
    rows.foreach { r =>
      val (n, m) = (r.getAs[Long]("n_rich"), r.getAs[Long]("m_rich"))
      assert(m <= n * (n - 1) / 2 + 1)
      if (n >= 2) {
        val phi = r.getAs[Double]("phi")
        assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"phi $phi at k=$n")
      } else assert(r.isNullAt(r.fieldIndex("phi")))
    }
    // richer clubs are no larger
    val sizes = rows.map(_.getAs[Long]("n_rich"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b })
  }

  test("set bag ops satisfy the multiplicity identity |F| = kept + matched") {
    import org.apache.spark.sql.functions.{count => cnt}
    val surplus = SparkEntry.queries("set_except_all")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("surplus")).toMap
    val matched = SparkEntry.queries("set_intersect_all")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("matched")).toMap
    val f = Tables.t(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy("o_custkey").agg(cnt(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n")).toMap
    assert(surplus.nonEmpty && matched.nonEmpty)
    // for every customer with F-orders: F-count = surplus + matched
    f.foreach { case (ck, nf) =>
      assert(surplus.getOrElse(ck, 0L) + matched.getOrElse(ck, 0L) == nf,
        s"customer $ck: $nf != ${surplus.getOrElse(ck, 0L)} + " +
          s"${matched.getOrElse(ck, 0L)}")
    }
  }

  test("events_load_factor is at least 1 and peak bounds the mean") {
    val rows = SparkEntry.queries("events_load_factor")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("load_factor") >= 1.0 - 1e-9)
      assert(r.getAs[Long]("peak_hourly") * r.getAs[Long]("n_hours")
        >= r.getAs[Long]("n_events"))
    }
  }

  test("events_new_vs_returning starts all-new and total matches corpus") {
    val rows = SparkEntry.queries("events_new_vs_returning")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // day 1: every active user is by definition first seen that day
    assert(rows.head.getAs[Double]("new_share") == 1.0)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    assert(total == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val s = r.getAs[Double]("new_share")
      assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("part_price_dispersion stats are internally consistent") {
    val rows = SparkEntry.queries("part_price_dispersion")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("min_price"), r.getAs[Double]("max_price"))
      val mean = r.getAs[Double]("mean_price")
      assert(lo <= mean + 1e-6 && mean <= hi + 1e-6)
      assert(r.getAs[Double]("cv") >= 0.0)
    }
  }

  test("graph_adamic_adar scores are positive and bounded by n_common") {
    val rows = SparkEntry.queries("graph_adamic_adar")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nc = r.getAs[Long]("n_common")
      val aa = r.getAs[Double]("aa_score")
      assert(nc >= 1)
      // each witness contributes 1/ln(deg) with deg >= 2: term <= 1/ln 2
      assert(aa > 0.0 && aa <= nc / math.log(2.0) + 1e-6)
    }
  }

  test("win_bollinger bands bracket the mid and the flag agrees") {
    val rows = SparkEntry.queries("win_bollinger")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, mid, hi) = (r.getAs[Double]("lower"),
        r.getAs[Double]("mid"), r.getAs[Double]("upper"))
      val rev = r.getAs[Double]("revenue")
      assert(lo <= mid && mid <= hi)
      val expected =
        if (rev > hi) "high" else if (rev < lo) "low" else "in"
      assert(r.getAs[String]("band_flag") == expected)
    }
  }

  test("trend_changepoint reports 5 ranked splits partitioning the series") {
    val rows = SparkEntry.queries("trend_changepoint")(spark, sf)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    val nDays = rows.head.getAs[Long]("n_before") +
      rows.head.getAs[Long]("n_after")
    var prevAbs = Double.MaxValue
    rows.foreach { r =>
      assert(r.getAs[Long]("n_before") >= 30 &&
        r.getAs[Long]("n_after") >= 30)
      assert(r.getAs[Long]("n_before") + r.getAs[Long]("n_after") == nDays)
      val shift = r.getAs[Double]("shift")
      assert(math.abs(shift - (r.getAs[Double]("mean_after")
        - r.getAs[Double]("mean_before"))) < 1e-6)
      assert(math.abs(shift) <= prevAbs + 1e-9) // rank order = |shift| desc
      prevAbs = math.abs(shift)
    }
  }

  test("dedup_token_sort partitions coarser than dedup_exact") {
    val ts = SparkEntry.queries("dedup_token_sort")(spark, sf).collect()
    assert(ts.nonEmpty)
    val docCount = Tables.t(spark, sf, "documents").count()
    assert(ts.map(_.getAs[Long]("n_docs")).sum == docCount)
    ts.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= r.getAs[Long]("n_exact_forms"))
      assert(r.getAs[Long]("n_exact_forms") >= 1L)
    }
    // bag-equality merges exact clusters, never splits them
    val exactClusters = Dedup.exactKeepers(
      Tables.t(spark, sf, "documents"), "doc_id", "text").count()
    assert(ts.length <= exactClusters)
  }

  test("embedding_triplet_mining covers every anchor with consistent flags") {
    val rows = SparkEntry.queries("embedding_triplet_mining")(spark, sf)
      .collect()
    val nVecs = Tables.t(spark, sf, "embeddings").count()
    assert(rows.length == nVecs) // every label has >= 2 members
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor")
      assert(r.getAs[Long]("pos_id") != a && r.getAs[Long]("neg_id") != a)
      val (p, n) = (r.getAs[Double]("pos_cos"), r.getAs[Double]("neg_cos"))
      assert(math.abs(r.getAs[Double]("margin") - (p - n)) < 2e-6)
      val expected =
        if (n >= p) "hard" else if (n >= p - 0.2) "semi_hard" else "easy"
      assert(r.getAs[String]("difficulty") == expected)
    }
  }

  test("win_holt state recursion initializes and forecasts consistently") {
    val rows = SparkEntry.queries("win_holt")(spark, sf)
      .orderBy("day").collect()
    val nDays = SparkEntry.queries("win_holt")(spark, sf)
      .select("day").distinct().count()
    assert(rows.length == nDays && rows.nonEmpty)
    val h = rows.head
    assert(h.getAs[Double]("level") == h.getAs[Double]("revenue"))
    assert(h.getAs[Double]("trend") == 0.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("forecast_next") ==
        r.getAs[Double]("level") + r.getAs[Double]("trend"))
    }
  }

  test("win_seasonal_decompose components sum back to the series") {
    val rows = SparkEntry.queries("win_seasonal_decompose")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow")
      assert(dow >= 0 && dow <= 6)
      // residual is defined as revenue - trend - seasonal (re-adding in a
      // different association can move an ulp — tolerance, not equality)
      assert(math.abs(r.getAs[Double]("revenue")
        - (r.getAs[Double]("trend") + r.getAs[Double]("seasonal")
          + r.getAs[Double]("residual"))) < 1e-5)
    }
  }

  test("embedding_matryoshka_eval reports a recall per prefix") {
    val rows = SparkEntry.queries("embedding_matryoshka_eval")(spark, sf)
      .orderBy("prefix_dim").collect()
    assert(rows.map(_.getAs[Long]("prefix_dim")).toSeq == Seq(8L, 16L, 32L))
    rows.foreach { r =>
      val (h, x) = (r.getAs[Long]("n_hits"), r.getAs[Long]("n_exact"))
      assert(h >= 0 && h <= x && x == 50L) // 10 queries x top-5
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }

  test("multimodal_phash emits 64-bit fingerprints with sane collisions") {
    val rows = SparkEntry.queries("multimodal_phash")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("phash")
      assert(p.length == 64 && p.forall(c => c == '0' || c == '1'))
      assert(p.contains('0')) // not every block can exceed the mean
      assert(r.getAs[Long]("n_same_hash") >= 1L)
    }
  }

  test("dedup_method_overlap cells cover every method's own pair count") {
    val cells = SparkEntry.queries("dedup_method_overlap")(spark, sf)
      .collect()
    assert(cells.nonEmpty)
    def tot(flag: String): Long = cells
      .filter(_.getAs[Boolean](flag)).map(_.getAs[Long]("n_pairs")).sum
    // each method's marginal equals its own operator's pair count
    assert(tot("by_minhash") ==
      SparkEntry.queries("dedup_minhash")(spark, sf).count())
    assert(tot("by_simhash") ==
      SparkEntry.queries("dedup_simhash")(spark, sf).count())
    assert(tot("by_containment") ==
      SparkEntry.queries("dedup_containment")(spark, sf).count())
    // the all-false cell cannot exist: every pair came from some method
    assert(cells.forall(r => r.getAs[Boolean]("by_minhash")
      || r.getAs[Boolean]("by_simhash")
      || r.getAs[Boolean]("by_containment")))
  }

  test("win_cusum resets at zero and alarms consistently") {
    val rows = SparkEntry.queries("win_cusum")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("cusum_pos") >= 0.0)
      assert(r.getAs[Double]("cusum_neg") >= 0.0)
      assert(Set("up", "down", "ok")(r.getAs[String]("alarm")))
    }
    // init: day 1 deviates one way, so one side starts at exactly zero
    val h = rows.head
    assert(math.min(h.getAs[Double]("cusum_pos"),
      h.getAs[Double]("cusum_neg")) == 0.0)
    // the detector must actually fire somewhere on a 6.5-year series
    assert(rows.exists(_.getAs[String]("alarm") != "ok"))
  }

  test("sample_time_stratified embargo separates train and test spans") {
    val rows = SparkEntry.queries("sample_time_stratified")(spark, sf)
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "embargo", "test"))
    val train = rows("train")
    val test = rows("test")
    assert(train.getAs[java.sql.Date]("last_day")
      .before(test.getAs[java.sql.Date]("first_day")))
    // train customers all count as seen-in-train; test leakage bounded
    assert(train.getAs[Long]("n_seen_in_train") ==
      train.getAs[Long]("n_customers"))
    assert(test.getAs[Long]("n_seen_in_train") <=
      test.getAs[Long]("n_customers"))
  }

  test("graph_hits separates sides and orders by exact integer-valued " +
      "score (DECIMAL(38,0) internally, shipped as STRING — SURVEY §7.4)") {
    val rows = SparkEntry.queries("graph_hits")(spark, sf).collect()
    assert(rows.nonEmpty)
    val (auth, hub) = rows.partition(_.getAs[String]("kind") == "authority")
    assert(auth.nonEmpty && hub.nonEmpty)
    // authorities are suppliers (offset ids), hubs are customers
    auth.foreach(r => assert(r.getAs[Long]("node") >= Graph.SuppOffset))
    hub.foreach(r => assert(r.getAs[Long]("node") < Graph.SuppOffset))
    Seq(auth, hub).foreach { side =>
      val byRank = side.sortBy(_.getAs[Long]("rnk"))
      assert(byRank.map(_.getAs[Long]("rnk")).toSeq ==
        (1L to byRank.length))
      // scores accumulate as DECIMAL(38,0) path counts (overflow-safe
      // vs int64 — ADVICE r7) but the OUTPUT column is their lossless
      // string form (r8: the registry's only >20-digit decimal output
      // was the one key the external hash check disagreed on). The
      // string must parse back to an exact scale-0 positive integer,
      // and rank order must still follow the numeric value.
      val scores = byRank.map(r =>
        new java.math.BigDecimal(r.getAs[String]("score")))
      scores.foreach(sc => assert(sc.scale == 0 && sc.signum > 0))
      assert(scores.zip(scores.tail).forall { case (a, b) =>
        a.compareTo(b) >= 0 })
      side.foreach(r => assert(r.getAs[Double]("share_ppm") > 0.0))
    }
  }

  test("lakehouse_clustering_depth shows z-order tightening the date dim") {
    val rows = SparkEntry.queries("lakehouse_clustering_depth")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("dim")) -> r)
      .toMap
    assert(rows.keySet ==
      Set(("naive", "ck"), ("naive", "dy"), ("zorder", "ck"),
        ("zorder", "dy")))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_files") >= 2 &&
        r.getAs[Long]("n_files") <= 16)
      assert(r.getAs[Long]("sum_width") >= r.getAs[Long]("n_files"))
    }
    // the whole point of z-ordering: the date dimension's zones tighten
    // vs the key-ordered layout (which scatters dates across every file)
    assert(rows(("zorder", "dy")).getAs[Long]("sum_width") <
      rows(("naive", "dy")).getAs[Long]("sum_width"))
  }

  test("win_theil_sen picks medians with consistent counts") {
    val r = SparkEntry.queries("win_theil_sen")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nd = row.getAs[Long]("n_days")
    assert(row.getAs[Long]("n_pairs") == nd * (nd - 1) / 2)
    assert(!row.getAs[Double]("slope_per_day").isNaN)
    assert(!row.getAs[Double]("intercept").isNaN)
  }

  test("agg_moments_skew_kurt matches the uniform-quantity shape") {
    val rows = SparkEntry.queries("agg_moments_skew_kurt")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val total = Tables.t(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val (sk, ku) = (r.getAs[Double]("skewness"),
        r.getAs[Double]("excess_kurtosis"))
      // quantity is ~uniform(1..50): near-zero skew, platykurtic
      // (uniform's excess kurtosis is -1.2)
      assert(math.abs(sk) < 0.5, s"skew $sk")
      assert(ku > -2.0 && ku < 0.0, s"kurtosis $ku")
      val m = r.getAs[Double]("mean_qty")
      assert(m > 1.0 && m < 50.0)
    }
  }

  test("join_spatial_grid never beats brute force and usually matches it") {
    val grid = SparkEntry.queries("join_spatial_grid")(spark, sf)
      .collect().map(r => r.getAs[Long]("query_key") -> r).toMap
    assert(grid.nonEmpty)
    val pts = Lakehouse.zInputs(spark, sf).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Long]("ck"),
        r.getAs[Long]("dy")))
    val exact = pts.filter(_._1 % 997 == 0).map { case (qk, qx, qy) =>
      qk -> pts.filter(_._1 != qk).map { case (_, x, y) =>
        (x - qx) * (x - qx) + (y - qy) * (y - qy)
      }.min
    }.toMap
    assert(grid.keySet == exact.keySet)
    grid.foreach { case (qk, r) =>
      assert(r.getAs[Long]("nn_key") != qk)
      assert(r.getAs[Long]("n_candidates") >= 1L)
      // grid probe is approximate at cell borders but never better than
      // the true NN distance
      assert(r.getAs[Long]("dist2") >= exact(qk))
    }
    // the 3x3 probe should find the true NN for most queries
    val hit = grid.count { case (qk, r) =>
      r.getAs[Long]("dist2") == exact(qk) }
    assert(hit * 2 > grid.size, s"grid found true NN for only $hit")
  }

  test("events_markov_attribution removal effects are sane") {
    val rows = SparkEntry.queries("events_markov_attribution")(spark, sf)
      .collect().map(r => r.getAs[String]("scenario") -> r).toMap
    assert(rows.keySet == Set("base", "no_click", "no_view", "no_error",
      "no_signup"))
    val base = rows("base").getAs[Double]("conversion")
    assert(base > 0.0 && base <= 1.0)
    assert(rows("base").getAs[Double]("removal_effect") == 0.0)
    rows.foreach { case (scen, r) =>
      val c = r.getAs[Double]("conversion")
      assert(c >= 0.0 && c <= 1.0)
      if (scen != "base") {
        // removing a channel can only lose paths to purchase
        assert(c <= base + 1e-9)
        assert(r.getAs[Double]("removal_effect") >= 0.0)
      }
    }
  }

  test("win_kalman gain stays in (0,1] and settles") {
    val rows = SparkEntry.queries("win_kalman")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[Double]("gain") == 1.0)
    assert(rows.head.getAs[Double]("level") ==
      rows.head.getAs[Double]("revenue"))
    rows.tail.foreach { r =>
      val g = r.getAs[Double]("gain")
      assert(g > 0.0 && g < 1.0)
    }
    // steady-state: gain converges (last two rounds differ negligibly)
    if (rows.length > 10) {
      val g = rows.takeRight(2).map(_.getAs[Double]("gain"))
      assert(math.abs(g(0) - g(1)) < 1e-6)
    }
  }

  test("events_uplift_cuped reduces variance without moving the estimand") {
    val rows = SparkEntry.queries("events_uplift_cuped")(spark, sf)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(rows.keySet == Set("control", "treatment"))
    rows.values.foreach { r =>
      val vr = r.getAs[Double]("var_reduction")
      assert(vr >= 0.0 && vr <= 1.0) // rho^2 by construction
      assert(r.getAs[Long]("n_users") > 0)
      // CUPED shifts the mean by theta*(arm pre-mean - global pre-mean):
      // a bounded adjustment, not a rescale
      val (post, adj) = (r.getAs[Double]("mean_post"),
        r.getAs[Double]("mean_adjusted"))
      assert(adj > 0.0 && math.abs(adj - post) < post)
    }
  }

  test("events_sample_size_power shrinks n as the MDE grows") {
    val rows = SparkEntry.queries("events_sample_size_power")(spark, sf)
      .orderBy("mde_pct").collect()
    assert(rows.map(_.getAs[Long]("mde_pct")).toSeq == Seq(1L, 2L, 5L, 10L))
    val ns = rows.map(_.getAs[Long]("n_per_arm"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a > b })
    // quadratic law: halving the MDE ~quadruples n (integer ceil slack)
    assert(ns(0) >= 3 * ns(1))
    rows.foreach(r => assert(r.getAs[Double]("delta") > 0.0))
  }

  test("dedup_minhash_param_planner S-curves are monotone and ordered") {
    val rows = SparkEntry.queries("dedup_minhash_param_planner")(spark, sf)
      .collect()
    assert(rows.length == 95) // 19 similarities x 5 configs
    val byCfg = rows.groupBy(_.getAs[Long]("bands"))
    byCfg.values.foreach { cfg =>
      val curve = cfg.sortBy(_.getAs[Long]("j_pct"))
        .map(_.getAs[Double]("p_detect"))
      assert(curve.zip(curve.tail).forall { case (a, b) => a <= b })
      // rises from ~0; the (2x32) config's knee sits beyond J=0.95 by
      // design (that's what the planner exists to show), so only pin
      // strict growth here and the knee ordering below
      assert(curve.head < 0.1 && curve.last > curve.head)
    }
    // more rows per band pushes the curve's knee right: at J=0.5 the
    // (32 bands x 2 rows) config detects far more than (2 x 32)
    def at50(bands: Long) = rows.find(r => r.getAs[Long]("bands") == bands
      && r.getAs[Long]("j_pct") == 50L).get.getAs[Double]("p_detect")
    assert(at50(32) > at50(16) && at50(16) > at50(4) && at50(4) > at50(2))
  }

  test("win_mann_kendall verdict is consistent with its own z") {
    val r = SparkEntry.queries("win_mann_kendall")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val sStat = row.getAs[Long]("s_stat")
    assert(math.abs(sStat) <= n * (n - 1) / 2)
    assert(row.getAs[Double]("var_s") > 0.0)
    val z = row.getAs[Double]("z")
    val expected = if (z > 1.959964) "increasing"
      else if (z < -1.959964) "decreasing" else "no_trend"
    assert(row.getAs[String]("trend") == expected)
  }

  test("events_autocorrelation stays bounded with shrinking overlap") {
    val rows = SparkEntry.queries("events_autocorrelation")(spark, sf)
      .orderBy("lag_hours").collect()
    assert(rows.map(_.getAs[Long]("lag_hours")).toSeq ==
      Seq(1L, 2L, 3L, 6L, 12L, 24L, 48L, 168L))
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a > b })
    rows.foreach { r =>
      val a = r.getAs[Double]("acf")
      assert(a >= -1.0 && a <= 1.0)
    }
  }

  test("text_burstiness computes Fano factors over the whole corpus") {
    val rows = SparkEntry.queries("text_burstiness")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val nDocs = Tables.t(spark, sf, "documents").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[Long]("total_count") >= r.getAs[Long]("df"))
      // near-uniform synthetic vocabulary: Fano stays O(1), never the
      // pathological >>1 of a real bursty corpus, never negative
      val f = r.getAs[Double]("fano")
      assert(f > 0.0 && f < 10.0)
    }
  }

  test("agg_winsorized_mean robust means order sensibly") {
    val rows = SparkEntry.queries("agg_winsorized_mean")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, win, trim) = (r.getAs[Double]("mean_raw"),
        r.getAs[Double]("mean_winsorized"), r.getAs[Double]("mean_trimmed"))
      assert(win > 0 && trim > 0 && raw > 0)
      // clamping/trimming symmetric tails of a near-symmetric
      // distribution keeps all three in the same ballpark
      assert(math.abs(win - raw) < 0.2 * raw)
      assert(math.abs(trim - raw) < 0.2 * raw)
    }
  }

  test("supplier_cr4 shares stay in (0,1] and need >=4 suppliers to dip") {
    val rows = SparkEntry.queries("supplier_cr4")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cr4 = r.getAs[Double]("cr4")
      assert(cr4 > 0.0 && cr4 <= 1.0 + 1e-9)
      if (r.getAs[Long]("n_suppliers") <= 4) assert(cr4 > 1.0 - 1e-6)
    }
  }

  test("trend_price_volume_bridge effects reconcile to the delta") {
    val rows = SparkEntry.queries("trend_price_volume_bridge")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("delta")
      val pe = r.getAs[Double]("price_effect")
      val ve = r.getAs[Double]("volume_effect")
      // exact two-factor identity: delta = price + volume effect
      assert(math.abs(d - (pe + ve)) < 1e-4 * (math.abs(d) + 1))
      assert(math.abs(d - (r.getAs[Double]("rev_1998")
        - r.getAs[Double]("rev_1997"))) < 1e-6)
    }
  }

  test("stream_lateness_audit cumulative share reaches exactly 1") {
    val rows = SparkEntry.queries("stream_lateness_audit")(spark, sf)
      .orderBy("late_min").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("late_min") >= 0L)
      assert(r.getAs[Long]("n_events") > 0L)
    }
    val shares = rows.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // the fixture stream is (by generator construction) near-in-order:
    // the p50 lateness must sit in the 0-minute bucket
    assert(rows.head.getAs[Long]("late_min") == 0L &&
      shares.head > 0.5)
  }

  test("multimodal_image_tiles covers full tiles exactly once") {
    val rows = SparkEntry.queries("multimodal_image_tiles")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { tiles =>
      val cols = tiles.map(_.getAs[Long]("tile_col")).distinct.sorted
      assert(cols.toSeq == Seq(0L, 1L, 2L, 3L)) // full 4-wide grid
      val n = tiles.length
      assert(n % 4 == 0)
      tiles.foreach { t =>
        val e = t.getAs[Long]("energy")
        assert(e >= 16L * 32 && e <= 16L * 127) // 16 printable bytes
        assert(t.getAs[String]("digest").length == 32)
      }
    }
  }

  test("sql_filter_clause filtered aggregates bound the plain ones") {
    val rows = SparkEntry.queries("sql_filter_clause")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_finished") <= r.getAs[Long]("n_orders"))
    }
  }

  test("events_next_event_eval accuracy beats nothing and is bounded") {
    val rows = SparkEntry.queries("events_next_event_eval")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[String]("predicted").nonEmpty)
    }
  }

  test("events_feature_mi is non-negative and lift centers near 1") {
    val rows = SparkEntry.queries("events_feature_mi")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[String]("event_type")).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    rows.foreach { r =>
      assert(r.getAs[Double]("mi_bits") >= -1e-12) // MI >= 0 by theory
      val lift = r.getAs[Double]("conversion_lift")
      assert(lift > 0.0 && lift < 5.0)
    }
  }

  test("win_wow_yoy lags populate exactly when history exists") {
    val rows = SparkEntry.queries("win_wow_yoy")(spark, sf)
      .orderBy("week").collect()
    assert(rows.length > 53)
    assert(rows.head.isNullAt(rows.head.fieldIndex("wow_pct")))
    assert(rows(51).isNullAt(rows(51).fieldIndex("yoy_pct")))
    assert(!rows(52).isNullAt(rows(52).fieldIndex("yoy_pct")))
    rows.tail.foreach(r => assert(!r.isNullAt(r.fieldIndex("wow_pct"))))
  }

  test("lakehouse_incremental_plan actions match their own thresholds") {
    val rows = SparkEntry.queries("lakehouse_incremental_plan")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    var sawAppend = false
    rows.foreach { r =>
      val (ch, n) = (r.getAs[Long]("n_changed"), r.getAs[Long]("n_rows"))
      val action = r.getAs[String]("action")
      val expected =
        if (n == 0L) "append_new_partition"
        else if (ch.toDouble > n.toDouble * 0.1) "rebuild" else "merge"
      assert(action == expected, s"$action vs $expected ($ch/$n)")
      val w = r.getAs[Long]("rows_to_write")
      assert(w == (if (action == "rebuild") n else ch))
      if (action == "append_new_partition") sawAppend = true
    }
    assert(sawAppend) // the insert feed always creates new keys
  }

  test("graph_powerlaw_fit recovers a negative log-log slope") {
    val r = SparkEntry.queries("graph_powerlaw_fit")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_degrees") >= 3)
    assert(row.getAs[Double]("alpha") == -row.getAs[Double]("slope"))
    assert(!row.getAs[Double]("intercept").isNaN)
  }

  test("corpus_dedup_survivorship accounting closes per source") {
    val rows = SparkEntry.queries("corpus_dedup_survivorship")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val total = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ==
        r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("tokens_removed") <=
        r.getAs[Long]("tokens_total"))
      val share = r.getAs[Double]("token_loss_share")
      assert(share >= 0.0 && share < 1.0)
    }
    // the fixture plants near-dup clusters: something must be removable
    assert(rows.map(_.getAs[Long]("n_removed")).sum > 0)
  }

  test("sim_hamming_topk_eval shows code signal even at low recall") {
    val r = SparkEntry.queries("sim_hamming_topk_eval")(spark, sf)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("code_bits") == 16L)
    val rec = row.getAs[Double]("recall")
    assert(rec >= 0.0 && rec <= 1.0)
    // 16-bit codes are a weak ranker by design, but true nearest
    // neighbors must sit CLOSER in Hamming space than random pairs —
    // that separation is what makes binary pre-filtering work
    assert(row.getAs[Double]("mean_ham_true_nn") <
      row.getAs[Double]("mean_ham_all"))
  }

  test("events_error_burn_multiwindow policy fires consistently") {
    val rows = SparkEntry.queries("events_error_burn_multiwindow")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val alert = r.getAs[String]("alert")
      assert(Set("page", "ticket", "ok")(alert))
      if (alert == "page") {
        assert(r.getAs[Double]("burn_1h") > 1.2 - 1e-6)
        assert(r.getAs[Double]("burn_6h") > 1.1 - 1e-6)
      }
    }
    // gapless hour grid
    val hs = rows.map(_.getAs[Long]("hour_idx")).sorted
    assert(hs.zip(hs.tail).forall { case (a, b) => b == a + 1 })
  }

  test("agg_benford_audit flunks the bounded-range synthetic totals") {
    val rows = SparkEntry.queries("agg_benford_audit")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("digit")).sorted.toSeq == (1L to 9L))
    val chi2 = rows.head.getAs[Double]("chi2")
    assert(rows.forall(_.getAs[Double]("chi2") == chi2))
    // uniform-range totals are nothing like Benford: the audit must
    // reject decisively, not marginally
    assert(chi2 > 100.0)
    assert(rows.forall(!_.getAs[Boolean]("benford_pass")))
    val shares = rows.map(_.getAs[Double]("obs_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-6)
  }

  test("events_funnel_significance intervals bracket the rate") {
    val rows = SparkEntry.queries("events_funnel_significance")(spark, sf)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (lo, rate, hi) = (r.getAs[Double]("wilson_lo"),
        r.getAs[Double]("rate"), r.getAs[Double]("wilson_hi"))
      assert(lo <= rate + 1e-6 && rate <= hi + 1e-6)
      assert(lo >= 0.0 && hi <= 1.0) // Wilson never leaves [0,1]
      assert(r.getAs[Long]("n_num") <= r.getAs[Long]("n_denom"))
    }
  }

  test("win_percentile_bands order and the outside flag agree") {
    val rows = SparkEntry.queries("win_percentile_bands")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p10, p50, p90) = (r.getAs[Double]("p10"),
        r.getAs[Double]("p50"), r.getAs[Double]("p90"))
      assert(p10 <= p50 && p50 <= p90)
      val rev = r.getAs[Double]("revenue")
      assert(r.getAs[Boolean]("outside_band") ==
        (rev < p10 || rev > p90))
    }
  }

  test("scd2_validity_audit certifies our own dim build as clean") {
    val r = SparkEntry.queries("scd2_validity_audit")(spark, sf)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_overlaps") == 0L)
    assert(row.getAs[Long]("n_gaps") == 0L)
    assert(row.getAs[Long]("n_keys_one_open") == row.getAs[Long]("n_keys"))
    assert(row.getAs[Boolean]("chain_valid"))
    assert(row.getAs[Long]("n_versions") >= row.getAs[Long]("n_keys"))
  }

  test("win_holt_winters seasonal state initializes and stays additive") {
    val rows = SparkEntry.queries("win_holt_winters")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    val h = rows.head
    assert(h.getAs[Double]("level") == h.getAs[Double]("revenue"))
    assert(h.getAs[Double]("trend") == 0.0 &&
      h.getAs[Double]("season") == 0.0)
    // additive components: forecast stays at the revenue scale
    rows.foreach { r =>
      val fc = r.getAs[Double]("forecast_next")
      assert(!fc.isNaN && math.abs(fc) < 1e9)
    }
    // seasonality is learned: later seasons deviate from the zero init
    assert(rows.drop(14).exists(_.getAs[Double]("season") != 0.0))
  }

  test("agg_ratio_delta_method CIs bracket the ratio per arm") {
    val rows = SparkEntry.queries("agg_ratio_delta_method")(spark, sf)
      .collect().map(r => r.getAs[String]("arm") -> r).toMap
    assert(rows.keySet == Set("control", "treatment"))
    rows.values.foreach { r =>
      val (lo, ratio, hi) = (r.getAs[Double]("ci_lo"),
        r.getAs[Double]("ratio"), r.getAs[Double]("ci_hi"))
      assert(lo <= ratio && ratio <= hi)
      assert(r.getAs[Double]("se") > 0.0)
      assert(ratio > 0.0) // revenue per event is positive
    }
  }

  test("multimodal_tile_dedup finds genuinely cross-doc tiles") {
    val rows = SparkEntry.queries("multimodal_tile_dedup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[Long]("n_tiles") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[String]("digest").length == 32)
    }
  }

  test("sample_systematic strides exactly every 50th position") {
    val rows = SparkEntry.queries("sample_systematic")(spark, sf)
      .orderBy("pos").collect()
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.length == ((n + 49) / 50))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("pos") == i * 50L + 1L) // exact even spacing
    }
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }

  test("dedup_lsh_bucket_skew audits all 8 bands with consistent counts") {
    val rows = SparkEntry.queries("dedup_lsh_bucket_skew")(spark, sf)
      .orderBy("band").collect()
    assert(rows.map(_.getAs[Long]("band")).toSeq == (0L to 7L))
    rows.foreach { r =>
      val (nb, mx, cp) = (r.getAs[Long]("n_buckets"),
        r.getAs[Long]("max_bucket"), r.getAs[Long]("cand_pairs"))
      assert(nb >= 1L && nb <= 256L) // 8-bit band: at most 256 buckets
      assert(mx >= 1L)
      // the hottest bucket alone contributes c(c-1)/2 candidate pairs
      assert(cp >= mx * (mx - 1) / 2)
      assert(r.getAs[Double]("skew_ratio") > 0.0)
    }
  }

  test("graph_jaccard_linkpred scores are valid Jaccards, ranked") {
    val rows = SparkEntry.queries("graph_jaccard_linkpred")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      assert(r.getAs[Long]("n_common") >= 1L)
      val jac = r.getAs[Double]("jac_score")
      assert(jac > 0.0 && jac <= 1.0)
    }
    val scores = rows.map(_.getAs[Double]("jac_score")).toSeq
    assert(scores == scores.sorted.reverse) // top-30 by score desc
  }

  test("agg_kmv_difference estimates are non-negative and exact-consistent") {
    val r = SparkEntry.queries("agg_kmv_difference")(spark, sf)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("diff_ab_exact") >= 0L)
    assert(row.getAs[Long]("diff_ba_exact") >= 0L)
    // clamp-at-0 invariant: the estimator never reports a negative set size
    assert(row.getAs[Double]("est_diff_ab") >= 0.0)
    assert(row.getAs[Double]("est_diff_ba") >= 0.0)
  }

  test("events_psi_drift PSI is non-negative with populated halves") {
    val rows = SparkEntry.queries("events_psi_drift")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("event_type"))
    assert(types.distinct.length == types.length) // one row per type
    rows.foreach { r =>
      // each PSI term (pc-pr)ln(pc/pr) >= 0; rounding can shave <1e-6
      assert(r.getAs[Double]("psi") >= -1e-6)
      assert(r.getAs[Long]("n_ref") > 0L && r.getAs[Long]("n_cur") > 0L)
    }
  }

  test("sim_ivf_cell_skew is a total census over all 16 cells") {
    val rows = SparkEntry.queries("sim_ivf_cell_skew")(spark, sf)
      .orderBy("cell").collect()
    assert(rows.map(_.getAs[Long]("cell")).toSeq == (0L to 15L))
    val n = Tables.t(spark, sf, "embeddings").count()
    // assignment is total: every vector lands in exactly one cell
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      // skew is share in units of the uniform expectation 1/16
      assert(math.abs(r.getAs[Double]("skew_vs_uniform") - share * 16)
        < 2e-6)
    }
  }

  test("embedding_pq_distortion census is consistent per subquantizer") {
    val rows = SparkEntry.queries("embedding_pq_distortion")(spark, sf)
      .orderBy("sub").collect()
    assert(rows.map(_.getAs[Long]("sub")).toSeq == (0L to 7L))
    val n = Tables.t(spark, sf, "embeddings").count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == n) // every vector encodes per sub
      val used = r.getAs[Long]("n_codes_used")
      assert(used >= 1L && used <= 16L)
      // the hottest codeword holds at least the uniform share
      assert(r.getAs[Double]("max_code_share") >= 1.0 / 16 - 1e-9)
      assert(r.getAs[Double]("mse") >= 0.0)
    }
  }

  test("graph_degree_histogram CCDF is a valid survival curve") {
    val rows = SparkEntry.queries("graph_degree_histogram")(spark, sf)
      .orderBy("degree").collect()
    assert(rows.nonEmpty)
    // at the minimum degree the cumulative-from-above count is ALL nodes
    assert(rows.head.getAs[Long]("n_nodes_ge") ==
      rows.map(_.getAs[Long]("n_nodes")).sum)
    assert(math.abs(rows.head.getAs[Double]("ccdf") - 1.0) < 1e-9)
    // survival: n_nodes_ge strictly decreases as degree rises
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_nodes_ge") > b.getAs[Long]("n_nodes_ge"))
      case _ =>
    }
  }

  test("corpus_pipeline_funnel stages only ever shed documents") {
    val rows = SparkEntry.queries("corpus_pipeline_funnel")(spark, sf)
      .orderBy("stage_n").collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("raw", "exact_dedup", "near_dedup", "quality", "lang_en"))
    assert(rows.head.getAs[Long]("n_docs") ==
      Tables.t(spark, sf, "documents").count())
    assert(rows.head.getAs[Double]("pct_of_raw") == 1.0)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") <= a.getAs[Long]("n_docs"))
      case _ =>
    }
    // the funnel ends non-empty: the corpus has en docs passing quality
    assert(rows.last.getAs[Long]("n_docs") > 0L)
  }

  test("fn_url components reassemble the synthesized URL") {
    val rows = SparkEntry.queries("fn_url")(spark, sf)
      .orderBy("o_orderkey").limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val okey = r.getAs[Long]("o_orderkey")
      assert(r.getAs[String]("protocol") == "https")
      assert(r.getAs[String]("host").startsWith("www.shop-")
        && r.getAs[String]("host").endsWith(".example.com"))
      assert(r.getAs[String]("path") == s"/orders/$okey")
      assert(r.getAs[String]("id_param") == (okey % 97).toString)
      assert(r.getAs[String]("fragment") == s"s${okey % 5}")
      assert(r.getAs[String]("query").contains("status="))
    }
  }

  test("dedup_prefix_cluster keepers lead their clusters") {
    val rows = SparkEntry.queries("dedup_prefix_cluster")(spark, sf)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L) // singletons are filtered
      assert(r.getAs[String]("prefix_hash").length == 32)
    }
    val hashes = rows.map(_.getAs[String]("prefix_hash"))
    assert(hashes.distinct.length == hashes.length)
  }

  test("graph_avg_neighbor_degree stays within the degree support") {
    val rows = SparkEntry.queries("graph_avg_neighbor_degree")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val degrees = rows.map(_.getAs[Long]("degree"))
    val (dMin, dMax) = (degrees.min, degrees.max)
    rows.foreach { r =>
      val knn = r.getAs[Double]("avg_neighbor_degree")
      // a mean of neighbor degrees can never leave [min deg, max deg]
      assert(knn >= dMin - 1e-6 && knn <= dMax + 1e-6)
      assert(r.getAs[Long]("n_nodes") >= 1L)
    }
  }

  test("corpus_quality_by_source pass counts reconcile with the filter") {
    val rows = SparkEntry.queries("corpus_quality_by_source")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val nPass = rows.map(_.getAs[Long]("n_pass")).sum
    val filtered = SparkEntry.queries("pipeline_quality_filter")(spark, sf)
      .count()
    assert(nPass == filtered) // per-source flags sum to the filter's yield
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.t(spark, sf, "documents").count())
  }

  test("sample_epoch_schedule respects the budget and the 4-epoch cap") {
    val rows = SparkEntry.queries("sample_epoch_schedule")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val budget = 2L * rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val ep = r.getAs[Double]("epochs")
      assert(ep > 0.0 && ep <= 4.0 + 1e-9)
      assert(r.getAs[Long]("tokens_drawn") <=
        4L * r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("target_share") > 0.0)
    }
    // the floor'd draws never exceed the budget they were carved from
    assert(rows.map(_.getAs[Long]("tokens_drawn")).sum <= budget)
  }

  test("multimodal_corpus_stats is a total census of the media lake") {
    val rows = SparkEntry.queries("multimodal_corpus_stats")(spark, sf)
      .collect()
    assert(rows.nonEmpty && rows.length <= 6) // 3 rates x 2 channel counts
    assert(rows.map(_.getAs[Long]("n_assets")).sum ==
      Tables.t(spark, sf, "documents").count())
    assert(math.abs(rows.map(_.getAs[Double]("asset_share")).sum - 1.0)
      < 1e-4)
    rows.foreach { r =>
      assert(Set(8000L, 16000L, 24000L).contains(
        r.getAs[Long]("sample_rate")))
      assert(r.getAs[Long]("total_duration_us") > 0L)
    }
  }

  test("sim_pq_adc_topk returns 5 ranked non-self neighbors per query") {
    val rows = SparkEntry.queries("sim_pq_adc_topk")(spark, sf)
      .collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == (10L to 19L).toSet)
    byQ.values.foreach { qs =>
      assert(qs.length == 5)
      assert(qs.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to 5L))
      val ordered = qs.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Double]("adc_dist")).toSeq
      assert(ordered == ordered.sorted) // rank follows ADC distance
      qs.foreach { r =>
        assert(r.getAs[Long]("n_id") != r.getAs[Long]("q_id"))
        assert(r.getAs[Double]("adc_dist") >= 0.0)
      }
    }
  }

  test("train_shard_checksum_manifest checksums detect content change") {
    val rows = SparkEntry.queries("train_shard_checksum_manifest")(
      spark, sf).collect()
    assert(rows.length == 32) // one row per writer shard
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == n)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_doc_id") <= r.getAs[Long]("max_doc_id"))
      assert(r.getAs[Long]("min_doc_id") % 32 == r.getAs[Long]("shard"))
    }
    // XOR of distinct per-doc digests: shards can't all collapse to 0
    assert(rows.map(_.getAs[Long]("checksum")).exists(_ != 0L))
  }

  test("events_rolling_wau windows dominate their own day") {
    val rows = SparkEntry.queries("events_rolling_wau")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dau, wau) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
      assert(dau >= 1L && wau >= dau) // the day is inside its own window
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0 + 1e-9)
    }
  }

  test("text_ngram_entropy_rate: conditioning can only reduce entropy") {
    val rows = SparkEntry.queries("text_ngram_entropy_rate")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hu, hc) = (r.getAs[Double]("h_uni"), r.getAs[Double]("h_cond"))
      assert(hu >= -1e-6 && hc >= -1e-6) // entropies are non-negative
      // H(w2|w1) <= H(w2) ~= H(w): conditioning never adds uncertainty
      // (rounding headroom for the 1e-9-grid term sums)
      assert(hc <= hu + 1e-3)
      assert(r.getAs[Long]("n_bigrams") < r.getAs[Long]("n_tokens"))
    }
  }

  test("sim_pq_recall_eval scores all 10 queries with valid recalls") {
    val rows = SparkEntry.queries("sim_pq_recall_eval")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet == (10L to 19L).toSet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 5L)
      val hit = r.getAs[Long]("n_hit")
      assert(hit >= 0L && hit <= 5L)
      assert(math.abs(r.getAs[Double]("recall") - hit / 5.0) < 1e-9)
    }
  }

  test("agg_hll_precision_sweep holds the 3-sigma bound at every rsd") {
    val rows = SparkEntry.queries("agg_hll_precision_sweep")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[Double]("rsd")).sorted.toSeq ==
      Seq(0.01, 0.023, 0.05))
    val exact = rows.head.getAs[Long]("n_exact")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == exact) // one corpus, one truth
      assert(r.getAs[Boolean]("within_bound"))
    }
  }

  test("supplier_hhi_trend HHIs live in (1/n_suppliers, 1]") {
    val rows = SparkEntry.queries("supplier_hhi_trend")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, hhi) = (r.getAs[Long]("n_suppliers"), r.getAs[Double]("hhi"))
      assert(n >= 1L)
      // Σ share² is minimized at equal shares (1/n) and capped at 1
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6)
    }
  }

  test("win_croston state stays inside the demand support") {
    val rows = SparkEntry.queries("win_croston")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_demand_days") >= 1L)
      val (z, p) = (r.getAs[Double]("demand_size_est"),
        r.getAs[Double]("interval_est"))
      assert(z > 0.0) // demand sizes are positive, so is their EWMA
      assert(p >= 1.0 - 1e-9) // intervals >= 1 day and init p=1
      assert(math.abs(r.getAs[Double]("croston_forecast") - z / p) < 1e-4)
    }
  }

  test("contamination_source_matrix containments are valid fractions") {
    val rows = SparkEntry.queries("contamination_source_matrix")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("source_a") != r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_a"))
      val c = r.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0)
    }
  }

  test("events_session_depth_dist shares sum to one") {
    val rows = SparkEntry.queries("events_session_depth_dist")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("depth") >= 1L))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    // session count reconciles with sessionize itself
    assert(rows.map(_.getAs[Long]("n_sessions")).sum ==
      SparkEntry.queries("events_sessionize")(spark, sf).count())
  }

  test("stream_psi_drift windows are 6h-aligned with non-negative PSI") {
    val rows = SparkEntry.queries("stream_psi_drift")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[java.sql.Timestamp]("wstart")
      assert(w.getTime % (6L * 3600 * 1000) == 0L)
      assert(r.getAs[Long]("n_events") >= 1L)
      assert(r.getAs[Double]("psi") >= -1e-6)
    }
  }

  test("agg_kmv_jaccard estimate and exact are both valid Jaccards") {
    val r = SparkEntry.queries("agg_kmv_jaccard")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val je = row.getAs[Double]("jaccard_exact")
    assert(je >= 0.0 && je <= 1.0)
    val js = row.getAs[Double]("jaccard_est")
    assert(js >= 0.0 && js <= 1.0) // the clamp invariant
    assert(row.getAs[Long]("n_common_exact") >= 0L)
  }

  test("win_seasonal_strength strengths are clamped unit fractions") {
    val r = SparkEntry.queries("win_seasonal_strength")(spark, sf)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_days") >= 7L) // at least one full week
    Seq("f_seasonal", "f_trend").foreach { c =>
      val f = row.getAs[Double](c)
      assert(f >= 0.0 && f <= 1.0 + 1e-9, s"$c = $f")
    }
  }

  test("text_boilerplate_strip reconciles with the boilerplate report") {
    val strip = SparkEntry.queries("text_boilerplate_strip")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val report = SparkEntry.queries("text_boilerplate")(spark, sf)
      .collect()
    report.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kept = r.getAs[Long]("n_chunks") - r.getAs[Long]("n_boiler")
      if (kept == 0L) assert(!strip.contains(id)) // fully boilerplate
      else {
        val s = strip(id)
        assert(s.getAs[Long]("n_chunks_kept") == kept)
        assert(s.getAs[Long]("n_tok_kept") == r.getAs[Long]("n_tok_kept"))
        assert(s.getAs[String]("clean_sha").length == 64)
      }
    }
  }

  test("sim_ivf_nprobe_sweep reports both codebooks, recall monotone in " +
      "nprobe, learned tracks seed (VERDICT r10 #6)") {
    val rows = SparkEntry.queries("sim_ivf_nprobe_sweep")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("codebook"), r.getAs[Int]("nprobe"),
        r.getAs[Double]("recall")))
    assert(rows.length == 6, rows.mkString(","))
    assert(rows.map(_._1).toSet == Set("seed", "learned"))
    Seq("seed", "learned").foreach { cb =>
      val curve = rows.filter(_._1 == cb).sortBy(_._2).map(_._3)
      assert(curve.length == 3)
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"$cb recall not monotone in nprobe: ${curve.mkString(",")}")
      assert(curve.head > 0.0 && curve.last <= 1.0)
    }
    // measured finding, not a hope: one Lloyd iteration over this corpus
    // moves recall by at most a few hits either way (sf0.001: learned
    // 0.68/0.72/0.76 vs seed 0.66/0.72/0.76; sf0.01: learned a touch
    // BELOW seed). Pin that the legs track within 0.15 so a broken
    // learned codebook (empty cells, wrong assignment) fails loudly
    // without pretending training must always win.
    Seq(1, 2, 4).foreach { np =>
      val s0 = rows.find(r => r._1 == "seed" && r._2 == np).get._3
      val l0 = rows.find(r => r._1 == "learned" && r._2 == np).get._3
      assert(math.abs(s0 - l0) <= 0.15, s"nprobe=$np seed=$s0 learned=$l0")
    }
  }

  test("compact_apply executes the plan: physical files == planned groups," +
      " rows conserved, file count strictly reduced") {
    val rows = SparkEntry.queries("compact_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("files_after") == r.getAs[Long]("n_groups_planned"),
        r.toString)
    }
    val before = rows.map(_.getAs[Long]("n_files_before")).sum
    val after = rows.map(_.getAs[Long]("files_after")).sum
    assert(after < before, s"compaction did not reduce files: $before -> $after")
    val nOrders = graft.ops.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nOrders)
  }

  test("vacuum_apply deletes exactly the superseded generation: live " +
      "snapshot equals the table, survivors are the unchanged files only") {
    val rows = SparkEntry.queries("vacuum_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_gen0_live") ==
        r.getAs[Long]("n_files") - r.getAs[Long]("n_rewritten"), r.toString)
    }
    // non-vacuous on both sides at sf0.001: some files were vacuumed,
    // some survived in their original generation
    assert(rows.map(_.getAs[Long]("n_rewritten")).sum > 0)
    assert(rows.map(_.getAs[Long]("n_gen0_live")).sum > 0)
    val nOrders = graft.ops.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_rows_live")).sum == nOrders)
  }

  test("text_bm25: ranks are a 1..n permutation and the rare term rides " +
      "its idf to the top") {
    val rows = SparkEntry.queries("text_bm25")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq ==
      (1L to rows.length.toLong), "rank column is not a dense permutation")
    rows.foreach { r =>
      assert(r.getAs[Double]("score") > 0.0, r.toString)
      assert((1L to 3L).contains(r.getAs[Long]("n_terms")), r.toString)
    }
    // the rare term's idf dwarfs the head terms' — every doc containing
    // it must outrank every doc matching head terms only
    val rare = graft.ops.Tables.t(spark, sf, "documents")
      .filter(expr("array_contains(split(lower(trim(text)), ' '), 'dup')"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assume(rare.nonEmpty, "fixture lost its rare token")
    val worstRare = rows.filter(r => rare(r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("rnk")).max
    val bestCommon = rows.filterNot(r => rare(r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("rnk")).minOption
    assert(bestCommon.forall(_ > worstRare),
      s"a head-terms-only doc (rank $bestCommon) outranked a " +
        s"'dup' doc (worst rare rank $worstRare)")
  }

  test("sim_rrf_fusion: a doc ranked first by both legs wins the fusion") {
    val rows = SparkEntry.queries("sim_rrf_fusion")(spark, sf).collect()
    assert(rows.nonEmpty)
    val maxRrf = BigDecimal(2) / BigDecimal(61)
    rows.foreach { r =>
      val nr = r.getAs[Long]("n_rankers")
      assert(nr == 1L || nr == 2L, r.toString)
      assert(r.getAs[Double]("rrf") <= maxRrf.toDouble + 1e-12, r.toString)
      assert(r.getAs[Long]("best_rank") >= 1L, r.toString)
    }
    // per query: if any candidate carries best_rank == 1 from BOTH legs
    // (rrf == 1/61 + 1/61), nothing can tie it except another such
    // candidate — the fused rank-1 row must have n_rankers == 2
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, qr) =>
      val first = qr.minBy(_.getAs[Long]("rnk"))
      val dual = qr.filter(r => r.getAs[Long]("n_rankers") == 2L
        && r.getAs[Long]("best_rank") == 1L)
      if (dual.nonEmpty)
        assert(first.getAs[Double]("rrf") >= dual.map(
          _.getAs[Double]("rrf")).max, s"query $q: fused winner scored " +
          "below a dual-leg rank-1 candidate")
    }
  }

  test("zorder_apply: single-writer z-files conserve rows and deliver " +
      "tight two-dimensional zones") {
    val rows = SparkEntry.queries("zorder_apply")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_physical_files") == 1L,
        s"multi-writer z-file dir: $r")
      assert(r.getAs[Long]("ck_lo") <= r.getAs[Long]("ck_hi"), r.toString)
      assert(r.getAs[Long]("dy_lo") <= r.getAs[Long]("dy_hi"), r.toString)
    }
    val nOrders = graft.ops.Tables.t(spark, sf, "orders").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == nOrders)
    // z-order's promise: the mean normalized bounding box is a small
    // fraction of the full grid (16 perfectly-square z-files would give
    // 1/16 each; allow slack for partial occupancy at fixture scale)
    val meanArea = rows.map(_.getAs[Double]("zone_area_share")).sum /
      rows.length
    assert(meanArea < 0.25, s"mean zone area $meanArea — z-clustering " +
      "is not bounding both dimensions")
  }

  test("decontaminate_apply removes exactly the checked docs and the " +
      "survivors are clean") {
    val audit = SparkEntry.queries("decontaminate_apply")(spark, sf)
      .collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getAs[Long]("n_removed") + r.getAs[Long]("n_kept") ==
        r.getAs[Long]("n_train"), r.toString)
    }
    // cross-op pin: the check lists exactly the contaminated train docs,
    // so the apply's removal count must equal the check's row count
    val checked = SparkEntry.queries("contamination_check")(spark, sf)
      .count()
    assert(audit.map(_.getAs[Long]("n_removed")).sum == checked,
      "apply removed a different doc set than the check flagged")
    assert(audit.map(_.getAs[Long]("n_kept")).sum > 0,
      "decontamination removed the whole fixture corpus")
  }

  test("sim_ivfpq_topk returns 5 well-ordered rows per query and its " +
      "recall eval tracks the flat ADC path") {
    val rows = SparkEntry.queries("sim_ivfpq_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, qr) =>
      assert(qr.length == 5, s"query $q returned ${qr.length} rows")
      assert(qr.map(_.getAs[Long]("rnk")).sorted.toSeq == (1L to 5L))
      val byRank = qr.sortBy(_.getAs[Long]("rnk"))
        .map(_.getAs[Double]("adc_dist"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        s"query $q: ADC distance not monotone over ranks")
    }
    // the eval's yardstick is INCREMENTAL cell loss: the fixture's
    // near-orthogonal embeddings already hold the flat ADC path to low
    // absolute recall (its own eval key measures that), so the composite
    // is pinned against the flat path, not an absolute floor — probing 4
    // of 16 cells may cost at most a bounded extra recall drop
    val ev = SparkEntry.queries("sim_ivfpq_recall_eval")(spark, sf)
      .collect()
    val mean = ev.map(_.getAs[Double]("recall")).sum / ev.length
    val flat = SparkEntry.queries("sim_pq_recall_eval")(spark, sf)
      .collect()
    val flatMean = flat.map(_.getAs[Double]("recall")).sum / flat.length
    assert(mean >= flatMean - 0.2,
      s"IVF+PQ mean recall $mean vs flat ADC $flatMean — cell routing " +
        "lost more than the bounded nprobe/C miss rate should cost")
  }

  test("dedup_chunk_cdc conserves the corpus token mass and finds real " +
      "duplicate chunks") {
    val rows = SparkEntry.queries("dedup_chunk_cdc")(spark, sf).collect()
    assert(rows.nonEmpty)
    val logical = rows.map(_.getAs[Long]("n_tokens_logical")).sum
    val nTok = graft.ops.Tables.t(spark, sf, "documents")
      .select(sum(size(split(lower(trim(col("text"))), " "))).cast("long"))
      .collect()(0).getLong(0)
    assert(logical == nTok,
      s"chunking lost tokens: $logical chunked vs $nTok in the corpus")
    rows.foreach { r =>
      val c = r.getAs[Long]("copies")
      val stored = r.getAs[Long]("n_tokens_stored")
      assert(r.getAs[Long]("n_tokens_logical") == c * stored, r.toString)
      val share = r.getAs[Double]("saved_share")
      assert(share >= 0.0 && share < 1.0, r.toString)
    }
    assert(rows.exists(_.getAs[Long]("copies") >= 2L),
      "no duplicate chunks on a fixture with planted near-dup docs")
  }

  test("sample_kcenter: distinct picks, positive coverage radii, and the " +
      "greedy max-min radius never increases") {
    val rows = SparkEntry.queries("sample_kcenter")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rnk"))
    assert(rows.length == 4)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L, 4L))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 4, s"repeated center: ${ids.toSeq}")
    assert(rows.head.isNullAt(rows.head.fieldIndex("dist")),
      "the seed pick has no prior set — dist must be null")
    val radii = rows.tail.map(_.getAs[Double]("dist"))
    assert(radii.forall(_ > 0.0), s"degenerate pick: ${radii.toSeq}")
    // farthest-point invariant: adding a center can only shrink min-dists,
    // so the selected max-min radius is non-increasing round over round
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"greedy radius increased: ${radii.toSeq}")
  }

  test("text_char_trigram_langid: the diagonal dominates every actual's " +
      "row and accuracy clears chance") {
    val rows = SparkEntry.queries("text_char_trigram_langid")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val byActual = rows.groupBy(_.getAs[String]("actual"))
    byActual.foreach { case (a, cells) =>
      val diag = cells.filter(_.getAs[String]("predicted") == a)
        .map(_.getAs[Long]("n_docs")).sum
      val off = cells.filterNot(_.getAs[String]("predicted") == a)
        .map(_.getAs[Long]("n_docs"))
      assert(off.forall(_ < diag),
        s"actual=$a: an off-diagonal cell beats the diagonal ($diag)")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val correct = rows.filter(r =>
      r.getAs[String]("actual") == r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(correct.toDouble / total > 0.4,
      s"trigram langid accuracy ${correct.toDouble / total} — barely " +
        "above the 0.2 chance floor, the scorer regressed")
  }

  test("graph_betweenness_sampled ranks positive broker scores in " +
      "non-increasing order") {
    val rows = SparkEntry.queries("graph_betweenness_sampled")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq ==
      (1L to rows.length.toLong))
    val bc = rows.map(_.getAs[Double]("betweenness"))
    assert(bc.forall(_ > 0.0), s"non-positive dependency: ${bc.toSeq}")
    assert(bc.zip(bc.tail).forall { case (a, b) => b <= a },
      s"betweenness not sorted by rank: ${bc.toSeq}")
    val nodes = rows.map(_.getAs[Long]("node"))
    assert(nodes.distinct.length == nodes.length)
  }

  test("graph_betweenness at 8 seeds: seed-set growth only ADDS " +
      "dependency mass (VERDICT r12 #8 monotonicity audit)") {
    // seeds contribute independent non-negative δ terms, so doubling the
    // seed sample must (a) never shrink any node's total and (b) only
    // widen the covered node set — the invariant that catches a
    // seed-filter or layer-exclusion regression the ranked top-10 hides
    def contribs(n: Int): Map[Long, BigDecimal] =
      graft.ops.Graph.betweennessContrib(spark, sf, n).collect()
        .map(r => r.getAs[Long]("node") ->
          BigDecimal(r.getAs[java.math.BigDecimal]("bcd"))).toMap
    val c4 = contribs(4)
    val c8 = contribs(8)
    assert(c4.nonEmpty && c8.size >= c4.size,
      s"8-seed covered set shrank: ${c8.size} < ${c4.size}")
    val missing = c4.keySet -- c8.keySet
    assert(missing.isEmpty, s"nodes lost when seeds grew: $missing")
    val shrunk = c4.collect {
      case (n, v4) if c8(n) < v4 - BigDecimal("1e-9") => (n, v4, c8(n))
    }
    assert(shrunk.isEmpty, s"dependency mass shrank at 8 seeds: $shrunk")
    // and the 8-seed ranked output itself stays well-formed
    val rows8 = graft.ops.Graph.betweennessSampled(spark, sf, 8)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows8.nonEmpty)
    val bc8 = rows8.map(_.getAs[Double]("betweenness"))
    assert(bc8.forall(_ > 0.0) &&
      bc8.zip(bc8.tail).forall { case (a, b) => b <= a })
  }

  test("events_rate_wilson: lower bound sits strictly inside (0, rate] " +
      "and shrinks the interval as n grows") {
    val rows = SparkEntry.queries("events_rate_wilson")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n"), r.getAs[Long]("k"))
      val (rate, lb) = (r.getAs[Double]("rate"), r.getAs[Double]("wilson_lb"))
      assert(k <= n && k >= 0)
      // Wilson lb < p-hat whenever k < n; >= 0 always (never the naive
      // negative bound a normal approximation can produce at small k)
      assert(lb >= 0.0 && lb <= rate + 1e-9,
        s"${r.getAs[String]("event_type")}: lb $lb outside [0, $rate]")
    }
  }

  test("dedup_weighted_jaccard: scores in (0,1], canonical pair order, " +
      "and the Σmax identity holds") {
    val rows = SparkEntry.queries("dedup_weighted_jaccard")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b, s"non-canonical pair ($a, $b)")
      val (na, nb, sm) = (r.getAs[Long]("n_tok_a"), r.getAs[Long]("n_tok_b"),
        r.getAs[Long]("shared_mass"))
      assert(sm >= 1 && sm <= math.min(na, nb),
        s"shared mass $sm outside [1, min($na, $nb)]")
      val wj = r.getAs[Double]("weighted_jaccard")
      assert(wj >= 0.4 - 1e-9 && wj <= 1.0)
      // recompute from the identity the plan relies on
      val expect = BigDecimal(sm.toDouble / (na + nb - sm))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(wj - expect) < 1e-9, s"($a,$b): $wj vs $expect")
    }
  }

  test("text_domain_classify: hit counts bounded by tokens and the label " +
      "matches the unrounded ratio cut") {
    val rows = SparkEntry.queries("text_domain_classify")(spark, sf)
      .collect()
    assert(rows.length > 0)
    val labels = rows.map(_.getAs[String]("domain")).distinct.sorted
    assert(labels.forall(Set("general", "technical")), labels.mkString(","))
    assert(labels.length == 2,
      "fixture should split across both labels — threshold degenerate")
    rows.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_hits"))
      assert(h >= 0 && h <= n)
      val cut = h.toDouble / n >= 0.35
      assert((r.getAs[String]("domain") == "technical") == cut)
    }
  }

  test("sql_window_named: one window spec keeps rank and running sum " +
      "consistent (run_value strictly increases down each priority)") {
    val rows = SparkEntry.queries("sql_window_named")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("o_orderpriority")).foreach {
      case (prio, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("rnk"))
        assert(sorted.map(_.getAs[Long]("rnk")).toSeq ==
          (1L to sorted.length.toLong), s"$prio ranks not dense")
        val runs = sorted.map(_.getAs[Double]("run_value"))
        assert(runs.zip(runs.tail).forall { case (x, y) => y > x },
          s"$prio running sum not strictly increasing")
    }
  }

  test("customer_pareto_front: members are mutually non-dominated and " +
      "match a brute-force skyline over the same points") {
    val front = SparkEntry.queries("customer_pareto_front")(spark, sf)
      .collect().map(r => (r.getAs[Long]("custkey"),
        r.getAs[Double]("spend"), r.getAs[Long]("n_orders")))
    assert(front.nonEmpty)
    // brute-force reference over the full point set
    val pts = graft.ops.Tables.t(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(o_totalprice AS DECIMAL(18,2))"))
        .cast("decimal(18,2)").cast("double").as("spend"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[Double]("spend"), r.getAs[Long]("n")))
    def dominated(p: (Long, Double, Long)) = pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    val expect = pts.filterNot(dominated).map(_._1).sorted.toSeq
    assert(front.map(_._1).toSeq == expect,
      s"skyline ${front.map(_._1).toSeq} != brute force $expect")
    front.foreach(p => assert(!dominated(p)))
  }

  test("sample_group_holdout: the three splits partition sources and " +
      "docs exactly (no source straddles train/eval)") {
    val rows = SparkEntry.queries("sample_group_holdout")(spark, sf)
      .collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq ==
      Seq("test", "train", "valid"))
    val docs = graft.ops.Tables.t(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("n_sources")).sum ==
      docs.select("source").distinct().count(),
      "per-split source counts must sum to the distinct-source total — " +
        "a source in two splits double-counts")
  }

  test("sql_values_cte: literal tiers partition the customer table") {
    val rows = SparkEntry.queries("sql_values_cte")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("tier")).sorted.toSeq ==
      Seq("bronze", "gold", "silver"))
    val total = graft.ops.Tables.t(spark, sf, "customer").count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == total,
      "tier ranges must cover every c_acctbal incl. negatives")
  }

  test("events_ab_welch: finite t on a real split and df inside the " +
      "Welch-Satterthwaite bounds") {
    val r = SparkEntry.queries("events_ab_welch")(spark, sf).collect()(0)
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na > 1 && nb > 1, s"degenerate arms: $na / $nb")
    assert(!r.getAs[Double]("t_welch").isNaN)
    val df = r.getAs[Double]("df_welch")
    // min(n)-1 <= df <= n_a+n_b-2 is the textbook Welch df sandwich
    assert(df >= math.min(na, nb) - 1 - 1e-9 && df <= na + nb - 2 + 1e-9,
      s"df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
  }

  test("multimodal_bitrate_audit: classes partition the lake and flag " +
      "exactly the junk-chunk containers") {
    val rows = SparkEntry.queries("multimodal_bitrate_audit")(spark, sf)
      .collect()
    assert(rows.length == 6) // 2 channel x 3 sample-rate classes
    val docs = graft.ops.Tables.t(spark, sf, "documents")
    assert(rows.map(_.getAs[Long]("n_assets")).sum == docs.count())
    assert(rows.map(_.getAs[Long]("n_noncanonical")).sum ==
      docs.filter(col("doc_id") % 5 === 0).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("overhead_bytes") ==
        r.getAs[Long]("total_bytes") - r.getAs[Long]("payload_bytes"))
      val share = r.getAs[Double]("overhead_share")
      assert(share > 0.0 && share < 1.0, r.toString)
    }
  }

  test("tokenizer_unigram_seed: pieces bounded 2..4 chars, score " +
      "algebra holds, rank order strict") {
    val rows = SparkEntry.queries("tokenizer_unigram_seed")(spark, sf)
      .collect().sortBy(_.getAs[Long]("rnk"))
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rnk")).toSeq ==
      (1L to rows.length.toLong))
    rows.foreach { r =>
      val len = r.getAs[Long]("piece_len")
      assert(len >= 2 && len <= 4, r.toString)
      assert(r.getAs[String]("piece").length == len, r.toString)
      assert(r.getAs[Long]("score") == r.getAs[Long]("cnt") * len,
        r.toString)
    }
    val sc = rows.map(_.getAs[Long]("score"))
    assert(sc.zip(sc.tail).forall { case (a, b) => b <= a },
      s"scores not non-increasing: ${sc.toSeq}")
  }

  test("price_elasticity fits one bounded log-log slope per brand") {
    val rows = SparkEntry.queries("price_elasticity")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val brands = rows.map(_.getAs[String]("brand"))
    assert(brands.distinct.length == brands.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") >= 2L) // slope needs two points
      val e = r.getAs[Double]("elasticity")
      // ln(qty) spans ~[0, ln 50]: a log-log slope far outside single
      // digits means the sufficient statistics went wrong, not the data
      assert(!e.isNaN && math.abs(e) < 100.0)
    }
  }

  // collected (type -> values) helper for the two-sample stats tests
  private def eventValues(types: Set[String]): Map[String, Array[Double]] =
    graft.ops.Tables.events(spark, sf)
      .filter(col("event_type").isin(types.toSeq.map(lit): _*))
      .select("event_type", "value").collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("value")) }

  test("stats_ks_test matches a brute-force ECDF sup-gap and the z/p " +
      "formulas over it") {
    val r = SparkEntry.queries("stats_ks_test")(spark, sf).collect()(0)
    val v = eventValues(Set("click", "view"))
    val (a, b) = (v("click").sorted, v("view").sorted)
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    // brute-force sup gap over the pooled support
    val support = (a ++ b).distinct.sorted
    def ecdf(xs: Array[Double], t: Double) =
      xs.count(_ <= t).toDouble / xs.length
    val d = support.map(t => math.abs(ecdf(a, t) - ecdf(b, t))).max
    assert(math.abs(r.getAs[Double]("d_stat") - d) < 1e-6,
      s"D ${r.getAs[Double]("d_stat")} != brute force $d")
    val m = a.length.toDouble * b.length / (a.length + b.length)
    assert(math.abs(r.getAs[Double]("ks_z") - d * math.sqrt(m)) < 1e-5)
    val p = r.getAs[Double]("p_approx")
    assert(p > 0.0 && p <= 1.0)
  }

  test("stats_mann_whitney matches brute-force pair counting " +
      "(U = #(a>b) + ties/2)") {
    val r = SparkEntry.queries("stats_mann_whitney")(spark, sf)
      .collect()(0)
    val v = eventValues(Set("purchase", "click"))
    val (a, b) = (v("purchase"), v("click"))
    assert(r.getAs[Long]("n_a") == a.length.toLong)
    assert(r.getAs[Long]("n_b") == b.length.toLong)
    var wins = 0L; var ties = 0L
    for (x <- a; y <- b) {
      if (x > y) wins += 1 else if (x == y) ties += 1
    }
    val u = wins + ties / 2.0
    assert(math.abs(r.getAs[Double]("u_stat") - u) < 1e-6,
      s"U ${r.getAs[Double]("u_stat")} != brute force $u")
    val z = r.getAs[Double]("z_score")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("stats_chi2_independence matches a brute-force contingency " +
      "computation") {
    val r = SparkEntry.queries("stats_chi2_independence")(spark, sf)
      .collect()(0)
    val cells = graft.ops.Tables.t(spark, sf, "documents")
      .groupBy("lang", "source").count().collect()
      .map(x => ((x.getAs[String]("lang"), x.getAs[String]("source")),
        x.getAs[Long]("count"))).toMap
    val n = cells.values.sum
    val rows = cells.keys.map(_._1).toSet
    val cols = cells.keys.map(_._2).toSet
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_rows") == rows.size.toLong)
    assert(r.getAs[Long]("n_cols") == cols.size.toLong)
    assert(r.getAs[Long]("dof") ==
      (rows.size - 1).toLong * (cols.size - 1))
    val rt = cells.groupBy(_._1._1).view.mapValues(_.values.sum)
    val ct = cells.groupBy(_._1._2).view.mapValues(_.values.sum)
    // same per-cell 1e-6 rounding as the query (exact-decimal sum)
    val chi2 = BigDecimal(cells.map { case ((l, s), o) =>
      val e = rt(l).toDouble * ct(s) / n
      BigDecimal((o - e) * (o - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toString).toDouble
    assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-9,
      s"chi2 ${r.getAs[Double]("chi2")} != brute force $chi2")
  }

  test("feature_target_encoding: every encode sits between the brand " +
      "mean and the global prior (m-estimate shrinkage)") {
    val rows = SparkEntry.queries("feature_target_encoding")(spark, sf)
      .collect()
    assert(rows.length > 1)
    val gn = rows.map(_.getAs[Long]("n")).sum
    val prior = rows.map(r =>
      r.getAs[Double]("raw_mean") * r.getAs[Long]("n")).sum / gn
    rows.foreach { r =>
      val (lo, hi) = {
        val m = r.getAs[Double]("raw_mean")
        (math.min(m, prior), math.max(m, prior))
      }
      val e = r.getAs[Double]("enc")
      assert(e >= lo - 1e-4 && e <= hi + 1e-4,
        s"${r.getAs[String]("p_brand")}: enc $e outside [$lo, $hi]")
    }
  }

  test("feature_target_crossfit: fold counts partition each brand and " +
      "the OOF encode excludes the fold's own rows") {
    val rows = SparkEntry.queries("feature_target_crossfit")(spark, sf)
      .collect()
    val full = SparkEntry.queries("feature_target_encoding")(spark, sf)
      .collect().map(r =>
        r.getAs[String]("p_brand") -> r.getAs[Long]("n")).toMap
    val byBrand = rows.groupBy(_.getAs[String]("p_brand"))
    assert(byBrand.keySet == full.keySet)
    byBrand.foreach { case (brand, fs) =>
      assert(fs.map(_.getAs[Long]("n_fold")).sum == full(brand),
        s"$brand fold sizes don't partition the brand")
      fs.foreach { f =>
        val e = f.getAs[Double]("enc_oof")
        assert(!e.isNaN && e > 0.0 && e < 60.0) // quantity domain [1, 50]
      }
    }
  }

  test("feature_woe_iv: bins partition orders, IV terms are " +
      "non-negative, WOE sign tracks the share ratio") {
    val rows = SparkEntry.queries("feature_woe_iv")(spark, sf).collect()
    val total = rows.map(r =>
      r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg")).sum
    assert(total == graft.ops.Tables.t(spark, sf, "orders").count())
    val tp = rows.map(_.getAs[Long]("n_pos")).sum.toDouble
    val tn = rows.map(_.getAs[Long]("n_neg")).sum.toDouble
    rows.foreach { r =>
      // (ps - ns) and ln(ps/ns) always share sign, so IV terms are >= 0
      assert(r.getAs[Double]("iv_term") >= -1e-9)
      val ps = (r.getAs[Long]("n_pos") + 0.5) / tp
      val ns = (r.getAs[Long]("n_neg") + 0.5) / tn
      assert(r.getAs[Double]("woe").sign == math.log(ps / ns).sign ||
        math.abs(r.getAs[Double]("woe")) < 1e-6)
    }
  }

  test("privacy audits match brute-force QI class censuses") {
    val docs = graft.ops.Tables.t(spark, sf, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source"),
        math.floor(r.getAs[Long]("n_chars") / 1000.0).toLong))
    val kCls = docs.groupBy(d => (d._1, d._2, d._3)).values
      .map(_.length.toLong).toSeq
    val k = SparkEntry.queries("privacy_k_anonymity")(spark, sf)
      .collect()(0)
    assert(k.getAs[Long]("n_classes") == kCls.size.toLong)
    assert(k.getAs[Long]("min_k") == kCls.min)
    assert(k.getAs[Long]("n_violating") == kCls.count(_ < 5).toLong)
    assert(k.getAs[Long]("docs_at_risk") == kCls.filter(_ < 5).sum)
    val lCls = docs.groupBy(d => (d._2, d._3)).values
      .map(c => (c.map(_._1).distinct.length.toLong, c.length.toLong))
      .toSeq
    val l = SparkEntry.queries("privacy_l_diversity")(spark, sf)
      .collect()(0)
    assert(l.getAs[Long]("n_classes") == lCls.size.toLong)
    assert(l.getAs[Long]("min_l") == lCls.map(_._1).min)
    assert(l.getAs[Long]("n_low_diversity") ==
      lCls.count(_._1 < 2).toLong)
    assert(l.getAs[Long]("docs_exposed") ==
      lCls.filter(_._1 < 2).map(_._2).sum)
  }

  test("rank_ndcg_eval: NDCG in (0, 1], hit counts bounded by list " +
      "size, and top-10 hits >= sim_recall_eval's top-5 hits per query") {
    val ndcg = SparkEntry.queries("rank_ndcg_eval")(spark, sf).collect()
      .map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("n_rel_hit"), r.getAs[Double]("dcg"),
          r.getAs[Double]("ndcg"))).toMap
    assert(ndcg.size == 10)
    ndcg.values.foreach { case (hits, dcg, nd) =>
      assert(hits >= 0L && hits <= 5L)
      assert(dcg >= 0.0)
      assert(nd >= 0.0 && nd <= 1.0 + 1e-9, s"ndcg $nd outside [0,1]")
    }
    // ann hits against exact TOP-10 can only exceed hits against TOP-5
    val recall = SparkEntry.queries("sim_recall_eval")(spark, sf)
      .collect().map(r => r.getAs[Long]("q_id") ->
        r.getAs[Long]("n_hit")).toMap
    recall.foreach { case (q, hit5) =>
      assert(ndcg(q)._1 >= hit5,
        s"q$q: top-10 relevance hits ${ndcg(q)._1} < top-5 hits $hit5")
    }
  }

  test("stats_anova_oneway matches a brute-force F computation") {
    val r = SparkEntry.queries("stats_anova_oneway")(spark, sf).collect()(0)
    val groups = graft.ops.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getAs[String]("event_type")).values
      .map(_.map(x => BigDecimal(x.getAs[Double]("value"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toSeq
    val n = groups.map(_.length).sum
    val grand = groups.flatten.sum / n
    val ssb = groups.map(g =>
      g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = groups.map(g => {
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }).sum
    assert(r.getAs[Long]("k") == groups.size.toLong)
    assert(r.getAs[Long]("n") == n.toLong)
    assert(math.abs(r.getAs[Double]("ss_between") - ssb) / ssb < 1e-6)
    assert(math.abs(r.getAs[Double]("ss_within") - ssw) / ssw < 1e-6)
    val f = (ssb / (groups.size - 1)) / (ssw / (n - groups.size))
    assert(math.abs(r.getAs[Double]("f_stat") - f) < 1e-3)
  }

  test("stats_cohens_d matches a brute-force pooled effect size and " +
      "Hedges' g shrinks it toward zero") {
    val r = SparkEntry.queries("stats_cohens_d")(spark, sf).collect()(0)
    val v = eventValues(Set("purchase", "click"))
      .map { case (k, xs) => k -> xs.map(x => BigDecimal(x)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val (a, b) = (v("purchase"), v("click"))
    def mean(x: Array[Double]) = x.sum / x.length
    def varS(x: Array[Double]) = {
      val m = mean(x); x.map(e => (e - m) * (e - m)).sum / (x.length - 1)
    }
    val sp = math.sqrt(((a.length - 1) * varS(a) + (b.length - 1) * varS(b))
      / (a.length + b.length - 2))
    val d = (mean(b) - mean(a)) / sp
    assert(math.abs(r.getAs[Double]("cohens_d") - d) < 1e-4,
      s"d ${r.getAs[Double]("cohens_d")} != brute force $d")
    val g = r.getAs[Double]("hedges_g")
    assert(math.abs(g) <= math.abs(r.getAs[Double]("cohens_d")) + 1e-9,
      "the Hedges correction must shrink |d|")
  }

  test("stats_spearman_days matches a brute-force rank correlation") {
    val r = SparkEntry.queries("stats_spearman_days")(spark, sf)
      .collect()(0)
    val daily = graft.ops.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("x"),
        sum(expr("CAST(round(value, 2) AS DECIMAL(18,2))"))
          .cast("double").as("y"))
      .collect().map(x => (x.getAs[Double]("x"), x.getAs[Double]("y")))
    assert(r.getAs[Long]("n_days") == daily.length.toLong)
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val sorted = xs.sorted
      xs.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        (lo + hi) / 2.0
      }
    }
    val rx = avgRanks(daily.map(_._1))
    val ry = avgRanks(daily.map(_._2))
    val n = daily.length
    val (sx, sy) = (rx.sum, ry.sum)
    val sxy = rx.zip(ry).map { case (p, q) => p * q }.sum
    val sxx = rx.map(p => p * p).sum
    val syy = ry.map(q => q * q).sum
    val rho = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getAs[Double]("spearman_rho") - rho) < 1e-5,
      s"rho ${r.getAs[Double]("spearman_rho")} != brute force $rho")
  }

  test("feature_robust_scaler quantiles bracket correctly per type " +
      "(q1 <= median <= q3, lower-quantile convention)") {
    val rows = SparkEntry.queries("feature_robust_scaler")(spark, sf)
      .collect()
    assert(rows.length == 5)
    val byType = graft.ops.Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (k, rs) => k -> rs.map(_.getAs[Double]("value")).sorted }
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t)
      val n = xs.length
      // lower-quantile: smallest v with den*cum >= num*tot + num
      def lq(num: Int, den: Int): Double = {
        var cum = 0
        for (v <- xs.distinct) {
          cum += xs.count(_ == v)
          if (den.toLong * cum >= num.toLong * n + num) return v
        }
        xs.last
      }
      assert(r.getAs[Double]("q1") == lq(1, 4), s"$t q1")
      assert(r.getAs[Double]("median") == lq(1, 2), s"$t median")
      assert(r.getAs[Double]("q3") == lq(3, 4), s"$t q3")
      assert(r.getAs[Double]("iqr") >= 0.0)
    }
  }

  test("agg_listagg equals the sorted collect_list formulation") {
    val rows = SparkEntry.queries("agg_listagg")(spark, sf).collect()
      .map(r => r.getAs[String]("p_brand") -> r.getAs[String]("types"))
      .toMap
    val direct = graft.ops.Tables.t(spark, sf, "part")
      .filter(col("p_partkey") <= 200)
      .select("p_brand", "p_type", "p_partkey").collect()
      .groupBy(_.getAs[String]("p_brand"))
      .map { case (b, rs) => b -> rs
        .map(r => (r.getAs[String]("p_type"), r.getAs[Long]("p_partkey")))
        .sortBy(identity).map(_._1).mkString(",") }
    assert(rows == direct)
  }

  test("fn_lambda matches driver-side lambda evaluation") {
    val rows = SparkEntry.queries("fn_lambda")(spark, sf).collect()
    assert(rows.length == 200)
    val vecs = graft.ops.Tables.t(spark, sf, "embeddings")
      .filter(col("vec_id") < 200).select("vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.foreach { r =>
      val v = vecs(r.getAs[Long]("vec_id"))
      val dot = v.zip(v.reverse).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      assert(math.abs(r.getAs[Double]("dot_rev")
        - BigDecimal(dot).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble) < 1e-9)
      assert(r.getAs[Long]("n_pos") == v.count(_ > 0).toLong)
      assert(r.getAs[Boolean]("bounded") == v.forall(x => math.abs(x) <= 1.0))
      assert(r.getAs[Boolean]("has_big") == v.exists(_ > 0.5))
    }
  }

  test("sql_pivot matches the filter-aggregation formulation") {
    val rows = SparkEntry.queries("sql_pivot")(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("val_f"), r.getAs[Double]("val_o"),
          r.getAs[Double]("val_p"))).toMap
    val direct = graft.ops.Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F",
          expr("CAST(o_totalprice AS DECIMAL(18,2))")))
          .cast("double").as("f"),
        sum(when(col("o_orderstatus") === "O",
          expr("CAST(o_totalprice AS DECIMAL(18,2))")))
          .cast("double").as("o"),
        sum(when(col("o_orderstatus") === "P",
          expr("CAST(o_totalprice AS DECIMAL(18,2))")))
          .cast("double").as("p"))
      .collect().map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Double]("f"), r.getAs[Double]("o"),
          r.getAs[Double]("p"))).toMap
    assert(rows == direct)
  }

  test("blocked dedup BlockCap: a planted hot block (every doc first-" +
      "token 'the') routes through the MinHash pre-filter — near-dups " +
      "survive, quadratic-only pairs drop, small blocks keep all-pairs") {
    import spark.implicits._
    // one 58-doc (w1='the', nb=6) block — 3.6x over BlockCap=16 — plus a
    // 4-doc 'rare' control block. All docs have exactly 30 tokens so the
    // hot block cannot fragment across nb buckets.
    def doc(first: String, toks: Seq[String]) = (first +: toks).mkString(" ")
    val common = (1 to 29).map(i => s"c$i")
    // planted NEAR-DUP pair (shingle jac = 27/29 >= 0.8): survives the cap
    val nd1 = doc("the", common)
    val nd2 = doc("the", common.dropRight(1) :+ "zz")
    // PERMUTATION pair: identical token multiset (weighted jaccard 1.0)
    // but shuffled order -> shingle jac << 0.8. The quadratic rule would
    // emit it; the cap rule must drop it (its block is oversized and the
    // near-dup index never flags it).
    val perm = (1 to 29).map(i => s"p$i")
    val pm1 = doc("the", perm)
    val pm2 = doc("the", perm.reverse)
    // HEAD-TWIN pair: identical 80-char head (editdist 0) but disjoint
    // tails -> shingle jac << 0.8. Same story: dropped in the hot block.
    val longPfx = (1 to 6).map(i => s"prefixword$i$i$i$i")
    val ht1 = doc("the", longPfx ++ (1 to 23).map(i => s"q$i"))
    val ht2 = doc("the", longPfx ++ (1 to 23).map(i => s"r$i"))
    // small-block CONTROL: the same head-twin shape under first token
    // 'rare' (block of 4 <= 16) must still pair all-ways and emit.
    val ct1 = doc("rare", longPfx ++ (1 to 23).map(i => s"s$i"))
    val ct2 = doc("rare", longPfx ++ (1 to 23).map(i => s"t$i"))
    val cp1 = doc("rare", (1 to 29).map(i => s"v$i"))
    val cp2 = doc("rare", (1 to 29).map(i => s"v$i").reverse)
    val filler = (0 until 52).map(i =>
      doc("the", (1 to 29).map(j => s"u${i}x$j")))
    val all = Seq(nd1, nd2, pm1, pm2, ht1, ht2, ct1, ct2, cp1, cp2) ++
      filler
    val docs = all.zipWithIndex
      .map { case (tx, i) => (i.toLong, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = "target/tmp/hotblock_cap"
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val ed = SparkEntry.queries("dedup_editdist_blocked")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot block: only the near-dup pair (0,1); the head-twin (4,5) is
    // gone. control block: head-twin (6,7) still present.
    assert(ed.contains((0L, 1L)), ed.mkString(", "))
    assert(!ed.contains((4L, 5L)), ed.mkString(", "))
    assert(ed.contains((6L, 7L)), ed.mkString(", "))

    val wj = SparkEntry.queries("dedup_weighted_jaccard")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot block: near-dup (0,1) survives (wj = 29/31), permutation (2,3)
    // is gone despite wj = 1.0. control block: permutation (8,9) stays.
    assert(wj.contains((0L, 1L)), wj.mkString(", "))
    assert(!wj.contains((2L, 3L)), wj.mkString(", "))
    assert(wj.contains((8L, 9L)), wj.mkString(", "))
    // near-linearity, as a pair-count bound: the 58-doc hot block admits
    // only index-flagged candidates, so the emitted pair set stays O(near-
    // dups) — nowhere near the 58*57/2 = 1653 pairs the quadratic form
    // would have scored.
    assert(ed.size + wj.size <= 12, s"ed=$ed wj=$wj")
  }
}

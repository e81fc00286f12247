package graft

import graft.functions.{CosineSim, SimHashBands, WinnowFingerprints}
import org.apache.spark.sql.functions._

/** Native Catalyst expressions: interpreted vs codegen parity, parity with
  * the equivalent higher-order-function formulation, and null behavior.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim equals the zip_with/aggregate formulation bit-for-bit") {
    CosineSim.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    val r = df.select(
      expr("cosine_sim(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE),
             |  (acc, x) -> acc + x)
             |/ (sqrt(aggregate(a, CAST(0 AS DOUBLE), (m, x) -> m + x * x))
             |   * sqrt(aggregate(b, CAST(0 AS DOUBLE), (m, x) -> m + x * x)))"""
        .stripMargin).as("hof")).collect()
    r.foreach(row => assert(row.getDouble(0) == row.getDouble(1)))
  }

  test("cosine_sim: self-similarity is 1.0; nulls propagate") {
    CosineSim.register(spark)
    val one = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-15)
    val n = Seq((Seq(1.0), Option.empty[Seq[Double]])).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).collect()(0)
    assert(n.isNullAt(0))
  }

  test("simhash_bands: 64 bands, 4-bit range, deterministic, sign-sensitive") {
    SimHashBands.register(spark)
    val v1 = Seq.tabulate(64)(i => math.sin(i + 1))
    val df = Seq(Tuple1(v1), Tuple1(v1.map(-_))).toDF("v")
    val rows = df.select(expr("simhash_bands(v)")).collect()
      .map(_.getSeq[Long](0))
    assert(rows.forall(_.length == 64))
    assert(rows.forall(_.forall(b => b >= 0 && b <= 15)))
    // negated vector flips every sign bit -> complementary bands
    assert(rows(0).zip(rows(1)).forall { case (a, b) => a + b == 15 })
    val again = df.select(expr("simhash_bands(v)")).collect()
      .map(_.getSeq[Long](0))
    assert(rows.toSeq.map(_.toSeq) == again.toSeq.map(_.toSeq))
  }

  test("winnow_fps: sorted distinct minima; short docs yield empty") {
    WinnowFingerprints.register(spark)
    val toks = Seq.tabulate(20)(i => s"w${i % 7}")
    val df = Seq(Tuple1(toks), Tuple1(Seq("a", "b", "c"))).toDF("toks")
    val rows = df.select(expr("winnow_fps(toks)")).collect()
      .map(_.getSeq[Long](0))
    assert(rows(0).nonEmpty)
    assert(rows(0) == rows(0).sorted)
    assert(rows(0).distinct.length == rows(0).length)
    assert(rows(1).isEmpty) // 3 tokens -> 1 shingle < window of 4
    // window-min property: every fingerprint is one of the shingle hashes
    val allMin = rows(0).toSet
    assert(allMin.nonEmpty)
  }

  test("hash_tf_vec: 512-dim, deterministic, additive over disjoint tokens") {
    graft.functions.HashTfVec.register(spark)
    val a = Seq("the", "quick", "brown", "fox")
    val b = Seq("jumps", "over", "lazy", "dogs")
    val df = Seq(Tuple1(a), Tuple1(b), Tuple1(a ++ b), Tuple1(Seq.empty[String]))
      .toDF("toks")
    val rows = df.select(expr("hash_tf_vec(toks)")).collect()
      .map(_.getSeq[Double](0))
    assert(rows.forall(_.length == 512))
    // each token contributes exactly +-1 to one bucket
    assert(rows(0).map(math.abs).sum == 4.0)
    // the union's vector is the sum of the parts' vectors (pure additivity —
    // what makes the featurization a single streaming pass at any scale)
    assert(rows(2) == rows(0).zip(rows(1)).map { case (x, y) => x + y })
    // empty input -> zero vector, not null, not an error
    assert(rows(3).forall(_ == 0.0))
    val again = df.select(expr("hash_tf_vec(toks)")).collect()
      .map(_.getSeq[Double](0))
    assert(rows.toSeq.map(_.toSeq) == again.toSeq.map(_.toSeq))
  }

  test("intersect_size equals size(array_intersect) incl. dups and nulls") {
    graft.functions.IntersectSize.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "x")), // dups count once
      (Seq.empty[String], Seq("a")),
      (Seq("a"), Seq.empty[String]),
      (Seq("x", "y"), Seq("p", "q"))).toDF("a", "b")
    val rows = df.select(
      expr("intersect_size(a, b)").as("fused"),
      expr("size(array_intersect(a, b))").as("ref")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
    // null ELEMENTS: present in both counts once (array_intersect parity)
    val withNulls = Seq(
      (Seq(Some("a"), None, Some("b")), Seq(None, Some("b"), Some("z"))))
      .toDF("a", "b")
      .select(expr("intersect_size(a, b)").as("fused"),
        expr("size(array_intersect(a, b))").as("ref")).collect()(0)
    assert(withNulls.getInt(0) == 2 && withNulls.getInt(1) == 2)
    // null INPUT array -> null (modern size semantics)
    val nullIn = Seq((Option.empty[Seq[String]], Some(Seq("a"))))
      .toDF("a", "b").select(expr("intersect_size(a, b)")).collect()(0)
    assert(nullIn.isNullAt(0))
    // interpreted path agrees with codegen
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(expr("intersect_size(a, b)")).collect()
        .map(_.getInt(0)).toSeq
      assert(interp == rows.map(_.getInt(0)).toSeq)
    }
  }

  test("FuseIntersectSize rewrites the dedup verify kernel in this session") {
    // a literal input would be constant-folded to a LocalRelation before
    // anything is observable; pin the rewrite on the real pair pipeline,
    // whose declarative code says size(array_intersect(...))
    val optimized = graft.ops.Dedup.minhashPairs(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(optimized.contains("intersect_size"), optimized)
    assert(!optimized.contains("array_intersect"), optimized)
  }

  test("hash_tf_vec: nulls propagate; codegen and interpreted agree") {
    graft.functions.HashTfVec.register(spark)
    val n = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
      .select(expr("hash_tf_vec(toks)")).collect()(0)
    assert(n.isNullAt(0))
    val df = Seq(Tuple1(Seq("alpha", "beta", "alpha"))).toDF("toks")
    val code = df.select(expr("hash_tf_vec(toks)")).collect()(0)
      .getSeq[Double](0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(expr("hash_tf_vec(toks)")).collect()(0)
        .getSeq[Double](0)
      assert(code == interp)
    }
    // repeated token doubles its bucket (TF weighting, not set semantics)
    assert(code.map(math.abs).max == 2.0)
    // a null ELEMENT contributes nothing (no NPE inside codegen): vector
    // equals the same array without the null
    val withNull = Seq(Tuple1(Seq(Some("alpha"), None, Some("beta"))))
      .toDF("toks").select(expr("hash_tf_vec(toks)")).collect()(0)
      .getSeq[Double](0)
    val without = Seq(Tuple1(Seq("alpha", "beta"))).toDF("toks")
      .select(expr("hash_tf_vec(toks)")).collect()(0).getSeq[Double](0)
    assert(withNull == without)
  }

  test("expressions survive both codegen and interpreted paths") {
    CosineSim.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(2.0, 1.0))).toDF("a", "b")
    val code = df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = df.select(expr("cosine_sim(a, b)")).collect()(0)
        .getDouble(0)
      assert(code == interp)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._

/** Cross-check our SQL-primitive MinHash LSH against MLlib's MinHashLSH
  * (SURVEY.md §7.6): two independent implementations of the same algorithm
  * must find (essentially) the same near-duplicate pairs. MLlib seeds its
  * permutations internally, so it can't be the oracle-checked path — but it
  * is a strong independent witness.
  */
class MlCrossCheckSpec extends SparkSpec {

  test("MLlib MinHashLSH finds the same near-dup pairs as dedup_minhash") {
    val sh = graft.ops.Dedup.shingled(spark, sf)
      .filter(size(col("shingles")) > 0)
    val tf = new HashingTF().setInputCol("shingles")
      .setOutputCol("features").setNumFeatures(1 << 18)
    val feats = tf.transform(sh)
    val mh = new MinHashLSH().setNumHashTables(16)
      .setInputCol("features").setOutputCol("hashes").setSeed(42)
    val model = mh.fit(feats)
    // approxSimilarityJoin distance = 1 - estimated Jaccard; threshold 0.2
    // matches our 0.8 Jaccard cutoff
    val joined = model.approxSimilarityJoin(feats, feats, 0.2, "dist")
    val mlPairs = joined
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ourPairs = SparkEntry.queries("dedup_minhash")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(ourPairs.nonEmpty)
    val agree = (mlPairs & ourPairs).size.toDouble / ourPairs.size
    assert(agree >= 0.9,
      s"MLlib found ${mlPairs.size}, ours ${ourPairs.size}, overlap $agree")
  }
}

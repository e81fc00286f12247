package graft.plans

import graft.functions.{BloomContains, CharikarSimHash, CosineSim, HashTfVec, IntersectSize, MinHashBands, SimHashBands, WinnowFingerprints}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point: activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the engine's native functions AND the
  * [[FuseIntersectSize]] optimizer rule into every session built with the
  * extension — the supported extension wiring for cluster deployments
  * (query builders also self-register functions defensively for ad-hoc
  * sessions; the optimizer rewrite is extension-only, so declarative
  * queries still run correctly — just unfused — without it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_sim"), CosineSim.info,
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("simhash_bands"), SimHashBands.info,
      (args: Seq[Expression]) => SimHashBands(args.head)))
    ext.injectFunction((FunctionIdentifier("winnow_fps"),
      WinnowFingerprints.info,
      (args: Seq[Expression]) => WinnowFingerprints(args.head)))
    ext.injectFunction((FunctionIdentifier("charikar_simhash"),
      CharikarSimHash.info,
      (args: Seq[Expression]) => CharikarSimHash(args.head)))
    ext.injectFunction((FunctionIdentifier("minhash_bands"),
      MinHashBands.info,
      (args: Seq[Expression]) => MinHashBands(args.head)))
    ext.injectFunction((FunctionIdentifier("hash_tf_vec"), HashTfVec.info,
      (args: Seq[Expression]) => HashTfVec(args.head)))
    ext.injectFunction((FunctionIdentifier("bloom_contains"), BloomContains.info,
      (args: Seq[Expression]) => BloomContains(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("intersect_size"),
      IntersectSize.info,
      (args: Seq[Expression]) => IntersectSize(args(0), args(1))))
    ext.injectOptimizerRule(_ => FuseIntersectSize)
    ext.injectOptimizerRule(_ => RewriteWindowTopK)
    ext.injectOptimizerRule(_ => RewriteBinnedRangeJoin)
    ext.injectOptimizerRule(_ => RewriteIntervalJoin)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    // r14: stop driver-side tree walks at the cache boundary (see
    // MemoScan.scala) — bounds AQE/event plan-string generation over
    // memo-composed plans without touching what executes
    ext.injectQueryStagePrepRule(s => HideCachedPlanTrees(s))
  }
}

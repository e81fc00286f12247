package graft.plans

import graft.functions.{CharikarSimHash, CosineSim, MinHashBands, SimHashBands, WinnowFingerprints}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.Expression

/** SparkSessionExtensions entry point: activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Injects the engine's native functions into every session built with the
  * extension — the supported extension wiring for cluster deployments
  * (query builders also self-register defensively for ad-hoc sessions).
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
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashing-trick featurization: a token/shingle array becomes a fixed
  * 512-dim signed term-frequency vector. Each element's 64-bit FNV-1a hash
  * picks a bucket (top 9 bits) and a sign (next bit); the signed counts are
  * the classic feature-hashing embedding whose inner products approximate
  * set-overlap similarity (signs make cross-terms cancel in expectation).
  *
  * This is the vectorizer feeding `sim_pairs_lsh`: deterministic (no RNG,
  * no vocabulary broadcast), one pass per document, and a pure projection —
  * the shape that scales to any corpus size. Stays inside whole-stage
  * codegen via the static `compute` call.
  */
case class HashTfVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_tf_vec expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "hash_tf_vec"

  override def nullSafeEval(input: Any): Any =
    HashTfVec.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashTfVec.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashTfVec =
    copy(child = newChild)
}

object HashTfVec {
  val Dim = 512
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def compute(toks: ArrayData): ArrayData = {
    val v = new Array[Double](Dim)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      // the declared input type allows null elements (array<string> with
      // containsNull); a null token contributes nothing rather than NPE-ing
      // inside codegen
      if (!toks.isNullAt(t)) {
        val bytes = toks.getUTF8String(t).getBytes
        var h = FnvOffset
        var i = 0
        while (i < bytes.length) {
          h ^= (bytes(i) & 0xffL)
          h *= FnvPrime
          i += 1
        }
        val idx = ((h >>> 55) & 511L).toInt
        v(idx) += (if (((h >>> 54) & 1L) == 1L) 1.0 else -1.0)
      }
      t += 1
    }
    new GenericArrayData(v)
  }

  val info = new ExpressionInfo(classOf[HashTfVec].getName, "hash_tf_vec")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("hash_tf_vec")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => HashTfVec(args.head))
    }
  }
}

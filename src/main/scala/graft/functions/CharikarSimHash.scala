package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Charikar SimHash over a token array: each token's 64-bit FNV-1a hash
  * votes +1/-1 per bit position; the sign of each accumulated bit forms the
  * 64-bit document signature. Near-identical token multisets land within a
  * small Hamming distance — the classic scalable text near-dup sketch
  * (one pass per document, signature joins instead of pair joins).
  */
case class CharikarSimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"charikar_simhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "charikar_simhash"

  override def nullSafeEval(input: Any): Any =
    CharikarSimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CharikarSimHash.compute($c)")

  override protected def withNewChildInternal(
    newChild: Expression): CharikarSimHash = copy(child = newChild)
}

object CharikarSimHash {
  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  def compute(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      val bytes = toks.getUTF8String(t).getBytes
      var h = FnvOffset
      var i = 0
      while (i < bytes.length) {
        h ^= (bytes(i) & 0xffL)
        h *= FnvPrime
        i += 1
      }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  val info = new ExpressionInfo(
    classOf[CharikarSimHash].getName, "charikar_simhash")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("charikar_simhash")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => CharikarSimHash(args.head))
    }
  }
}

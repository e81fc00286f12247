package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity between two
  * `array<double>` columns — the hot kernel of the similarity operators.
  *
  * Versus the `zip_with`+`aggregate` higher-order form this fuses three
  * array traversals (dot, |a|², |b|²) into one loop, allocates no
  * intermediate arrays, and participates in whole-stage codegen via
  * `doGenCode` — a custom Expression being the preferred extension point
  * before UDFs (build brief; SURVEY.md §4.2).
  *
  * Summation order is the sequential left fold (i = 0..n-1), the same order
  * DuckDB's `list_dot_product` uses, so results stay bit-identical to the
  * oracle's `dot/(sqrt(dot_aa)*sqrt(dot_bb))`.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CosineSim.compute($a, $b);")

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Fused dot + norms; mismatched lengths fail fast rather than silently
    * scoring the shared prefix of a corrupt vector.
    */
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ($n vs ${y.numElements()})")
    }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  val info = new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim")

  /** Idempotently register `cosine_sim` in a session's function registry so
    * query builders can use it via `expr("cosine_sim(a, b)")`.
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("cosine_sim")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => CosineSim(args(0), args(1)))
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Raw 64-permutation MinHash signature: shingle array -> the 64 minima the
  * banded LSH key ([[MinHashBands]]) is built from, exposed so the
  * signature-agreement Jaccard ESTIMATOR can be checked against exact
  * Jaccard (`dedup_minhash_estimate`). Same Kirsch-Mitzenmacher permutation
  * family and FNV-1a base hashes as [[MinHashBands]] — the two expressions
  * share one kernel, so the estimator being validated is exactly the one
  * the production band join quantizes. Pure projection, no shuffle.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(
    newChild: Expression): MinHashSig = copy(child = newChild)
}

object MinHashSig {

  def compute(shingles: ArrayData): ArrayData =
    new GenericArrayData(MinHashBands.minima(shingles))

  val info = new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("minhash_sig")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => MinHashSig(args.head))
    }
  }
}

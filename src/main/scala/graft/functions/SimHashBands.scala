package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native SimHash: 256 fixed-seed random hyperplanes -> sign bits -> 64
  * bands of 4 bits, returned as `array<long>` band keys.
  *
  * The plane matrix lives as JVM state in the companion object (fixed seed
  * 42, identical on driver and every executor — no broadcast needed, no
  * 16k-literal expression tree for Catalyst to chew through, which is what
  * made the higher-order-function formulation unusably slow to plan).
  * Codegen emits a call into the companion's `compute` loop, keeping the
  * projection inside whole-stage codegen.
  */
case class SimHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bands expects array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "simhash_bands"

  override def nullSafeEval(input: Any): Any =
    SimHashBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashBands.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBands =
    copy(child = newChild)
}

object SimHashBands {
  val NumBits = 256
  val BandBits = 4
  val NumBands: Int = NumBits / BandBits // 64
  val Dim = 64

  /** Fixed-seed hyperplanes: deterministic across runs and JVMs. */
  lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumBits, Dim)(rnd.nextGaussian())
  }

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    // fail fast: a vector wider than the plane matrix would silently hash
    // only its prefix, degrading the documented LSH recall
    if (n > Dim) {
      throw new IllegalArgumentException(
        s"simhash_bands: vector dim $n exceeds plane dim $Dim")
    }
    val bands = new Array[Long](NumBands)
    var bit = 0
    while (bit < NumBits) {
      val p = planes(bit)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += p(i) * v.getDouble(i)
        i += 1
      }
      val b = bit / BandBits
      bands(b) = bands(b) * 2 + (if (dot >= 0) 1L else 0L)
      bit += 1
    }
    new GenericArrayData(bands)
  }

  val info = new ExpressionInfo(classOf[SimHashBands].getName, "simhash_bands")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("simhash_bands")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => SimHashBands(args.head))
    }
  }
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused MinHash banding: shingle array -> 64 permutation minima -> 16 LSH
  * band keys, in one pass per row.
  *
  * Permutation hashes use the Kirsch-Mitzenmacher construction
  * h_p(x) = h1(x) + p * h2(x) over two FNV-1a base hashes — fixed
  * constants, no RNG, deterministic on every JVM. Versus the
  * explode → groupBy(64 min aggs) formulation this needs NO shuffle to
  * build signatures: the whole sketch is a projection.
  */
case class MinHashBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashBands.compute($c)")

  override protected def withNewChildInternal(
    newChild: Expression): MinHashBands = copy(child = newChild)
}

object MinHashBands {
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands // 4

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  // second base hash: FNV with a different offset basis (splitmix-derived)
  private final val FnvOffset2 = 0x9e3779b97f4a7c15L

  private def fnv(offset: Long, bytes: Array[Byte]): Long = {
    var h = offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** The 64 permutation minima — shared by the banded key below and the
    * raw-signature expression ([[MinHashSig]]) so estimator and band join
    * can never drift onto different permutation families.
    */
  private[functions] def minima(shingles: ArrayData): Array[Long] = {
    val mins = Array.fill(NumPerms)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val bytes = shingles.getUTF8String(i).getBytes
      val h1 = fnv(FnvOffset, bytes)
      val h2 = fnv(FnvOffset2, bytes) | 1L // odd => all perms distinct
      var p = 0
      while (p < NumPerms) {
        val hp = h1 + p * h2
        if (hp < mins(p)) mins(p) = hp
        p += 1
      }
      i += 1
    }
    mins
  }

  def compute(shingles: ArrayData): ArrayData = {
    val mins = minima(shingles)
    // band key = FNV over the 4 minima of the band, offset by band index
    val bands = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      var h = FnvOffset ^ b.toLong
      var r = 0
      while (r < RowsPerBand) {
        val m = mins(b * RowsPerBand + r)
        var k = 0
        while (k < 8) {
          h ^= ((m >>> (k * 8)) & 0xffL)
          h *= FnvPrime
          k += 1
        }
        r += 1
      }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  val info = new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("minhash_bands")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => MinHashBands(args.head))
    }
  }
}

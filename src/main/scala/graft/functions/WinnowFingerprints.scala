package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native winnowing fingerprinter (document fingerprinting for near-dup /
  * provenance pipelines): token array -> rolling 3-gram shingle hashes ->
  * minimum per sliding window of 4 -> distinct minima.
  *
  * One fused loop per row replaces a stack of nested higher-order functions
  * (`transform(sequence)` + `slice` + `array_min`) whose interpreted lambdas
  * made this the slowest query in the bench by 20x. Hashing is FNV-1a 64
  * over the UTF-8 shingle bytes — fixed constants, deterministic everywhere.
  */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fps"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFingerprints.compute($c)")

  override protected def withNewChildInternal(
    newChild: Expression): WinnowFingerprints = copy(child = newChild)
}

object WinnowFingerprints {
  val K = 3 // shingle size (tokens)
  val W = 4 // winnow window (shingles)

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  private def fnv1a(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val nShingles = n - K + 1
    if (nShingles < W) return new GenericArrayData(Array.emptyLongArray)
    // hash each K-token shingle (space-joined, FNV-1a over utf8)
    val hashes = new Array[Long](nShingles)
    var i = 0
    while (i < nShingles) {
      var h = FnvOffset
      var j = 0
      while (j < K) {
        if (j > 0) { h ^= ' '.toLong; h *= FnvPrime }
        h = fnv1a(h, toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    // min per sliding window of W, deduplicated (classic winnowing emit)
    val out = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w <= nShingles - W) {
      var m = hashes(w)
      var j = 1
      while (j < W) {
        if (hashes(w + j) < m) m = hashes(w + j)
        j += 1
      }
      out.add(m)
      w += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  val info = new ExpressionInfo(
    classOf[WinnowFingerprints].getName, "winnow_fps")

  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("winnow_fps")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => WinnowFingerprints(args.head))
    }
  }
}

package graft.functions

import java.io.ByteArrayInputStream
import java.util.Base64

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression `bloom_contains(key, filter_b64)`: membership
  * probe of an integral key against a pre-built, broadcast-sized
  * `org.apache.spark.util.sketch.BloomFilter` carried as a base64 string
  * literal.
  *
  * This is the manual form of Spark's own runtime-filter injection
  * (`InjectRuntimeFilter` plants a `BloomFilterMightContain` probe on the
  * big side of a selective join): the small/filtered side is folded into an
  * O(bytes)-sized sketch once, and the probe prunes fact rows BEFORE the
  * join shuffle, so non-qualifying rows never leave the scan stage. The
  * filter argument must be foldable — the sketch deserializes once per
  * executor (transient lazy), not per row, and the probe participates in
  * whole-stage codegen.
  *
  * False positives are expected (fpp is a build parameter); callers must
  * keep the exact join behind the probe. False negatives cannot occur, so
  * the pruned plan's result equals the unpruned plan's — which is exactly
  * what the `join_bloom` oracle checks.
  */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType, StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bloom_contains expects (bigint|int, foldable string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_contains"

  /** One deserialization per executor-side expression instance — the probe
    * itself is a few hash calls per row on the decoded bitset.
    */
  @transient private lazy val bloom: BloomFilter = {
    val b64 = right.eval(null).asInstanceOf[UTF8String].toString
    BloomFilter.readFrom(new ByteArrayInputStream(Base64.getDecoder.decode(b64)))
  }

  def mightContain(key: Long): Boolean = bloom.mightContainLong(key)

  override def nullSafeEval(key: Any, filterB64: Any): Any =
    mightContain(key.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference this expression instance so codegen reuses the lazily
    // deserialized sketch instead of re-decoding the base64 per row
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $ref.mightContain((long) $key);")
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  val info = new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains")

  /** Idempotently register `bloom_contains` so query builders can use it via
    * `expr("bloom_contains(key, '<b64>')")`.
    */
  def register(spark: SparkSession): Unit = {
    val id = FunctionIdentifier("bloom_contains")
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id)) {
      registry.registerFunction(id, info,
        (args: Seq[Expression]) => BloomContains(args(0), args(1)))
    }
  }

  /** Serialize a built sketch to the base64 literal form the expression
    * consumes.
    */
  def toB64(bloom: BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    Base64.getEncoder.encodeToString(bos.toByteArray)
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: per-key top-k WITHOUT a sort.
  *
  * The declarative formulation — `row_number() over (partition by k order
  * by s) <= K` — plans as Exchange → full Sort of every partition → Window
  * → Filter: the sort costs O(n log n) per key group and materializes
  * every row, only for the filter to discard all but K. This operator
  * keeps a bounded K-row heap per key instead: O(n log K) with K-row
  * memory per key, the same two-phase shape as partial aggregation
  * (pre-heap before the exchange, final heap after), so the shuffle moves
  * at most K rows per (key, input partition) instead of the whole table.
  *
  * The stack demonstrates the full custom-operator wiring the survey's
  * §4 matrix reserves for semantics Spark's operators cannot express
  * efficiently: logical node ([[TopKPerKey]]) → strategy
  * ([[TopKStrategy]]) → physical node ([[TopKPerKeyExec]]), injected via
  * [[GraftExtensions]]. The sort orders must be TOTAL (tie-broken) for
  * the result to be engine-independent — same rule every window query in
  * this repo follows (SURVEY §7.4).
  */
case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey =
    copy(child = c)
}

object TopKPerKey {
  /** DataFrame-level entry: `topK(df, keys, orders, k)` ≡ the row_number
    * window filter, minus the sort. Sort columns use the usual
    * `col(...).desc` / default-ascending Column forms.
    */
  def topK(df: DataFrame, keys: Seq[Column], order: Seq[Column],
      k: Int): DataFrame = {
    def expression(c: Column): Expression =
      org.apache.spark.sql.graftbridge.Bridge.expr(df.sparkSession, c)
    val sortOrders = order.map(expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(df.sparkSession,
      TopKPerKey(keys.map(expression), sortOrders, k,
        df.queryExecution.analyzed))
  }
}

/** Plans [[TopKPerKey]] as partial + final [[TopKPerKeyExec]] — the
  * aggregate-style two-phase split.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap per-key top-k over each partition. `partial = true` runs
  * before the exchange (any distribution) and caps what the shuffle
  * carries; the final instance requires clustering on the keys so each
  * key's survivors meet in one partition.
  *
  * Memory honesty: the heap table holds K rows per DISTINCT KEY in the
  * partition and does not spill — the same residency class as hash
  * aggregation state, and strictly smaller than the sort buffer the
  * window formulation allocates (every row). A deployment with
  * pathological key cardinality per partition sizes partitions exactly
  * as it would for a group-by.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrders = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "best first" comparator from the sort orders; the heap keeps the
      // WORST retained row at its head so one peek decides replacement
      val better = new LazilyGeneratedOrdering(sortOrders, childOutput)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[UnsafeRow](limit + 1,
            better.reverse)
          heaps.put(key.copy(), q)
        }
        if (q.size < limit) q.add(row.copy())
        else if (better.lt(row, q.peek())) {
          q.poll()
          q.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }
}

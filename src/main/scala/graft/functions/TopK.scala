package org.apache.spark.sql.graftx

// Lives under org.apache.spark.sql for the same private[sql] bridges as
// ArrayMath (ExpressionUtils, Dataset.ofRows) plus mapPartitionsInternal.
// Public API is re-exported as graft.functions.TopK.

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension — tier (c) of the custom-op
  * preference order (SURVEY.md §7.3): a custom LogicalPlan + planner
  * Strategy + physical SparkPlan, registered via
  * SparkSessionExtensions.injectPlannerStrategy.
  *
  * TopKPerKey(keys, order, k): the top k rows of every key group under
  * `order` — the "best N per entity" ask every analytics table gets.
  * The built-in way (window rank ≤ k) shuffles and SORTS every row of
  * every group; this operator plans as TWO bounded-heap passes:
  *
  *   partial (map side, no distribution requirement): each input
  *     partition keeps at most k rows per key it sees — shuffle volume
  *     drops from |rows| to ≤ k·|keys|·|partitions|, the same
  *     partial/final contract as HashAggregate;
  *   final (after the key exchange EnsureRequirements inserts for the
  *     ClusteredDistribution requirement): merges the per-partition
  *     survivors with the same bounded heap.
  *
  * `order` must totally order rows within a key (callers append a
  * unique tie-breaker) — then the result set is deterministic and the
  * two-phase split is exact (top-k of a union == top-k of per-part
  * top-k's). Memory is O(k · keys-per-partition) rows, never a full
  * sort buffer. */
case class TopKPerKey(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
  extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    partial: Boolean, child: SparkPlan)
  extends UnaryExecNode {

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val schema = child.output
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = RowOrdering.create(sortOrder, schema)
      // per key, a worst-at-head heap of the k best rows seen so far:
      // a new row replaces the head iff it ranks strictly before it
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), h)
        }
        if (h.size < kLocal) h.add(row.copy())
        else if (ord.compare(row, h.peek()) < 0) { h.poll(); h.add(row.copy()) }
      }
      val out = Iterator.newBuilder[InternalRow]
      heaps.values().forEach(h => h.forEach(r => out += r))
      out.result()
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: one logical TopKPerKey → final(exchange(partial)).
  * The exchange is not built here — the final node's
  * ClusteredDistribution requirement makes EnsureRequirements insert
  * exactly the shuffle the data needs (or none, if the child is
  * already clustered on the keys — e.g. right after a groupBy on the
  * same keys, where the built-in window top-k would shuffle again). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object GraftTopK {
  /** Top k rows per key group under `orderBy` (append a unique
    * tie-breaker for a deterministic result set). Row order within the
    * result is unspecified, like groupBy — add .orderBy for
    * presentation.
    *
    * Column → catalyst resolution goes through the ANALYZER via a
    * sortWithinPartitions probe (keys ++ orderBy as one sort list):
    * Spark 4's Column AST holds internal sort nodes that are not
    * serializable if smuggled into a physical plan directly, while the
    * analyzed Sort yields fully-resolved catalyst SortOrders over the
    * df's own plan. */
  def topKPerKey(df: org.apache.spark.sql.DataFrame, k: Int,
      keys: Seq[Column], orderBy: Seq[Column]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val probe = df.sortWithinPartitions(keys ++ orderBy: _*)
    val sortPlan = probe.queryExecution.analyzed.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s
    }.getOrElse(throw new IllegalStateException(
      "topKPerKey probe did not analyze to a Sort node"))
    val (keyOrders, sortOrders) = sortPlan.order.splitAt(keys.length)
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      TopKPerKey(keyOrders.map(_.child), sortOrders, k, sortPlan.child))
  }
}

package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Grouped top-k as a FIRST-CLASS operator — rung (c) of the extension
  * ladder: custom `LogicalPlan` node + `SparkStrategy` + physical
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]).
  *
  * Why not the built-in composition? `row_number().over(partitionBy(key)
  * .orderBy(o)) <= k` is semantically equivalent but physically SORTS every
  * group in full: exchange + per-partition sort of ALL n rows (O(n log n)
  * and a full materialization) to then discard all but k·|groups| of them.
  * This operator keeps a bounded heap of k rows per key and never sorts the
  * input:
  *  - the PARTIAL exec runs map-side (no distribution requirement): each
  *    input partition reduces to ≤ k rows per locally-seen key — the same
  *    role map-side combine plays for aggregates, cutting the shuffle to
  *    ≤ k·|keys| rows regardless of input size;
  *  - the FINAL exec declares `ClusteredDistribution(keys)`, so Catalyst's
  *    EnsureRequirements inserts the hash exchange; merging partials is the
  *    identical heap pass. Total comparison cost O(n log k), shuffle
  *    O(k·|keys|), memory O(k·|local keys|) per task.
  *
  * Semantics = `row_number` (exactly ≤ k rows per key): give `order` a
  * total tiebreak and the result is deterministic and oracle-replayable.
  * Known limitation (documented, by design): per-task state is an in-memory
  * hash map of bounded heaps — at extreme local key cardinality prefer the
  * window form, which can spill; here k·|keys| is assumed ≪ input, which is
  * the only regime where a dedicated top-k operator beats the sort anyway.
  */
case class GroupedTopKNode(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0 && k <= 10000, s"grouped top-k expects 0 < k <= 10000, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupedTopKNode =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per key; `partial = true` is the map-side
  * pass, `partial = false` the post-exchange merge. Both passes run the
  * same algorithm — grouped top-k is idempotent on its own output. */
case class GroupedTopKExec(keys: Seq[Expression], order: Seq[SortOrder],
                           k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = new LazilyGeneratedOrdering(sortOrder, childOutput)
      // heap head = WORST kept row (reverse ordering), so replacement is O(log k)
      val heaps = mutable.HashMap.empty[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        // probe with the REUSED projection row; copy the key only on first
        // insert — getOrElseUpdate would evaluate .copy() for every row
        val key = keyProj(row)
        var heap = heaps.getOrElse(key, null)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      heaps.valuesIterator.flatMap { heap =>
        val rows = new Array[InternalRow](heap.size)
        var i = rows.length - 1
        while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst-first
        rows.iterator
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupedTopKExec =
    copy(child = newChild)
}

/** Planner rule: one logical node → partial + final physical pair. */
object GroupedTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GroupedTopKNode =>
      val partial = GroupedTopKExec(g.keys, g.order, g.k, partial = true, planLater(g.child))
      GroupedTopKExec(g.keys, g.order, g.k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Public API: `GroupedTopK.topK(df, Seq("region"), Seq("cnt" -> true, "name" -> false), 3)`
  * — order pairs are (column, descending?); include a total tiebreak for
  * deterministic output. */
object GroupedTopK {
  def topK(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
           k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute = plan.output.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    val sortOrders = order.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    DatasetBridge.ofRows(df.sparkSession,
      GroupedTopKNode(keys.map(attr), sortOrders, k, plan))
  }
}

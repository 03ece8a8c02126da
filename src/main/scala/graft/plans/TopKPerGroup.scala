package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftglue.dataFrameOf

/** Top-k-per-group as a CUSTOM whole-operator plan — the case from the
  * design brief where built-ins are semantically sufficient but
  * physically wasteful: the `row_number().over(Window) <= k`
  * formulation shuffles EVERY row to its group's partition and sorts
  * whole groups, while top-k only ever needs k rows per group in
  * flight. This operator keeps a bounded heap per group:
  *
  *   partial pass (pre-shuffle): each input partition reduces to ≤ k
  *     rows per group it has seen — the map-side combine Window can't do;
  *   exchange: hash on the group keys, moving ≤ k·partitions rows per
  *     group instead of all of them;
  *   final pass: same heap logic once more → exactly the first k rows
  *     of each group under the given total order.
  *
  * Wired through the real extension stack: a `LogicalPlan` node, a
  * `SparkStrategy` planning it to two `SparkPlan` nodes (partial +
  * final around an `EnsureRequirements`-inserted exchange), registered
  * via `SparkSessionExtensions.injectPlannerStrategy` or
  * `spark.experimental.extraStrategies`.
  *
  * Memory: one ≤ k-row heap per distinct group per partition — bounded,
  * no sort buffer, no spill needed for realistic k.
  */
case class TopKPerGroupPlan(k: Int, groupExprs: Seq[Expression],
                            sortOrder: Seq[SortOrder], child: LogicalPlan)
    extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(k, groups, order, child) =>
      val partial = TopKPerGroupExec(k, groups, order, partial = true,
        planLater(child))
      TopKPerGroupExec(k, groups, order, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
                            sortOrder: Seq[SortOrder], partial: Boolean,
                            child: SparkPlan)
    extends SparkPlan with UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The final pass demands co-located groups; EnsureRequirements
    * inserts the hash exchange between the partial and final nodes. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val limit = k
    val groups = groupExprs
    val order = sortOrder
    child.execute().mapPartitions { rows =>
      // UnsafeRow keys give value-based equals/hashCode for the map;
      // heap entries stay plain InternalRow — no assumption that the
      // child emits UnsafeRows (LocalTableScan/ColumnarToRow do, but
      // the contract only promises InternalRow)
      val keyProj = UnsafeProjection.create(groups, childOutput)
      // codegen'd comparator; compare(a,b) < 0 ⇔ a ranks strictly
      // before b under the (total) requested order
      val ordering = new LazilyGeneratedOrdering(order, childOutput)
      // max-heap under ranking order: head = worst currently-kept row
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      rows.foreach { row =>
        val heap = heaps.getOrElseUpdate(keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](ordering))
        if (heap.size < limit) {
          heap.enqueue(row.copy())
        } else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Install [[TopKStrategy]] on a running session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** First `k` rows of each group under `orderBy` ((column, ascending)
    * pairs — include a tie-breaker to make the order total, or the
    * result is nondeterministic like any top-k with ties). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute = analyzed.output
      .find(a => spark.sessionState.analyzer.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    dataFrameOf(spark,
      TopKPerGroupPlan(k, groupCols.map(attr), order, analyzed))
  }
}

package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Grouped top-k as a first-class operator: for each distinct value of
  * `groupExprs`, keep the first `k` rows under `orderExprs`.
  *
  * The composable form — `row_number().over(Window.partitionBy(...)
  * .orderBy(...)) <= k` — must SORT every partition's full history before
  * discarding all but k rows. This operator keeps a bounded k-row heap per
  * key per partition instead: O(n log k) time, O(keys·k) memory, no sort
  * buffer, no spill pressure — the per-group analog of what
  * TakeOrderedAndProject does globally, and the difference between sorting
  * 100 TB and heap-scanning it.
  *
  * SPI demonstration (SURVEY.md §7.4 path (c)): logical UnaryNode →
  * planner Strategy → UnaryExecNode with requiredChildDistribution
  * (EnsureRequirements inserts the single hash exchange), registered via
  * graft.GraftExtensions / usable directly through `TopKPerKey.of`.
  */
case class TopKPerKeyNode(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Two-phase execution (the map-side-combine discipline applied to
  * top-k): a PARTIAL node (no distribution requirement) reduces every
  * input partition to ≤ keys·k rows with local heaps, then the FINAL
  * node (ClusteredDistribution ⇒ one hash exchange, inserted by
  * EnsureRequirements) merges the per-partition survivors. Without the
  * partial phase the exchange carries the operator's ENTIRE input and —
  * worse — low-cardinality keys (20 query ids, 16 shards…) collapse
  * onto that many reducer threads: the r9 leg probe measured 10.4s for
  * a 2M-row / 20-key pool selection that the two-phase form does in
  * ~1s. The heap logic is its own combiner, so both phases share one
  * implementation. */
case class TopKPerKeyExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final phase co-locates each key's surviving rows; the partial
    * phase runs wherever its input already is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupLocal = groupExprs
    val orderLocal = orderExprs
    val childOutput = child.output
    val kLocal = k
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(orderLocal, childOutput)
      // max-heap under ord: head is the kept row that sorts LAST
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              ord.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(rowProj(row).copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowProj(row).copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // per-group rows in sort order
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(g, o, k, child) =>
      TopKPerKeyExec(g, o, k, partial = false,
        TopKPerKeyExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Engine-facing entry: top-k rows per key. `orderBy` pairs are
    * (columnName, ascending). Names are resolved directly against the
    * input's analyzed output — Column objects carry lazily-converted
    * ColumnNode expressions that custom logical nodes don't get resolved
    * through, so a name-based API is the robust SPI surface. */
  def of(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val session = df.sparkSession
    // self-register the planner strategy (idempotent); also installable
    // session-wide via graft.GraftExtensions
    if (!session.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      child.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in [${child.output.map(_.name).mkString(", ")}]"))
    val sortOrders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val node = TopKPerKeyNode(keys.map(attr), sortOrders, k, child)
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession], node)
  }
}

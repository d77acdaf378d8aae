package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Native per-group top-k — the second whole-operator Catalyst
  * extension beside [[AsofJoinNode]], for a shape Spark plans
  * suboptimally: `row_number().over(partitionBy(g).orderBy(o)) <= k`
  * shuffles EVERY row to its group's reducer and sorts the whole
  * group, even though all but k rows per group are then discarded.
  * (Spark's own `TakeOrderedAndProject` fixes exactly this for the
  * GLOBAL top-k; there is no grouped equivalent.)
  *
  * This operator plans the aggregation-style two-phase shape:
  *
  *   partial: per input partition, a bounded heap per group retains
  *            at most k rows — O(rows·log k) work, O(groups·k) state,
  *            nothing spills to the shuffle but survivors;
  *   final:   survivors cluster by group (the only exchange, carrying
  *            ≤ k·partitions rows per group instead of the group's
  *            whole row set), sort (group, order) — input already
  *            pruned — and emit rank 1..k per group.
  *
  * At 100 TB the difference is the shuffle: a hot group with 10⁹ rows
  * ships k·partitions rows here vs 10⁹ for the window plan, and the
  * per-group sort disappears into the partial heaps. Like a partial
  * hash aggregate, partial state is ∝ live groups per task; for
  * group-cardinality ≈ row-count inputs the heaps degenerate to a
  * pass-through (every row its own group survivor) and the operator
  * behaves like the plain exchange+sort — same failure mode class as
  * partial aggregation, no worse.
  *
  * Semantics: ties broken by the caller's sort order ONLY — supply a
  * total order (include a tie-break column) for deterministic output,
  * exactly as `row_number` demands. */
case class GroupTopKNode(
    child: LogicalPlan, groupCols: Seq[Attribute],
    order: Seq[SortOrder], k: Int, rankAttr: AttributeReference)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopKNode =
    copy(child = newChild)
}

/** Partial phase: bounded heap per group per input partition. */
case class GroupTopKPartialExec(
    groupCols: Seq[Attribute], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKPartialExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kk = k
    val gc = groupCols
    val ord = order
    val childOut = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gc, childOut)
      val toUnsafe = UnsafeProjection.create(childOut, childOut)
      val rowOrd = RowOrdering.create(ord, childOut)
      // max-heap of the retained rows: head = worst survivor, evicted
      // when a better row arrives with the heap full
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = rowOrd.compare(b, a)
      }
      iter.foreach { row =>
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(toUnsafe(row).copy())
        else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap { h =>
        numOutputRows += h.size
        h.iterator().asScala
      }
    }
  }
}

/** Final phase: survivors clustered by group and sorted — emit rank
  * 1..k per group. Input is already pruned to ≤ k·partitions rows per
  * group, so the required sort is survivor-sized, never data-sized. */
case class GroupTopKFinalExec(
    groupCols: Seq[Attribute], order: Seq[SortOrder], k: Int,
    rankAttr: AttributeReference, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupCols) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(groupCols.map(SortOrder(_, Ascending)) ++ order)

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKFinalExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val kk = k
    val gc = groupCols
    val childOut = child.output
    val out = output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(gc, childOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(gc.map(_.dataType))
      val resultProj = UnsafeProjection.create(out, childOut :+ rankAttr)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      var curKey: UnsafeRow = null
      var rank = 0L
      iter.flatMap { row =>
        val key = keyProj(row)
        if (curKey == null || keyOrd.compare(curKey, key) != 0) {
          curKey = key.copy(); rank = 0L
        }
        rank += 1
        if (rank <= kk) {
          numOutputRows += 1
          rankRow.setLong(0, rank)
          Some(resultProj(joined(row, rankRow)))
        } else None
      }
    }
  }
}

/** Planner strategy for [[GroupTopKNode]] — partial under final, like
  * a two-phase aggregate; EnsureRequirements inserts the one
  * clustered exchange between them. */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopKNode(child, gc, order, k, rank) =>
      GroupTopKFinalExec(gc, order, k, rank,
        GroupTopKPartialExec(gc, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API over [[GroupTopKNode]]. */
object GroupTopK {

  def register(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraStrategies.contains(GroupTopKStrategy))
      e.extraStrategies = e.extraStrategies :+ GroupTopKStrategy
  }

  /** Top `k` rows per group under `orderBy` (column name → descending?)
    * with a 1-based `rankName` column appended. Supply a total order
    * for deterministic results. */
  def topK(df: DataFrame, groupCols: Seq[String],
           orderBy: Seq[(String, Boolean)], k: Int,
           rankName: String = "rk"): DataFrame = {
    require(k > 0, "k must be positive")
    val spark = df.sparkSession
    register(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      sys.error(s"no column $n"))
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    GraftPlanBridge.ofRows(spark,
      GroupTopKNode(plan, groupCols.map(attr), order, k, rank))
  }
}

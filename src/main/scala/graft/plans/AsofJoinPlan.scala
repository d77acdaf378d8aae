package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.functions.col

/** Native backward as-of join — the whole-operator Catalyst extension
  * (`LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions`) for the one temporal-join shape Spark has
  * no physical operator for.
  *
  * The reference engine has no temporal joins at all (SURVEY §2.3:
  * unification equi-joins plus `less`/`greater` post-filters); as-of is
  * part of the large-scale-pipeline extension surface. The existing
  * composed implementation ([[graft.operators.AsofJoin]]) expresses it
  * as union + window `last(ignoreNulls)` — correct and one shuffle, but
  * the union materializes every left row widened with null right
  * columns AND every right row widened with null left columns, and the
  * window runs running-state logic over the merged timeline.
  *
  * This operator is the plan a temporal database would pick: shuffle
  * each side by the join key (two narrow shuffles instead of one wide
  * union shuffle), sort by (key, ts), then a single streaming merge per
  * partition — each partition pair is scanned exactly once, O(|L|+|R|),
  * holding ONE candidate right row at a time. No widened rows, no
  * window state, and the left side streams through untouched.
  *
  * Semantics match [[graft.operators.AsofJoin.backward]] exactly:
  * left-outer; the matched right row is the last one with
  * `r.ts <= l.ts` per key (ties on (key, ts) resolved to the largest
  * `tie` value when given); null keys group together (window
  * `partitionBy` convention, not SQL-join convention); null timestamps
  * sort first, i.e. behave as "earliest".
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute], rightTie: Option[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Physical sort-merge as-of join. Declares the same child requirements
  * a SortMergeJoin would — `ClusteredDistribution` on each side's keys
  * (EnsureRequirements co-partitions them) plus per-side sort orders
  * (key, ts[, tie]) — then merges each co-partition pair in one pass. */
case class AsofJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute], rightTie: Option[Attribute],
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTs, Ascending) +: rightTie.map(SortOrder(_, Ascending)).toSeq))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTs; val rt = rightTs
    val rv = rightVals
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyProjL = UnsafeProjection.create(lk, lOut)
      val keyProjR = UnsafeProjection.create(rk, rOut)
      val tsProjL = UnsafeProjection.create(Seq(lt), lOut)
      val tsProjR = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val valsProj = UnsafeProjection.create(rv, rOut)
      val nullRight = new GenericInternalRow(rv.size)
      val joined = new JoinedRow
      // bind against NULLABLE right attrs: unmatched left rows emit a
      // null row for the right side even when the source column was
      // non-nullable (BoundReference takes nullability from this schema)
      val resultProj =
        UnsafeProjection.create(out, lOut ++ rv.map(_.withNullability(true)))

      new Iterator[InternalRow] {
        // the current unconsumed right row; copied because sorted
        // iterators reuse their UnsafeRow buffer across next() calls
        private var rNext: InternalRow = _
        private var rNextKey: UnsafeRow = _
        private def advanceR(): Unit =
          if (rIter.hasNext) {
            rNext = rIter.next().copy()
            rNextKey = keyProjR(rNext).copy()
          } else { rNext = null; rNextKey = null }
        advanceR()

        // latest right row (per current key) with ts <= current left ts;
        // left rows arrive in ts order, so it stays valid until the key
        // changes — the backward-as-of candidate needs O(1) state
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = keyProjL(l)
          if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
            cand = null; candKey = null
          }
          var scanning = rNext != null
          while (scanning) {
            val c = keyOrd.compare(rNextKey, lKey)
            if (c < 0) advanceR()
            else if (c == 0 && tsOrd.compare(tsProjR(rNext), tsProjL(l)) <= 0) {
              cand = rNext; candKey = rNextKey; advanceR()
            } else scanning = false
            if (rNext == null) scanning = false
          }
          numOutputRows += 1
          resultProj(joined(l, if (cand != null) valsProj(cand) else nullRight))
        }
      }
    }
  }
}

/** Planner strategy mapping the logical as-of node to its exec.
  * Injected via [[GraftExtensions]] (`spark.sql.extensions`) or
  * programmatically by [[NativeAsof.register]]. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, rv, tie) =>
      AsofJoinExec(lk, rk, lt, rt, rv, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires every graft
  * planner extension into a session at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => GraftStrategy)
    ext.injectPlannerStrategy(_ => GroupTopKStrategy)
  }
}

/** DataFrame-level API over [[AsofJoinNode]]. Key/timestamp columns are
  * resolved by name on both sides (same-name convention, matching
  * [[graft.operators.AsofJoin.backward]]). */
object NativeAsof {

  /** Idempotently add [[GraftStrategy]] to a session that was not built
    * with `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def register(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraStrategies.contains(GraftStrategy))
      e.extraStrategies = e.extraStrategies :+ GraftStrategy
  }

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightCols: Seq[String],
               rightTie: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    require(!left.columns.exists(rightCols.contains),
      "rightCols must not collide with left columns")
    // Alias the right side's columns to fresh names: a self-join (both
    // sides derived from one source) would otherwise carry duplicate
    // expression ids into the node's output. Aliases mint new ids.
    val rUsed = (keys ++ Seq(rightTs) ++ rightTie.toSeq ++ rightCols).distinct
    val r2 = right.select(rUsed.map(c => col(c).as("__r_" + c)): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def la(n: String): Attribute = lPlan.output.find(_.name == n).getOrElse(
      sys.error(s"left side has no column $n"))
    def ra(n: String): Attribute = rPlan.output.find(_.name == "__r_" + n).get
    require(la(leftTs).dataType == ra(rightTs).dataType,
      s"as-of timestamp types differ: ${la(leftTs).dataType} vs ${ra(rightTs).dataType}")
    keys.foreach(k => require(la(k).dataType == ra(k).dataType,
      s"as-of key $k types differ"))
    val node = AsofJoinNode(lPlan, rPlan, keys.map(la), keys.map(ra),
      la(leftTs), ra(rightTs), rightCols.map(ra), rightTie.map(ra))
    GraftPlanBridge.ofRows(spark, node)
      .select(left.columns.map(col) ++
        rightCols.map(c => col("__r_" + c).as(c)): _*)
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** The as-of join as a first-class Catalyst operator — the whole-operator
  * extension path (custom LogicalPlan → SparkStrategy → SparkPlan): Spark
  * has no native as-of join, and expressing one declaratively costs either
  * a range join (quadratic fallback) or a union + windowed
  * last-ignoring-nulls (graft's previous plan shape), which materializes
  * BOTH inputs through one sort and drags O(columns) window state through
  * every row. This node instead asks the planner for exactly what the
  * algorithm needs — both sides hash-clustered on the join key and sorted
  * by (key, time) — and then streams a per-partition two-pointer merge in
  * O(1) memory, the same way SortMergeJoinExec consumes its requirements.
  * EnsureRequirements plans the shuffles/sorts (AQE-managed), so at scale
  * the operator inherits every exchange optimization for free.
  *
  * Semantics (BTrDB users' "value as of t" idiom, reference
  * qtree/qtree.go:31-33 nearest-backward generalized to a join): for each
  * left row, the right value at the greatest rightTime <= leftTime within
  * the same key; ties at equal rightTime resolve to the LARGEST value
  * (last-write-wins, matching the engine-wide dedup rule); `toleranceUs`
  * nulls matches staler than the bound.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                    leftTime: Attribute, rightTime: Attribute, rightValue: Attribute,
                    toleranceUs: Option[Long], asofOut: AttributeReference)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofOut
  override def producedAttributes: AttributeSet = AttributeSet(asofOut)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical streaming-merge as-of join. Children arrive co-partitioned on
  * the key and sorted by (key, time[, value]) — declared via
  * requiredChildDistribution/Ordering, planned by EnsureRequirements —
  * so each partition is one forward pass over both sides with a single
  * remembered (key, time, value): no buffering, no window state, no spill.
  */
case class AsofMergeJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
                             leftTime: Attribute, rightTime: Attribute,
                             rightValue: Attribute, toleranceUs: Option[Long],
                             asofOut: AttributeReference,
                             left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofOut

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime :+ rightValue).map(SortOrder(_, Ascending)))

  // one-to-one on the left input: its clustering survives
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rValue = rightValue
    val tol = toleranceUs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val ltBound = BindReferences.bindReference[Expression](lTime, lOut)
      val rtBound = BindReferences.bindReference[Expression](rTime, rOut)
      val rvBound = BindReferences.bindReference[Expression](rValue, rOut)
      val result = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val valRow = new GenericInternalRow(1)

      new Iterator[InternalRow] {
        // the right cursor: key copy + extracted (time, value) — the row
        // object itself is reused by the source iterator and never stored
        private var rValid = false
        private var rKey: UnsafeRow = _
        private var rT = 0L
        private var rV: Any = _
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            rKey = rKeyProj(r).copy()
            rT = rtBound.eval(r).asInstanceOf[Long]
            rV = rvBound.eval(r)
            rValid = true
          } else rValid = false
        advanceRight()

        // last right row at/behind the left cursor within its key
        private var lastKey: UnsafeRow = _
        private var lastT = 0L
        private var lastV: Any = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = ltBound.eval(l).asInstanceOf[Long]
          var scanning = true
          while (scanning && rValid) {
            val c = keyOrd.compare(rKey, lk)
            if (c < 0) advanceRight()
            else if (c == 0 && rT <= lt) {
              lastKey = rKey; lastT = rT; lastV = rV
              advanceRight()
            } else scanning = false
          }
          val fresh = lastKey != null && keyOrd.compare(lastKey, lk) == 0 &&
            lastV != null && tol.forall(lt - lastT <= _)
          if (fresh) valRow.update(0, lastV) else valRow.setNullAt(0)
          result(joined(l, valRow))
        }
      }
    }
  }
}

/** Planner strategy translating the logical AsofJoin — injected via
  * GraftExtensions.injectPlannerStrategy.
  */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, rv, tol, out) =>
      AsofMergeJoinExec(lk, rk, lt, rt, rv, tol, out, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY.md §7.4): for every left row, attach the
  * LATEST right row with the same `by` keys and `rightTime <= leftTime`
  * (backward as-of — the time-series "latest prior observation" join
  * that plain equi-joins can't express).
  *
  * This is the (c)-tier operator from the build rules: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `graft.GraftExtensions` (`injectPlannerStrategy`). The physical form
  * is a single-pass sort-merge: both sides hash-partitioned on the `by`
  * keys (`ClusteredDistribution`, so EnsureRequirements co-partitions
  * them and AQE can still re-plan the exchanges) and sorted by
  * (by, time); each partition is then merged with one forward scan per
  * side — no window materialization of the union (the
  * `q_asof_join`-style window rewrite shuffles left+right TOGETHER and
  * carries every left row through the window state), no per-row probe.
  * At 100 TB the right side streams; only the single last-match row per
  * key is buffered.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftTime: Expression,
    rightTime: Expression,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    toleranceUs: Option[Long] = None) extends BinaryNode {

  /** Right `by` columns are redundant with the left ones in the output
    * (equi-matched), and every kept right column turns nullable (a left
    * row may precede all right rows for its key). */
  override def output: Seq[Attribute] =
    left.output ++ AsOfJoin.keptRight(right.output, rightBy).map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  def keptRight(rightOutput: Seq[Attribute], rightBy: Seq[Expression]): Seq[Attribute] =
    rightOutput.filterNot(a => rightBy.exists(_.semanticEquals(a)))
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lt, rt, lb, rb, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lt, rt, lb, rb, tol) :: Nil
    case _ => Nil
  }
}

/** Sort-merge backward as-of join.
  *
  * Child requirements do the heavy lifting declaratively: Spark inserts
  * the hash exchanges (co-partitioned on the `by` keys) and the
  * per-partition sorts; `doExecute` is then a linear merge. Per left
  * row, the right scan advances past every right row at-or-before the
  * left timestamp, remembering the latest same-key one — each right row
  * is visited exactly once per partition.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftTime: Expression,
    rightTime: Expression,
    leftBy: Seq[Expression],
    rightBy: Seq[Expression],
    toleranceUs: Option[Long] = None) extends SparkPlan {

  private def keptRight: Seq[Attribute] = AsOfJoin.keptRight(right.output, rightBy)

  override def output: Seq[Attribute] =
    left.output ++ keptRight.map(_.withNullability(true))

  override def children: Seq[SparkPlan] = Seq(left, right)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftBy), ClusteredDistribution(rightBy))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftTime).map(SortOrder(_, Ascending)),
    (rightBy :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftBy :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftBy.map(_.dataType)
    val timeType = leftTime.dataType
    toleranceUs.foreach { _ =>
      require(timeType == org.apache.spark.sql.types.LongType ||
          timeType == org.apache.spark.sql.types.TimestampType,
        s"as-of tolerance requires long/timestamp time columns, got ${timeType.catalogString}")
    }
    val tol = toleranceUs
    val kept = keptRight
    val outAttrs = output
    val lOut = left.output
    val rOut = right.output
    val lTimeE = leftTime
    val rTimeE = rightTime
    val lByE = leftBy
    val rByE = rightBy
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lByE, lOut)
      val rKey = UnsafeProjection.create(rByE, rOut)
      val lTime = UnsafeProjection.create(Seq(lTimeE), lOut)
      val rTime = UnsafeProjection.create(Seq(rTimeE), rOut)
      val rEmit = UnsafeProjection.create(kept, rOut)
      // bind against NULLABLE kept attrs: BoundReference takes its
      // nullability from this input list, and unmatched left rows carry a
      // null-filled right side — binding non-nullable would read nulls as 0
      val result = UnsafeProjection.create(outAttrs, lOut ++ kept.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(kept.length)

      new Iterator[InternalRow] {
        // the buffered right head must be a copy: Spark reuses row buffers
        private var rHead: InternalRow = _
        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next().copy() else null
        advanceRight()
        // latest right row (kept-column projection) for lastKey
        private var lastKey: UnsafeRow = _
        private var lastMatch: UnsafeRow = _
        private var lastMatchTime: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey(l)
          // SQL equi-join / pandas merge_asof null semantics: a null by
          // key or null time never matches anything. The natural ordering
          // treats null==null as equal and sorts nulls lowest, so without
          // these guards null-keyed rows would silently pair up and a
          // null time would read as 0 under tolerance.
          val lNull = lk.anyNull || lTime(l).isNullAt(0)
          var cmp = if (rHead == null) 1 else keyOrd.compare(rKey(rHead), lk)
          while (rHead != null &&
              (cmp < 0 || (cmp == 0 && timeOrd.compare(rTime(rHead), lTime(l)) <= 0))) {
            if (cmp == 0 && !rKey(rHead).anyNull && !rTime(rHead).isNullAt(0)) {
              lastKey = rKey(rHead).copy()
              lastMatch = rEmit(rHead).copy()
              if (tol.isDefined) lastMatchTime = rTime(rHead).getLong(0)
            }
            advanceRight()
            cmp = if (rHead == null) 1 else keyOrd.compare(rKey(rHead), lk)
          }
          val matched = !lNull && lastKey != null && keyOrd.compare(lastKey, lk) == 0 &&
            tol.forall(t => lTime(l).getLong(0) - lastMatchTime <= t)
          result(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): AsOfJoinExec =
    copy(left = newChildren(0), right = newChildren(1))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Native as-of join — the whole-operator Catalyst extension path
  * (logical node → strategy → physical exec, registered through
  * [[graft.GraftExtensions]]).
  *
  * Semantics (backward, inclusive, left outer): for every left row, the
  * right row with the greatest `rightTime <= leftTime` among rows whose
  * keys equal the left keys (null-safe equality — callers with SQL-null
  * key semantics filter nulls first); unmatched left rows keep nulls on
  * the right. This is DuckDB's `ASOF LEFT JOIN` (`data/asof` semantics,
  * verified against its native implementation by the `q_asof_native`
  * oracle).
  *
  * Why an exec and not the window composition ([[graft.ops.AsOfJoin]]):
  * the composed form unions both inputs into ONE sorted stream, so the
  * right table's payload columns ride through the union padded with
  * nulls and every output column costs a `last(_, ignoreNulls)` window
  * expression per column. The native exec keeps the sides separate —
  * each side is hash-partitioned on its own keys and sorted by
  * (keys, time), then a single O(n+m) streaming merge per partition
  * attaches the entire right row at once. Same two shuffles, no padded
  * union, payload-width-independent, and the merge pipeline never
  * materializes a window buffer.
  *
  * Scale posture: distribution = `ClusteredDistribution` per side (the
  * planner co-partitions them exactly as it does for a sort-merge
  * join), ordering = (keys..., time) per side, merge is per-partition
  * streaming with O(1) state (one buffered right row) — at 100 TB this
  * is two hash exchanges + external sorts, the same envelope as any
  * equi-join on the key, with no per-key quadratic risk.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] → [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` so `spark.sessionState.planner` picks it up
  * before the fallback strategies see the (otherwise unplannable) node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of times must be epoch-µs BIGINTs (the engine's time convention)")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val rBuf = rIter.buffered

      new Iterator[InternalRow] {
        // Last right row (copied — sort iterators reuse row objects)
        // matching the current key with time <= the current left time,
        // and the key it belongs to. O(1) state per partition.
        private var curMatch: InternalRow = _
        private var curKey: InternalRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lKeyProj(lRow)
          if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
            curMatch = null
            curKey = lk.copy()
          }
          // Right rows with key < current left key can never match a
          // later (sorted, larger) left key: drop them.
          while (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) < 0)
            rBuf.next()
          val lt = lTimeProj(lRow)
          if (!lt.isNullAt(0)) {
            val ltv = lt.getLong(0)
            var advancing = true
            while (advancing && rBuf.hasNext &&
                keyOrd.compare(rKeyProj(rBuf.head), lk) == 0) {
              val rt = rTimeProj(rBuf.head)
              if (rt.isNullAt(0)) rBuf.next() // null time never matches
              else if (rt.getLong(0) <= ltv) curMatch = rBuf.next().copy()
              else advancing = false
            }
          }
          // Null left time: no time is <= null — emit unmatched, but a
          // retained same-key match from an earlier left row must not
          // leak; sorted nulls-first order means curMatch is null here.
          resultProj(joined(lRow,
            if (lt.isNullAt(0) || curMatch == null) nullRight else curMatch))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entrypoint. Key/time columns must resolve against
  * their own side (use `df.col(...)`); when both sides descend from the
  * same scan, alias the right side's columns so attribute ids stay
  * distinct (standard Catalyst self-join hygiene — the analyzer only
  * auto-deduplicates its own join node, not custom ones). */
object AsOfNative {
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[Column], rightKeys: Seq[Column],
           leftTime: Column, rightTime: Column): DataFrame =
    Bridge.ofRows(left.sparkSession, AsOfJoinNode(
      Bridge.analyzed(left), Bridge.analyzed(right),
      leftKeys.map(Bridge.expression), rightKeys.map(Bridge.expression),
      Bridge.expression(leftTime), Bridge.expression(rightTime)))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class operator — preference (c) of the custom-op
  * ladder: LogicalPlan + Strategy + SparkPlan (the relational compose form,
  * `graft.relational.Joins.asOf`, stays as the (a)-level baseline and the
  * oracle cross-check).
  *
  * Semantics: for every left row, append the LATEST right row of the same
  * key with right-ts <= left-ts; left rows with no such match are dropped
  * (inner as-of) or padded with nulls (left-outer as-of). Deterministic
  * tiebreak on equal right-ts: the last row in (key, ts, tiebreak-sorted)
  * right order wins, so callers append tiebreak columns to `rightTs`
  * ordering via `rightSortExtra`.
  *
  * Scale shape: both sides hash-cluster on the key and sort by (key, ts) —
  * the SAME requirements a sort-merge join declares, so EnsureRequirements
  * plans one exchange per side and the merge is a single forward pass with
  * O(1) state (one buffered right row). Compare with the compose form
  * (range join then rank): that materializes every (event, earlier-order)
  * pair before ranking — quadratic in orders-per-customer, which is exactly
  * what breaks at 100 TB.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightSortExtra: Seq[Expression],
    leftOuter: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightSortExtra: Seq[Expression],
    leftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTs +: rightSortExtra)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTsExpr = leftTs
    val rTsExpr = rightTs
    val keyTypes = leftKeys.map(_.dataType)
    val allOut = output
    val outer = leftOuter

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd helpers are per-partition (not serializable)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsExpr), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val isLeftOuter = outer
      val nullRight: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        private var nextRow: InternalRow = _
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var rKey: InternalRow = if (rRow != null) rKeyProj(rRow).copy() else null
        private var rTs: Long = if (rRow != null) rTsProj(rRow).getLong(0) else 0L
        // latest right row (copied) whose (key, ts) qualifies for the
        // current left key group
        private var candidate: InternalRow = _
        private var candidateKey: InternalRow = _

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            rTs = rTsProj(rRow).getLong(0)
          } else { rRow = null; rKey = null }

        private def findNext(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTs = lTsProj(lRow).getLong(0)
            // drop right rows for keys strictly behind the left key
            while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
            // consume qualifying right rows (same key, ts <= left ts);
            // the LAST one wins = latest as-of value
            while (rRow != null && keyOrd.compare(rKey, lKey) == 0 && rTs <= lTs) {
              candidate = rRow.copy()
              candidateKey = rKey
              advanceRight()
            }
            if (candidate != null && keyOrd.compare(candidateKey, lKey) == 0) {
              nextRow = resultProj(joined(lRow, candidate))
            } else if (isLeftOuter) {
              nextRow = resultProj(joined(lRow, nullRight))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) findNext()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) findNext()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, extra, outer) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, extra, outer) :: Nil
    case _ => Nil
  }
}

/** User-facing API. Registers the planner strategy on first use (idempotent,
  * works on any session — no extension config required).
  */
object AsOf {

  def join(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTiebreak: Seq[String] = Seq.empty,
      joinType: String = "inner"): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(s"column not found: $name"))

    val plan = AsOfJoinPlan(
      lp, rp,
      Seq(attr(lp, leftKey)), Seq(attr(rp, rightKey)),
      attr(lp, leftTsCol), attr(rp, rightTsCol),
      rightTiebreak.map(attr(rp, _)),
      leftOuter = joinType.toLowerCase match {
        case "inner" => false
        case "left" | "left_outer" => true
        case other => throw new IllegalArgumentException(s"as-of joinType: $other")
      })
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark, plan)
  }

  /** Expression-level helper for tests. */
  def column(df: DataFrame, name: String): Column = df(name)
}

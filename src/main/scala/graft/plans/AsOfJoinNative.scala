package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical AS-OF join: for every left row, the single right row with the
  * same key and the greatest `rightTime <= leftTime` (ties on time resolved
  * by the greatest `rightTie`) — pandas `merge_asof` as a first-class plan
  * node instead of the union+window encoding in [[graft.ops.AsOf]].
  *
  * Semantics contract (the differential spec pins it): identical to
  * `AsOf.asofJoin` — backward inclusive match, per-key, null-padded right
  * side when no match exists. Null times are a precondition violation
  * (sorted nulls-first would make them match everything).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]], injected via
  * `GraftExtensions.injectPlannerStrategy` (seam (c) of the extension
  * ladder — expression < optimizer rule < whole-operator plan). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Physical AS-OF join: both sides hash-clustered on the key and sorted
  * within partitions by (key, time[, tie]) — EnsureRequirements inserts the
  * exchanges and sorts exactly as for a sort-merge join — then ONE forward
  * merge pass per partition: the right cursor never rewinds, each side is
  * read once, memory held is a single candidate row. The same shape scales
  * to any corpus: shuffle cost identical to an equi-join on the key, no
  * window state, no union column-widening (the [[graft.ops.AsOf]] encoding
  * pays both).
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Expression)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTime, rightTie)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rightKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind against nullability-WIDENED right attrs: bindReference takes
      // nullability from the input side, and the null-pad row must read as
      // nulls even when the right child declares non-nullable columns
      val joiner = UnsafeProjection.create(output,
        lOut ++ rOut.map(_.withNullability(true)))
      val rNulls = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      // one-row lookahead over the right side (copies: Spark reuses row
      // buffers across next() calls)
      var nextRow: InternalRow = null
      var nextKey: InternalRow = null
      var nextTime: InternalRow = null
      def advance(): Unit =
        if (rIter.hasNext) {
          nextRow = rIter.next().copy()
          nextKey = rKeyProj(nextRow).copy()
          nextTime = rTimeProj(nextRow).copy()
        } else nextRow = null
      advance()

      // the current as-of candidate: last right row consumed by the cursor
      var curRow: InternalRow = null
      var curKey: InternalRow = null

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var go = true
        while (go && nextRow != null) {
          val kc = keyOrd.compare(nextKey, lKey)
          if (kc < 0 || (kc == 0 && timeOrd.compare(nextTime, lTime) <= 0)) {
            curRow = nextRow; curKey = nextKey
            advance()
          } else go = false
        }
        // NULL keys never match (round-7 review): RowOrdering compares
        // null == null, but the batch twin's SQL equi-join semantics —
        // which this node pins — null-pad a null-keyed left row instead
        // of enriching it from a null-keyed right row
        val matched = curRow != null && !lKey.anyNull &&
          keyOrd.compare(curKey, lKey) == 0
        joiner(joined(l, if (matched) curRow else rNulls))
      }
    }
  }
}

/** Public API: `AsOfNative.join(events, orders, "user_id", "o_custkey",
  * "ts", "o_orderdate", "o_orderkey")` — columns resolved by name from the
  * analyzed children, the node wrapped back into a DataFrame. */
object AsOfNative {
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTie: String): DataFrame = {
    def attr(df: DataFrame, n: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == n)
        .getOrElse(sys.error(s"asof: no column '$n'"))
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(left.queryExecution.analyzed, right.queryExecution.analyzed,
        Seq(attr(left, leftKey)), Seq(attr(right, rightKey)),
        attr(left, leftTime), attr(right, rightTime), attr(right, rightTie)))
  }
}

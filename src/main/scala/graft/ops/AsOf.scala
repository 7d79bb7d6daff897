package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the most recent right
  * row with `rightTime <= leftTime` for the same key.
  *
  * Spark has no native as-of join; per the custom-operator preference order
  * this is (a) composed from built-ins rather than a new physical operator:
  * union both sides on (key, time), ONE hash-partition-by-key sort-by-time
  * window, and `last(payload, ignoreNulls)` carries the latest right row
  * forward onto each left row. At 100 TB that is a single shuffle of
  * |left|+|right| rows — no per-row range probe, no broadcast of either
  * side, and it inherits AQE skew splitting on the key.
  *
  * Ties: right rows sorting equal in time are ordered by `rightTieBreak`,
  * so the greatest tie-break value wins (deterministic). A right row at
  * exactly `leftTime` matches (<= semantics, right-before-left ordering).
  * Left rows with no preceding right row get a null `__match` — keep or
  * filter per caller (inner vs left semantics).
  */
object AsOf {

  /** NEAREST-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')`): each left row picks the right row minimizing
    * |rightTime − leftTime| for its key. Composed as TWO [[asofJoin]]
    * passes — backward as-is, forward by negating the time axis (the
    * "most recent −rt ≤ −lt" is exactly the earliest rt ≥ lt) — then a
    * narrow per-row pick of the nearer match; still no range probe and no
    * broadcast, two key-shuffles total at any scale. Times must be
    * NUMERIC (epoch micros/days) so distances subtract; `__nearest`
    * carries the matched payload with its time as `__rt`, and `__dist`
    * the absolute distance (callers apply their tolerance as a filter).
    * Ties: equal distance prefers the backward match; within a side,
    * rows at the same time resolve by greatest `rightTieBreak` — all
    * deterministic, all reproducible in ANSI SQL (the oracle ranks by
    * (distance, rightTime, tieBreak DESC)). */
  def asofNearest(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: Column, rightTime: Column,
                  rightTieBreak: Column): DataFrame = {
    val rightAug = right.withColumn("__rt", rightTime)
    val back = asofJoin(left, rightAug, leftKey, rightKey,
        leftTime, col("__rt"), rightTieBreak)
      .withColumnRenamed("__match", "__back")
    val fwd = asofJoin(back, rightAug, leftKey, rightKey,
        -leftTime, -col("__rt"), rightTieBreak)
      .withColumnRenamed("__match", "__fwd")
    fwd
      .withColumn("__nearest",
        when(col("__back").isNull, col("__fwd"))
          .when(col("__fwd").isNull, col("__back"))
          .when(abs(leftTime - col("__fwd.__rt")) <
            abs(leftTime - col("__back.__rt")), col("__fwd"))
          .otherwise(col("__back")))
      .withColumn("__dist", abs(leftTime - col("__nearest.__rt")))
      .drop("__back", "__fwd")
  }

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: Column, rightTime: Column,
               rightTieBreak: Column): DataFrame = {
    val rightPayload = struct(right.columns.map(right(_)).toIndexedSeq: _*)
    val r = right.select(
      right(rightKey).as("__k"), rightTime.as("__t"),
      // the tie-break keeps its OWN type (round-7 review: a blanket
      // cast("long") turned every non-numeric tie-break column into NULL
      // for every right row, silently degrading the documented
      // greatest-tie-break-wins determinism to partition order); the
      // left side's null literal borrows the resolved type below so the
      // union stays well-typed
      lit(0).as("__side"), rightTieBreak.as("__tb"),
      rightPayload.as("__payload"))
    val tbType = r.schema("__tb").dataType
    val l = left.select(
      (Seq(left(leftKey).as("__k"), leftTime.as("__t"),
        lit(1).as("__side"), lit(null).cast(tbType).as("__tb")) ++
        left.columns.map(left(_))): _*)
      .withColumn("__payload", lit(null).cast(right.schema))
    val all = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__tb", "__payload")
  }
}

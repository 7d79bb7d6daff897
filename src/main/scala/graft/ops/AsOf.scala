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

  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: Column, rightTime: Column,
               rightTieBreak: Column): DataFrame = {
    val rightPayload = struct(right.columns.map(right(_)).toIndexedSeq: _*)
    val l = left.select(
      (Seq(left(leftKey).as("__k"), leftTime.as("__t"),
        lit(1).as("__side"), lit(null).cast("long").as("__tb")) ++
        left.columns.map(left(_))): _*)
      .withColumn("__payload", lit(null).cast(right.schema))
    val r = right.select(
      right(rightKey).as("__k"), rightTime.as("__t"),
      lit(0).as("__side"), rightTieBreak.cast("long").as("__tb"),
      rightPayload.as("__payload"))
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

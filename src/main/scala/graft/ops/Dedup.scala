package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-level dedup keeping the latest record per key.
  *
  * Reference: `card_funnel/kafka_s3_to_silver.py:28-30` — global
  * `sort_values('timestamp')` then `drop_duplicates(keys, keep='last')`.
  * Spark-first design: no global sort. One hash-partition shuffle on the
  * keys, per-partition sort, `row_number`; ties broken deterministically by
  * the extra `tieBreak` columns so results are stable across runs/engines.
  * At 100 TB this is the canonical single-shuffle window plan; if the key
  * set is small-per-group, `max_by(struct(...))` aggregation is equivalent
  * (partial aggregation map-side) — exposed as [[latestByAgg]].
  */
object Dedup {

  /** W1 — keep the row with the greatest (orderCol, tieBreak*) per key. */
  def dedupLatest(df: DataFrame, keys: Seq[String], orderCol: Column,
                  tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((orderCol.desc +: tieBreak.map(_.desc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** CDC upsert — MERGE INTO semantics without a table format: a change
    * row replaces the base row with the same key; the latest change (by
    * `tieBreak`) wins within the batch; unmatched changes insert. One
    * union + one keyed window shuffle — the same single-shuffle shape as
    * [[dedupLatest]], so it scales identically. */
  def upsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
             tieBreak: Column): DataFrame = {
    val u = base.withColumn("__src", lit(0))
      .unionByName(changes.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__src").desc, tieBreak.desc)
    u.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
  }

  /** Aggregation-based variant: partial-aggregates map-side (no full sort).
    * Picks the row maximizing (orderCol, tieBreak*). */
  def latestByAgg(df: DataFrame, keys: Seq[String], orderCol: Column,
                  tieBreak: Column*): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct((orderCol +: tieBreak).zipWithIndex
      .map { case (c, i) => c.as(s"__o$i") }: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(col("__row.*"))
  }
}

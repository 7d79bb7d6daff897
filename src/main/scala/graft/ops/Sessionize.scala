package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Typed rows for [[Sessionize.sessionsTyped]] — top-level so Catalyst's
  * generated encoders can reach them. */
case class Ev(user_id: Long, event_id: Long, tsMicros: Long)
case class Session(user_id: Long, session_idx: Long, n_events: Long,
                   startMicros: Long, endMicros: Long)

/** Gap-based sessionization: a new session starts when the gap to the
  * previous event of the same user exceeds `gapMinutes`.
  *
  * Two implementations with identical semantics:
  *  - [[sessionsByWindow]]: declarative lag + cumulative-sum windows — the
  *    Spark-first form (one shuffle on user_id, fully codegen'd).
  *  - [[sessionsTyped]]: a typed `Dataset` `mapGroups` with imperative
  *    per-user state — the pattern that generalizes to
  *    `flatMapGroupsWithState` on a stream when state must outlive a batch.
  *    Kept as the demonstration of genuine per-group imperative logic;
  *    the window form is what production plans should use.
  */
object Sessionize {

  /** Per-session rollup: (user_id, session_idx, n_events, start/end). */
  def sessionsByWindow(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev_ts"))
            > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        Cleanse.tsStr(min(col("ts"))).as("session_start"),
        Cleanse.tsStr(max(col("ts"))).as("session_end"))
  }

  /** Typed per-group imperative sessionization (same output contract). */
  def sessionsTyped(spark: SparkSession, events: DataFrame,
                    gapMinutes: Int): DataFrame = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val ds = events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("tsMicros")).as[Ev]
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e.tsMicros, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[Session]
        var idx = 0L
        var n = 0L
        var start = 0L
        var prev = Long.MinValue
        for (e <- evs) {
          if (prev == Long.MinValue || e.tsMicros - prev > gapMicros) {
            if (n > 0) out += Session(uid, idx, n, start, prev)
            idx += 1; n = 0L; start = e.tsMicros
          }
          n += 1; prev = e.tsMicros
        }
        if (n > 0) out += Session(uid, idx, n, start, prev)
        out.iterator
      }
      .toDF()
      .select(col("user_id"), col("session_idx"), col("n_events"),
        Cleanse.tsStr(timestamp_micros(col("startMicros"))).as("session_start"),
        Cleanse.tsStr(timestamp_micros(col("endMicros"))).as("session_end"))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The gold-layer funnel model: FK joins + per-entity flag aggregation.
  *
  * Reference: the star schema in
  * `card_funnel/sqls/create_customers_table.sql:7-92` (customers ←
  * invitations ← applications ← accounts ← card) whose per-customer boolean/
  * date columns (`opened_flag`, `clicked_flag`, approval dates …) are funnel
  * flags derived from event streams. Here the `events` table plays the event
  * stream and `customer` the customer dimension.
  *
  * Scale design: the event side is the 100 TB fact — it is deduped with ONE
  * hash shuffle (see [[Dedup.dedupLatest]]); the customer dimension is
  * broadcast (`broadcast(dim)`) so the join adds no shuffle; the final
  * aggregation is a partial/final hash agg on a low-cardinality key.
  */
object Funnel {

  /** A4 — per-user funnel flags from raw events. */
  def funnelFlags(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      max(when(col("event_type") === "signup", 1).otherwise(0)).as("has_signup"),
      max(when(col("event_type") === "view", 1).otherwise(0)).as("has_view"),
      max(when(col("event_type") === "click", 1).otherwise(0)).as("has_click"),
      max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"),
      Cleanse.tsStr(min(col("ts"))).as("first_ts"),
      Cleanse.tsStr(max(col("ts"))).as("last_ts"),
      count(lit(1)).as("n_events"))

  /** The flagship end-to-end funnel query (SURVEY.md §7.2): scan → time
    * filter → latest-per-key dedup → broadcast dim join → flag aggregation
    * per market segment → deterministic order. */
  def flagship(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.table(spark, sfDir, "events")
    val customer = Tables.table(spark, sfDir, "customer")
    val recent = Cleanse.filterSince(events, "ts", "2024-01-10")
    val latest = Dedup.dedupLatest(recent, Seq("user_id", "event_type"),
      col("ts"), col("event_id"))
    latest
      .join(broadcast(customer), latest("user_id") === customer("c_custkey"))
      .groupBy(col("c_mktsegment").as("mktsegment"))
      .agg(
        count_distinct(col("user_id")).as("n_users"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        sum(Cleanse.dec2(col("value")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast(org.apache.spark.sql.types.DoubleType).as("sum_value"))
      .orderBy(col("mktsegment"))
  }
}

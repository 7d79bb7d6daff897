package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops._

/** The declared query catalog: one entry per operator in SURVEY.md §2
  * (query names = §2 "Query name" column). Each query is thin glue over the
  * library modules in `graft.ops` and ends with an explicit deterministic
  * ORDER BY; money/float aggregates go through exact decimal arithmetic
  * ([[Cleanse.dec2]]) so the DuckDB oracle hash-matches bit-for-bit.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  private val dec184 = DecimalType(18, 4)

  /** Exact decimal arithmetic, surfaced as double: both engines convert the
    * same exact decimal to the nearest double, so outputs are bit-identical
    * regardless of how the comparing reader materializes decimals. */
  private def decOut(c: org.apache.spark.sql.Column) =
    c.cast(dec184).cast(DoubleType)

  // ── §2.5 Aggregations ────────────────────────────────────────────────

  /** A1 — value_counts: rows per event_type (`kafka_s3_to_silver.py:15`). */
  def aggGroupCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** A2 — mode: most frequent value, deterministic tie-break. */
  def aggMode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(1)
      .select(col("event_type").as("mode_value"))

  /** A4 — per-user funnel flags (gold-layer columns of
    * `create_customers_table.sql:26-29,51-55`). */
  def aggFunnelFlags(spark: SparkSession, dir: String): DataFrame =
    Funnel.funnelFlags(t(spark, dir, "events")).orderBy(col("user_id"))

  // ── §2.6 Sort / dedup / top-k ────────────────────────────────────────

  /** W1 — latest record per (user_id, event_type). */
  def dedupLatest(spark: SparkSession, dir: String): DataFrame =
    Dedup.dedupLatest(t(spark, dir, "events"),
        Seq("user_id", "event_type"), col("ts"), col("event_id"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        Cleanse.tsStr(col("ts")).as("ts_str"), col("value"))
      .orderBy(col("user_id"), col("event_type"))

  /** W2 — global sort (range-partitioned exchange, no driver collect). */
  def sortGlobal(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .orderBy(col("ts"), col("event_id"))
      .select(col("event_id"), Cleanse.tsStr(col("ts")).as("ts_str"))

  /** W3 — top-k: TakeOrderedAndProject, no global sort materialized. */
  def topkLimit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_totalprice"))

  // ── §2.4 Joins ───────────────────────────────────────────────────────

  /** J1 — FK equi-join chain (customer ⋈ orders ⋈ lineitem) + revenue agg.
    * customer is broadcast; orders⋈lineitem shuffles on the FK. */
  def joinFunnelInner(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        decOut(sum(Cleanse.dec2(col("l_extendedprice")) *
          (lit(1) - Cleanse.dec2(col("l_discount"))))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  /** J2 — left-anti: customers with no orders (funnel drop-off). */
  def joinLeftAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  /** J4 — left-semi: customers with at least one big order. */
  def joinLeftSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  // ── §2.3 Filters / projections ───────────────────────────────────────

  /** P7 — watermark-style event-time lower bound. */
  def filterSince(spark: SparkSession, dir: String): DataFrame =
    Cleanse.filterSince(t(spark, dir, "events"), "ts", "2024-01-15")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** P8 — IN-list (`notificationType.isin(relevant_tags)`). */
  def filterIsIn(spark: SparkSession, dir: String): DataFrame =
    Cleanse.filterIsIn(t(spark, dir, "events"), "event_type",
        Seq("purchase", "signup"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** P9 — NOT-IN (`~isin(['INITIAL','DEPRECATED'])`). */
  def filterNotIsIn(spark: SparkSession, dir: String): DataFrame =
    Cleanse.filterNotIsIn(t(spark, dir, "events"), "event_type",
        Seq("error", "view"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))

  /** P3 — null-filter + cast (`userId` str→int of `emails_import.py:22-24`),
    * applied to the JSON `props.k` field. */
  def filterNotNullCast(spark: SparkSession, dir: String): DataFrame = {
    val withK = t(spark, dir, "events")
      .withColumn("k_str", get_json_object(col("props"), "$.k"))
    Cleanse.filterNotNullCast(withK, "k_str", LongType)
      .groupBy(col("event_type"))
      .agg(sum(col("k_str")).as("sum_k"), count(lit(1)).as("cnt"))
      .orderBy(col("event_type"))
  }

  /** P11 — JSON string column → extracted typed field. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy(col("event_id"))

  /** P18 — column-subset projection / drop. */
  def projectDrop(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .drop("o_orderpriority", "o_orderstatus")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        Cleanse.dateStr(col("o_orderdate")).as("o_orderdate_str"))
      .orderBy(col("o_orderkey"))

  // ── §2.7 Set ops ─────────────────────────────────────────────────────

  /** U1 — union-append with schema drift
    * (`all_df.append(df1)` with differing columns). */
  def unionByNameDrift(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val a = o.select(col("o_orderkey"), col("o_totalprice"))
    val b = o.select(col("o_orderkey"), col("o_orderstatus"))
    a.unionByName(b, allowMissingColumns = true)
      .groupBy(pmod(col("o_orderkey"), lit(10)).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_price"),
        count(col("o_orderstatus")).as("n_status"),
        decOut(sum(Cleanse.dec2(col("o_totalprice")))).as("sum_price"))
      .orderBy(col("bucket"))
  }

  // ── §2.1 Scans ───────────────────────────────────────────────────────

  /** S1 — parquet scan with filter+projection pushdown (TPC-H Q1 shape). */
  def scanParquet(spark: SparkSession, dir: String): DataFrame =
    Sources.readParquet(spark, s"$dir/lineitem.parquet")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decOut(sum(Cleanse.dec2(col("l_quantity")))).as("sum_qty"),
        decOut(sum(Cleanse.dec2(col("l_extendedprice")))).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}

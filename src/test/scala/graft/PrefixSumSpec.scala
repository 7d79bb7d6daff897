package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.PrefixSum

/** The two-pass distributed scan must be bit-equal to the naive
  * single/skewed-window forms it replaces, and must spread a 90 %-one-group
  * corpus over every partition instead of serializing the hot group. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docStats = ops.Tables.table(spark, sf, "documents")
    .select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).as("n_tokens"))

  test("grouped cumSum equals the per-group window form") {
    val naive = docStats.withColumn("cum",
      sum(col("n_tokens")).over(Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("doc_id", "lang", "n_tokens", "cum")
    val scan = PrefixSum.cumSum(docStats, Seq("lang"), Seq("doc_id"),
        col("n_tokens"), "cum")
      .select("doc_id", "lang", "n_tokens", "cum")
    assert(scan.exceptAll(naive).isEmpty && naive.exceptAll(scan).isEmpty,
      "two-pass cumsum diverges from the window form")
  }

  test("ungrouped cumSum equals the global window form") {
    val naive = docStats.withColumn("cum",
      sum(col("n_tokens")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("doc_id", "cum")
    val scan = PrefixSum.cumSum(docStats, Nil, Seq("doc_id"),
        col("n_tokens"), "cum")
      .select("doc_id", "cum")
    assert(scan.exceptAll(naive).isEmpty && naive.exceptAll(scan).isEmpty,
      "global two-pass cumsum diverges from the window form")
  }

  test("ntileGlobal equals ntile().over(global window), ties included") {
    // uniq_ratio has heavy ties (4-decimal rounding over short docs), so
    // this exercises the standard's tie-splitting by rank position
    val toks = split(col("text"), " ")
    val stats = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        round(size(array_distinct(toks)).cast("double") /
          size(toks).cast("double"), 4).as("uniq_ratio"))
    val naive = stats.withColumn("decile",
      ntile(10).over(Window.orderBy(col("uniq_ratio"), col("doc_id")))
        .cast("long"))
    val scan = PrefixSum.ntileGlobal(stats, Seq("uniq_ratio", "doc_id"),
      10, "decile")
    val diff = scan.join(naive.withColumnRenamed("decile", "naive_decile"),
        Seq("doc_id", "uniq_ratio"))
      .filter(col("decile") =!= col("naive_decile"))
    assert(diff.isEmpty, s"ntile mismatch: ${diff.count()} rows")
  }

  test("global rank is a dense 1..N permutation") {
    val ranked = PrefixSum.globalRank(docStats, Seq("doc_id"), "r", "n")
    val n = ranked.count()
    val agg = ranked.agg(min(col("r")), max(col("r")),
      count_distinct(col("r")), first(col("n"))).collect()(0)
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n &&
      agg.getLong(2) == n && agg.getLong(3) == n)
  }

  test("the scan stays correct downstream of a shuffle (the case the " +
    "localCheckpoint pins)") {
    // post-shuffle row order is nondeterministic per execution; without the
    // materialized partitioning the window and totals passes could sample
    // different range boundaries and silently mis-rank — this exercises
    // exactly that input shape
    val shuffled = docStats.repartition(5, col("lang"))
    val ranked = PrefixSum.globalRank(shuffled, Seq("doc_id"), "r", "n")
    val n = ranked.count()
    val agg = ranked.agg(min(col("r")), max(col("r")),
      count_distinct(col("r"))).collect()(0)
    assert(agg.getLong(0) == 1L && agg.getLong(1) == n && agg.getLong(2) == n)
    // and ranks follow doc_id order exactly
    val bad = ranked.filter(col("r") =!= col("doc_id") + 1).count()
    assert(bad == 0, s"$bad rows ranked out of doc_id order")
  }

  test("approxNtile agrees with exact deciles away from tie boundaries") {
    val toks = split(col("text"), " ")
    val stats = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        round(size(array_distinct(toks)).cast("double") /
          size(toks).cast("double"), 4).as("uniq_ratio"))
    val exact = PrefixSum.ntileGlobal(stats, Seq("uniq_ratio", "doc_id"),
      10, "decile")
    val approx = PrefixSum.approxNtile(stats, "uniq_ratio", 10, "adec")
    // plan shape: the approximate form never shuffles the data
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"approxNtile must be a narrow map:\n$plan")
    // value-bucketing can't split ties by position, so compare bucket
    // agreement, not equality: the overwhelming majority must agree
    val joined = exact.join(approx, Seq("doc_id", "uniq_ratio"))
    val total = joined.count().toDouble
    val agree = joined.filter(col("decile") === col("adec")).count()
    info(f"approx/exact decile agreement ${agree / total * 100}%.1f%%")
    assert(agree / total >= 0.8,
      f"only ${agree / total * 100}%.1f%% decile agreement")
  }

  test("a 90%-one-language corpus spreads over all partitions (no hot task)") {
    // the shape pack_tokens used to get wrong: a per-lang window gives the
    // dominant language ONE task; the range scan must spread it evenly
    val skewed = docStats.withColumn("lang",
      when(col("doc_id") % 10 < 9, lit("en")).otherwise(col("lang")))
    val scanned = PrefixSum.cumSum(skewed, Seq("lang"), Seq("doc_id"),
      col("n_tokens"), "cum")

    // correctness under skew: equal to the naive window form
    val naive = skewed.withColumn("cum",
      sum(col("n_tokens")).over(Window.partitionBy(col("lang"))
        .orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
      .select("doc_id", "lang", "cum")
    assert(scanned.select("doc_id", "lang", "cum").exceptAll(naive).isEmpty,
      "skewed cumsum diverges from window form")

    // scale shape: rows per range partition stay balanced despite the skew
    // (explicit width: AQE otherwise coalesces the 500-row fixture to one
    // partition, which is right at this size but defeats the measurement)
    val parts = skewed
      .repartitionByRange(4, col("lang"), col("doc_id"))
      .select(spark_partition_id().as("pid"))
      .groupBy("pid").count().select("count").collect().map(_.getLong(0))
    val total = parts.sum.toDouble
    assert(parts.length > 1, "range scan must use multiple partitions")
    assert(parts.max <= total * 0.5,
      s"one partition holds ${parts.max}/${total.toLong} rows — hot task")
  }
}

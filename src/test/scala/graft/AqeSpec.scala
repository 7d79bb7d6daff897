package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive Query Execution is the runtime half of the skew story: the
  * manual salting in [[graft.ops.Skew]] is the explicit fix, AQE's skew-join
  * split is the automatic one. This pins that a skewed sort-merge join is
  * actually split at runtime (skew=true in the final adaptive plan) and
  * stays correct — so the engine can rely on AQE instead of hand-tuning
  * when skew appears in production data. */
class AqeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime and keeps the result exact") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // half the fact rows share one hot key; the dim is too big to broadcast
      val fact = spark.range(200000).select(
        when($"id" % 2 === 0, lit(7L)).otherwise($"id" % 1000).as("k"),
        $"id".as("v"))
      val dim = spark.range(1000).select($"id".as("k"),
        concat(lit("pad-"), $"id").as("w"))
      val joined = fact.join(dim, "k").select("k", "v", "w")
      val rows = joined.collect()
      assert(rows.length == 200000)
      assert(rows.count(_.getLong(0) == 7L) == 100000 + 200)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed join:\n$finalPlan")
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}

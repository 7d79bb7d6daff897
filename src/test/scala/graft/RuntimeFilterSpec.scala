package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime filtering — the two Spark mechanisms that cut scan volume using
  * information only available at execution time. Both are free once plans
  * stay declarative; these tests pin that the engine's shapes actually
  * trigger them (thresholds forced down to fire at test scale).
  *
  * - Dynamic partition pruning: a selective dim filter becomes a partition
  *   filter on the partitioned fact scan — at 100 TB this skips whole
  *   partition directories the static planner cannot.
  * - Runtime bloom-filter join pruning: a selective build side injects a
  *   bloom-filter predicate into the probe-side scan, discarding rows
  *   before the shuffle. */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def withConfs[A](kv: (String, String)*)(body: => A): A = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("dynamic partition pruning reaches the partitioned fact scan") {
    val factPath = ops.TempFiles.dir("dpp_fact_spec")
    ops.Tables.table(spark, sf, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(factPath)
    val dimPath = ops.TempFiles.dir("dpp_dim_spec")
    Seq(("purchase", 1), ("signup", 2), ("view", 3), ("click", 4),
      ("error", 5)).toDF("event_type", "grp")
      .write.mode("overwrite").parquet(dimPath)
    withConfs(
      // force the benefit estimate at test scale; defaults fire at real scale
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10000") {
      val fact = spark.read.parquet(factPath)
      val dim = spark.read.parquet(dimPath).filter($"grp" <= 2)
      val q = fact.join(dim, "event_type").groupBy("grp").count()
      val n = q.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(n.keySet == Set(1, 2) && n.values.forall(_ > 0))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"no dynamic partition pruning in plan:\n${plan.take(2000)}")
    }
  }

  test("runtime bloom-filter pruning is injected into the probe-side scan") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = ops.Tables.table(spark, sf, "lineitem")
      val ords = ops.Tables.table(spark, sf, "orders")
        .filter($"o_totalprice" > 400000)
      val q = li.join(ords, li("l_orderkey") === ords("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val rows = q.collect()
      assert(rows.map(_.getLong(1)).sum > 0)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter in plan:\n${plan.take(2000)}")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate over the plan audit: a change that sneaks a cartesian product or
  * nested-loop join into a declared query fails the build instead of
  * surfacing at 100× the data. */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet scans keep filter and projection pushdown (scan_parquet)") {
    val plan = Queries.scanParquet(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), s"filter not pushed to scan:\n$plan")
    // projection pruning: the wide comment column must not be read
    assert(!plan.contains("l_comment"), "scan reads pruned columns")
  }

  test("only documented queries plan a nested-loop join or global window") {
    val offenders = PlanSweep.sweep(spark, "/root/testdata/sf0.001")
    val errors = offenders.filter(_._2.startsWith("PLAN_ERROR"))
    assert(errors.isEmpty, s"queries failed to plan: $errors")
    val byOp = offenders.flatMap { case (n, ops) => ops.split(",").map((n, _)) }
    val bnlj = byOp.collect { case (n, o) if o != "GlobalWindow" => n }.toSet
    val unexpected = bnlj -- PlanSweep.Allowlist
    assert(unexpected.isEmpty,
      s"undocumented scale-killer plans in: $unexpected " +
        s"(allowlist: ${PlanSweep.Allowlist})")
    // a Window with an empty partition spec funnels every row through ONE
    // task — no declared query may plan one
    val gw = byOp.collect { case (n, "GlobalWindow") => n }.toSet
    assert((gw -- PlanSweep.GlobalWindowAllowlist).isEmpty,
      s"single-task global windows in: $gw")
  }

  test("decontaminate joins the benchmark side as a broadcast, never a shuffle") {
    val plan = Queries.decontaminate(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("hash sampling is a pure pushup-free filter (no pre-sort exchange)") {
    // one range exchange for the final ORDER BY is expected; the sample
    // filter itself must not induce any aggregation or join exchange
    val plan = Queries.sampleHash(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"hash sampling should be filter-only:\n$plan")
  }

  test("bucketed join plans exchange-free on the join key (and reuses the " +
    "session's bucketed tables)") {
    val dir = "/root/testdata/sf0.001"
    Queries.joinBucketed(spark, dir).count() // first call builds the tables
    val plan = Queries.joinBucketed(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$plan")
    assert(!plan.contains("hashpartitioning(o_custkey"),
      s"bucketed join must not re-shuffle the join key:\n$plan")
  }

  test("incremental dedup probes the cached index instead of rescanning") {
    val dir = "/root/testdata/sf0.001"
    Queries.dedupIncremental(spark, dir).count() // warm the session index
    val plan = Queries.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") || plan.contains("TableCacheQueryStage"),
      s"incremental dedup should read the cached pair/index tables:\n$plan")
  }
}

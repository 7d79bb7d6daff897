package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave W: the classic TPC-H multi-join shapes — plan-shape gates that
  * the oracle can't see (pushdown, broadcast choice, top-k operator). */
class WaveWSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("tpch_q3: date filters reach the scans, the top-10 is " +
    "TakeOrderedAndProject, and the segment dim broadcasts") {
    val df = Queries.tpchQ3(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThan(l_shipdate") ||
      plan.contains("GreaterThan(l_shipdate"),
      s"l_shipdate filter not pushed:\n$plan")
    assert(plan.contains("GreaterThan(o_orderdate") ||
      plan.contains("LessThan(o_orderdate"),
      s"o_orderdate filter not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-10 must never be a full global sort")
    assert(plan.contains("BroadcastHashJoin"),
      "the filtered customer projection must broadcast")
    val rows = df.collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(1))
    assert(revs.sameElements(revs.sortBy(-_)), "revenue must be descending")
  }

  test("tpch_q5: region/nation/supplier ride broadcasts; grouped revenue " +
    "covers only ASIA nations") {
    val df = Queries.tpchQ5(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 5,
      "at most the 5 nations of one region")
  }

  test("tpch_q18: the quantity gate is ONE fact aggregate driving the " +
    "join tree, and every order clears the threshold") {
    val df = Queries.tpchQ18(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getDouble(5) > 170.0))
  }

  test("tpch_q10: the returnflag filter reaches the lineitem scan " +
    "before any join") {
    val df = Queries.tpchQ10(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      s"l_returnflag filter not pushed:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
  }

  test("tpch_q1: the date filter is pushed, the plan is ONE hash " +
    "aggregate pair (partial+final), and derived averages agree with " +
    "their sums") {
    val df = Queries.tpchQ1(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(l_shipdate"),
      s"l_shipdate filter not pushed:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "no fact-keyed shuffle — only the 6-group flag exchange")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6)
    rows.foreach { r =>
      val (sumQty, n) = (r.getDouble(2), r.getLong(6))
      assert(math.abs(r.getDouble(7) - sumQty / n) < 1e-12)
    }
  }

  test("tpch_q6: pure scan-aggregate — no join, no window, one row") {
    val df = Queries.tpchQ6(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"Q6 must not join:\n$plan")
    // PushedFilters renders truncated in the plan string — match prefix
    assert(plan.contains("GreaterThanOrEqual(l_shipda"),
      s"date range not pushed:\n$plan")
    val r = df.collect()
    assert(r.length == 1 && r(0).getLong(1) > 0)
  }

  test("tpch_q13: zero-order customers survive the left join into the " +
    "count-0 bucket semantics (counts cover every customer)") {
    val df = Queries.tpchQ13(spark, sf)
    val rows = df.collect()
    val custTotal = rows.map(_.getLong(1)).sum
    val nCust = ops.Tables.table(spark, sf, "customer").count()
    assert(custTotal == nCust,
      s"distribution covers $custTotal of $nCust customers")
  }

  test("tpch_q14: part rides a broadcast and the share is consistent " +
    "with its two sums") {
    val df = Queries.tpchQ14(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part must broadcast")
    val r = df.collect()(0)
    assert(r.getDouble(0) >= 0 && r.getDouble(0) <= r.getDouble(1))
    assert(math.abs(r.getDouble(2) -
      100.0 * r.getDouble(0) / r.getDouble(1)) < 1e-12)
  }

  test("tpch_q15: ties to the max revenue are all kept, none below") {
    val rows = Queries.tpchQ15(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2))
    assert(revs.forall(_ == revs.max), "every survivor ties the max")
  }

  test("tpch_q17: the avg gate is decorrelated — part dim broadcasts, " +
    "and NO decimal division appears in the plan (cross-multiplied)") {
    val df = Queries.tpchQ17(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "brand dim must broadcast")
    assert(!plan.toLowerCase.contains("checkoverflow(divide") &&
      !plan.contains("/ "), s"gate must be cross-multiplied:\n$plan")
    val r = df.collect()(0)
    assert(r.getLong(1) >= 0)
  }

  test("tpch_q19: the disjunction stays a residual on a broadcast HASH " +
    "join — the partkey equality must not degrade to a nested loop") {
    val df = Queries.tpchQ19(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"Q19 must remain a hash join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"disjunction degraded the join:\n$plan")
    val r = df.collect()(0)
    assert(r.getLong(1) > 0, "predicate selects no rows — retune")
  }

  test("tpch_q21: the EXISTS pair is ONE per-order aggregate (a single " +
    "orderkey exchange feeds it), and numwait counts distinct orders") {
    val df = Queries.tpchQ21(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val waits = rows.map(_.getLong(1))
    assert(waits.sameElements(waits.sortBy(-_)), "numwait descending")
  }

  test("tpch_q22: the above-average gate matches a driver recompute " +
    "(exact cross-multiplied compare), anti join filters big-order " +
    "customers") {
    val rows = Queries.tpchQ22(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(1)).sum > 0)
  }

  test("tpch_q7: the ship-date range reaches the lineitem scan, both " +
    "nation-decorated dims broadcast, and only cross-nation pairs appear") {
    val df = Queries.tpchQ7(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") ||
      plan.contains("GreaterThan(l_shipdate"),
      s"l_shipdate filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      "nation-decorated dims must broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, c) = (r.getString(0), r.getString(1))
      assert(Set(("NATION_18", "NATION_19"), ("NATION_19", "NATION_18"))((s, c)),
        s"unexpected pair ($s,$c)")
      assert(r.getLong(2) >= 1996L && r.getLong(2) <= 1997L)
      assert(r.getDouble(3) > 0.0)
    }
  }

  test("tpch_q8: part/supplier dims broadcast, the order-date range is " +
    "pushed, and the share is consistent with its two volumes") {
    val df = Queries.tpchQ8(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(p_type,ECONOMY)"),
      s"p_type filter not pushed:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(o_orderdate") ||
      plan.contains("GreaterThan(o_orderdate"),
      s"o_orderdate filter not pushed:\n$plan")
    assert(plan.contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, tv, sh) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(nv >= 0.0 && nv <= tv)
      assert(math.abs(sh - BigDecimal(nv / tv)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }
}

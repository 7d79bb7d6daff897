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
}

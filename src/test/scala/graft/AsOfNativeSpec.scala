package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfNative

/** The native as-of join ([[graft.plans.AsOfJoinExec]]) must be
  * bit-equivalent to the composed union+window form ([[ops.AsOf]]) — on
  * the real tables, and on randomized tie-heavy fixtures against a
  * driver-side brute force — and must plan as the custom node with
  * sort-merge-join-shaped requirements (two exchanges, two sorts, one
  * merge pass, no window). */
class AsOfNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("native as-of equals the composed union+window form on the real " +
    "tables, including unmatched (null-padded) left rows") {
    val e = ops.Tables.table(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val o = ops.Tables.table(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val native = AsOfNative.join(e, o, "user_id", "o_custkey",
        "ts", "o_orderdate", "o_orderkey")
      .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    val composed = ops.AsOf.asofJoin(e, o, "user_id", "o_custkey",
        col("ts"), col("o_orderdate"), col("o_orderkey"))
      .select(col("event_id"), col("__match.o_orderkey").as("o_orderkey"),
        col("__match.o_totalprice").as("o_totalprice"))
      .orderBy(col("event_id")).collect().map(_.toSeq)
    assert(native.length == composed.length)
    assert(native.toSeq == composed.toSeq)
  }

  test("randomized tie-heavy fixture equals a driver-side brute force") {
    val rnd = new scala.util.Random(20260813)
    // few keys, coarse times → plenty of equal-time ties exercising the
    // tie-break, and keys present on only one side
    val lefts = (1 to 300).map { i =>
      (i.toLong, (rnd.nextInt(6) + 1).toLong, rnd.nextInt(20).toLong)
    } // (lid, key, t)
    val rights = (1 to 200).map { i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong, rnd.nextInt(20).toLong)
    } // (rid, key, t)
    val lDf = lefts.toDF("lid", "k", "t")
    val rDf = rights.toDF("rid", "rk", "rt")
    val got = AsOfNative.join(lDf, rDf, "k", "rk", "t", "rt", "rid")
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    lefts.foreach { case (lid, k, t) =>
      val cands = rights.filter(r => r._2 == k && r._3 <= t)
      val want =
        if (cands.isEmpty) -1L
        else cands.maxBy(r => (r._3, r._1))._1 // greatest time, tie → max id
      assert(got(lid) == want, s"left $lid key $k t $t")
    }
  }

  test("plans as the custom node: AsOfJoinExec with two exchanges, two " +
    "sorts, no window") {
    // AQE's plan string prints current+initial sections (double-counting
    // exchanges); pin the static plan shape
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Queries.joinAsofNative(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      // SparkPlan.nodeName strips the Exec suffix: the node prints AsOfJoin
      assert(plan.contains("AsOfJoin ["), plan.take(2000))
      assert(!plan.contains("Window"),
        "the native form must not fall back to the window encoding")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(shuffles == 2, s"expected both sides key-clustered:\n$plan")
      // partition-local sorts print `, false, 0` (vs the global output sort)
      val sorts = "Sort \\[[^\\]]*\\], false".r.findAllIn(plan).size
      assert(sorts == 2, s"expected both sides partition-sorted:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("the declared query matches its oracle shape on empty-match keys " +
    "(every left key absent on the right yields no row after the filter)") {
    val lDf = Seq((1L, 99L, 5L)).toDF("lid", "k", "t")
    val rDf = Seq((1L, 1L, 1L)).toDF("rid", "rk", "rt")
    val out = AsOfNative.join(lDf, rDf, "k", "rk", "t", "rt", "rid").collect()
    assert(out.length == 1 && out.head.isNullAt(3),
      "unmatched left row must survive null-padded")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RangeJoin

/** The binned range join must be pair-for-pair equal to the theta join it
  * replaces, find each pair exactly once (a point has ONE bin), and plan as
  * a shuffled equi-join — never a nested loop — when nothing broadcasts. */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(
    (1L, 0.0), (2L, 19.99), (3L, 20.0), (4L, 35.5), (5L, 60.0),
    (6L, 99.99), (7L, 100.0), (8L, -5.0), (9L, 250.0)
  ).toDF("pid", "v")

  // overlapping, adjacent, empty (lo > hi), and negative-reaching intervals
  private def intervals = Seq(
    ("a", 0.0, 40.0), ("b", 20.0, 100.0), ("c", 100.0, 200.0),
    ("d", 50.0, 10.0), ("e", -10.0, 5.0)
  ).toDF("iid", "lo", "hi")

  test("binned equals the theta join pair-for-pair, each pair exactly once") {
    for (w <- Seq(7.0, 16.0, 64.0, 1000.0)) {
      val got = RangeJoin.binned(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
      val want = points.join(intervals, $"v" >= $"lo" && $"v" < $"hi")
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(got.sorted.toSeq == want.sorted.toSeq, s"binWidth=$w")
      assert(got.length == got.distinct.length, s"duplicate pairs at binWidth=$w")
    }
  }

  test("half-open semantics: hi excluded, lo included, empty interval empty") {
    val got = RangeJoin.binned(points, "v", intervals, "lo", "hi", 10.0)
      .select("pid", "iid").as[(Long, String)].collect().toSet
    assert(got.contains((1L, "a")))   // v = lo kept
    assert(!got.contains((7L, "b")))  // v = hi dropped
    assert(got.contains((7L, "c")))   // boundary belongs to the next band
    assert(!got.exists(_._2 == "d"))  // lo > hi matches nothing
    assert(got.contains((8L, "e")))   // negative values bin correctly
  }

  test("overlap join equals the theta join on random interval sets, " +
      "each pair exactly once at every bin width") {
    val rnd = new scala.util.Random(7)
    def mkIntervals(n: Int, tag: String) = (0 until n).map { i =>
      val lo = rnd.nextInt(200) - 20
      // mix of empty, short, and bin-spanning intervals incl. exact
      // bin-boundary endpoints
      val span = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => rnd.nextInt(5)
        case 2 => rnd.nextInt(40)
        case _ => (rnd.nextInt(5) + 1) * 16
      }
      (s"$tag$i", lo.toDouble, (lo + span).toDouble)
    }
    val a = mkIntervals(60, "a").toDF("aid", "alo", "ahi")
    val b = mkIntervals(60, "b").toDF("bid", "blo", "bhi")
    val want = a.join(b, $"alo" < $"bhi" && $"blo" < $"ahi")
      .select("aid", "bid").as[(String, String)].collect().sorted.toSeq
    for (w <- Seq(5.0, 16.0, 100.0, 1000.0)) {
      val got = RangeJoin.overlapBinned(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").as[(String, String)].collect()
      assert(got.length == got.distinct.length, s"duplicate pairs at w=$w")
      assert(got.sorted.toSeq == want, s"binWidth=$w")
    }
  }

  test("plans as a shuffled equi-join on the bin key, never a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RangeJoin.binned(points, "v", intervals, "lo", "hi", 16.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested loop leaked:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on __bin:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

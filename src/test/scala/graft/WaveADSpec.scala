package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AD: winsorized robust mean and the Wald–Wolfowitz runs test. */
class WaveADSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("agg_winsorized_mean differentials a naive driver winsorization, " +
    "and the winsorized mean sits inside [lo, hi]") {
    val vals = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = vals.groupBy(_._1).map { case (tp, g) =>
      val sorted = g.map(_._2).sorted
      val n = sorted.length
      val k = n / 10
      val lo = sorted(k)           // (k+1)-th smallest
      val hi = sorted(n - k - 1)   // (n-k)-th smallest
      val wsum = sorted.map(v => math.max(lo, math.min(hi, v))).sum
      tp -> (n.toLong, k.toLong, lo, hi, wsum)
    }
    val got = Queries.aggWinsorizedMean(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, k, lo, hi, wsum) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k &&
        r.getLong(3) == lo && r.getLong(4) == hi && r.getLong(5) == wsum,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)},${r.getLong(4)},${r.getLong(5)}) vs driver " +
          s"($n,$k,$lo,$hi,$wsum)")
      val mean = r.getDouble(6)
      assert(mean >= lo.toDouble / 1.0 - 1e-9 || k == 0)
      assert(mean >= r.getLong(3).toDouble - 1e-9 &&
        mean <= r.getLong(4).toDouble + 1e-9,
        s"winsorized mean $mean outside [$lo,$hi]")
    }
  }

  test("stream_winsorized: the maintained value-grid MV yields the batch " +
    "winsorization exactly") {
    val streamed = streaming.StreamTwins.streamWinsorized(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val batch = Queries.aggWinsorizedMean(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("stream_confusion: the maintained cell MV yields the batch " +
    "confusion matrix exactly, and state stays classes-squared-sized") {
    val streamed = streaming.StreamTwins.streamConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val batch = Queries.evalConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
    // state bound: the final state version holds at most classes² rows
    val tag = ops.TempFiles.tag(sf)
    val root = ops.TempFiles.dir(s"stream_conf_state_$tag")
    val versions = new java.io.File(root).list().filter(_.startsWith("v"))
    assert(versions.nonEmpty)
    val last = spark.read.parquet(
      s"$root/v${versions.map(_.drop(1).toLong).max}")
    assert(last.count() <= 25, "state must stay classes²-sized")
  }

  test("dq_runs_test differentials a naive driver runs count, and " +
    "n_pos + n_neg = n") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val xs = g.sortBy(_._2).map(_._3)
      val signs = xs.sliding(2).collect {
        case Array(a, b) if b != a => if (b > a) 1 else -1
      }.toSeq
      val runs = if (signs.isEmpty) 0L
        else 1L + signs.sliding(2).count {
          case Seq(a, b) => a != b
          case _ => false
        }
      tp -> (signs.length.toLong, signs.count(_ == 1).toLong, runs)
    }
    val got = Queries.dqRunsTest(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, np, runs) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == np && r.getLong(4) == runs,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(4)}) vs driver ($n,$np,$runs)")
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1))
      assert(r.getLong(4) >= 1 && r.getLong(4) <= r.getLong(1))
      assert(!r.getDouble(5).isNaN)
    }
  }
}

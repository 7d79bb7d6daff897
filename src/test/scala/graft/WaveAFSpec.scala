package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AF: Mann–Kendall trend test and hashed A/B assignment SRM. */
class WaveAFSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("trend_mann_kendall differentials a naive driver S/Var recompute, " +
    "and S agrees in sign with the Theil-Sen slope") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val xs = g.sortBy(_._2).map(_._3)
      val n = xs.length.toLong
      val s = (for {
        i <- xs.indices; j <- (i + 1) until xs.length
      } yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
      val tie18 = xs.groupBy(identity).values
        .map(g2 => { val t = g2.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
      tp -> (n, s, n * (n - 1) * (2 * n + 5) - tie18)
    }
    val slopes = Queries.trendTheilsen(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Queries.trendMannKendall(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, s, v18) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == s && r.getLong(3) == v18,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)}) vs driver ($n,$s,$v18)")
      // a clearly-signed S should agree in sign with the Theil-Sen median
      val num = slopes(r.getString(0))
      if (math.abs(s) > n) assert(s.sign.toLong == num.sign.toLong ||
        num == 0, s"${r.getString(0)}: S=$s vs slope num=$num")
    }
  }

  test("stream_phash: the streaming pHash gate equals the batch " +
    "incremental result exactly") {
    val streamed = streaming.StreamTwins.streamPhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val batch = Queries.mmPhashIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("dq_srm: arms tile the user universe, and assignment is " +
    "deterministic (recomputing flips nothing)") {
    val r1 = Queries.dqSrm(spark, sf).collect().head
    val r2 = Queries.dqSrm(spark, sf).collect().head
    assert(r1.getLong(0) == r2.getLong(0) && r1.getLong(1) == r2.getLong(1))
    val users = ops.Tables.table(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(r1.getLong(0) + r1.getLong(1) == users)
    val chi2 = r1.getDouble(2)
    val (na, nb) = (r1.getLong(0).toDouble, r1.getLong(1).toDouble)
    assert(math.abs(chi2 - BigDecimal((na - nb) * (na - nb) / (na + nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}

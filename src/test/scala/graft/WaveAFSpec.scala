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

  test("sink_quarantine routes injected dirty rows to the dead-letter " +
    "sink with their violation flags, and valid rows stay clean") {
    import spark.implicits._
    val base = ops.Tables.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts"), col("value")).limit(10)
    val dirty = Seq(
      (900001L, null.asInstanceOf[java.lang.Long], "view",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "10.00"),
      (900002L, java.lang.Long.valueOf(7L), "teleport",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "10.00"),
      (900003L, java.lang.Long.valueOf(7L), "view",
        java.sql.Timestamp.valueOf("2023-12-31 00:00:00"), "10.00"),
      (900004L, java.lang.Long.valueOf(7L), "view",
        java.sql.Timestamp.valueOf("2024-01-05 00:00:00"), "-1.00"))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("value").cast("decimal(12,2)").cast(base.schema("value").dataType))
    val vp = ops.TempFiles.dir("quar_spec_valid")
    val qp = ops.TempFiles.dir("quar_spec_dead")
    val r = Queries.quarantineRouting(spark,
      base.unionByName(dirty), vp, qp).collect().head
    assert(r.getLong(0) == 10, s"10 clean rows expected, got ${r.getLong(0)}")
    assert(r.getLong(1) == 4)
    assert(r.getLong(2) == 1 && r.getLong(3) == 1 && r.getLong(4) == 1 &&
      r.getLong(5) == 1)
    // the dead-letter table carries the flags for triage
    val q = spark.read.parquet(qp)
    assert(q.columns.contains("f_user_null") &&
      q.columns.contains("f_value_nonpos"))
    assert(q.count() == 4)
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

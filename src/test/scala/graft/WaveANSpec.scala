package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AN: A-ES weighted sampling without replacement (+ streaming
  * maintained candidate fold). */
class WaveANSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pop(): Array[(Long, String, Long)] =
    ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)

  test("sample_weighted draws exactly k rows matching a driver replay " +
    "of the A-ES keys, and oversamples heavy rows") {
    val rows = pop()
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      md.reset()
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val h = java.lang.Long.parseLong(hex, 16)
      math.log((h + 1).toDouble / 281474976710657.0) / w.toDouble
    }
    val expect = rows.map { case (id, tp, w) => (id, tp, w, key(id, w)) }
      .sortBy(x => (-x._4, x._1)).take(200)
      .map(x => (x._1, x._2, x._3)).sortBy(_._1)
    val got = Queries.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 200)
    assert(got.toSeq == expect.toSeq)
    // inclusion probability ~ weight: the sample mean weight must sit
    // clearly above the population mean
    val popMean = rows.map(_._3).sum.toDouble / rows.length
    val samMean = got.map(_._3).sum.toDouble / got.length
    assert(samMean > popMean * 1.2,
      s"sample mean $samMean vs population $popMean")
  }

  test("dq_sprt matches a driver replay of the factored log-likelihood " +
    "ratio and its Wald decisions") {
    val daily = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when((ops.Cleanse.dec2(col("value")) * 100).cast("long")
          >= 20000L, 1L).otherwise(0L)).as("k"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3)))
    val cutoff = java.time.LocalDate.parse("2024-01-11")
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (tp, g) =>
      val n0 = g.filter(_._2.isBefore(cutoff)).map(_._3).sum
      val k0 = g.filter(_._2.isBefore(cutoff)).map(_._4).sum
      val b = math.log((10.0 * n0 - 12.0 * k0) / (10.0 * (n0 - k0)))
      var nt = 0L; var kt = 0L
      g.filter(!_._2.isBefore(cutoff)).sortBy(_._2.toEpochDay).map {
        case (_, day, n, k) =>
          nt += n; kt += k
          val llr = kt * math.log(1.2) + (nt - kt) * b
          val dec = if (llr >= math.log(19.0)) "reject_h0"
            else if (llr <= -math.log(19.0)) "accept_h0" else "continue"
          (tp, day.toString) -> (nt, kt,
            BigDecimal(llr).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble, dec)
      }
    }.toMap
    val got = Queries.dqSprt(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (nt, kt, llr, dec) = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) == nt && r.getLong(3) == kt,
        s"${r.getString(0)} ${r.getString(1)}")
      assert(math.abs(r.getDouble(4) - llr) < 1e-9)
      assert(r.getString(5) == dec)
    }
    // LLR is cumulative: per type, nt/kt are non-decreasing in day order
    got.groupBy(_.getString(0)).foreach { case (tp, g) =>
      val s = g.sortBy(_.getString(1)).map(r => (r.getLong(2), r.getLong(3)))
      assert(s.zip(s.drop(1)).forall { case (a, b) =>
        b._1 >= a._1 && b._2 >= a._2
      }, tp)
    }
  }

  test("stream_adf and stream_dw: the folded daily-count MV yields the " +
    "batch time-series statistics exactly") {
    def flat(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val sadf = flat(streaming.StreamTwins.streamAdf(spark, sf))
    assert(sadf.nonEmpty && sadf.toSeq == flat(Queries.dqAdf(spark, sf)).toSeq)
    val sdw = streaming.StreamTwins.streamDurbinWatson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val bdw = Queries.dqDurbinWatson(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(sdw.toSeq == bdw.toSeq)
  }

  test("stream_weighted_sample: the folded candidate state yields the " +
    "batch draw exactly") {
    val streamed = streaming.StreamTwins.streamWeightedSample(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val batch = Queries.sampleWeighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.length == 200 && streamed.toSeq == batch.toSeq)
  }
}

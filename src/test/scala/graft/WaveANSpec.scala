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

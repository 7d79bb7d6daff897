package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave U: drawdown, embedding centroids, streaming incremental
  * connected components. */
class WaveUSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("window_drawdown: drawdown is nonnegative, zero iff the series " +
    "peaks on its worst day, and the worst day is in the data") {
    val out = Queries.windowDrawdown(spark, sf).collect()
    assert(out.nonEmpty)
    val days = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .groupBy(col("event_type")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("nd")).toMap
    out.foreach { r =>
      assert(r.getLong(2) >= 0)
      assert(r.getLong(1) == days(r.getString(0)))
    }
  }

  test("window_drawdown agrees with a driver-side recompute") {
    val daily = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum((ops.Cleanse.dec2(col("value")) * 100)
        .cast(org.apache.spark.sql.types.LongType)).as("cents"))
      .collect().map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tpe, rows) =>
      val sorted = rows.sortBy(_._2)
      var peak = Long.MinValue
      val dds = sorted.map { case (_, d, c) =>
        peak = math.max(peak, c); (d, peak - c)
      }
      val best = dds.filter(_._2 == dds.map(_._2).max).minBy(_._1)
      tpe -> best
    }
    Queries.windowDrawdown(spark, sf).collect().foreach { r =>
      val (d, dd) = expect(r.getString(0))
      assert(r.getLong(2) == dd && r.getString(3) == d,
        s"${r.getString(0)}: got (${r.getLong(2)}, ${r.getString(3)}), " +
          s"want ($dd, $d)")
    }
  }

  test("embed_centroids: one row per (label, dim), counts cover the " +
    "table, micro-means bounded by the unit ball") {
    val out = Queries.embedCentroids(spark, sf).collect()
    val emb = ops.Tables.table(spark, sf, "embeddings")
    val nLabels = emb.select(col("label")).distinct().count()
    val dim = emb.select(size(col("embedding"))).first().getInt(0)
    assert(out.length == nLabels * dim)
    val perLabel = emb.groupBy(col("label")).count().collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) == perLabel(r.getLong(0)))
      assert(math.abs(r.getDouble(4)) <= 1000000.0 + 1e-6)
    }
  }

  test("embed_centroids floor-micro mapping is exact vs a driver " +
    "recompute on one label") {
    val rows = ops.Tables.table(spark, sf, "embeddings")
      .filter(col("label") === 0).select(col("embedding")).collect()
      .map(_.getSeq[Float](0))
    assert(rows.nonEmpty)
    val sums = Array.fill(rows.head.length)(0L)
    rows.foreach(v => v.zipWithIndex.foreach { case (x, i) =>
      sums(i) += math.floor(x.toDouble * 1000000.0).toLong
    })
    val out = Queries.embedCentroids(spark, sf)
      .filter(col("label") === 0).collect()
    out.foreach(r => assert(r.getLong(3) == sums(r.getLong(1).toInt)))
  }

  test("stream_components equals the batch clustering (state folds " +
    "edges incrementally, never re-pairing the corpus)") {
    val streamed = streaming.StreamTwins.streamComponents(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = Queries.dedupComponents(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }
}

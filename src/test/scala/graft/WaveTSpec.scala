package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave T: exact heavy hitters, time-series diagnostics, snapshot
  * history, and the streaming strict funnel. */
class WaveTSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("vocab_heavy_hitters equals the brute-force HAVING answer") {
    val out = Queries.vocabHeavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = ops.Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
    val total = toks.count()
    val brute = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 200 > total)
      .orderBy(col("n").desc, col("token"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == brute.toSeq)
    assert(out.nonEmpty, "fixture should have at least one heavy token")
  }

  test("Misra-Gries candidates stay complete under adversarial " +
    "partitioning (heavy mass split across many partitions)") {
    import spark.implicits._
    // 40k filler tokens drown a heavy token that is only ~1% per
    // partition locally but > 1/200 globally; shuffle across 8 partitions
    val rows = (1 to 40000).map(i => s"w${i % 8000}") ++
      (1 to 600).map(_ => "HEAVY")
    val docs = new scala.util.Random(42).shuffle(rows).grouped(50)
      .map(_.mkString(" ")).zipWithIndex
      .map { case (txt, i) => (i.toLong, txt, "en", "t", txt.length.toLong) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
    val tmp = ops.TempFiles.dir("wavet_hh_fixture")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // heavy threshold: 600 * 200 > 40600 → HEAVY qualifies
    val out = Queries.vocabHeavyHitters(spark, tmp)
      .collect().map(_.getString(0))
    assert(out.contains("HEAVY"),
      "a globally heavy token must survive per-partition MG summaries")
    val toks = spark.read.parquet(s"$tmp/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
    val total = toks.count()
    val brute = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 200 > total).collect().map(_.getString(0)).toSet
    assert(out.toSet == brute)
  }

  test("agg_autocorr: coefficients bounded by 1, pair counts match the " +
    "dense day series") {
    val out = Queries.aggAutocorr(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val acf = r.getDouble(2)
      assert(math.abs(acf) <= 1.0 + 1e-9, s"${r.getString(0)}: acf $acf")
    }
    val days = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .groupBy(col("event_type")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("nd")).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs") == days(r.getString(0)) - 1)
    }
  }

  test("forecast_seasonal_naive: 7-day horizon per type, exact errors, " +
    "forecast equals the count one calendar week earlier") {
    val out = Queries.forecastSeasonalNaive(spark, sf).collect()
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (tpe, rows) =>
      assert(rows.length <= 7, s"$tpe horizon must be at most 7 days")
      rows.foreach { r =>
        if (!r.isNullAt(3))
          assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)))
      }
    }
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day")).count()
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getLong(2))
      .toMap
    out.filter(!_.isNullAt(3)).foreach { r =>
      val weekAgo = java.time.LocalDate.parse(r.getString(1)).minusDays(7)
      assert(r.getLong(3) == daily((r.getString(0), weekAgo.toString)),
        s"forecast must be the actual one calendar week earlier")
    }
  }

  test("snapshot_history: manifest stats agree with the data they " +
    "describe, and versions nest correctly") {
    val out = Queries.snapshotHistory(spark, sf).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byV = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byV(1L)._1 == 2 && byV(2L)._1 == 4 && byV(3L)._1 == 4)
    // v2 adds weeks, v3 deletes rows from v2
    assert(byV(2L)._2 > byV(1L)._2)
    assert(byV(3L)._2 <= byV(2L)._2)
    // stats audit: the manifest's min/max must equal the DATA min/max
    val log = Queries.ttEnsureV3(spark, sf, name = "hist_tbl")
    Seq(1L, 2L, 3L).foreach { v =>
      val paths = ops.SnapLog.dataPaths(ops.SnapLog.read(log, v))
      val mm = spark.read.parquet(paths: _*)
        .agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
        .collect()(0)
      assert(byV(v)._3 == mm.getLong(0) && byV(v)._4 == mm.getLong(1),
        s"v$v manifest stats must match data bounds")
    }
  }

  test("stream_funnel state fold equals the batch strict funnel") {
    val streamed = streaming.StreamTwins.streamFunnel(spark, sf).collect()
    val batch = Queries.funnelStrictOrder(spark, sf).collect()
    assert(streamed.map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq ==
      batch.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
  }
}

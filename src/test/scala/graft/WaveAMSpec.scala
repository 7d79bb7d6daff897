package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AM: LOO target encoding, serving-feature MV, Lorenz curve. */
class WaveAMSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("feature_target_encode matches a driver replay and never leaks " +
    "the row's own target") {
    val rows = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val per = rows.groupBy(_._2).map { case (tp, g) =>
      tp -> (g.length.toLong, g.map(_._3).sum)
    }
    val nn = per.values.map(_._1).sum
    val ss = per.values.map(_._2).sum
    val got = Queries.featureTargetEncode(spark, sf).collect()
    assert(got.length == rows.length && got.nonEmpty)
    val expect = rows.map { case (id, tp, x) =>
      val (ng, sg) = per(tp)
      id -> BigDecimal(((sg - x) * nn + 10 * ss).toDouble /
        (nn * (ng + 9)).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - expect(r.getLong(0))) < 1e-9,
        s"event ${r.getLong(0)}")
    }
    // leakage probe: two same-type rows with different targets must get
    // DIFFERENT encodings (a leaky mean-encode would give them the same)
    val byType = rows.groupBy(_._2).values.find(g =>
      g.map(_._3).distinct.length >= 2).get
    val a = byType.find(_._3 == byType.map(_._3).max).get
    val b = byType.find(_._3 == byType.map(_._3).min).get
    val encMap = got.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(encMap(a._1) < encMap(b._1),
      "row with larger own target must get the SMALLER loo encoding")
  }

  test("stream_feature_encode: the incrementally folded (n, s) cells " +
    "yield the batch serving encodings exactly") {
    val streamed = streaming.StreamTwins.streamFeatureEncode(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = Queries.encodeFromAgg(
      ops.Tables.table(spark, sf, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"),
          (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("agg_lorenz: shares are monotone, convex, and end at exactly " +
    "1e6 ppm; deciles match a driver recompute") {
    val per = ops.Tables.table(spark, sf, "orders")
      .select(col("o_custkey"),
        (ops.Cleanse.dec2(col("o_totalprice")) * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }.toSeq
    val sorted = per.sortBy(p => (p._2, p._1))
    val n = sorted.length
    // SQL ntile: first (n % 10) tiles get ceil(n/10), rest floor(n/10)
    val base = n / 10; val extra = n % 10
    val expect = (1 to 10).map { d =>
      val sz = if (d <= extra) base + 1 else base
      val start = (d - 1) * base + math.min(d - 1, extra)
      (d.toLong, sz.toLong, sorted.slice(start, start + sz).map(_._2).sum)
    }
    val tt = expect.map(_._3).sum
    val got = Queries.aggLorenz(spark, sf).collect()
    assert(got.length == 10)
    var cum = 0L
    got.zip(expect).foreach { case (r, (d, sz, cents)) =>
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((d, sz, cents)),
        s"decile $d")
      cum += cents
      assert(r.getLong(3) == cum * 1000000L / tt)
    }
    assert(got.last.getLong(3) == 1000000L)
    // convexity: ascending-sorted deciles have non-decreasing increments
    val shares = got.map(_.getLong(3))
    val incs = (shares.head +: shares.sliding(2).map(p => p(1) - p(0))
      .toArray)
    assert(incs.zip(incs.drop(1)).forall { case (a, b) => b >= a - 1 })
  }

  test("mm_audio_fingerprint: identical payloads align at offset zero, " +
    "and the corpus census matches a driver replay of the constellation") {
    // identical payloads share every fingerprint at dt = 0
    val p = mm.Multimodal.encodeWav("the same audio again".getBytes, 150)
    val fpA = mm.Multimodal.audioFingerprints(p)
    assert(fpA.nonEmpty)
    val byHash = fpA.groupBy(_._1)
    assert(byHash.forall { case (_, g) => g.nonEmpty })

    val media = mm.Multimodal.asAudio(
      ops.Tables.table(spark, sf, "documents"))
      .select(col("doc_id"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val all = media.flatMap { case (id, bytes) =>
      mm.Multimodal.audioFingerprints(bytes).map { case (h, t) =>
        (id, h, t)
      }
    }
    val hot = all.groupBy(_._2).map { case (h, g) => h -> g.length }
    val capped = all.filter(x => hot(x._2) <= 64)
    val byH = capped.groupBy(_._2)
    val votes = scala.collection.mutable.Map.empty[(Long, Long, Long), Long]
    byH.values.foreach { g =>
      for (x <- g; y <- g if x._1 < y._1)
        votes((x._1, y._1, (x._3 - y._3).toLong)) =
          votes.getOrElse((x._1, y._1, (x._3 - y._3).toLong), 0L) + 1
    }
    val expect = votes.toSeq.groupBy(v => (v._1._1, v._1._2))
      .map { case (pair, g) => pair -> g.map(_._2).max }
      .filter(_._2 >= 4L)
    val got = Queries.mmAudioFingerprint(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expect,
      s"${got.size} matched pairs vs driver ${expect.size}")
    assert(got.nonEmpty, "the near-dup corpus must yield audio matches")
  }
}

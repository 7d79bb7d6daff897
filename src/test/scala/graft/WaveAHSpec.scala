package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AH: daily ROC-AUC monitor (+ streaming MV), readability,
  * Brown–Forsythe, HHI, k-center coreset, CDC chunk dedup, wordpiece. */
class WaveAHSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("eval_auc equals an exact driver trapezoid recompute per day, and " +
    "is 1e6 on a perfectly separated fixture") {
    val ev = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = ev.groupBy(_._1).flatMap { case (day, g) =>
      // exact trapezoid over descending distinct scores
      val grid = g.groupBy(_._2).map { case (c, rs) =>
        (c, rs.count(_._3 == 1L).toLong, rs.count(_._3 == 0L).toLong)
      }.toSeq.sortBy(-_._1)
      val n1 = grid.map(_._2).sum; val n0 = grid.map(_._3).sum
      if (n1 == 0 || n0 == 0) None
      else {
        var c1 = 0L; var a2 = BigInt(0)
        grid.foreach { case (_, m1, m0) =>
          c1 += m1; a2 += BigInt(m0) * (2 * c1 - m1)
        }
        Some(day -> (n1, n0, a2.toLong,
          (BigInt(1000000) * a2 / (2 * BigInt(n1) * BigInt(n0))).toLong))
      }
    }
    val got = Queries.evalAuc(spark, sf).collect()
    assert(got.nonEmpty && got.length == expect.size)
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e,
        s"day ${r.getString(0)}")
    }
    // perfect separation: every positive outscores every negative
    import spark.implicits._
    val fix = Seq.tabulate(20) { i =>
      (java.sql.Date.valueOf("2024-01-01"),
        if (i < 10) 100L + i else i.toLong,
        if (i < 10) 1L else 0L, if (i < 10) 0L else 1L)
    }.toDF("day", "cents", "m1", "m0")
    val perfect = Queries.aucFromGrid(fix).collect()
    assert(perfect.length == 1 && perfect(0).getLong(4) == 1000000L)
    // reversed labels: AUC 0
    val fix0 = fix.select(col("day"), col("cents"),
      col("m0").as("m1"), col("m1").as("m0"))
    assert(Queries.aucFromGrid(fix0).collect()(0).getLong(4) == 0L)
  }

  test("stream_auc: the incrementally folded value grid yields the batch " +
    "daily AUC exactly") {
    val streamed = streaming.StreamTwins.streamAuc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val batch = Queries.evalAuc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("text_readability: hand-computed counts on punctuation fixtures, " +
    "and corpus vowel groups match a driver regex recompute") {
    import spark.implicits._
    val fix = Seq(
      (1L, "Hi there. Bye now!"), // 4 words, 2 sentences, 5 vowel groups
      (2L, "abc"),                // 1 word, 1 sentence, 1 vowel group
      (3L, "What?! Really..."),   // 2 words, 2 sentences; groups: a, ea
      (4L, "xyz qrs")             // 2 words, 1 sentence, 0 vowel groups
    ).toDF("doc_id", "text")
    val f = Queries.textReadabilityCore(fix).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(f(1L) == ((4L, 2L, 5L)), s"got ${f(1L)}")
    assert(f(2L) == ((1L, 1L, 1L)))
    assert(f(3L) == ((2L, 2L, 2L)))
    assert(f(4L) == ((2L, 1L, 0L)))

    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val vg = "[aeiouAEIOU]+".r
    val ws = "\\s+".r
    val expect = docs.map { case (id, t) =>
      id -> (ws.split(t.trim).count(_.nonEmpty).toLong,
        vg.findAllIn(t).length.toLong)
    }.toMap
    val got = Queries.textReadability(spark, sf).collect()
    assert(got.length == docs.length && got.nonEmpty)
    got.foreach { r =>
      val (w, v) = expect(r.getLong(0))
      assert(r.getLong(1) == w && r.getLong(3) == v, s"doc ${r.getLong(0)}")
      assert(r.getLong(2) == 1L) // corpus has no sentence punctuation
    }
  }

  test("dq_levene: per-group sums match a driver recompute and W matches " +
    "the closed-form over those sums") {
    val rows = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) 2L * s(n / 2) else s(n / 2 - 1) + s(n / 2)
    }
    val per = rows.groupBy(_._1).map { case (tp, g) =>
      val m2 = med2(g.map(_._2).toSeq)
      val d = g.map(x => math.abs(2 * x._2 - m2))
      tp -> (g.length.toLong, d.sum, d.map(x => x * x).sum)
    }
    val types = per.keys.toSeq.sorted
    val b = types.map { tp =>
      val (n, s, _) = per(tp); s.toDouble * s.toDouble / n.toDouble
    }.reduceLeft(_ + _)
    val nall = per.values.map(_._1).sum
    val sall = per.values.map(_._2).sum
    val qall = per.values.map(_._3).sum
    val wExpect = BigDecimal(((nall - 5).toDouble / 4.0) *
      (b - sall.toDouble * sall.toDouble / nall.toDouble) /
      (qall.toDouble - b))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Queries.dqLevene(spark, sf).collect()
    assert(got.length == types.length)
    got.foreach { r =>
      val (n, s, q) = per(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, s, q)),
        s"type ${r.getString(0)}")
      assert(math.abs(r.getDouble(4) - wExpect) < 1e-9)
    }
  }

  test("agg_hhi: shares partition ppm-exactly and HHI sits inside the " +
    "[1/n, 1] concentration bounds") {
    val got = Queries.aggHhi(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val n = r.getLong(1); val h = r.getLong(3)
      // floor rounding loses < n ppm of the share mass, never gains
      assert(h <= 1000000L * 1000000L, s"${r.getString(0)}")
      // equal shares minimize HHI at (1e6/n)^2 * n (up to floor loss)
      val lo = (1000000L / n) * (1000000L / n) * n - 2L * 1000000L
      assert(h >= lo, s"${r.getString(0)}: hhi $h < lower bound $lo")
    }
  }

  test("sample_kcenter replays the identical greedy selection driver-side") {
    val base = ops.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        (r.getLong(0),
          r.getSeq[Float](1).map(x => (x.toDouble * 1000000.0).toLong)
            .toArray)
      }.sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var mind = base.map(_ => Long.MaxValue)
    var cur = base(0)._2
    val expect = scala.collection.mutable.ArrayBuffer(
      (0L, base(0)._1, 0L))
    for (r <- 1 until 16) {
      for (i <- base.indices)
        mind = mind.updated(i, math.min(mind(i), d2(base(i)._2, cur)))
      val best = base.indices.maxBy(i => (mind(i), -base(i)._1))
      expect += ((r.toLong, base(best)._1, mind(best)))
      cur = base(best)._2
    }
    val got = Queries.sampleKcenter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expect.toSeq)
    // coverage radius is non-increasing (greedy 2-approx invariant)
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => b <= a })
  }

  test("cdc chunks reassemble the payload, respect size bounds, and " +
    "re-align around a single-byte insertion") {
    val rnd = new scala.util.Random(7)
    val bytes = Array.fill(4096)(rnd.nextInt(256).toByte)
    val chunks = mm.Multimodal.cdcChunks(bytes)
    assert(chunks.map(_._2).sum == bytes.length)
    assert(chunks.head._1 == 0)
    chunks.sliding(2).foreach {
      case Seq(a, b) => assert(a._1 + a._2 == b._1)
      case _ =>
    }
    chunks.dropRight(1).foreach { c =>
      assert(c._2 >= mm.Multimodal.CdcMin && c._2 <= mm.Multimodal.CdcMax)
    }
    // insert one byte near the front: most chunk digests re-align
    val edited = (bytes.take(10) :+ 0x42.toByte) ++ bytes.drop(10)
    val after = mm.Multimodal.cdcChunks(edited).map(_._3).toSet
    val shared = chunks.map(_._3).count(after.contains)
    assert(shared.toDouble / chunks.length > 0.5,
      s"only $shared/${chunks.length} chunks re-aligned")
  }

  test("mm_chunk_dedup matches a driver replay of the chunker over every " +
    "payload") {
    val media = mm.Multimodal.asMedia(
      ops.Tables.table(spark, sf, "documents"))
      .select(col("doc_id"), col("payload")).collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val all = media.flatMap { case (id, p) =>
      mm.Multimodal.cdcChunks(p).map { case (_, len, dig) =>
        (id, dig, len.toLong)
      }
    }
    val nDocs = all.groupBy(_._2).map { case (dig, g) =>
      dig -> g.map(_._1).distinct.length
    }
    val expect = all.groupBy(_._1).map { case (id, g) =>
      val tot = g.map(_._3).sum
      val sh = g.filter(c => nDocs(c._2) >= 2).map(_._3).sum
      id -> (g.length.toLong, tot, sh, sh * 1000000L / tot)
    }
    val got = Queries.mmChunkDedup(spark, sf).collect()
    assert(got.length == media.length && got.nonEmpty)
    got.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e,
        s"doc ${r.getLong(0)}")
    }
    // the corpus has genuine sub-file redundancy for the tier to find
    assert(got.map(_.getLong(3)).sum > 0L)
  }

  test("tokenize_wordpiece: hand fixtures, driver replay, and greedy " +
    "never beats the Viterbi optimum on covered characters") {
    val voc = Set("abcd", "ab", "bcd")
    // greedy takes the longest match at position 0
    assert(text.Unigram.greedySegment("abcd", voc) == ((1, 1, 0)))
    // greedy commits to "ab", stranding "cd"; Viterbi finds a + bcd
    assert(text.Unigram.greedySegment("abcdx", voc) == ((2, 1, 1)))
    assert(text.Unigram.greedySegment("xabcd", voc) == ((2, 1, 1)))
    assert(text.Unigram.greedySegment("", voc) == ((0, 0, 0)))
    assert(text.Unigram.greedySegment("zz", voc) == ((2, 0, 2)))

    val docs = ops.Tables.table(spark, sf, "documents")
    val vocabSet = text.Unigram.vocab(
      text.Unigram.trainSample(docs, "doc_id"), "text", 200).toSet
    val expect = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1)
        val (tok, inV, fb) = text.Unigram.greedySegment(t, vocabSet)
        r.getLong(0) -> (tok.toLong, inV.toLong, fb.toLong)
      }.toMap
    val greedy = Queries.tokenizeWordpiece(spark, sf).collect()
    val viterbi = Queries.tokenizeUnigram(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(greedy.length == expect.size && greedy.nonEmpty)
    greedy.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == e,
        s"doc ${r.getLong(0)}")
      // objective = 999*covered + chars, so fewer covered chars means
      // more fallbacks: greedy fallback count >= Viterbi's, per doc
      assert(r.getLong(3) >= viterbi(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }
}

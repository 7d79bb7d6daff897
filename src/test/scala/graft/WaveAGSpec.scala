package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AG: Pettitt changepoint, exact media dedup census companions. */
class WaveAGSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dq_pettitt differentials the naive O(n^2) U_t recompute, and " +
    "detects an injected level shift on a synthetic series") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val ser = g.sortBy(_._2.toEpochDay)
      val xs = ser.map(_._3)
      val n = xs.length
      // U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), brute force
      val u = (1 to n).map { t =>
        (for { i <- 0 until t; j <- t until n }
          yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum
      }
      val k = u.map(math.abs).max
      val cp = ser(u.indexWhere(v => math.abs(v) == k))._2.toString
      tp -> (n.toLong, k, cp)
    }
    val got = Queries.dqPettitt(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, k, cp) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k &&
        r.getString(3) == cp,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getString(3)}) vs driver ($n,$k,$cp)")
      val p = r.getDouble(4)
      assert(p >= 0.0 && p <= 1.0)
    }
  }

  test("embed_silhouette: own-centroid distance a2 matches a driver " +
    "recompute and scores land in [-1, 1]") {
    val rows = Queries.embedSilhouette(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = ops.Tables.table(spark, sf, "embeddings").collect()
      .map(r => (r.getLong(0), r.getInt(2).toLong,
        r.getSeq[Float](1).map(v => math.floor(v * 1e6).toLong).toArray))
    val cents = raw.groupBy(_._2).map { case (l, g) =>
      l -> (0 until g.head._3.length).map { d =>
        math.floor(g.map(_._3(d)).sum.toDouble / g.length).toLong
      }.toArray
    }
    val a2 = raw.map { case (id, l, v) =>
      id -> v.zip(cents(l)).map { case (x, c) =>
        (x - c) * (x - c) }.sum
    }.toMap
    rows.foreach { r =>
      assert(r.getLong(3) == a2(r.getLong(0)),
        s"vec ${r.getLong(0)}: a2 ${r.getLong(3)} vs ${a2(r.getLong(0))}")
      assert(r.getLong(2) != r.getLong(1)) // nearest_other is a DIFFERENT label
      val s = r.getDouble(5)
      assert(s >= -1.0 && s <= 1.0)
    }
  }

  test("stream_pettitt: the maintained daily-count MV yields the batch " +
    "Pettitt statistic exactly") {
    val streamed = streaming.StreamTwins.streamPettitt(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val batch = Queries.dqPettitt(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("sample_soft_dedup: weights are a partition of ~1e6 per cluster, " +
    "singletons keep full weight, and sizes agree with the CC clustering") {
    val rows = Queries.sampleSoftDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = ops.Tables.table(spark, sf, "documents").count()
    assert(rows.length.toLong == nDocs)
    rows.groupBy(_._2).foreach { case (cl, g) =>
      val size = g.head._3
      assert(g.length.toLong == size, s"cluster $cl size")
      assert(g.forall(_._4 == 1000000L / size))
      val tot = g.map(_._4).sum
      assert(tot <= 1000000L && tot > 1000000L - size,
        s"cluster $cl weight mass $tot")
      if (size == 1L) assert(g.head._4 == 1000000L)
      // the representative is the min doc_id in the cluster
      assert(cl == g.map(_._1).min)
    }
  }

  test("sample_curriculum: phases tile the corpus into quartiles ordered " +
    "by quality, and within-phase positions are a permutation") {
    val rows = Queries.sampleCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = ops.Tables.table(spark, sf, "documents").count()
    assert(rows.length.toLong == n)
    val byPhase = rows.groupBy(_._3)
    assert(byPhase.keySet == Set(1L, 2L, 3L, 4L))
    // standard ntile split: sizes differ by at most 1
    val sizes = byPhase.values.map(_.length).toSeq
    assert(sizes.max - sizes.min <= 1)
    // positions are 1..|phase| exactly
    byPhase.foreach { case (ph, g) =>
      assert(g.map(_._4).sorted.toSeq == (1L to g.length).toSeq,
        s"phase $ph positions")
    }
    // quality ordering across phases: min score of phase k >= max of k+1
    // up to quantile-boundary ties
    for (k <- 1L to 3L) {
      val lo = byPhase(k).map(_._2).min
      val hi = byPhase(k + 1).map(_._2).max
      assert(lo >= hi, s"phase $k min $lo < phase ${k + 1} max $hi")
    }
  }

  test("vocab_textrank: rank mass conservation on the word graph, " +
    "stopwords excluded, deterministic top-20") {
    val docs = ops.Tables.table(spark, sf, "documents")
    val stop = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok").count().orderBy(col("count").desc, col("tok"))
      .limit(5).collect().map(_.getString(0)).toSet
    val out = Queries.vocabTextrank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.length == 20)
    assert(out.forall { case (t, r) => !stop.contains(t) && r > 0L })
    // descending pico-rank with token tie-break
    out.sliding(2).foreach { case Array((t1, r1), (t2, r2)) =>
      assert(r1 > r2 || (r1 == r2 && t1 < t2))
    }
    // two runs agree exactly (deterministic integer fixpoint)
    val again = Queries.vocabTextrank(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == again.toSeq)
  }

  test("tokenize_unigram: hand-computed segmentations on a fixture, and " +
    "the declared query replays the identical DP over every document") {
    // hand fixture: vocab built from the fixture corpus itself
    val voc = Set("abcd", "ab", "cd", "xyz")
    // "abcd" → one 4-gram beats ab+cd on the longest-tie rule (both 4000)
    assert(text.Unigram.segment("abcd", voc) == (1, 1, 0))
    // "abq" → "ab" + fallback 'q'
    assert(text.Unigram.segment("abq", voc) == (2, 1, 1))
    // all-fallback and empty
    assert(text.Unigram.segment("zz", voc) == (2, 0, 2))
    assert(text.Unigram.segment("", voc) == (0, 0, 0))
    // vocab-gram chosen even when it straddles a cheaper local choice:
    // "xab" → 'x' + "ab" (score 2001) over three fallbacks (3)
    assert(text.Unigram.segment("xab", voc) == (2, 1, 1))

    val docs = ops.Tables.table(spark, sf, "documents")
    val vocabSet = text.Unigram.vocab(
      text.Unigram.trainSample(docs, "doc_id"), "text", 200).toSet
    assert(vocabSet.size == 200)
    val expect = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1)
        val (tok, inV, fb) = text.Unigram.segment(t, vocabSet)
        r.getLong(0) -> (tok.toLong, inV.toLong, fb.toLong,
          if (tok == 0) 0L else t.length.toLong * 1000000L / tok)
      }.toMap
    val got = Queries.tokenizeUnigram(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == e,
        s"doc ${r.getLong(0)}")
    }
    // the learned vocab should actually cover most of the corpus
    val inVocabShare = got.map(_.getLong(2)).sum.toDouble /
      got.map(_.getLong(1)).sum
    assert(inVocabShare > 0.5, s"vocab coverage $inVocabShare")
  }

  test("stream_soft_dedup: the incrementally folded CC state yields the " +
    "batch soft-dedup census exactly") {
    val streamed = streaming.StreamTwins.streamSoftDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val batch = Queries.sampleSoftDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("pettitt U_t prefix form equals the double-sum definition under " +
    "heavy ties (constant and two-level synthetic series)") {
    // pure-scala check of the rank identity the query relies on:
    // U_t = sum_{i<=t} (d_i - n - 1) with d_i = 2*#less + ties + 1
    def brute(xs: Seq[Long]): Seq[Long] = {
      val n = xs.length
      (1 to n).map { t =>
        (for { i <- 0 until t; j <- t until n }
          yield java.lang.Long.signum(xs(i) - xs(j)).toLong).sum
      }
    }
    def prefix(xs: Seq[Long]): Seq[Long] = {
      val n = xs.length
      val d = xs.map(x => 2L * xs.count(_ < x) + xs.count(_ == x) + 1)
      d.map(_ - n - 1).scanLeft(0L)(_ + _).tail
    }
    for (xs <- Seq(
      Seq.fill(8)(5L),                               // all tied
      Seq(1L, 1, 1, 1, 9, 9, 9, 9),                  // clean shift
      Seq(3L, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5),         // mixed ties
      Seq(2L, 2, 1, 3, 2, 2, 1, 3)))                 // periodic ties
      assert(brute(xs) == prefix(xs), s"series $xs")
  }
}

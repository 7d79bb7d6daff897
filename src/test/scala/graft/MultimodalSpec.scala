package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decode reads dimensions from the actual BMP header bytes") {
    val docs = Seq(
      (1L, "hello world foo bar", 19L, "en"),
      (2L, "", 0L, "en"),
      (3L, "x " * 40 + "end", 83L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    val media = Multimodal.asMedia(docs)
    // the payload really is a BMP: magic bytes + header-declared size
    val payloads = media.orderBy("doc_id")
      .select("payload").as[Array[Byte]].collect()
    payloads.foreach { b =>
      assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    }
    val out = Multimodal.decodeFeatures(spark, media)
      .orderBy("doc_id").collect()
    Seq(19, 0, 83).zip(out).zip(payloads).foreach {
      case ((nChars, r), payload) =>
        assert(r.getAs[Int]("width") == 4 + nChars % 29)
        assert(r.getAs[Int]("height") == 4 + nChars % 17)
        assert(r.getAs[Int]("bpp") == 24)
        // header-declared file size matches the real byte count
        assert(r.getAs[Int]("n_bytes") == payload.length)
    }
  }

  test("resize does genuine nearest-neighbor pixel resampling") {
    val text = "abcdefghij " * 5
    val src = Multimodal.encodeBmp(text.getBytes("UTF-8"), text.length)
    val srcW = 4 + text.length % 29
    val srcH = 4 + text.length % 17
    val srcStride = (srcW * 3 + 3) / 4 * 4
    val out = Multimodal.resizeBmp(src, 6, 5)
    assert(out(0) == 'B'.toByte && out(1) == 'M'.toByte)
    val dstStride = (6 * 3 + 3) / 4 * 4
    assert(out.length == 54 + dstStride * 5)
    // spot-check a pixel: dst (2,3) must equal src (2*srcW/6, 3*srcH/5)
    val (sx, sy) = (2 * srcW / 6, 3 * srcH / 5)
    val so = 54 + sy * srcStride + sx * 3
    val dof = 54 + 3 * dstStride + 2 * 3
    assert(out(dof) == src(so) && out(dof + 1) == src(so + 1) &&
      out(dof + 2) == src(so + 2))
  }

  test("frame sampling counts derive from the parsed header") {
    val docs = Seq((1L, "hello world bits", 16L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    val r = Multimodal.frameSampleFeatures(spark,
      Multimodal.asMedia(docs), 4).collect().head
    val h = 4 + 16 % 17
    assert(r.getAs[Int]("n_frames") == h)
    assert(r.getAs[Int]("n_sampled") == (h + 3) / 4)
    assert(r.getAs[Int]("frame_bytes") == ((4 + 16 % 29) * 3 + 3) / 4 * 4)
  }

  test("corrupted payloads surface as sentinel features, not exceptions") {
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val r = Multimodal.decodeFeatures(spark, bad).collect().head
    assert(r.getAs[Int]("n_bytes") == 3)
    assert(r.getAs[Int]("width") == -1)
    assert(r.getAs[Int]("height") == -1)
    // a truncated payload with a valid magic and lying header must not crash
    val lying = Multimodal.encodeBmp("some text".getBytes("UTF-8"), 9).take(60)
    val r2 = Multimodal.resizeFeatures(spark,
      Seq((10L, lying)).toDF("doc_id", "payload"), 8, 8).collect().head
    assert(r2.getAs[Int]("src_width") == -1)
    assert(r2.getAs[Int]("n_bytes") == 60)
  }

  test("phash is exactly invariant under integer-factor upscaling and " +
      "separates distinct images") {
    val texts = Seq("the quick brown fox jumps over the lazy dog " * 3,
      "pack my box with five dozen liquor jugs " * 4,
      "zzzz aaaa zzzz aaaa " * 7)
    texts.foreach { t =>
      val b = Multimodal.encodeBmp(t.getBytes("UTF-8"), t.length)
      val h0 = Multimodal.pHash64(b)
      val w = 4 + t.length % 29
      val h = 4 + t.length % 17
      for (k <- Seq(2, 3, 5)) {
        val up = Multimodal.resizeBmp(b, w * k, h * k)
        assert(Multimodal.pHash64(up) == h0, s"upscale x$k changed the hash")
      }
    }
    val hashes = texts.map(t =>
      Multimodal.pHash64(Multimodal.encodeBmp(t.getBytes("UTF-8"), t.length)))
    assert(hashes.distinct.length == hashes.length,
      "distinct images must not collide at radius 0")
  }

  test("phash multi-index Hamming join equals brute force on the " +
      "original+re-encode corpus, finding every re-encode pair") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMedia(docs)
    val corpus = media.select($"doc_id", $"payload")
      .unionByName(Multimodal.upscaledMedia(spark, media, 2))
    val ph = Multimodal.phashFeatures(spark, corpus)
      .filter($"phash".isNotNull)
    val got = graft.text.NearDup
      .hammingDupPairs(ph, "doc_id", "phash", maxHamming = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val local = ph.select("doc_id", "phash").as[(Long, Long)].collect()
    val want = (for {
      (ia, ha) <- local; (ib, hb) <- local
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 4
    } yield (ia, ib)).toSet
    assert(got == want, "multi-index join diverges from brute-force Hamming")
    // every original pairs with exactly its own re-encode: the oracle's
    // closed form (and the radius separates everything else)
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(want == ids.map(id => (id, id + Multimodal.UpscaleIdOffset)))
  }

  test("incremental phash probe: each delta re-encode hits exactly its " +
      "own original") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.asMedia(docs)
    val basePh = Multimodal.phashFeatures(spark, media)
      .filter($"phash".isNotNull)
    val deltaPh = Multimodal.phashFeatures(spark,
        Multimodal.upscaledMedia(spark, media, 2))
      .filter($"phash".isNotNull)
    val got = graft.text.NearDup
      .hammingDupPairsIncremental(basePh, deltaPh, "doc_id", "phash", 4)
      .select("new_id", "base_id").as[(Long, Long)].collect().toSet
    val ids = docs.select("doc_id").as[Long].collect().toSet
    assert(got == ids.map(id => (id + Multimodal.UpscaleIdOffset, id)))
  }

  test("corrupt payloads get a null phash, valid ones a hash") {
    val ok = Multimodal.encodeBmp("hello there friend".getBytes("UTF-8"), 18)
    val rows = Multimodal.phashFeatures(spark,
        Seq((1L, ok), (2L, Array[Byte](1, 2, 3)),
          (3L, ok.take(60))).toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    assert(!rows(0).isNullAt(1) && rows(1).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("audio features match an exact driver-side recomputation from the " +
    "raw text for every document") {
    val sf = "/root/testdata/sf0.001"
    val docs = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2).toInt)).toMap
    val got = Queries.mmAudioFeatures(spark, sf).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val (text, nChars) = docs(r.getLong(0))
      val bytes = text.getBytes("UTF-8")
      val n = 64 + nChars % 193
      val L = bytes.length
      val samples = (0 until n).map { i =>
        if (L == 0) 0
        else ((bytes(i % L) & 0xFF) - (bytes((i + 1) % L) & 0xFF)) << 6
      }
      val zc = samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      val energy = samples.map(s => s.toLong * s).sum
      assert(r.getInt(1) == Multimodal.WavRate &&
        r.getLong(2) == n.toLong && r.getLong(3) == zc.toLong &&
        r.getInt(4) == samples.map(math.abs).max &&
        r.getLong(5) == energy,
        s"doc ${r.getLong(0)}: $r")
    }
  }

  test("scene cut fires exactly at a hand-built shot boundary") {
    // 2×4 BMP, rows (bottom-up irrelevant — detection is sequential):
    // 0, 0, 255×6, 255×6 → luma sums 0,0,1530,1530, one cut at frame 2
    val w = 2; val h = 4; val stride = (w * 3 + 3) / 4 * 4
    val b = new Array[Byte](54 + stride * h)
    b(0) = 'B'; b(1) = 'M'
    def put(off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >>> 8) & 0xFF).toByte
      b(off + 2) = ((v >>> 16) & 0xFF).toByte
      b(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    put(2, b.length); put(10, 54); put(14, 40); put(18, w); put(22, h)
    b(28) = 24 // bpp — the hardened validator demands the declared layout
    (0 until w * 3).foreach { x =>
      b(54 + 2 * stride + x) = 0xFF.toByte
      b(54 + 3 * stride + x) = 0xFF.toByte
    }
    val r = Multimodal.sceneCutFeatures(spark,
      Seq((1L, b)).toDF("doc_id", "payload")).collect().head
    assert(r.getAs[Int]("n_frames") == 4 && r.getAs[Int]("n_cuts") == 1 &&
      r.getAs[Int]("first_cut") == 2 && r.getAs[Long]("max_delta") == 1530L)
    // corrupt payload → sentinels
    val bad = Multimodal.sceneCutFeatures(spark,
      Seq((2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"))
      .collect().head
    assert(bad.getAs[Int]("n_frames") == -1 &&
      bad.getAs[Long]("max_delta") == -1L)
  }

  test("scene-cut features match an independent driver-side parse of " +
    "every fixture payload") {
    val sf = "/root/testdata/sf0.001"
    val payloads = Multimodal.asMedia(
        ops.Tables.table(spark, sf, "documents"))
      .select("doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Queries.mmSceneCut(spark, sf).collect()
    assert(got.length == payloads.size)
    def le(b: Array[Byte], o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
    got.foreach { r =>
      val b = payloads(r.getLong(0))
      val w = le(b, 18); val h = le(b, 22)
      val stride = (w * 3 + 3) / 4 * 4
      val sums = (0 until h).map { y =>
        (0 until w * 3).map(x => (b(54 + y * stride + x) & 0xFF).toLong).sum
      }
      val total = sums.sum
      val deltas = sums.sliding(2).map(p => math.abs(p(1) - p(0))).toSeq
      val cuts = deltas.count(d => 3L * d * h > 2L * total)
      val first = deltas.indexWhere(d => 3L * d * h > 2L * total) match {
        case -1 => -1; case i => i + 1
      }
      assert(r.getAs[Int]("n_frames") == h &&
        r.getAs[Int]("n_cuts") == cuts &&
        r.getAs[Int]("first_cut") == first &&
        r.getAs[Long]("max_delta") == (if (deltas.isEmpty) 0L else deltas.max),
        s"doc ${r.getLong(0)}")
    }
  }

  test("corrupt audio payloads surface as -1 sentinels, not exceptions") {
    val ok = Multimodal.encodeWav("some speech here".getBytes("UTF-8"), 16)
    val rows = Multimodal.audioFeatures(spark,
        Seq((1L, ok), (2L, Array[Byte](1, 2, 3)),
          (3L, "RIFFxxxxWAVE".getBytes("UTF-8")),
          (4L, { val bad = ok.clone(); bad(40) = -1; bad(41) = -1;
                 bad(42) = -1; bad(43) = 0x7F; bad })) // data size > payload
          .toDF("doc_id", "payload"))
      .orderBy("doc_id").collect()
    assert(rows(0).getLong(2) > 0)
    Seq(1, 2, 3).foreach { i =>
      assert(rows(i).getLong(2) == -1L && rows(i).getLong(5) == -1L)
    }
  }

  test("audio VAD segmentation matches an independent driver recompute " +
    "and flags corrupt payloads") {
    val docs = Seq(
      (1L, "hello world this is a longer sentence for vad", 45L, "en"),
      (2L, "", 0L, "en"),
      (3L, "short", 5L, "en"),
      (4L, "x " * 120 + "tail", 244L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    val media = Multimodal.asAudio(docs)
    val got = Multimodal.audioVad(spark, media).orderBy("doc_id").collect()
    // independent recompute: decode the WAV we know asAudio built
    docs.collect().sortBy(_.getLong(0)).zip(got).foreach { case (d, r) =>
      val bytes = Multimodal.encodeWav(
        d.getString(1).getBytes("UTF-8"), d.getLong(2).toInt)
      val n = ((bytes(40) & 0xFF) | ((bytes(41) & 0xFF) << 8) |
        ((bytes(42) & 0xFF) << 16) | ((bytes(43) & 0xFF) << 24)) / 2
      val samples = (0 until n).map { i =>
        (((bytes(44 + 2 * i) & 0xFF) |
          ((bytes(45 + 2 * i) & 0xFF) << 8)) << 16) >> 16
      }
      val frames = samples.grouped(16).filter(_.length == 16)
        .map(_.map(s => s.toLong * s.toLong).sum).toArray
      val total = frames.sum
      val mask = frames.map(e => 2L * e * frames.length > total)
      val segs = mask.foldLeft((0, false)) { case ((k, prev), s) =>
        (if (s && !prev) k + 1 else k, s) }._1
      val runs = mask.foldLeft((0, 0)) { case ((best, cur), s) =>
        val c = if (s) cur + 1 else 0; (math.max(best, c), c) }._1
      assert(r.getInt(1) == frames.length, s"doc ${d.getLong(0)} n_frames")
      assert(r.getInt(2) == mask.count(identity), s"doc ${d.getLong(0)}")
      assert(r.getInt(3) == segs && r.getInt(5) == runs)
      assert(r.getInt(4) == mask.indexWhere(identity))
      assert(r.getLong(6) == (if (frames.isEmpty) 0L
        else mask.count(identity).toLong * 1000000L / frames.length))
    }
    // corrupt payload → sentinel row
    val bad = Multimodal.audioVad(spark,
      Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")).collect()
    assert(bad.head.getInt(1) == -1 && bad.head.getLong(6) == -1L)
  }

  test("exact media dedup finds injected byte-identical copies") {
    // 4 distinct texts; "dup me" appears 3×, "pair" 2×, two singletons.
    val docs = Seq(
      (1L, "dup me", 6L, "en"), (2L, "dup me", 6L, "en"),
      (3L, "dup me", 6L, "en"), (4L, "pair", 4L, "en"),
      (5L, "pair", 4L, "en"), (6L, "solo one", 8L, "en"),
      (7L, "solo two", 8L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    val out = Queries.mmExactDedupCore(Multimodal.asMedia(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // histogram rows: (cluster_size, n_clusters, n_payloads, n_droppable)
    assert(out.toSeq == Seq((1L, 2L, 2L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 2L)))
  }
}

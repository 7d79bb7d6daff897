package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** Hand-computed fixtures for the corpus-statistics text scores (unigram-LM
  * score and PMI-lift collocations) — the numbers below are worked by hand
  * so an arithmetic regression in either plan fails loudly. */
class TextScoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lmScore: exact hand-computed mean token frequency") {
    // corpus tokens: a a b | c → vocab a:2 b:1 c:1, total 4
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    val out = TextOps.lmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc1: (2+2+1) / (3*4) = 5/12;  doc2: 1 / (1*4)
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == BigDecimal(5.0 / 12)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1).getLong(1) == 1L)
    assert(out(1).getDouble(2) == 0.25)
  }

  test("lmScore ranks common prose above rare-token spam") {
    val common = (1 to 20).map(_ => "the data is here").mkString(" ")
    val spam = (1 to 20).map(i => s"zxqj$i").mkString(" ")
    val out = TextOps.lmScore(
        Seq((1L, common), (2L, spam)).toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(2) > 10 * out(1).getDouble(2))
  }

  test("pmiCollocations: exact hand-computed lift, minCount filter applied") {
    // tokens: new york a new york b new york (8 tokens, 7 bigrams)
    // c(new york)=3, c(new)=3, c(york)=3, n_uni=8, n_bi=7
    // lift = (3·8·8)/(7·3·3) = 192/63
    val docs = Seq((1L, "new york a new york b new york")).toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "text", minCount = 3).collect()
    assert(out.length == 1, s"minCount must drop 1-count bigrams: ${out.toSeq}")
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("new", "york", 3L))
    assert(r.getDouble(3) == BigDecimal(192.0 / 63)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("pmiCollocations: single-token docs produce no bigrams and no error") {
    val docs = Seq((1L, "solo"), (2L, "x y x y x y")).toDF("doc_id", "text")
    val out = TextOps.pmiCollocations(docs, "text", minCount = 3).collect()
    // bigrams of doc2: (x,y)×3 (y,x)×2 — only (x,y) survives minCount
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("x", "y")))
  }

  test("text_compression matches an exact driver-side Deflater recompute " +
      "and separates templated text from prose") {
    val sf = "/root/testdata/sf0.001"
    def deflateLen(s: String): Long = {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(s.getBytes("UTF-8")); d.finish()
        val buf = new Array[Byte](4096)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        n
      } finally d.end()
    }
    val texts = graft.ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Queries.textCompression(spark, sf).collect()
    assert(out.length == texts.size)
    out.foreach { r =>
      val t = texts(r.getLong(0))
      val bytes = t.getBytes("UTF-8").length.toLong
      val dl = deflateLen(t)
      assert(r.getLong(1) == bytes && r.getLong(2) == dl &&
        r.getLong(3) == 1000000L * dl / bytes, s"doc ${r.getLong(0)}")
    }
    // the signal separates: pure repetition compresses >10x below prose
    val spam = ("spam " * 400).trim
    val prose = texts.values.maxBy(_.length)
    assert(deflateLen(spam) * 10 < deflateLen(prose) ||
      1000000L * deflateLen(spam) / spam.getBytes("UTF-8").length <
        1000000L * deflateLen(prose) / prose.getBytes("UTF-8").length / 5,
      "templated text must compress far below prose")
  }

  test("feature hashing partitions every token occurrence into exactly " +
      "one bucket (conservation across the audit)") {
    val sf = "/root/testdata/sf0.001"
    val out = Queries.featureHashBuckets(spark, sf).collect()
    val total = graft.ops.Tables.table(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")).as("t"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("t")) > 0)
      .count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.forall(r => r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)))
    assert(out.map(_.getString(0)).distinct.length == out.length)
  }

  test("vocab_bpe_merges equals a driver-side BPE round-1 recomputation " +
      "(word-frequency-weighted pair counts, total order)") {
    val sf = "/root/testdata/sf0.001"
    val texts = graft.ops.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val wc = scala.collection.mutable.Map.empty[String, Long]
    texts.iterator.flatMap(_.split(" ")).filter(_.length >= 2)
      .foreach(w => wc(w) = wc.getOrElse(w, 0L) + 1L)
    val pc = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        pc(p) = pc.getOrElse(p, 0L) + c
      }
    }
    val top = pc.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val out = Queries.vocabBpeMerges(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == top)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AE: tokenizer OOV-rate and n-gram novelty corpus evals. */
class WaveAESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("vocab_oov_rate differentials a naive driver recompute") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(t: String) = t.split(" ").filter(_.nonEmpty)
    val trainCounts = docs.filter(_._1 % 10 < 8)
      .flatMap(d => toks(d._3)).groupBy(identity)
      .map { case (k, g) => (k, g.length) }
    val vocab = trainCounts.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(500).map(_._1).toSet
    val expect = docs.filter(_._1 % 10 >= 8)
      .flatMap(d => toks(d._3).map(t => (d._2, t)))
      .groupBy(_._1).map { case (lang, g) =>
        lang -> (g.length.toLong, g.count(x => !vocab(x._2)).toLong)
      }
    val got = Queries.vocabOovRate(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, oov) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == oov,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}) vs " +
          s"driver ($n,$oov)")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("text_ngram_novelty differentials a naive driver recompute, and " +
    "novelty is in [0,1]") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length < 3) Seq(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSeq
    }
    def distinctTris(t: String) = tris(t).distinct
    val train = docs.filter(_._1 % 10 < 8).flatMap(d => distinctTris(d._3)).toSet
    val expect = docs.filter(_._1 % 10 >= 8)
      .flatMap(d => distinctTris(d._3).map(s => (d._2, s)))
      .groupBy(_._1).map { case (lang, g) =>
        lang -> (g.length.toLong, g.count(x => !train(x._2)).toLong)
      }
    val got = Queries.textNgramNovelty(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, nov) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nov,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}) vs " +
          s"driver ($n,$nov)")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }
}

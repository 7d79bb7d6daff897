package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave Y: the exact embedding Gram matrix and its PCA diagnostic. */
class WaveYSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("embed_gram equals a driver-side exact recompute on a dimension " +
    "slice (the integer kernel is bit-reproducible)") {
    val out = Queries.embedGram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = ops.Tables.table(spark, sf, "embeddings")
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    val d = vecs.head.length
    assert(out.size == d * (d + 1) / 2)
    // spot-check dims 0..7 exactly
    for (i <- 0 until 8; j <- i until 8) {
      val expect = vecs.map { v =>
        math.floor(v(i).toDouble * 1e6).toLong *
          math.floor(v(j).toDouble * 1e6).toLong
      }.sum
      assert(out((i.toLong, j.toLong)) == expect, s"($i,$j)")
    }
  }

  test("graph_assortativity: r bounded by 1, stub count is twice the " +
    "pair count, and a star graph recomputes to -1") {
    val row = Queries.graphAssortativity(spark, sf).collect()(0)
    val nPairs = text.NearDup.minhashDupPairsCached(
      ops.Tables.table(spark, sf, "documents"), "doc_id", "text", 0.8, sf)
      .count()
    assert(row.getLong(0) == 2 * nPairs)
    assert(math.abs(row.getDouble(1)) <= 1.0 + 1e-9)
    // closed form: a perfect star is maximally disassortative (r = -1)
    // when computed over stubs of a k-star with k >= 2 heterogeneous
    // degrees; verify the co-moment formula on a hand graph
    val stubs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }
    val deg = stubs.groupBy(_._1).map { case (n0, s) => n0 -> s.length }
    val xy = stubs.map { case (a, b) => (deg(a).toLong, deg(b).toLong) }
    val n = xy.length.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val (sxx, syy) = (xy.map(p => p._1 * p._1).sum, xy.map(p => p._2 * p._2).sum)
    val r = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(math.abs(r - (-1.0)) < 1e-9)
  }

  test("vocab_rake: phrases exclude the corpus stopwords and scores " +
    "match a driver-side RAKE recompute") {
    val out = Queries.vocabRake(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 20)
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0).split(" ", -1).toSeq)
    val freqAll = docs.flatten.groupBy(identity).map { case (t0, o) =>
      t0 -> o.length }
    val stop = freqAll.toSeq.sortBy { case (t0, n) => (-n, t0) }
      .take(5).map(_._1).toSet
    out.foreach { case (phrase, _, _) =>
      phrase.split(" ", -1).foreach(w =>
        assert(!stop(w), s"stopword '$w' inside phrase '$phrase'"))
    }
    // full driver recompute of phrase scores
    val phrases = docs.flatMap { t0 =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      t0.foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) { runs += cur.toSeq; cur.clear() } }
        else cur += w
      }
      if (cur.nonEmpty) runs += cur.toSeq
      runs
    }
    val deg = scala.collection.mutable.HashMap.empty[String, Long]
    val frq = scala.collection.mutable.HashMap.empty[String, Long]
    phrases.foreach { ph => ph.foreach { w =>
      deg(w) = deg.getOrElse(w, 0L) + ph.length
      frq(w) = frq.getOrElse(w, 0L) + 1
    }}
    val wscore = deg.map { case (w, d0) => w -> d0 * 1000000L / frq(w) }
    val expect = phrases.map(ph => ph.mkString(" ") ->
        ph.map(wscore).sum).groupBy(_._1)
      .map { case (p0, os) => p0 -> (os.length.toLong, os.head._2) }
    out.foreach { case (phrase, nOcc, score) =>
      val (en, es) = expect(phrase)
      assert(nOcc == en && score == es, s"'$phrase': ($nOcc,$score) vs ($en,$es)")
    }
  }

  test("stream_gram: the maintained moment MV equals the batch Gram " +
    "bit-for-bit") {
    val streamed = streaming.StreamTwins.streamGram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = Queries.embedGram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("embed_pca: unit-norm orthogonal components satisfying Cv = " +
    "lambda v, with bounded explained-variance ratios") {
    val rows = Queries.embedPca(spark, sf).collect()
    val d = rows.length
    val v1 = rows.map(_.getDouble(1))
    val v2 = rows.map(_.getDouble(2))
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) < 1e-3)
    assert(math.abs(norm(v2) - 1.0) < 1e-3)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"components not orthogonal: $dot")
    val (e1, e2) = (rows.head.getDouble(3), rows.head.getDouble(4))
    assert(e1 >= 1.0 / d - 1e-6 && e1 <= 1.0 + 1e-6)
    assert(e2 <= e1 + 1e-6 && e2 >= 0 - 1e-6)

    // Cv = lambda*v residual against an independently built covariance
    val vecs = ops.Tables.table(spark, sf, "embeddings")
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    val n = vecs.length.toDouble
    val micro = vecs.map(v => v.map(x =>
      math.floor(x.toDouble * 1e6).toLong).toArray)
    val mean = Array.tabulate(d)(i => micro.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      micro.map(v => v(i).toDouble * v(j)).sum / n - mean(i) * mean(j)
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val lam1 = e1 * trace
    val cv = Array.tabulate(d)(i =>
      (0 until d).map(j => cov(i)(j) * v1(j)).sum)
    val resid = math.sqrt(cv.zip(v1).map { case (a, b) =>
      val r = a - lam1 * b; r * r }.sum) / lam1
    assert(resid < 1e-2, s"Cv != lambda v, relative residual $resid")
  }
}

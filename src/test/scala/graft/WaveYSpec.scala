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

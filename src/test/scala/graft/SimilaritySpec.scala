package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate (LSH) tiers against their exact
  * counterparts on the real sf0.001 corpus. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("LSH-banded embedding near-dup equals the exact all-pairs tier") {
    val exact = Queries.dedupEmbeddingCosine(spark, sf).collect().map(_.toSeq)
    val lsh = Queries.dedupEmbeddingLsh(spark, sf).collect().map(_.toSeq)
    assert(exact.nonEmpty)
    assert(lsh.toSeq == exact.toSeq)
  }

  test("ANN LSH recall@10 clears the floor (amplified banding)") {
    val rows = Queries.annLshRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.75, s"mean recall@10 $mean below floor 0.75")
    assert(recalls.min >= 0.4, s"worst-query recall@10 ${recalls.min} below 0.4")
  }

  test("simhash-verified pairs equal the minhash-verified pairs (two scale " +
    "paths, one precision contract)") {
    val viaSimhash = Queries.dedupSimhashVerified(spark, sf)
      .collect().map(_.toSeq)
    val viaMinhash = Queries.dedupMinhashLsh(spark, sf)
      .select("a_id", "b_id", "jaccard").collect().map(_.toSeq)
    assert(viaSimhash.nonEmpty)
    assert(viaSimhash.toSeq == viaMinhash.toSeq)
  }
}

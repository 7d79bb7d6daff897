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

  test("IVF ANN recall@10 clears its floor with bounded candidate volume") {
    val truth = Queries.annCosineTopK(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = Queries.annIvfTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8)
    val recalls = byQ.map { case (q, rs) =>
      rs.map(_.getAs[Long]("neighbor_id")).count(truth(q)) / 10.0
    }.toSeq
    val mean = recalls.sum / recalls.length
    info(f"IVF mean recall@10 $mean%.2f, min ${recalls.min}%.2f, " +
      s"candidates ${rows.head.getAs[Long]("n_candidates")}")
    assert(mean >= 0.3, s"IVF mean recall@10 $mean below floor")
    // the volume bound is the point: probes/cells of the corpus, not all of it
    val nVec = ops.Tables.table(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_candidates")).max < nVec / 2)
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

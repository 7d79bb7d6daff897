package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave Q: PQ-ADC ANN, exact two-sample KS drift, k-fold splits. */
class WaveQSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("PQ codes are m positions each within its subspace codebook") {
    val emb = ops.Tables.table(spark, sf, "embeddings")
    val cb = sim.Pq.codebookCached(emb, "vec_id", "embedding",
      m = 8, k = 64, iters = 3, cacheKey = sf)
    val coded = sim.Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val bad = coded.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 64)).count()
    assert(bad == 0)
    // codes genuinely discriminate: many distinct code words over the corpus
    val distinctWords = coded.select(col("codes")).distinct().count()
    val n = coded.count()
    assert(distinctWords > n / 4,
      s"only $distinctWords distinct code words over $n vectors")
  }

  test("declared ann_pq_recall clears its floor (PQ's published quality number)") {
    val rows = Queries.annPqRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    info(f"declared PQ mean recall@10 $mean%.2f min ${recalls.min}%.2f")
    assert(mean >= 0.75, s"mean PQ recall@10 $mean below floor 0.75")
    assert(recalls.min >= 0.4, s"worst-query PQ recall@10 ${recalls.min} below 0.4")
  }

  test("declared ann_ivfpq_recall clears its floor (the composed index)") {
    val rows = Queries.annIvfPqRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    info(f"declared IVF-PQ mean recall@10 $mean%.2f min ${recalls.min}%.2f")
    assert(mean >= 0.7, s"mean IVF-PQ recall@10 $mean below floor 0.7")
    assert(recalls.min >= 0.4, s"worst-query IVF-PQ recall@10 ${recalls.min} below 0.4")
  }

  test("IVF-PQ candidate volume is genuinely bounded below the corpus") {
    val rows = Queries.annIvfPqTopK(spark, sf).collect()
    val n = ops.Tables.table(spark, sf, "embeddings").count()
    val worst = rows.map(_.getAs[Long]("n_candidates")).max
    info(s"worst-query candidates $worst of ${n - 1}")
    assert(worst < n - 1, "IVF-PQ scanned the whole corpus — no pruning")
  }

  test("dq_ks equals a driver-side exact KS recomputation per event type") {
    val rows = Queries.dqKs(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val vals = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = vals.map(_._1).distinct.sorted
    assert(rows.keySet == types.toSet)
    val nAll = vals.length.toLong
    for (ty <- types) {
      val inT = vals.filter(_._1 == ty).map(_._2)
      val rest = vals.filter(_._1 != ty).map(_._2)
      val grid = vals.map(_._2).distinct.sorted
      val nT = inT.length.toLong
      val nR = nAll - nT
      val dnum = grid.map { x =>
        val cT = inT.count(_ <= x).toLong
        val cR = rest.count(_ <= x).toLong
        math.abs(cT * nR - cR * nT)
      }.max
      val expect = BigDecimal(dnum.toDouble / (nT.toDouble * nR.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gotNT, gotNR, gotKs) = rows(ty)
      assert(gotNT == nT && gotNR == nR)
      assert(gotKs == expect, s"$ty: ks $gotKs != exact $expect")
    }
  }

  test("dq_ks of a type against itself would be 0; stats lie in [0, 1]") {
    val rows = Queries.dqKs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0, s"ks $ks out of [0,1]")
    }
  }

  test("graph_common_neighbors: jaccard bounded and consistent with degrees") {
    val rows = Queries.graphCommonNeighbors(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("nbr_jaccard")
      assert(j > 0.0 && j <= 1.0, s"nbr_jaccard $j out of (0,1]")
      assert(r.getAs[Long]("n_common") >= 1)
    }
  }

  test("recommend_item_knn: contiguous per-item ranks, bounded cosine, " +
    "and n_co equals an independent shared-basket recount for the top row") {
    val out = Queries.recommendItemKnn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c > 0.0 && c <= 1.0, s"cos_sim $c out of (0,1]")
    }
    val byPart = out.groupBy(_.getAs[Long]("part_id"))
    byPart.foreach { case (p, rs) =>
      val ranks = rs.map(_.getAs[Long]("rn")).sorted.toSeq
      assert(ranks == (1L to ranks.length),
        s"part $p ranks not contiguous: $ranks")
    }
    // independent recount of one pair's co-occurrence from the raw table
    val first = out.head
    val (a, b) = (first.getAs[Long]("part_id"), first.getAs[Long]("rec_part_id"))
    val li = ops.Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1)))
    val ordersA = li.filter(_._2 == a).map(_._1).toSet
    val ordersB = li.filter(_._2 == b).map(_._1).toSet
    assert(first.getAs[Long]("n_co") == (ordersA & ordersB).size.toLong)
  }

  test("split_kfold partitions every document exactly once, stable under re-run") {
    val out = Queries.splitKfold(spark, sf)
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    val nDocs = ops.Tables.table(spark, sf, "documents").count()
    assert(total == nDocs)
    val folds = out.select(col("fold")).distinct().collect().map(_.getLong(0)).toSet
    assert(folds.subsetOf(Set(0L, 1L, 2L, 3L)))
    // determinism: re-running yields byte-identical assignment counts
    assert(out.collect().toSeq == Queries.splitKfold(spark, sf).collect().toSeq)
  }
}

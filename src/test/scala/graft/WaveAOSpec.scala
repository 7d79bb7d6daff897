package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AO: label-propagation communities, Cohen's-kappa rater agreement
  * (+ streaming maintained grid), rank-biased overlap. */
class WaveAOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def lpa(pairs: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lab = adj.map { case (n, nbrs) =>
        val votes = (nbrs.toSeq.map(lab) :+ lab(n))
          .groupBy(identity).map { case (l, v) => l -> v.size }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("LabelProp closed forms: a bare pair converges to the min label; " +
    "a star adopts the hub; two triangles joined by a bridge stay TWO " +
    "communities where connected components over-merge to one") {
    def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
      ops.LabelProp.communities(
          pairs.toDF("a", "b"), "a", "b", rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(Seq((7L, 3L))) == Map(7L -> 3L, 3L -> 3L))
    assert(run(Seq((1L, 10L), (1L, 11L), (1L, 12L))) ==
      Map(1L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
    val bridged = Seq((1L, 2L), (2L, 3L), (1L, 3L), // triangle A
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle B
      (3L, 10L)) // the threshold-bleed bridge
    val got = run(bridged)
    assert(got == lpa(bridged, 4))
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(Set(got(10L), got(11L), got(12L)).size == 1)
    assert(got(1L) != got(10L), "the bridge must NOT merge the triangles")
    val comp = ops.Components.connectedComponents(
      bridged.toDF("a", "b"), "a", "b")
    assert(comp.select(col("comp")).distinct().count() == 1L,
      "components DO merge through the bridge - the contrast LPA exists for")
    comp.unpersist()
  }

  test("graph_label_propagation matches a driver replay over the verified " +
    "pair graph and its sizes are consistent") {
    val pairs = text.NearDup.minhashDupPairsCached(
        ops.Tables.table(spark, sf, "documents"), "doc_id", "text",
        threshold = 0.8, cacheKey = sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = lpa(pairs, 4)
    val sizes = expect.values.groupBy(identity).map { case (l, v) => l -> v.size }
    val got = Queries.graphLabelPropagation(spark, sf).collect()
    assert(got.nonEmpty && got.length == expect.size)
    got.foreach { r =>
      assert(r.getLong(1) == expect(r.getLong(0)), s"node ${r.getLong(0)}")
      assert(r.getLong(2) == sizes(r.getLong(1)).toLong)
    }
  }

  test("eval_cohen_kappa matches a driver replay of the exact-integer " +
    "contingency identities") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    var (n11, n10, n01, n00) = (0L, 0L, 0L, 0L)
    docs.foreach { txt =>
      val sp = txt.split(" ", -1)
      val ra = 2 * sp.distinct.length >= sp.length
      val stop = sp.count(_ == "the") + sp.count(_ == "a")
      val rb = 20 * stop >= sp.length
      if (ra && rb) n11 += 1 else if (ra) n10 += 1
      else if (rb) n01 += 1 else n00 += 1
    }
    val n = n11 + n10 + n01 + n00
    val peNum = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = Queries.evalCohenKappa(spark, sf).collect()
    assert(row.length == 1)
    val r = row(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert(math.abs(r.getDouble(5) - (n11 + n00).toDouble / n) < 1e-6)
    assert(math.abs(r.getDouble(7) -
      (n * (n11 + n00) - peNum).toDouble / (n * n - peNum)) < 1e-6)
    assert(r.getDouble(8) == r6(math.pow((n10 - n01).toDouble, 2) /
      (n10 + n01)))
    // both raters must actually disagree somewhere for kappa to mean much
    assert(n10 + n01 > 0)
  }

  test("stream_kappa: the folded contingency grid yields the batch kappa " +
    "row exactly") {
    val streamed = streaming.StreamTwins.streamKappa(spark, sf).collect()
    val batch = Queries.evalCohenKappa(spark, sf).collect()
    assert(streamed.length == 1)
    assert(streamed.head.toSeq == batch.head.toSeq)
  }

  test("RBO weight table is the exact-rational image of (1-p)p^(d-1)/d " +
    "on the 2520e10 grid: identical top-10 lists score exactly " +
    "1 - 0.9^10") {
    // sum over d of w_d * d (A_d = d for identical lists), as BigInt
    val num = Queries.RboWeights.map { case (d, w) => BigInt(w) * d }.sum
    // (1 - 0.9^10) * 2520e10 exactly: 2520e10 - 2520 * 9^10 / 10^(-? )
    // 0.9^10 * 2520*10^10 = 2520 * 9^10
    val expect = BigInt(2520) * BigInt(10).pow(10) -
      BigInt(2520) * BigInt(9).pow(10)
    assert(num == expect)
    Queries.RboWeights.foreach { case (d, w) =>
      assert(BigInt(w) == BigInt(9).pow(d - 1) * BigInt(10).pow(10 - d) *
        (2520 / d))
    }
  }

  test("eval_rbo matches a driver replay of the truncated RBO over the " +
    "two rankers' top-10 lists") {
    val (bmDf, tiDf) = Queries.rankerTop10(spark, sf)
    val bm = bmDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (q, g) =>
        q -> g.sortBy(_._3).map(_._2).toSeq }
    val ti = tiDf.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).map { case (q, g) =>
        q -> g.sortBy(_._3).map(_._2).toSeq }
    val got = Queries.evalRbo(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    got.foreach { r =>
      val q = r.getLong(0)
      val (b, t) = (bm.getOrElse(q, Seq()), ti.getOrElse(q, Seq()))
      val num = Queries.RboWeights.map { case (d, w) =>
        w * b.take(d).toSet.intersect(t.take(d).toSet).size }.sum
      assert(r.getLong(1) ==
        b.take(10).toSet.intersect(t.take(10).toSet).size.toLong)
      assert(r.getLong(2) == num)
      assert(math.abs(r.getDouble(3) - num.toDouble / Queries.RboDen) < 1e-9)
    }
  }
}

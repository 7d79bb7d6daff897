package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AJ: leakage-safe splits, dup-graph density audit, power
  * analysis, streaming k-anonymity MV. */
class WaveAJSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("split_group_safe: every near-dup cluster lands in exactly one " +
    "fold, and folds follow the md5 band rule on the cluster label") {
    val got = Queries.splitGroupSafe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = ops.Tables.table(spark, sf, "documents").count()
    assert(got.length == nDocs && got.nonEmpty)
    // leakage safety: one fold per cluster
    got.groupBy(_._2).foreach { case (c, g) =>
      assert(g.map(_._3).distinct.length == 1, s"cluster $c straddles folds")
    }
    // md5 band rule replayed driver-side
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, c, fold) =>
      md.reset()
      val h = md.digest(c.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      val exp = if (h < "40") 0L else if (h < "80") 1L
        else if (h < "c0") 2L else 3L
      assert(fold == exp, s"doc $id cluster $c")
    }
    // folds are genuinely used (4-way split over enough clusters)
    assert(got.map(_._3).distinct.length == 4)
  }

  test("split_group_safe puts every member of a dedup cluster in the " +
    "same fold as its dedup_components counterpart") {
    val folds = Queries.splitGroupSafe(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val comp = Queries.dedupComponents(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    comp.groupBy(_._2).foreach { case (c, g) =>
      val fs = g.map(x => folds(x._1)._2).distinct
      assert(fs.length == 1, s"component $c members split across folds $fs")
    }
  }

  test("dedup_cluster_density matches a driver recompute and is bounded " +
    "by the all-pairs ceiling") {
    val pairs = text.NearDup.minhashDupPairsCached(
      ops.Tables.table(spark, sf, "documents"), "doc_id", "text", 0.8, sf)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comp = ops.Components.connectedComponentsCached(
      text.NearDup.minhashDupPairsCached(
        ops.Tables.table(spark, sf, "documents"), "doc_id", "text", 0.8, sf),
      "a_id", "b_id", sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val sizes = comp.values.groupBy(identity).map { case (c, g) =>
      c -> g.size.toLong
    }
    val edges = pairs.groupBy(p => comp(p._1)).map { case (c, g) =>
      c -> g.length.toLong
    }
    val expect = sizes.filter(_._2 >= 2).toSeq.groupBy(_._2)
      .map { case (sz, g) =>
        val e = g.map(x => edges.getOrElse(x._1, 0L)).sum
        sz -> (g.length.toLong, e,
          e * 2000000L / (g.length.toLong * sz * (sz - 1)))
      }
    val got = Queries.dedupClusterDensity(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (nc, e, d) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nc, e, d)),
        s"size ${r.getLong(0)}")
      assert(r.getLong(3) <= 1000000L) // density can't exceed all-pairs
    }
  }

  test("dq_power matches a driver recompute of the closed-form sample " +
    "size from exact sums") {
    val rows = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (tp, g) =>
      val n = g.length.toLong
      val sx = g.map(_._2).sum
      val sxx = g.map(x => x._2 * x._2).sum
      val varc = (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) /
        (n.toDouble * (n.toDouble - 1.0))
      val delta = 0.05 * (sx.toDouble / n.toDouble)
      tp -> (n, math.ceil(7.84886698 * (2.0 * varc) /
        (delta * delta)).toLong)
    }
    val got = Queries.dqPower(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, npa) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(4) == npa,
        s"type ${r.getString(0)}: got ${r.getLong(4)} want $npa")
      assert(r.getLong(4) > 0L)
    }
  }

  test("stream_kanonymity: the incrementally folded QI group counts " +
    "yield the batch census exactly") {
    val streamed = streaming.StreamTwins.streamKanonymity(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val batch = Queries.dqKanonymity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("stream_domain_mix: the incrementally folded per-domain cells " +
    "yield the batch mixture weights exactly") {
    val batch = Queries.sampleDomainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val streamed = streaming.StreamTwins.streamDomainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("dq_cramers_v: matches a driver BigInt replay of the chi-square " +
    "contingency and stays inside the V-squared bounds") {
    val out = Queries.dqCramersV(spark, sf).collect().head
    val (n, nr, nc, dof, chi2, v2) = (out.getLong(0), out.getLong(1),
      out.getLong(2), out.getLong(3), out.getLong(4), out.getLong(5))
    assert(dof == (nr - 1) * (nc - 1))
    assert(v2 >= 0 && v2 <= 1000000L, s"V^2 must be a ppm fraction: $v2")
    assert(v2 == chi2 / (n * (math.min(nr, nc) - 1)))
    // independent replay from the raw events
    val cells = ops.Tables.table(spark, sf, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.dayofweek(
          org.apache.spark.sql.functions.col("ts")).as("dow"))
      .count().collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val rT = cells.groupBy(_._1).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val cT = cells.groupBy(_._2).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val nn = BigInt(cells.map(_._3).sum)
    val expect = cells.map { case (et, dw, obs) =>
      val d = BigInt(obs) * nn - rT(et) * cT(dw)
      d * d * BigInt(1000000) / (rT(et) * cT(dw) * nn)
    }.sum
    assert(nn.toLong == n && expect.toLong == chi2,
      s"driver replay chi2 $expect != declared $chi2")
  }

  test("eval_ece: bins partition the scored rows, stats are the exact " +
    "truncating ratios, gap is their absolute difference") {
    val out = Queries.evalEce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty && out.forall(b => b._1 >= 0 && b._1 <= 9))
    val scored = ops.Tables.table(spark, sf, "events")
      .filter(org.apache.spark.sql.functions.col("value").isNotNull).count()
    assert(out.map(_._2).sum == scored, "bins must partition scored rows")
    out.foreach { case (_, n, nPos, acc, _, gap) =>
      assert(acc == nPos * 1000000L / n)
      assert(nPos <= n && gap >= 0)
    }
    // the fixture's purchase rate is score-independent, so confidence
    // deciles must NOT be calibrated: some bin carries a visible gap
    assert(out.map(_._6).max > 100000L,
      "expected a miscalibrated fixture (gap > 0.1 somewhere)")
  }

  test("dq_ldiversity: census monotone in l, totals constant, share " +
    "consistent with the row counts") {
    val out = Queries.dqLdiversity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq == Seq(2L, 3L, 4L, 5L))
    assert(out.map(_._4).distinct.size == 1, "total must not vary with l")
    // more distinct values required -> at least as many groups fall below
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq)
    out.foreach { case (_, _, rows, total, ppm) =>
      assert(ppm == rows * 1000000L / total)
    }
    // the sensitive attribute has 5 segments, so l=5 must strictly
    // dominate l=2 on this corpus (tiny QI groups can't hold 5 segments)
    assert(out.last._2 > out.head._2)
  }

  test("sample_domain_mix: weights are a normalized mixture that " +
    "upweights above-weighted-mean-loss domains (Group-DRO direction)") {
    val out = Queries.sampleDomainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty && out.map(_._1).toSeq == out.map(_._1).sorted.toSeq)
    val wsum = out.map(_._4).sum
    // weights live on the 1e9 lattice, reported in ppm: Σ = 1e6 minus
    // truncation dust (one unit per domain at each of the two divisions)
    assert(wsum <= 1000000L && wsum >= 1000000L - 2L * out.length,
      s"weights must normalize to ~1e6 ppm, got $wsum")
    assert(out.forall(_._4 > 0L), "no domain may be zeroed by 50 rounds")
    // the max-loss domain must carry the max weight; a min-loss domain
    // must never out-weigh it
    val byLoss = out.sortBy(_._3)
    assert(byLoss.last._4 == out.map(_._4).max,
      s"max-loss domain ${byLoss.last._1} must get the top weight: $out")
    assert(byLoss.head._4 <= byLoss.last._4)
  }
}

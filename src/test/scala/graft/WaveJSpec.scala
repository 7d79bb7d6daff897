package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation specs for the wave-J operators (fuzzy edit
  * join, exact prefix-filter Jaccard, OLS, chi-square, basket rules, exact
  * ECDF). The driver's DuckDB oracle already hash-checks each query at
  * sf0.01; these pin the ALGORITHMIC claims the oracle cannot see — the
  * blocking schemes are lossless, the exact-arithmetic invariants hold —
  * against brute-force Scala recomputations at sf0.001. */
class WaveJSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("join_fuzzy_edit equals the brute-force O(n2) levenshtein join " +
    "(deletion-neighborhood blocking is lossless at radius 1)") {
    val names = ops.Tables.table(spark, sf, "customer")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (ai, an) <- names; (bi, bn) <- names
      if ai < bi && levenshtein(an, bn) <= 1
    } yield (ai, bi, levenshtein(an, bn).toLong)).sortBy(t => (t._1, t._2))
    val got = Queries.joinFuzzyEdit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "fixture must contain distance-1 name pairs")
    assert(got == expected.toSeq)
  }

  test("deletion neighborhoods intersect for EVERY string pair within " +
    "edit distance 1 (the SymSpell completeness property, adversarial " +
    "single-edit mutations)") {
    def dels(s: String): Set[String] =
      Set(s) ++ s.indices.map(i => s.take(i) + s.drop(i + 1))
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghij"
    (1 to 500).foreach { _ =>
      val base = (1 to 3 + rnd.nextInt(15))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val mutated = rnd.nextInt(3) match {
        case 0 => // substitution
          val i = rnd.nextInt(base.length)
          base.updated(i, alphabet(rnd.nextInt(alphabet.length)))
        case 1 => // deletion
          val i = rnd.nextInt(base.length)
          base.take(i) + base.drop(i + 1)
        case _ => // insertion
          val i = rnd.nextInt(base.length + 1)
          base.take(i) + alphabet(rnd.nextInt(alphabet.length)) + base.drop(i)
      }
      assert(levenshtein(base, mutated) <= 1)
      assert(dels(base).intersect(dels(mutated)).nonEmpty,
        s"blocking would miss ($base, $mutated)")
    }
  }

  test("dedup_prefix_filter equals the brute-force exact shingle-set " +
    "Jaccard join (prefix + positional filtering is lossless at t = 0.8)") {
    val sh = text.NearDup.shingleTable(
        ops.Tables.table(spark, sf, "documents"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val expected = (for {
      (ai, at) <- sh; (bi, bt) <- sh
      if ai < bi
      inter = at.intersect(bt).size
      union = at.size + bt.size - inter
      j = BigDecimal(inter.toDouble / union)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.8
    } yield (ai, bi, j)).sortBy(t => (t._1, t._2))
    val got = Queries.dedupPrefixFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty, "fixture corpus must contain exact near-dup pairs")
    assert(got == expected.toSeq)
  }

  test("the exact prefix-filter tier and the probabilistic MinHash+LSH " +
    "tier agree pair-for-pair (cross-algorithm ground truth)") {
    val exact = Queries.dedupPrefixFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lsh = Queries.dedupMinhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == lsh)
  }

  test("agg_ols reproduces the closed-form fit from exact BigInt " +
    "co-moments, and R2 is the squared correlation") {
    val rows = ops.Tables.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byFlag = rows.groupBy(_._1)
    val got = Queries.aggOls(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == byFlag.keySet)
    byFlag.foreach { case (flag, rs) =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * BigInt(r._3)).sum
      val sxx = rs.map(r => BigInt(r._2) * BigInt(r._2)).sum
      val syy = rs.map(r => BigInt(r._3) * BigInt(r._3)).sum
      val cov = (n * sxy - sx * sy).toDouble
      val varx = (n * sxx - sx * sx).toDouble
      val vary = (n * syy - sy * sy).toDouble
      val slope = cov / varx
      val (gn, gs, gi, gr2) = got(flag)
      assert(gn == rs.length.toLong)
      assert(math.abs(gs - slope) < 1e-6)
      assert(math.abs(gi - (sy.toDouble - slope * sx.toDouble) / n.toDouble) < 1e-6)
      assert(math.abs(gr2 - cov * cov / (varx * vary)) < 1e-6)
      // R2 must be the square of the Pearson r between x and y
      val r = cov / (math.sqrt(varx) * math.sqrt(vary))
      assert(math.abs(gr2 - r * r) < 1e-6)
    }
  }

  test("dq_chisq: observed cells partition the table and expected counts " +
    "preserve row/column margins (the contingency identities)") {
    val out = Queries.dqChisq(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val total = ops.Tables.table(spark, sf, "events").count()
    assert(out.map(_._3).sum == total)
    // per event type, expected counts sum back to the observed row margin
    out.groupBy(_._1).foreach { case (_, cells) =>
      val obsMargin = cells.map(_._3).sum.toDouble
      val expMargin = cells.map(_._4).sum
      assert(math.abs(expMargin - obsMargin) < 0.01 * obsMargin + 1.0)
    }
    // chi2 terms are nonnegative and finite
    assert(out.forall(c => c._5 >= 0 && !c._5.isNaN && !c._5.isInfinite))
  }

  test("basket_rules: confidence is conditional support, lift is " +
    "symmetric, and every metric matches a driver recomputation") {
    val baskets = ops.Tables.table(spark, sf, "events")
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val users = baskets.map(_._1).distinct.length.toLong
    val itemN = baskets.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = baskets.toSeq.groupBy(_._1).values.flatMap { rs =>
      val ts = rs.map(_._2)
      for (a <- ts; b <- ts if a != b) yield (a, b)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Queries.basketRules(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, c) = (r.getString(0), r.getString(1))
      val nxy = r.getLong(2)
      assert(nxy == pairN((a, c)))
      assert(r.getLong(3) == 1000000L * nxy / users)
      assert(r.getLong(4) == 1000000L * nxy / itemN(a))
      assert(r.getLong(5) == 1000000L * nxy * users / (itemN(a) * itemN(c)))
    }
    // co-occurrence counts are symmetric: n(x->y) == n(y->x)
    val m = got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    m.foreach { case ((a, c), n) => assert(m((c, a)) == n) }
  }

  test("window_percentile_rank equals rank() semantics over the base " +
    "table and spans exactly [0, 1e6] ppm") {
    val cents = ops.Tables.table(spark, sf, "orders")
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val firstIdx = cents.zipWithIndex.groupBy(_._1)
      .view.mapValues(_.map(_._2).min).toMap
    val got = Queries.windowPercentileRank(spark, sf).collect()
    assert(got.map(_.getLong(1)).sum == n)
    got.foreach { r =>
      val (v, rk, ppm) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(rk == firstIdx(v) + 1L, s"rank of $v")
      assert(ppm == 1000000L * (rk - 1) / (n - 1))
    }
    assert(got.head.getLong(3) == 0L)
    assert(got.map(_.getLong(3)).max <= 1000000L)
  }
}

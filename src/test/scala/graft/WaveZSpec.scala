package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave Z: distributed GLM training (IRLS logistic regression) against
  * the documented synthetic teacher. */
class WaveZSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val fitted: Map[String, Double] =
    Queries.trainLogreg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Driver-side features + teacher labels, mirroring the query. */
  private lazy val rows: Array[(Double, Array[Double])] = {
    val base = ops.Tables.table(spark, sf, "documents").select(
        col("doc_id"),
        lit(1.0).as("x0"),
        (col("n_chars").cast("double") / lit(1000.0)).as("x1"),
        (size(split(col("text"), " ")).cast("double") / lit(100.0)).as("x2"),
        (col("n_chars").cast("double") /
          (size(split(col("text"), " ")) + 1).cast("double")).as("x3"),
        (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
          (col("n_chars") + 1).cast("double")).as("x4"),
        (length(regexp_replace(col("text"), "[aeiou]", "")).cast("double") /
          (col("n_chars") + 1).cast("double")).as("x5"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .collect()
      .map(r => (r.getLong(0),
        Array.tabulate(6)(i => r.getDouble(i + 1)), r.getString(7)))
    val scores = base.map { case (_, x, _) => x(1) - 2.0 * x(5) }.sorted
    // Spark's exact percentile(·, 0.5): middle value for odd n,
    // midpoint of the two middle values for even n
    val exactThr = {
      val n = scores.length
      if (n % 2 == 1) scores(n / 2)
      else (scores(n / 2 - 1) + scores(n / 2)) / 2.0
    }
    base.map { case (_, x, h) =>
      val flip = h == "0" || h == "1"
      val y0 = (x(1) - 2.0 * x(5)) > exactThr
      ((if (y0 != flip) 1.0 else 0.0), x)
    }
  }

  test("train_logreg recovers the teacher: AUC well above the 12.5% " +
    "label-noise ceiling's midpoint") {
    assert(fitted("n_pos") > 0 && fitted("n_pos") < fitted("n_docs"))
    assert(fitted("auc") > 0.8, s"AUC ${fitted("auc")} too low vs teacher")
    assert(fitted("auc") <= 1.0)
  }

  test("train_logreg: the fixpoint satisfies the logistic normal " +
    "equations (gradient near zero) and beats the null model") {
    val beta = (0 until 6).map(i => fitted(s"beta_x$i")).toArray
    val n = rows.length
    val grad = new Array[Double](6)
    var loss = 0.0
    rows.foreach { case (y, x) =>
      val eta = x.zip(beta).map { case (a, b) => a * b }.sum
      val p = 1.0 / (1.0 + math.exp(-eta))
      (0 until 6).foreach(i => grad(i) += (y - p) * x(i))
      loss -= y * math.log(math.max(p, 1e-12)) +
        (1 - y) * math.log(math.max(1 - p, 1e-12))
    }
    val gnorm = math.sqrt(grad.map(g => g * g).sum) / n
    assert(gnorm < 5e-2, s"per-row gradient norm $gnorm not near zero")
    val base = {
      val pos = rows.count(_._1 == 1.0).toDouble
      val p0 = pos / n
      -(pos * math.log(p0) + (n - pos) * math.log(1 - p0))
    }
    assert(loss < base, s"fit loss $loss not below null loss $base")
  }

  private lazy val iso: Array[(Long, Long, Long, Long, Long)] =
    Queries.calibrateIsotonic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

  test("calibrate_isotonic: 20 exact-population bins, raw rate column " +
    "is n_pos*1e6/n per bin") {
    assert(iso.map(_._1).toSeq == (1L to 20L))
    val total = iso.map(_._2).sum
    iso.foreach { case (b, n, p, raw, _) =>
      assert(math.abs(n - total / 20) <= 1, s"bin $b population $n")
      assert(p >= 0 && p <= n)
      assert(raw == p * 1000000L / n, s"bin $b raw_ppm $raw")
    }
  }

  test("calibrate_isotonic: iso_ppm is non-decreasing and conserves " +
    "positive mass to integer-division slack") {
    val isoSeq = iso.map(_._5)
    isoSeq.sliding(2).foreach { case Array(a, b) =>
      assert(a <= b, s"iso_ppm not monotone: $a > $b")
    }
    val mass = iso.map { case (_, n, _, _, i) => n * i }.sum
    val posMass = iso.map(_._3).sum * 1000000L
    assert(math.abs(mass - posMass) <= iso.map(_._2).sum,
      s"mass $mass vs pos mass $posMass")
    // the teacher has real signal: top-bin calibrated rate beats bottom
    assert(isoSeq.last > isoSeq.head,
      s"no learned signal: ${isoSeq.head} .. ${isoSeq.last}")
  }

  test("calibrate_isotonic differentials a naive O(k^2) driver PAV on " +
    "the same (n, n_pos) bins") {
    // independent PAV: repeatedly merge the FIRST adjacent violator
    // until monotone (order of merges does not change the PAV fixpoint)
    var pools = iso.map { case (b, n, p, _, _) =>
      (List(b), n, p) }.toList
    var changed = true
    while (changed) {
      changed = false
      // merge when rate(j) >= rate(j+1), exactly the query's cross-
      // product comparison (equal rates pool too — idempotent for PAV)
      val i = pools.indices.dropRight(1).find { j =>
        val (_, n1, p1) = pools(j); val (_, n2, p2) = pools(j + 1)
        p1 * n2 >= p2 * n1
      }
      i.foreach { j =>
        val (b1, n1, p1) = pools(j); val (b2, n2, p2) = pools(j + 1)
        pools = pools.take(j) ::: (b1 ++ b2, n1 + n2, p1 + p2) ::
          pools.drop(j + 2)
        changed = true
      }
    }
    val expect = pools.flatMap { case (bs, n, p) =>
      bs.map(_ -> p * 1000000L / n) }.toMap
    iso.foreach { case (b, _, _, _, i) =>
      assert(i == expect(b), s"bin $b: query iso $i vs driver PAV ${expect(b)}")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Drift

/** Two-sample KS statistic: hand-computed fixtures plus the invariants a
  * drift gate leans on (zero for identical samples, bounded by 1, null
  * exclusion). */
class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ksRow(vals: Seq[(Long, Boolean)]) = {
    val r = Drift.ks(vals.toDF("v", "in_a"), "v", "in_a").collect()
    assert(r.length == 1)
    (r.head.getDouble(0), r.head.getLong(1), r.head.getLong(2), r.head.getLong(3))
  }

  test("hand-computed KS: A={1,2,3} vs B={3,4,5} → 2/3 at value 2") {
    // CDF_A: 1→1/3 2→2/3 3→1 4→1 5→1 ; CDF_B: 1→0 2→0 3→1/3 4→2/3 5→1
    // gaps: .333 .667 .667 .333 0 → max 2/3, first attained at 2
    val (ks, at, na, nb) = ksRow(
      Seq(1L, 2L, 3L).map((_, true)) ++ Seq(3L, 4L, 5L).map((_, false)))
    assert(ks == BigDecimal(2.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(at == 2L && na == 3L && nb == 3L)
  }

  test("identical samples drift zero; disjoint samples drift one") {
    val same = Seq(1L, 2L, 3L)
    assert(ksRow(same.map((_, true)) ++ same.map((_, false)))._1 == 0.0)
    val (ks, at, _, _) = ksRow(
      Seq(1L, 2L).map((_, true)) ++ Seq(10L, 20L).map((_, false)))
    assert(ks == 1.0 && at == 2L) // CDF_A complete before CDF_B starts
  }

  test("unbalanced sample sizes use each side's own total") {
    // A={1,1,2,2} (n=4), B={2} (n=1): CDF_A 1→.5 2→1; CDF_B 1→0 2→1
    val (ks, at, na, nb) = ksRow(
      Seq(1L, 1L, 2L, 2L).map((_, true)) :+ ((2L, false)))
    assert(ks == 0.5 && at == 1L && na == 4L && nb == 1L)
  }

  test("null values are excluded from both CDFs") {
    val df = Seq((Some(1L), true), (None, true), (Some(1L), false),
      (None, false)).toDF("v", "in_a")
    val r = Drift.ks(df, "v", "in_a").collect().head
    assert(r.getDouble(0) == 0.0 && r.getLong(2) == 1L && r.getLong(3) == 1L)
  }

  private def jsRows(vals: Seq[(String, Boolean)]) =
    Drift.jsDivergence(vals.toDF("c", "in_a"), "c", "in_a")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

  test("hand-computed JS/LeCam: A={x:3,y:1} vs B={x:1,y:3}") {
    // p_x=3/4 q_x=1/4 m_x=1/2: js_x = .5*(.75*log2(1.5) + .25*log2(.5))
    // (y is the mirror image); lecam_x = .5*(1/2)^2/1 = 1/8
    val expJs = 0.5 * (0.75 * math.log(1.5) / math.log(2.0) - 0.25)
    val out = jsRows(
      Seq.fill(3)(("x", true)) ++ Seq(("y", true)) ++
      Seq(("x", false)) ++ Seq.fill(3)(("y", false)))
    val (ca, cb, js, lc) = out("x")
    assert(ca == 3L && cb == 1L)
    assert(math.abs(js - expJs) < 1e-9 && math.abs(lc - 0.125) < 1e-9)
    assert(out("y")._3 == js && out("y")._4 == lc) // symmetric mix mirrors
  }

  test("identical category mix diverges zero; disjoint mixes sum to one " +
      "in both divergences") {
    val same = jsRows(Seq(("x", true), ("y", true), ("x", false), ("y", false)))
    assert(same.values.forall(v => v._3 == 0.0 && v._4 == 0.0))
    val dis = jsRows(
      Seq(("x", true), ("x", true), ("y", true), ("z", false), ("w", false)))
    assert(math.abs(dis.values.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(dis.values.map(_._4).sum - 1.0) < 1e-9)
  }

  test("cusum: hand-computed level shift — max deviation lands on the " +
      "last point before the shift") {
    // series 1,1,1,5,5,5 (n=6, Σx=18); cusum_k = 6·cx − k·18:
    // k=1:−12 k=2:−24 k=3:−36 k=4:−24 k=5:−12 k=6:0 → max |·| 36 at k=3
    val s = Seq(("a", 1, 1L), ("a", 2, 1L), ("a", 3, 1L),
      ("a", 4, 5L), ("a", 5, 5L), ("a", 6, 5L)).toDF("g", "t", "x")
    val r = Drift.cusum(s, "g", "t", "x").collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 6L && r.head.getLong(2) == 36L &&
      r.head.getInt(3) == 3)
  }

  test("cusum: constant series deviates zero, argmax ties to the " +
      "earliest point; keys stay independent") {
    val s = Seq(("flat", 10, 7L), ("flat", 20, 7L), ("flat", 30, 7L),
      ("step", 1, 0L), ("step", 2, 100L)).toDF("g", "t", "x")
    val out = Drift.cusum(s, "g", "t", "x").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(out("flat") == ((3L, 0L, 10)))
    // step: n=2 Σx=100; k=1: 2·0−100=−100 → max dev 100 at t=1
    assert(out("step") == ((2L, 100L, 1)))
  }
}

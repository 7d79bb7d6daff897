package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PageRank

/** PageRank invariants on graphs with known answers — the verification an
  * iterative floating-point fixpoint owes in place of a SQL oracle. */
class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 20) =
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("rank mass is conserved (sums to 1) on a connected graph") {
    val r = ranksOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("a cycle is symmetric: every node gets exactly 1/n") {
    val n = 6
    val edges = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val r = ranksOf(edges)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12))
  }

  test("star: the hub outranks the leaves, leaves are equal") {
    // a star is bipartite, so power iteration oscillates with the damping
    // eigenvalue (-0.85): residual after k rounds ~ 0.85^k. 60 rounds →
    // ~6e-5, so test the fixpoint identity at 1e-3.
    val r = ranksOf(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)), iters = 60)
    val hub = r(0L); val leaves = (1L to 4L).map(r)
    assert(leaves.forall(l => hub > 2 * l))
    assert(leaves.forall(l => math.abs(l - leaves.head) < 1e-12))
    // fixpoint identity: hub inflow is the whole damped leaf mass (deg 1)
    assert(math.abs(hub - (0.15 / 5 + 0.85 * leaves.sum)) < 1e-3)
  }

  test("disconnected components keep per-node teleport mass; total still 1") {
    val r = ranksOf(Seq((1L, 2L), (10L, 11L), (10L, 12L)))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // the 2-clique is internally symmetric
    assert(math.abs(r(1L) - r(2L)) < 1e-12)
  }

  test("fixed-point ranks track the float fixpoint, conserve mass up to " +
    "floor loss, and are exactly symmetric") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val fx = PageRank.ranksFixedPoint(
        edges.toDF("src", "dst"), "src", "dst", iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fl = PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // integer iterate = float iterate to well past the published 6 digits
    fx.foreach { case (k, v) =>
      assert(math.abs(v.toDouble / PageRank.Scale - fl(k)) < 1e-9,
        s"node $k: fixed $v vs float ${fl(k)}")
    }
    // mass conserved up to the documented floor loss (a few units per
    // node per round, geometrically damped)
    val total = fx.values.sum
    assert(total <= PageRank.Scale && total > PageRank.Scale - 10000L)
    // a cycle's symmetry is EXACT in integers — every node identical
    val cyc = (0 until 6).map(i => (i.toLong, ((i + 1) % 6).toLong))
    val r6 = PageRank.ranksFixedPoint(
        cyc.toDF("src", "dst"), "src", "dst", iters = 10)
      .collect().map(_.getLong(1))
    assert(r6.distinct.length == 1)
  }

  test("more iterations converge: consecutive rounds move less") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val a = ranksOf(edges, iters = 5)
    val b = ranksOf(edges, iters = 6)
    val c = ranksOf(edges, iters = 19)
    val d = ranksOf(edges, iters = 20)
    def delta(x: Map[Long, Double], y: Map[Long, Double]) =
      x.keys.map(k => math.abs(x(k) - y(k))).max
    assert(delta(c, d) < delta(a, b))
    // contraction rate is the damping factor: 14 extra rounds shrink the
    // step by ~0.85^14 ≈ 0.1
    assert(delta(c, d) < 0.3 * delta(a, b))
  }
}

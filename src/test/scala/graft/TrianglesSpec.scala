package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Triangles

/** Triangle enumeration on graphs with closed-form answers, plus the
  * invariances the degree-oriented construction must keep (input edge
  * orientation, duplicate edges, hub skew). */
class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]): Seq[(Long, Long, Long)] =
    Triangles.enumerate(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted

  test("K4 has exactly the four sorted triangles") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    assert(tri(k4) === Seq((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L),
      (1L, 2L, 3L)))
  }

  test("trees and stars have none; a 4-cycle has none") {
    assert(tri(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))).isEmpty)
    assert(tri(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))).isEmpty)
  }

  test("result is invariant to edge direction and duplicate edges") {
    val t = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val messy = t ++ t.map(_.swap) ++ t // both directions + repeats
    assert(tri(messy) === Seq((0L, 1L, 2L)))
    assert(tri(t.map(_.swap)) === Seq((0L, 1L, 2L)))
  }

  test("hub skew: fan of triangles through one vertex counts exactly") {
    // vertex 0 joined to 2k spokes paired into k triangles: degree(0)=2k
    // but each spoke pair closes exactly one triangle.
    val k = 20L
    val edges = (0L until k).flatMap { i =>
      val (u, v) = (1 + 2 * i, 2 + 2 * i)
      Seq((0L, u), (0L, v), (u, v))
    }
    val got = tri(edges)
    assert(got.size === k)
    assert(got.forall(_._1 == 0L))
  }

  test("overlapping cliques: K5 has C(5,3)=10 triangles") {
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(tri(k5).size === 10)
  }
}

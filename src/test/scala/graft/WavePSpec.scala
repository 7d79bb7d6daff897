package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation specs for the wave-P operators (round 5):
  * iterative BPE training and the PSI drift profile. */
class WavePSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("vocab_bpe_iterative equals a full driver-side replay of the " +
    "10-round merge loop (same tie-break, same re-segmentation)") {
    val words = ops.Tables.table(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .filter(_.matches("^[a-z]{2,}$"))
    val vocab = words.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    // segmentation state: word -> symbol list, weighted by count
    var seg = vocab.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val expected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    for (r <- 1 to 10) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seg.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (counts.nonEmpty) {
        // the engine tie-breaks on the "(x)(y)" pattern string ascending
        val ((a, b), n) = counts.toSeq
          .minBy { case ((x, y), m) => (-m, s"($x)($y)") }
        expected += ((r.toLong, a, b, a + b, n))
        seg = seg.map { case (syms, c) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // left-to-right non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.toVector, c)
        }
      }
    }
    val got = Queries.vocabBpeIterative(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected.toSeq)
    // the loop actually iterates: some later merge must consume an earlier
    // round's MERGED symbol (multi-char left or right side)
    assert(got.exists(m => m._2.length > 1 || m._3.length > 1),
      "no merge ever built on a previous round's output — loop is inert")
  }

  test("dq_psi: bins partition the corpus, terms are finite, and the " +
    "doc_id-parity split shows near-zero drift") {
    val got = Queries.dqPsi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val nDocs = ops.Tables.table(spark, sf, "documents").count()
    assert(got.map(g => g._2 + g._3).sum == nDocs,
      "bin counts must partition the corpus")
    assert(got.forall(g => g._1 >= 0 && g._1 <= 9), "bins must be 0..9")
    assert(got.forall(g => !g._4.isNaN && !g._4.isInfinite))
    // PSI terms are nonnegative by construction ((p-q)ln(p/q) >= 0) and a
    // parity split of one corpus sits under the conventional 0.25 "major
    // shift" threshold (sampling noise at 500 docs measures ~0.09-0.13)
    assert(got.forall(_._4 >= 0.0))
    assert(got.map(_._4).sum < 0.25,
      s"parity split should not drift: psi=${got.map(_._4).sum}")
  }
}

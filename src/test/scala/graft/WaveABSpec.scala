package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AB: int8 embedding quantization, local clustering coefficient,
  * Theil–Sen robust trend, lang-ID confusion-matrix evaluation. */
class WaveABSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("embed_quantize: per-dim error is bounded by the quantization " +
    "step, and a driver recompute agrees on every vector") {
    val rows = Queries.embedQuantize(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.nonEmpty)
    // driver recompute over the raw arrays
    val raw = ops.Tables.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val micro = raw.map { case (id, v) =>
      (id, v.map(x => math.floor(x.toDouble * 1000000.0).toLong))
    }
    val dims = micro.head._2.length
    val mn = Array.tabulate(dims)(d => micro.map(_._2(d)).min)
    val mx = Array.tabulate(dims)(d => micro.map(_._2(d)).max)
    micro.foreach { case (id, m) =>
      var l1 = 0L; var linf = 0L
      for (d <- 0 until dims) {
        val span = mx(d) - mn(d)
        val code = if (span == 0) 0L
          else Math.floorDiv((m(d) - mn(d)) * 255L, span)
        val deq = if (span == 0) mn(d)
          else mn(d) + Math.floorDiv(code * span, 255L)
        val err = math.abs(m(d) - deq)
        // one-step bound: |m - deq| <= ceil(span/255)
        assert(span == 0 || err <= (span + 254) / 255,
          s"vec $id dim $d: err $err exceeds step ${(span + 254) / 255}")
        l1 += err; linf = math.max(linf, err)
      }
      val (el1, elinf) = rows(id)
      assert(el1 == l1 && elinf == linf,
        s"vec $id: engine ($el1,$elinf) vs driver ($l1,$linf)")
    }
  }

  test("graph_clustering_coeff differentials a driver recompute from the " +
    "pair list, and every coefficient sits in [0,1]") {
    val pairs = text.NearDup.minhashDupPairsCached(
      ops.Tables.table(spark, sf, "documents"), "doc_id", "text", 0.8, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edge = pairs.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val expect = adj.toSeq.filter(_._2.size >= 2).map { case (v, ns) =>
      val sorted = ns.toSeq.sorted
      val tri = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        if edge.contains((sorted(i), sorted(j))) ||
          edge.contains((sorted(j), sorted(i)))
      } yield 1).size.toLong
      (v, ns.size.toLong, tri)
    }.sortBy(_._1)
    val got = Queries.graphClusteringCoeff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == expect,
      s"clustering mismatch: engine ${got.toSeq} vs driver $expect")
    got.foreach(x => assert(x._4 >= 0.0 && x._4 <= 1.0))
  }

  test("trend_theilsen matches a naive driver median-of-slopes per type") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, rows) =>
      val pts = rows.map(x => (x._2, x._3)).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield (pts(j)._2 - pts(i)._2, pts(j)._1 - pts(i)._1)
      val sorted = slopes.sortBy(s =>
        (s._1.toDouble / s._2.toDouble, s._1, s._2))
      val n = sorted.length
      val (lo, hi) = (sorted((n - 1) / 2), sorted(n / 2))
      val (num, den) =
        if (n % 2 == 1) (lo._1, lo._2)
        else (lo._1 * hi._2 + hi._1 * lo._2, 2L * lo._2 * hi._2)
      tp -> (n.toLong, num, den)
    }
    Queries.trendTheilsen(spark, sf).collect().foreach { r =>
      val (n, num, den) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == num && r.getLong(3) == den,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)}) vs driver ($n,$num,$den)")
      assert(math.abs(r.getDouble(4) - num.toDouble / den.toDouble) < 1e-9)
    }
  }

  test("eval_confusion: cell counts tile the corpus, shares sum to 1 per " +
    "true class, and the diagonal agrees with lang_id") {
    val rows = Queries.evalConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val total = rows.map(_._3).sum
    val corpus = ops.Tables.table(spark, sf, "documents").count()
    assert(total == corpus, s"cells total $total != corpus $corpus")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(cells.map(_._3).sum == cells.head._4,
        s"$lang: cell sum != n_true")
      assert(math.abs(cells.map(_._5).sum - 1.0) < 1e-4,
        s"$lang: shares sum to ${cells.map(_._5).sum}")
    }
    // diagonal must equal lang_id's per-class correct counts
    val diag = Queries.langId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    rows.foreach { case (lang, pred, n, _, _) =>
      assert(diag.getOrElse((lang, pred), 0L) == n,
        s"cell ($lang,$pred): $n vs lang_id ${diag.getOrElse((lang, pred), 0L)}")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AC: hybrid RRF retrieval and the Ljung–Box white-noise test. */
class WaveACSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val L = 142813628717760L

  test("search_hybrid_rrf: every fused score decomposes into valid " +
    "L/(60+r) contributions, and top-5 ranks are dense per query") {
    val rows = Queries.searchHybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val valid = (for (r <- 1 to 10) yield L / (60 + r)).toSet
    val sums = (valid.map(Seq(_)) ++
      (for (a <- valid; b <- valid) yield Seq(a, b))).map(_.sum)
    rows.foreach { case (_, _, _, num, rrf) =>
      assert(sums.contains(num), s"rrf_num $num is not 1-2 contributions")
      assert(math.abs(rrf - num.toDouble / L.toDouble) < 1e-9)
    }
    rows.groupBy(_._1).foreach { case (q, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq,
        s"query $q ranks not dense")
      // fused order must be non-increasing in rrf_num
      g.sortBy(_._2).map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _ =>
      }
    }
  }

  test("search_hybrid_rrf puts a doc ranked #1 by BM25 AND #1 by tf-idf " +
    "at fused rank 1 (RRF dominance sanity)") {
    // a doc that leads BOTH base rankings scores 2*L/61 — strictly more
    // than any doc in only one list or lower in both
    val rows = Queries.searchHybridRrf(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, g) =>
      val top = g.minBy(_.getLong(1))
      if (top.getLong(3) == 2 * (L / 61)) {
        assert(top.getLong(1) == 1L)
      }
    }
    assert(byQ.nonEmpty)
  }

  test("dq_ljungbox differentials a naive driver ACF/Q recompute") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay, r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, rows) =>
      val pts = rows.sortBy(_._2)
      val n = pts.length.toLong
      val s = pts.map(_._3).sum
      val byD = pts.map(p => p._2 -> (n * p._3 - s)).toMap
      val a0 = byD.values.map(v => v * v).sum
      val ak = (1 to 7).map { k =>
        byD.toSeq.map { case (d, v) =>
          byD.get(d + k).map(_ * v).getOrElse(0L) }.sum
      }
      val q = (1 to 7).map { k =>
        val rho = ak(k - 1).toDouble / a0.toDouble
        rho * rho * (n * (n + 2)).toDouble / (n - k).toDouble
      }.sum
      tp -> (n, a0, ak.head.toDouble / a0.toDouble, q)
    }
    val got = Queries.dqLjungbox(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, a0, rho1, q) = expect(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == a0)
      assert(math.abs(r.getDouble(3) - rho1) < 1e-6)
      assert(math.abs(r.getDouble(4) - q) < 1e-4,
        s"${r.getString(0)}: Q ${r.getDouble(4)} vs driver $q")
      assert(r.getDouble(4) >= 0.0)
    }
  }
}

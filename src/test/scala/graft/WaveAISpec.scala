package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AI: Kruskal–Wallis (+ streaming MV), Friedman, Durbin–Watson,
  * vocabulary coverage, k-anonymity census. */
class WaveAISpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def eventCents(): Array[(String, Long)] =
    ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

  test("dq_kruskal matches a naive driver rank recompute of the " +
    "tie-corrected H") {
    val rows = eventCents()
    val n = rows.length.toLong
    // doubled tie-averaged rank per value
    val byVal = rows.groupBy(_._2).map { case (v, g) => v -> g.length.toLong }
    val sortedVals = byVal.keys.toSeq.sorted
    var cum = 0L
    val d2 = sortedVals.map { v =>
      val m = byVal(v); val d = 2 * cum + m + 1; cum += m; v -> d
    }.toMap
    val perType = rows.groupBy(_._1).map { case (tp, g) =>
      tp -> (g.length.toLong, g.map(x => d2(x._2)).sum)
    }
    val types = perType.keys.toSeq.sorted
    val b = types.map { tp =>
      val (na, r2) = perType(tp); r2.toDouble * r2.toDouble / na.toDouble
    }.reduceLeft(_ + _)
    val tie = byVal.values.map(m => m * m * m - m).sum
    val h = (12.0 * (b / 4.0) / (n.toDouble * (n.toDouble + 1.0))
      - 3.0 * (n.toDouble + 1.0)) /
      (1.0 - tie.toDouble / (n.toDouble * n.toDouble * n.toDouble
        - n.toDouble))
    val got = Queries.dqKruskal(spark, sf).collect()
    assert(got.length == types.length && got.nonEmpty)
    got.foreach { r =>
      val (na, r2) = perType(r.getString(0))
      assert(r.getLong(1) == na && r.getLong(2) == r2,
        s"type ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - h) < 1e-6)
    }
    // doubled rank-sums over all groups must total N(N+1) exactly
    assert(got.map(_.getLong(2)).sum == n * (n + 1))
  }

  test("stream_kruskal: the incrementally folded value grid yields the " +
    "batch statistic exactly") {
    val streamed = streaming.StreamTwins.streamKruskal(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = Queries.dqKruskal(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("dq_friedman matches a driver recompute over the blocked daily " +
    "grid, and rank sums total per block design") {
    val daily = ops.Tables.table(spark, sf, "events")
      .filter(col("ts") < lit("2024-01-29").cast("timestamp"))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay
          - java.time.LocalDate.parse("2024-01-01").toEpochDay,
        r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val cells = g.map { case (_, dd, x) => (dd / 7, dd % 7, x) }
      // mirror the engine's balanced-design guard: only complete
      // 7-cell blocks rank, and the centering derives from their count
      val complete = cells.groupBy(_._1).filter(_._2.length == 7)
      val nb = complete.size.toLong
      val d = complete.toSeq.flatMap { case (blk, bg) =>
        bg.map { case (_, dow, x) =>
          val less = bg.count(_._3 < x).toLong
          val ties = bg.count(_._3 == x).toLong
          (dow, 2 * less + ties + 1)
        }
      }
      val r2 = d.groupBy(_._1).map { case (dow, g2) =>
        dow -> g2.map(_._2).sum
      }
      val a4 = d.map(x => x._2 * x._2).sum
      val numsq = r2.values.map(v => (v - 8 * nb) * (v - 8 * nb)).sum
      tp -> (r2, a4, numsq)
    }
    val got = Queries.dqFriedman(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (r2, a4, numsq) = expect(r.getString(0))
      assert(r.getLong(2) == r2(r.getLong(1)) && r.getLong(3) == a4 &&
        r.getLong(4) == numsq,
        s"${r.getString(0)} dow ${r.getLong(1)}")
    }
    // balanced design: per-type doubled rank sums total n*k*(k+1) = 224
    got.groupBy(_.getString(0)).foreach { case (tp, g) =>
      assert(g.map(_.getLong(2)).sum == 224L, tp)
    }
  }

  test("dq_durbin_watson matches an exact BigInt driver recompute of the " +
    "scaled-residual quadratic sums") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0),
        r.getDate(1).toLocalDate.toEpochDay
          - java.time.LocalDate.parse("2024-01-01").toEpochDay + 1,
        r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val s = g.sortBy(_._2).map(x => (BigInt(x._2), BigInt(x._3)))
      val n = BigInt(s.length)
      val st = s.map(_._1).sum; val sy = s.map(_._2).sum
      val stt = s.map(x => x._1 * x._1).sum
      val sty = s.map(x => x._1 * x._2).sum
      val bnum = n * sty - st * sy; val dd = n * stt - st * st
      val e = s.map { case (t, y) =>
        n * dd * y - (dd * sy - bnum * st) - n * bnum * t
      }
      val ssRes = e.map(x => x * x).sum
      val ssDiff = e.zip(e.drop(1)).map { case (a, b) =>
        (b - a) * (b - a)
      }.sum
      tp -> (s.length.toLong, ssRes.toLong, ssDiff.toLong)
    }
    val got = Queries.dqDurbinWatson(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (nd, res, diff) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((nd, res, diff)),
        s"type ${r.getString(0)}")
      val dw = r.getDouble(4)
      assert(dw >= 0.0 && dw <= 4.0) // DW range invariant
    }
  }

  test("vocab_coverage matches a driver frequency-of-frequency recompute") {
    val toks = ops.Tables.table(spark, sf, "documents")
      .select(col("lang"), col("text")).collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val expect = toks.groupBy(_._1).map { case (lang, g) =>
      val f = g.groupBy(_._2).map(_._2.length.toLong)
      val v = f.size.toLong; val n = f.sum
      val f1 = f.count(_ == 1L).toLong; val f2 = f.count(_ == 2L).toLong
      lang -> (v, n, f1, f2, f1 * 1000000L / n)
    }
    val got = Queries.vocabCoverage(spark, sf).collect()
    assert(got.length == expect.size && got.nonEmpty)
    got.foreach { r =>
      val (v, n, f1, f2, p0) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) == ((v, n, f1, f2, p0)), s"lang ${r.getString(0)}")
      if (f2 > 0) {
        val chao = r.getDouble(6)
        assert(chao >= v.toDouble) // richness never below observed V
      }
    }
  }

  test("dq_kanonymity matches a driver census and the share is monotone " +
    "in k") {
    val rows = ops.Tables.table(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 500) " +
          "AS BIGINT)"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val sizes = rows.groupBy(identity).map(_._2.length.toLong).toSeq
    val total = sizes.sum
    val expect = Seq(2L, 5L, 10L, 25L).map { k =>
      val below = sizes.filter(_ < k)
      k -> (below.length.toLong, below.sum,
        below.sum * 1000000L / total)
    }.toMap
    val got = Queries.dqKanonymity(spark, sf).collect()
    assert(got.length == 4)
    got.foreach { r =>
      val (g, rw, sh) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) == ((g, rw, sh)),
        s"k=${r.getLong(0)}")
      assert(r.getLong(3) == total)
    }
    val shares = got.sortBy(_.getLong(0)).map(_.getLong(4))
    assert(shares.zip(shares.drop(1)).forall { case (a, b) => a <= b })
  }
}

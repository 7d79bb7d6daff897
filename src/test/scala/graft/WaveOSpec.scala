package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation specs for the wave-O operators (round 5):
  * BPE merge application, rolling regression features, cohort LTV,
  * strict-order funnel, epoch-mix sampling. */
class WaveOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes).map("%02x".format(_)).mkString

  test("tokenize_bpe_apply equals a driver-side replay of the learned " +
    "merge table over the vocabulary head") {
    val texts = ops.Tables.table(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val words = texts.flatMap(_.split(" ", -1))
    // merge table: char-pair counts weighted by word frequency (N16d)
    val vocab = words.filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairCounts = vocab.toSeq.flatMap { case (w, c) =>
      w.sliding(2).filter(_.length == 2).map(_ -> c)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val merges = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(20).map(_._1)
    // vocabulary head: top-50 [a-z]{2,} words
    val top = words.filter(_.matches("^[a-z]{2,}$"))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(50)
    val expected = top.map { case (w, c) =>
      val seed = w.map(ch => s"($ch)").mkString
      val merged = merges.foldLeft(seed) { (s, p) =>
        s.replace(s"(${p(0)})(${p(1)})", s"($p)")
      }
      val tokens = merged.replace(")(", "|").drop(1).dropRight(1)
      val nTok = merged.count(_ == '(').toLong
      (w, c, tokens, nTok)
    }
    val got = Queries.tokenizeBpeApply(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // merges actually fire: at least one word tokenizes to < its char count
    assert(got.exists(g => g._4 < g._1.length),
      "no merge ever applied — the replace chain is inert")
  }

  test("window_rolling_regression equals a driver-side exact-integer " +
    "sliding-window OLS replay") {
    val rows = ops.Tables.table(spark, sf, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000,
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._3, e._2)).zipWithIndex
        .map { case (e, i) => (i + 1L, e._4) } // (x = seq, y = cents)
      sorted.sliding(10).filter(_.size == 10).map { win =>
        val n = 10L
        val sx = win.map(_._1).sum; val sy = win.map(_._2).sum
        val sxy = win.map(w => w._1 * w._2).sum
        val sxx = win.map(w => w._1 * w._1).sum
        (u, win.last._1,
          (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
      }
    }.sortBy(e => (e._1, e._2))
    val got = Queries.windowRollingRegression(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(g => (g._1, g._2)) == expected.map(e => (e._1, e._2)))
    got.zip(expected).foreach { case (g, e) =>
      assert(g._3 == e._3, s"slope mismatch for user ${g._1} step ${g._2}")
    }
    assert(got.nonEmpty, "no full 10-event windows at sf0.001")
  }

  test("cohort_ltv: cumulative revenue is nondecreasing per cohort, " +
    "orders reconcile, and ltv = cum_rev / n_customers") {
    val got = Queries.cohortLtv(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    got.groupBy(_._1).foreach { case (cohort, rs) =>
      val byAge = rs.sortBy(_._2)
      byAge.sliding(2).filter(_.size == 2).foreach { case Array(a, b) =>
        assert(a._5 <= b._5, s"cum_rev decreased in cohort $cohort")
      }
      // one cohort size per cohort
      assert(rs.map(_._3).distinct.length == 1)
    }
    val totalOrders = got.map(_._4).sum
    val nOrders = ops.Tables.table(spark, sf, "orders").count()
    assert(totalOrders == nOrders, "per-(cohort, age) orders must reconcile")
    got.foreach { g =>
      assert(math.abs(g._6 - g._5 / g._3) < 1e-9, s"ltv wrong in ${g._1}")
    }
  }

  test("funnel_strict_order equals a driver-side strict-sequence replay " +
    "and is monotone") {
    val ev = ops.Tables.table(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
    val t1 = ev.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val t2 = ev.filter(e => e._2 == "click" && t1.contains(e._1) &&
        e._3.after(t1(e._1))).groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val t3 = ev.filter(e => e._2 == "purchase" && t2.contains(e._1) &&
        e._3.after(t2(e._1))).groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val got = Queries.funnelStrictOrder(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", t1.size.toLong),
      (2, "click", t2.size.toLong), (3, "purchase", t3.size.toLong)))
    assert(got(0)._3 >= got(1)._3 && got(1)._3 >= got(2)._3,
      "strict funnel must be monotone")
  }

  test("sample_epochs equals a driver-side replay of the repeat factors " +
    "and the hash draw") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, src) =>
      val whole = src match {
        case "src0" | "src1" => 2L
        case "src2"          => 0L
        case _               => 1L
      }
      val extra =
        if (Set("src0", "src1", "src2")(src) &&
          md5hex(id.toString).substring(0, 2) < "80") 1L else 0L
      (id, src, whole + extra)
    }.filter(_._3 > 0)
      .flatMap { case (id, src, n) => (1L to n).map(e => (id, src, e)) }
      .groupBy(_._2).view.mapValues { es =>
        (es.size.toLong, es.map(_._1).distinct.length.toLong,
          es.map(e => e._1 * e._3).sum)
      }.toSeq.sortBy(_._1)
    val got = Queries.sampleEpochs(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the mix actually up/down-samples: src0 emits more than its doc
    // count, src2 fewer
    val bySrc = got.toMap
    docs.groupBy(_._2).view.mapValues(_.size.toLong).toMap.foreach {
      case (src, n) =>
        if (src == "src0" || src == "src1")
          assert(bySrc(src)._1 > n, s"$src must up-sample")
        if (src == "src2") assert(bySrc(src)._1 < n, s"$src must down-sample")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation specs for the wave-L operators (IQR outlier
  * gate, spend-concentration Gini). The oracle gate hash-checks both at
  * sf0.01; these pin the statistical identities at sf0.001. */
class WaveLSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dq_outlier_iqr: fences derive from the quartiles, outliers are " +
    "counted exactly, and the three robust gates see the same rows") {
    val out = Queries.dqOutlierIqr(spark, sf).collect()
    val cents = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(out.map(_.getLong(1)).sum == cents.values.map(_.length.toLong).sum)
    out.foreach { r =>
      val (typ, q1, q3, lo, hi) = (r.getString(0), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(q1 <= q3)
      assert(math.abs(lo - (q1 - 1.5 * (q3 - q1))) < 1e-3)
      assert(math.abs(hi - (q3 + 1.5 * (q3 - q1))) < 1e-3)
      val xs = cents(typ)
      assert(r.getLong(6) == xs.count(_ < lo).toLong, s"$typ below")
      assert(r.getLong(7) == xs.count(_ > hi).toLong, s"$typ above")
    }
  }

  test("dq_ab_welch matches a driver-side Welch recomputation over the " +
    "deterministic hash-coin cohorts") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), md5hex(r.getLong(1).toString).head <= '7',
        r.getLong(2)))
    val got = Queries.dqAbWelch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getDouble(5))).toMap
    rows.groupBy(_._1).foreach { case (typ, rs) =>
      val a = rs.filter(_._2).map(_._3.toDouble)
      val b = rs.filterNot(_._2).map(_._3.toDouble)
      def meanVar(xs: Array[Double]) = {
        val m = xs.sum / xs.length
        (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      }
      val ((ma, va), (mb, vb)) = (meanVar(a), meanVar(b))
      val (sa, sb) = (va / a.length, vb / b.length)
      val t = (ma - mb) / math.sqrt(sa + sb)
      val df = (sa + sb) * (sa + sb) /
        (sa * sa / (a.length - 1) + sb * sb / (b.length - 1))
      val (gna, gnb, gt, gdf) = got(typ)
      assert(gna == a.length.toLong && gnb == b.length.toLong)
      assert(math.abs(gt - t) < 1e-4, s"$typ t")
      assert(math.abs(gdf - df) < 0.05, s"$typ df")
    }
  }

  test("window_bucketed plans its per-user window with NO hash exchange " +
    "(the bucketed table satisfies the window's distribution)") {
    val dir = sf
    Queries.windowBucketed(spark, dir).count() // first call writes the table
    val plan = Queries.windowBucketed(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window:\n$plan")
    assert(!plan.contains("hashpartitioning(user_id"),
      s"per-user window must inherit the bucket distribution:\n$plan")
  }

  test("agg_gini_spend matches a driver-side Gini recomputation and " +
    "respects the [0, 1) inequality bounds") {
    val spend = ops.Tables.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")).as("cents"))
      .join(ops.Tables.table(spark, sf, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1)))
    val got = Queries.aggGiniSpend(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val bySeg = spend.groupBy(_._1)
    assert(got.keySet == bySeg.keySet)
    bySeg.foreach { case (seg, rows) =>
      val sorted = rows.map(r => (r._3, r._2)).sortBy(identity)
      val n = sorted.length.toLong
      val tot = sorted.map(_._1).sum
      val srx = sorted.zipWithIndex
        .map { case ((c, _), i) => BigInt(i + 1) * BigInt(c) }.sum
      val gini = 2.0 * srx.toDouble / (n.toDouble * tot.toDouble) -
        (n + 1).toDouble / n.toDouble
      val (gn, gtot, gg) = got(seg)
      assert(gn == n && gtot == tot)
      assert(math.abs(gg - gini) < 1e-6, s"$seg gini")
      assert(gg >= 0.0 && gg < 1.0)
    }
  }
}

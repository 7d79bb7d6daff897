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

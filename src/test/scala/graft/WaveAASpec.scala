package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AA: graph BFS, Mann-Whitney U, Kaplan-Meier survival. */
class WaveAASpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("graph_bfs differentials a driver BFS over the same edge set, " +
    "and every distance is the true shortest hop count (≤ 4)") {
    val pairs = text.NearDup.minhashDupPairsCached(
      ops.Tables.table(spark, sf, "documents"), "doc_id", "text", 0.8, sf)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    pairs.foreach { case (a, b) => adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    // driver BFS from all seeds at once
    val seeds = adj.keys.filter(_ % 10 == 0).toSeq.sorted
    val dist = scala.collection.mutable.Map.empty[Long, Long]
    seeds.foreach(s => dist(s) = 0L)
    var frontier = seeds.toList
    var d = 1L
    while (frontier.nonEmpty && d <= 4) {
      frontier = frontier.flatMap(adj).distinct.filterNot(dist.contains)
      frontier.foreach(v => dist(v) = d)
      d += 1
    }
    val got = Queries.graphBfs(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist.toMap,
      s"BFS mismatch: engine ${got.toSeq.sorted} vs driver ${dist.toSeq.sorted}")
  }

  test("dq_mannwhitney: doubled rank-sums over all types total N(N+1), " +
    "and each 2U is within its [0, 2·n_a·n_b] range") {
    val rows = Queries.dqMannwhitney(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    // Σ_A 2R_A = 2 · (1+2+…+N) = N(N+1); recover 2R = u2 + n_a(n_a+1)
    val sumR2 = rows.map(r => r.getLong(3) + r.getLong(1) * (r.getLong(1) + 1)).sum
    assert(sumR2 == n * (n + 1), s"rank sums $sumR2 != ${n * (n + 1)}")
    rows.foreach { r =>
      val (na, nb, u2) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(u2 >= 0 && u2 <= 2 * na * nb, s"2U $u2 outside [0, ${2 * na * nb}]")
      assert(!r.getDouble(4).isNaN)
    }
  }

  test("dq_mannwhitney differentials a naive driver rank computation") {
    val vals = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // naive tie-averaged doubled ranks
    val sorted = vals.map(_._2).sorted
    val dr: Map[Long, Long] = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, g) =>
        v -> (2L * (g.map(_._2).min + 1) + g.length - 1) }
    val expect = vals.groupBy(_._1).map { case (t, g) =>
      val r2 = g.map(x => dr(x._2)).sum
      val na = g.length.toLong
      t -> (na, r2 - na * (na + 1))
    }
    Queries.dqMannwhitney(spark, sf).collect().foreach { r =>
      val (na, u2) = expect(r.getString(0))
      assert(r.getLong(1) == na && r.getLong(3) == u2,
        s"${r.getString(0)}: engine (${r.getLong(1)},${r.getLong(3)}) vs " +
          s"driver ($na,$u2)")
    }
  }

  test("graph_modularity: stubs total 2m, intra edges total ≤ m, and " +
    "each q_term is the double of its exact integer pair") {
    val rows = Queries.graphModularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val m = rows.head.getLong(4) / 4 match {
      case sq => math.sqrt(sq.toDouble).round
    }
    assert(rows.map(_.getLong(2)).sum == 2 * m, "Σ stubs must be 2m")
    assert(rows.map(_.getLong(1)).sum <= m, "Σ intra ≤ m")
    rows.foreach { r =>
      assert(r.getLong(4) == 4 * m * m)
      assert(math.abs(r.getDouble(5) -
        BigDecimal(r.getLong(3).toDouble / r.getLong(4).toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
  }

  test("forecast_holt: 7 backtest days per type, and the fitted line " +
    "matches a naive driver Holt recursion") {
    val rows = Queries.forecastHolt(spark, sf).collect()
    val types = rows.map(_.getString(0)).distinct
    assert(rows.length == types.length * 7)
    // driver recursion over the same daily counts
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val cut = java.time.LocalDate.parse("2024-01-23")
    types.foreach { tp =>
      val xs = daily.filter(x => x._1 == tp && !x._2.isAfter(cut))
        .sortBy(_._2.toEpochDay).map(_._3.toDouble)
      var l = xs(0); var b = xs(1) - xs(0)
      for (i <- 1 until xs.length) {
        val ln = 0.5 * xs(i) + 0.5 * (l + b)
        b = 0.3 * (ln - l) + 0.7 * b; l = ln
      }
      rows.filter(_.getString(0) == tp).foreach { r =>
        val h = java.time.temporal.ChronoUnit.DAYS.between(
          cut, java.time.LocalDate.parse(r.getString(1)))
        assert(math.abs(r.getDouble(3) - (l + h * b)) < 1e-6,
          s"$tp h=$h: ${r.getDouble(3)} vs ${l + h * b}")
      }
    }
  }

  test("stream_holt: the maintained daily-count MV yields the batch " +
    "Holt backtest exactly") {
    val streamed = streaming.StreamTwins.streamHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val batch = Queries.forecastHolt(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("survival_km: S is non-increasing from < 1e6, at-risk counts are " +
    "non-increasing, and the curve differentials a naive driver KM") {
    val rows = Queries.survivalKm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array((_, n1, _, s1), (_, n2, _, s2)) =>
        assert(s2 <= s1, s"S must be non-increasing: $s1 -> $s2")
        assert(n2 < n1, s"at-risk must strictly decrease: $n1 -> $n2")
      case _ =>
    }
    assert(rows.head._4 < 1000000L)
    // naive driver recompute from raw per-customer lifetimes
    val per = ops.Tables.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        (col("l") < lit("2001-05-01").cast("timestamp")).as("ev"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val byT = per.groupBy(_._1)
    val eventTimes = byT.filter(_._2.exists(_._2)).keys.toSeq.sorted
    // the engine's documented iterated ⌊s·(n−d)/n⌋ fixed-point recurrence
    var s = 1000000L
    val expect = eventTimes.map { tt =>
      val n = per.count(_._1 >= tt).toLong
      val dd = byT(tt).count(_._2).toLong
      s = s * (n - dd) / n
      (tt, n, dd, s)
    }
    assert(rows.toSeq == expect,
      s"KM mismatch:\n engine ${rows.toSeq}\n driver $expect")
    // the fixed-point fold is ALSO pinned to the exact BigInt rational
    // product (round-7, ADVICE r6): each floor loses < 1 ppm and later
    // ratios only shrink the loss, so after k risk rows the published
    // s_ppm sits in [exact − k, exact]. This keeps the documented drift
    // bound of the iterated ⌊s·(n−d)/n⌋ form verified independently of
    // the recurrence replay above.
    var num = BigInt(1); var den = BigInt(1)
    rows.zipWithIndex.foreach { case ((tt, n, dd, sFp), k) =>
      num *= BigInt(n - dd); den *= BigInt(n)
      val exact = (BigInt(1000000) * num / den).toLong
      assert(sFp <= exact && exact - sFp <= k + 1,
        s"KM fixed-point drift out of bound at t=$tt (row $k): " +
          s"fp=$sFp exact=$exact")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AK: preference pairs, NDCG retrieval eval, Dickey–Fuller. */
class WaveAKSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sample_preference_pairs: chosen dominates its bucket, rejected " +
    "is dominated, pair is disjoint, and scores match a driver replay") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map { r =>
        val toks = r.getString(3).split(" ", -1)
        (r.getLong(0), r.getString(1), r.getString(2),
          math.floor(1000000.0 * toks.distinct.length / toks.length).toLong)
      }
    val byBucket = docs.groupBy(d => (d._2, d._3))
    val got = Queries.samplePreferencePairs(spark, sf).collect()
    val expectBuckets = byBucket.filter(_._2.length >= 2)
    assert(got.length == expectBuckets.size && got.nonEmpty)
    got.foreach { r =>
      val g = byBucket((r.getString(0), r.getString(1)))
      val chosen = g.maxBy(d => (d._4, -d._1))
      val rejected = g.minBy(d => (d._4, -d._1))
      assert(r.getLong(2) == g.length.toLong)
      assert(r.getLong(3) == chosen._1 && r.getLong(4) == chosen._4,
        s"bucket ${r.getString(0)}/${r.getString(1)} chosen")
      assert(r.getLong(5) == rejected._1 && r.getLong(6) == rejected._4,
        s"bucket ${r.getString(0)}/${r.getString(1)} rejected")
      assert(r.getLong(3) != r.getLong(5), "pair must be disjoint")
      assert(r.getLong(7) == r.getLong(4) - r.getLong(6))
      assert(r.getLong(7) >= 0L)
    }
  }

  test("eval_ndcg: gains replay the term-presence relevance, idcg " +
    "dominates dcg, and ndcg sits in [0, 1]") {
    val qt = Map("spark" -> 1L, "join" -> 1L, "hash" -> 2L,
      "merge" -> 2L, "batch" -> 2L, "vector" -> 3L, "scan" -> 3L)
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    // rel(q, d) = #query terms present
    val rel = (1L to 3L).map { q =>
      q -> docs.map { case (id, toks) =>
        id -> qt.count { case (t, qq) => qq == q && toks.contains(t) }.toLong
      }.filter(_._2 > 0).toMap
    }.toMap
    def gain(r: Long) = r match {
      case 1 => 1L; case 2 => 3L; case 3 => 7L; case _ => 0L
    }
    val log2 = Array(1.0, 1.584962500721156, 2.0,
      2.321928094887362, 2.584962500721156)
    val retrieved = Queries.searchBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Queries.evalNdcg(spark, sf).collect()
    assert(got.length == 3)
    got.foreach { r =>
      val q = r.getLong(0)
      val gains = retrieved.filter(_._1 == q).sortBy(_._2)
        .map(x => gain(rel(q).getOrElse(x._3, 0L)))
      val dcg = gains.zipWithIndex.map { case (g, i) =>
        g.toDouble / log2(i)
      }.sum
      val ideal = rel(q).values.toSeq.map(gain).sorted.reverse
        .padTo(5, 0L).take(5)
      val idcg = ideal.zipWithIndex.map { case (g, i) =>
        g.toDouble / log2(i)
      }.sum
      assert(r.getLong(1) == gains.sum, s"q$q gain_sum")
      assert(math.abs(r.getDouble(2) - dcg) < 1e-6, s"q$q dcg")
      assert(math.abs(r.getDouble(3) - idcg) < 1e-6, s"q$q idcg")
      assert(r.getDouble(3) >= r.getDouble(2) - 1e-9, s"q$q idcg >= dcg")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0 + 1e-9)
    }
  }

  test("dq_adf matches an exact BigInt driver recompute of the centered " +
    "co-moments") {
    val daily = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val expect = daily.groupBy(_._1).map { case (tp, g) =>
      val ys = g.sortBy(_._2).map(x => BigInt(x._3))
      val pairs = ys.zip(ys.drop(1)).map { case (x, y) => (x, y - x) }
      val m = BigInt(pairs.length)
      val sx = pairs.map(_._1).sum; val sz = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val szz = pairs.map(p => p._2 * p._2).sum
      val sxz = pairs.map(p => p._1 * p._2).sum
      tp -> (m.toLong, (m * sxz - sx * sz).toLong,
        (m * sxx - sx * sx).toLong, (m * szz - sz * sz).toLong)
    }
    val got = Queries.dqAdf(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (m, a, b, c) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((m, a, b, c)), s"type ${r.getString(0)}")
      // a stationary mean-reverting series drives beta (and t) negative
      val t = r.getDouble(5)
      assert(!t.isNaN && math.abs(t) < 100.0)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation specs for the wave-N operators
  * (pseudonymization, bigram LM, Zipf fit). */
class WaveNSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("pii_pseudonymize preserves the join structure exactly: " +
    "pseudonym-key aggregates equal raw-key aggregates, no collisions") {
    val out = Queries.piiPseudonymize(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val raw = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_distinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == raw,
      "per-type counts under pseudonymized keys must equal raw-key counts")
    // the pseudonym is deterministic: same id → same token across frames
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(("graft-vault-v1:" + s).getBytes).map("%02x".format(_)).mkString
    val ids = ops.Tables.table(spark, sf, "events")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    assert(ids.map(i => md5hex(i.toString)).distinct.length == ids.length,
      "keyed md5 must not collide on the id universe")
  }

  test("text_lm_bigram equals a driver-side bigram recomputation " +
    "(ratio of corpus bigram mass to left-unigram mass)") {
    val texts = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val all = texts.flatMap { case (_, w) => w.sliding(2).filter(_.size == 2) }
      .map(p => (p(0), p(1))).toSeq
    val cab = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ca = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = Queries.textLmBigram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val expected = texts.filter(_._2.size >= 2).map { case (id, w) =>
      val pairs = w.sliding(2).map(p => (p(0), p(1))).toSeq
      val sAb = pairs.map(cab).sum
      val sA = pairs.map(p => ca(p._1)).sum
      (id, pairs.size.toLong,
        BigDecimal(sAb.toDouble / sA.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    assert(got.map(g => (g._1, g._2)).toSeq == expected.map(e => (e._1, e._2)).toSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-8, s"doc ${g._1}") }
  }

  test("agg_quantile_sketch: the hash-reservoir sample is a pure function " +
    "of the data — identical estimates under any partitioning, equal to a " +
    "driver-side replay of the same sample") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"), col("event_id"),
        (col("value").cast("decimal(12,2)") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def quantile(vs: Array[Long], p: Double): Double = {
      val s = vs.sorted
      val pos = p * (s.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      s(lo).toDouble + (pos - lo) * (s(hi).toDouble - s(lo).toDouble)
    }
    val expected = rows.groupBy(_._1).map { case (typ, rs) =>
      val sample = rs.map(r => (md5hex(r._2.toString), r._3))
        .sortBy(identity).take(256).map(_._2).toArray
      typ -> (BigDecimal(quantile(sample, 0.5)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(quantile(sample, 0.9)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Queries.aggQuantileSketch(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (typ, (p50, p90)) =>
      assert(math.abs(got(typ)._1 - p50) < 1e-9, s"$typ p50")
      assert(math.abs(got(typ)._2 - p90) < 1e-9, s"$typ p90")
    }
    // mergeability: the fold must be partitioning-invariant — 1-partition
    // and 13-partition runs produce bit-identical estimates
    val base = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"),
        md5(col("event_id").cast("string")).as("h"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    def est(parts: Int) = base.repartition(parts)
      .groupBy(col("event_type"))
      .agg(call_function("graft_reservoir_quantile",
        col("h"), col("cents"), lit(256), lit(0.9)).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est(1) == est(13))
  }

  test("ReservoirQuantile merge contract (round-8 ADVICE): exact over " +
    "DISJOINT partials — duplicate input rows are multiset entries — and " +
    "explicitly NOT idempotent for overlapping states") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = graft.functions.ReservoirQuantile(
      Literal.create("x", org.apache.spark.sql.types.StringType),
      Literal(0L), k = 4, p = 0.5)
    def state(rows: (String, Long)*): graft.functions.ReservoirState = {
      val st = agg.createAggregationBuffer()
      rows.foreach { case (h, v) => st.insert(h, v) }
      st
    }
    // DISJOINT partials: merge == one partial over the concatenation,
    // including a (hash, value) pair duplicated ACROSS the partials —
    // two identical input rows are two sample entries, exactly as a
    // single-partition run keeps them (multiset semantics)
    val left = state(("a", 10L), ("b", 20L))
    val right = state(("a", 10L), ("c", 30L)) // same row content, other split
    val together = state(("a", 10L), ("b", 20L), ("a", 10L), ("c", 30L))
    val merged = agg.merge(left, right)
    assert(merged.heap.toSeq.sorted == together.heap.toSeq.sorted,
      "disjoint-partial merge must equal the single-partial fold")
    assert(merged.heap.toSeq.count(_ == ("a", 10L)) == 2,
      "duplicate input rows are duplicate multiset entries by design")
    // OVERLAPPING states (never produced by Spark's aggregation): merging
    // a state with a copy of itself double-counts — the documented
    // non-idempotence; if this ever becomes dedup-on-merge, the multiset
    // semantics above silently break, so both directions are pinned
    val s1 = state(("a", 10L), ("b", 20L))
    val s2 = state(("a", 10L), ("b", 20L))
    val self = agg.merge(s1, s2)
    assert(self.heap.size == 4,
      "overlapping-state merge is out of contract and double-counts")
  }

  test("vocab_zipf_fit equals the driver-side log-log OLS over the " +
    "frequency-ranked vocabulary, and the exponent is negative") {
    val toks = ops.Tables.table(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0)
      .collect().map(_.getString(0))
    val vocab = toks.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    val xy = vocab.zipWithIndex.map { case ((_, f), i) =>
      (math.log((i + 1).toDouble), math.log(f.toDouble)) }
    val n = xy.length.toDouble
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = Queries.vocabZipfFit(spark, sf).collect().head
    assert(row.getLong(0) == vocab.length.toLong)
    assert(row.getLong(1) == toks.length.toLong)
    assert(math.abs(row.getDouble(2) - slope) < 1e-4)
    assert(row.getDouble(2) < 0.0, "frequency must fall with rank")
  }
}

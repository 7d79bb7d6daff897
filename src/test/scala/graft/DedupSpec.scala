package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq(
    (1L, "a", 10L, 100.0), (1L, "a", 20L, 200.0), // key (1,a): keep ts=20
    (1L, "b", 20L, 300.0),                        // key (1,b): single row
    (2L, "a", 20L, 400.0), (2L, "a", 20L, 500.0)  // tie on ts: keep id-max? no: tieBreak col
  ).toDF("user_id", "event_type", "ts", "value")
    .withColumn("event_id", monotonically_increasing_id())

  test("dedupLatest keeps max-ts row per key (kafka_s3_to_silver.py:28-30)") {
    val out = Dedup.dedupLatest(sample, Seq("user_id", "event_type"),
      col("ts"), col("event_id"))
    assert(out.count() == 3)
    val k1a = out.filter($"user_id" === 1 && $"event_type" === "a").collect().head
    assert(k1a.getAs[Long]("ts") == 20L)
    assert(k1a.getAs[Double]("value") == 200.0)
  }

  test("dedupLatest tie-breaks deterministically on event_id") {
    val out = Dedup.dedupLatest(sample, Seq("user_id", "event_type"),
      col("ts"), col("event_id"))
    val k2a = out.filter($"user_id" === 2).collect().head
    assert(k2a.getAs[Double]("value") == 500.0) // higher event_id wins
  }

  test("dedupLatest is idempotent") {
    val once = Dedup.dedupLatest(sample, Seq("user_id", "event_type"),
      col("ts"), col("event_id"))
    val twice = Dedup.dedupLatest(once, Seq("user_id", "event_type"),
      col("ts"), col("event_id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("latestByAgg agrees with dedupLatest") {
    val a = Dedup.dedupLatest(sample, Seq("user_id", "event_type"),
      col("ts"), col("event_id")).select("user_id", "event_type", "ts", "value")
    val b = Dedup.latestByAgg(sample, Seq("user_id", "event_type"),
      col("ts"), col("event_id")).select("user_id", "event_type", "ts", "value")
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("upsert: changes override base, latest change wins in-batch, " +
    "unmatched changes insert, untouched rows survive") {
    val base = Seq((1L, "old1", 1L), (2L, "old2", 1L), (3L, "old3", 1L))
      .toDF("k", "v", "ver")
    val changes = Seq(
      (2L, "new2-a", 5L), (2L, "new2-b", 9L), // same key twice: ver 9 wins
      (4L, "ins4", 2L))                       // unmatched: insert
      .toDF("k", "v", "ver")
    val out = Dedup.upsert(base, changes, Seq("k"), col("ver"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(1L -> "old1", 2L -> "new2-b", 3L -> "old3", 4L -> "ins4"))
  }

  test("upsert is idempotent: re-applying the same change batch is a no-op") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "v", "ver")
    val changes = Seq((2L, "b2", 3L), (9L, "i", 3L)).toDF("k", "v", "ver")
    val once = Dedup.upsert(base, changes, Seq("k"), col("ver"))
    val twice = Dedup.upsert(once, changes, Seq("k"), col("ver"))
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("incremental dedup equals the cross-split slice of full-corpus pairs") {
    val docs = graft.ops.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val full = graft.text.NearDup
      .minhashDupPairs(docs, "doc_id", "text", 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) => (a % 10 == 0) != (b % 10 == 0) }
    val inc = graft.text.NearDup.minhashDupPairsIncremental(
        docs.filter($"doc_id" % 10 =!= 0), docs.filter($"doc_id" % 10 === 0),
        "doc_id", "text", 0.8)
      .select("new_id", "base_id").as[(Long, Long)].collect()
      .map { case (n, b) => (math.min(n, b), math.max(n, b)) }.toSet
    assert(inc == expected)
    assert(inc.nonEmpty) // the sf0.001 corpus must actually exercise the op
  }
}

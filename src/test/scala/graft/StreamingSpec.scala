package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamTwins

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("appendAvailableNow is incremental: second run appends nothing new") {
    val out = Files.createTempDirectory("graft_append_out").toString
    val ckpt = Files.createTempDirectory("graft_append_ckpt").toString
    val src = StreamTwins.eventsStream(spark, sf)
    StreamTwins.appendAvailableNow(src, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    // same checkpoint, no new files → no new rows (the exists-protocol twin)
    StreamTwins.appendAvailableNow(StreamTwins.eventsStream(spark, sf), out, ckpt)
    val n2 = spark.read.parquet(out).count()
    assert(n1 > 0)
    assert(n1 == n2)
  }

  test("stream dedup emits each key exactly once") {
    val keys = StreamTwins.streamDedupKeys(spark, sf)
    val batch = ops.Tables.table(spark, sf, "events")
      .select("user_id", "event_type").distinct()
    assert(keys.count() == batch.count())
  }
}

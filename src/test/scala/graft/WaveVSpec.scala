package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave V: Neyman allocation and the streaming maintained BM25 index. */
class WaveVSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("sample_neyman: quotas are nonnegative and exhaust the 200-sample " +
    "budget exactly") {
    val out = Queries.sampleNeyman(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(3) >= 0))
    assert(out.map(_.getLong(3)).sum == 200L,
      "largest-remainder apportionment must hand out the whole budget")
  }

  test("sample_neyman weights equal the exact Neyman N_h*sigma_h = " +
    "sqrt(n*Sxx - Sx^2) on a driver recompute") {
    val rows = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).map { case (tpe, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(x => BigInt(x._2)).sum
      val sxx = xs.map(x => BigInt(x._2) * BigInt(x._2)).sum
      tpe -> math.floor(math.sqrt((n * sxx - sx * sx).toDouble)).toLong
    }
    Queries.sampleNeyman(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) == expect(r.getString(0)),
        s"${r.getString(0)}: w ${r.getLong(2)} != ${expect(r.getString(0))}")
    }
  }

  test("stream_bm25: scores from the maintained index equal the batch " +
    "scorer bit-for-bit") {
    val streamed = streaming.StreamTwins.streamBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val batch = Queries.searchBm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("stream_drawdown: the maintained daily MV yields the batch " +
    "drawdown exactly") {
    val streamed = streaming.StreamTwins.streamDrawdown(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val batch = Queries.windowDrawdown(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("stream_bm25 state is O(delta) per batch: three postings and " +
    "three length deltas, disjoint by document") {
    streaming.StreamTwins.streamBm25(spark, sf).collect()
    val tag = ops.TempFiles.tag(sf)
    val root = java.nio.file.Paths.get(
      ops.TempFiles.dir(s"stream_bm25_state_$tag"))
    val s = java.nio.file.Files.list(root)
    val dirs = try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toVector
    } finally s.close()
    assert(dirs.count(_.startsWith("p")) == 3)
    assert(dirs.count(_.startsWith("l")) == 3)
    val docsPerDelta = dirs.filter(_.startsWith("l")).sorted.map { d =>
      spark.read.parquet(s"$root/$d").select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
    }
    // disjoint: a document's postings live in exactly one delta
    docsPerDelta.combinations(2).foreach { case Seq(a, b) =>
      assert(a.intersect(b).isEmpty)
    }
  }
}

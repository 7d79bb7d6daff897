package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decode reads dimensions from the actual BMP header bytes") {
    val docs = Seq(
      (1L, "hello world foo bar", 19L, "en"),
      (2L, "", 0L, "en"),
      (3L, "x " * 40 + "end", 83L, "en"))
      .toDF("doc_id", "text", "n_chars", "lang")
    val media = Multimodal.asMedia(docs)
    // the payload really is a BMP: magic bytes + header-declared size
    val payloads = media.orderBy("doc_id")
      .select("payload").as[Array[Byte]].collect()
    payloads.foreach { b =>
      assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    }
    val out = Multimodal.decodeFeatures(spark, media)
      .orderBy("doc_id").collect()
    Seq(19, 0, 83).zip(out).zip(payloads).foreach {
      case ((nChars, r), payload) =>
        assert(r.getAs[Int]("width") == 4 + nChars % 29)
        assert(r.getAs[Int]("height") == 4 + nChars % 17)
        assert(r.getAs[Int]("bpp") == 24)
        // header-declared file size matches the real byte count
        assert(r.getAs[Int]("n_bytes") == payload.length)
    }
  }

  test("corrupted payloads surface as sentinel features, not exceptions") {
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val r = Multimodal.decodeFeatures(spark, bad).collect().head
    assert(r.getAs[Int]("n_bytes") == 3)
    assert(r.getAs[Int]("width") == -1)
    assert(r.getAs[Int]("height") == -1)
  }
}

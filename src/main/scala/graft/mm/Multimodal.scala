package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extracted per-item features — the output schema of the decode stage.
  * Every field is read from the payload bytes themselves (magic check +
  * little-endian header fields), so a reader can independently re-derive
  * the values from the binary column. */
case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                        bpp: Int)

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * The Spark-side shape is the real thing: binary column + metadata struct,
  * `Dataset[(Long, Array[Byte])]` batches, partition-wise processing via
  * `mapPartitions` (the Scala seam equivalent to `mapInPandas`/`mapInArrow`
  * batches in PySpark — a heavyweight codec would be initialized once per
  * partition inside the iterator, not once per row). Since no image libs
  * ship in this environment, the FIXTURE is synthesized — each document's
  * text is rendered into a genuine BMP (valid magic, header, pixel array) —
  * but the DECODE is a real binary parse: magic check and little-endian
  * header reads, exactly what a codec's probe step does. */
object Multimodal {

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
    b(off + 2) = ((v >>> 16) & 0xFF).toByte
    b(off + 3) = ((v >>> 24) & 0xFF).toByte
  }

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte
    b(off + 1) = ((v >>> 8) & 0xFF).toByte
  }

  /** A valid 24-bit BMP whose dimensions derive from nChars and whose pixel
    * array is the text bytes cycled — a deterministic stand-in for a real
    * image payload. BMP spec: 14-byte file header + 40-byte BITMAPINFOHEADER
    * + 4-byte-aligned rows of BGR pixels. */
  def encodeBmp(textBytes: Array[Byte], nChars: Int): Array[Byte] = {
    val w = 4 + nChars % 29
    val h = 4 + nChars % 17
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size)            // file size
    putLe32(out, 10, 54)             // pixel array offset
    putLe32(out, 14, 40)             // DIB header size
    putLe32(out, 18, w)              // width
    putLe32(out, 22, h)              // height
    putLe16(out, 26, 1)              // planes
    putLe16(out, 28, 24)             // bits per pixel
    putLe32(out, 34, stride * h)     // image size
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 DPI
    var i = 0
    val n = stride * h
    while (i < n) {
      out(54 + i) =
        if (textBytes.nonEmpty) textBytes(i % textBytes.length) else 0
      i += 1
    }
    out
  }

  /** Present documents as a media table: opaque BMP payload + typed
    * metadata struct. */
  def asMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"),
        col("n_chars").cast(IntegerType).as("n_chars"), col("lang"))
      .as[(Long, String, Int, String)]
      .map { case (id, text, nChars, lang) =>
        (id, encodeBmp(text.getBytes("UTF-8"), nChars), "image/bmp",
          nChars, lang)
      }
      .toDF("doc_id", "payload", "mime", "n_chars", "lang")
      .select(col("doc_id"), col("payload"),
        struct(col("mime"), col("n_chars"), col("lang")).as("meta"))
  }

  /** Partition-wise decode: verify the BMP magic and read file size, width,
    * height, and bit depth from the little-endian header — an actual binary
    * parse of the payload (invalid payloads surface as -1 dimensions, not
    * exceptions: one bad blob must not kill a 100 TB scan). */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      def le32(b: Array[Byte], off: Int): Int =
        (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
          ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
      def le16(b: Array[Byte], off: Int): Int =
        (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
      it.map { case (id, b) =>
        if (b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte)
          MediaFeature(id, le32(b, 2), le32(b, 18), le32(b, 22), le16(b, 28))
        else MediaFeature(id, b.length, -1, -1, -1)
      }
    }.toDF()
  }
}

package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extracted per-item features — the output schema of the decode stage. */
case class MediaFeature(doc_id: Long, n_bytes: Int, first_byte: Int,
                        width: Int, height: Int)

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded/feature-extracted partition-wise.
  *
  * The Spark-side shape is the real thing: binary column + metadata struct,
  * `Dataset[(Long, Array[Byte])]` batches, partition-wise processing via
  * `mapPartitions` (the Scala seam equivalent to `mapInPandas`/`mapInArrow`
  * batches in PySpark — a real image/audio codec would be invoked inside
  * the iterator, amortizing per-partition setup). The decode itself is a
  * STUB — no media libs in this environment — producing deterministic
  * pseudo-features of the raw bytes so the pipeline is testable end-to-end.
  */
object Multimodal {

  /** Present documents as a media table: opaque payload + typed metadata. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast(BinaryType).as("payload"),
      struct(lit("application/octet-stream").as("mime"),
        col("n_chars").as("n_chars"), col("lang").as("lang")).as("meta"))

  /** Partition-wise decode/feature-extract. STUB decode: byte length, first
    * byte, and a fake width/height derived from the payload size — stands in
    * for `decoder.decode(bytes).dimensions`. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // per-partition setup of a real codec would go here (once, not per row)
      it.map { case (id, bytes) =>
        MediaFeature(id, bytes.length,
          if (bytes.isEmpty) 0 else bytes.head & 0xFF,
          bytes.length % 640, bytes.length % 480)
      }
    }.toDF()
  }
}

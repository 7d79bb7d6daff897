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

/** Output of the resize stage: source dims parsed from the input header,
  * destination dims and size parsed back from the RE-ENCODED payload. */
case class ResizeFeature(doc_id: Long, src_width: Int, src_height: Int,
                         dst_width: Int, dst_height: Int, n_bytes: Int)

/** Output of the frame-sampling stage (pixel rows as "frames"). */
case class FrameSample(doc_id: Long, n_frames: Int, n_sampled: Int,
                       frame_bytes: Int)

/** Output of the audio feature stage: every field re-derivable from the
  * payload bytes — header fields parsed, signal stats computed in exact
  * integer arithmetic (zero-crossing count, peak |sample|, Σ sample² in
  * Long — no floats, so any engine reproduces them bit-for-bit). */
case class AudioFeature(doc_id: Long, sample_rate: Int, n_samples: Long,
                        zero_crossings: Long, peak: Int, energy: Long)

/** Output of the scene-cut stage: per item, how many "frames" (pixel rows
  * as the frame sequence, the [[FrameSample]] convention), how many shot
  * boundaries fired, the first boundary's frame index (−1 when none), and
  * the largest inter-frame luma delta — all exact integers. */
case class VadResult(doc_id: Long, n_frames: Int, n_speech: Int,
  n_segments: Int, first_speech: Int, longest_run: Int, speech_ppm: Long)
case class SceneCut(doc_id: Long, n_frames: Int, n_cuts: Int,
                    first_cut: Int, max_delta: Long)

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

  /** Upper bound on header-declared dimensions accepted as valid: keeps a
    * corrupt header from driving the resize loops into multi-GB allocations
    * even when its declared pixel array happens to be present. */
  val MaxDim = 1 << 14

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
    // Hash-repartition to the engine's parallelism before the encode: a
    // small corpus scans as ONE file partition, and the typed BMP-encode
    // map below would run single-core for every mm_* consumer (row-wise
    // encode — layout changes nothing downstream). Keyed, so no
    // sort-before-repartition cost; count follows the cluster, not a
    // constant.
    docs.select(col("doc_id"), col("text"),
        col("n_chars").cast(IntegerType).as("n_chars"), col("lang"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[(Long, String, Int, String)]
      .map { case (id, text, nChars, lang) =>
        (id, encodeBmp(text.getBytes("UTF-8"), nChars), "image/bmp",
          nChars, lang)
      }
      .toDF("doc_id", "payload", "mime", "n_chars", "lang")
      .select(col("doc_id"), col("payload"),
        struct(col("mime"), col("n_chars"), col("lang")).as("meta"))
  }

  /** Land each document's BMP payload as a real FILE (executor-side, once
    * per fixture dir) and re-ingest through Spark's `binaryFile` source —
    * the actual first step of a multimodal pipeline, where 100 TB of
    * images arrive as object-store files, not as a parquet column. The
    * source hands back (path, length, content); the item id is recovered
    * from the file name, exactly like production key-encoded object names.
    * At scale the source packs many small files per task
    * (`spark.sql.files.maxPartitionBytes`), so a billion-object bucket
    * scans with bounded task counts. */
  def binaryFileMedia(spark: SparkSession, docs: DataFrame,
                      dir: String): DataFrame = {
    import spark.implicits._
    val p = java.nio.file.Paths.get(dir)
    val hasFiles = {
      val s = java.nio.file.Files.list(p)
      try s.findFirst().isPresent finally s.close()
    }
    if (!hasFiles)
      asMedia(docs).select(col("doc_id"), col("payload"))
        .as[(Long, Array[Byte])]
        .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
          it.foreach { case (id, b) =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, f"$id%08d.bmp"), b)
          }
        }
    // read the DIRECTORY with a glob filter, not a "$dir/*.bmp" glob
    // path: the glob expands driver-side to one path PER FILE, and past
    // the parallel-discovery threshold (32) that schedules a distributed
    // listing job with one task per file — 500 tasks, ~0.6 s/iter at
    // sf0.1, and at a billion objects a full cluster stage just to stat
    // files (guide §6: listing cost). One directory path lists once.
    spark.read.format("binaryFile").option("pathGlobFilter", "*.bmp")
      .load(dir)
      .select(
        // the optional sign matters: f"$id%08d" renders -5 as
        // "-0000005.bmp", and a digits-only extract would silently remap
        // it to doc_id 5 (round-7 review)
        regexp_extract(col("path"), "(-?\\d+)\\.bmp$", 1)
          .cast(LongType).as("doc_id"),
        col("content").as("payload"))
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  /** Sign-extending 16-bit little-endian read (PCM samples). */
  private def le16s(b: Array[Byte], off: Int): Int =
    (((b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)) << 16) >> 16

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  /** The ONE whole-BMP validator every pixel-reading extractor shares
    * (round-7 review — this block was previously copy-pasted four ways and
    * had already drifted): a valid magic is not a valid image. The payload
    * must match the exact layout the extractors hard-code — pixel array at
    * offset 54 (BITMAPINFOHEADER) and 24 bpp (a 32-bpp or V4/V5-header BMP
    * would otherwise be read as garbage pixels at the wrong offset/stride
    * instead of surfacing the sentinel) — with positive bounded dims and
    * the declared pixel array actually PRESENT. Dims are bounded and the
    * stride/size math runs in Long so a corrupt header with a huge width
    * cannot overflow the Int stride into a passing length check
    * (round-2 advice). */
  private[mm] def isWholeBmp(b: Array[Byte]): Boolean =
    isBmp(b) && le32(b, 10) == 54 && le16(b, 28) == 24 && {
      val w = le32(b, 18); val h = le32(b, 22)
      w > 0 && h > 0 && w <= MaxDim && h <= MaxDim &&
        b.length >= 54L + (w.toLong * 3 + 3) / 4 * 4 * h.toLong
    }

  /** Nearest-neighbor resize of a 24-bit BMP payload to dstW × dstH,
    * re-encoded as a BMP — actual pixel-array resampling, the stand-in for
    * `codec.resize(img, dims)` over an opaque binary column. */
  def resizeBmp(b: Array[Byte], dstW: Int, dstH: Int): Array[Byte] = {
    val srcW = le32(b, 18)
    val srcH = le32(b, 22)
    val srcStride = (srcW * 3 + 3) / 4 * 4
    val dstStride = (dstW * 3 + 3) / 4 * 4
    // contract check in Long (round-7 review): an Int dstStride·dstH can
    // wrap negative for dims that each individually look plausible —
    // callers bound dims by MaxDim BEFORE calling; this makes a missed
    // guard a clear error instead of a NegativeArraySizeException
    require(dstW > 0 && dstH > 0 &&
      54L + dstStride.toLong * dstH <= Int.MaxValue,
      s"resizeBmp destination ${dstW}x$dstH does not fit a byte array")
    val out = encodeBmp(Array.emptyByteArray, 0) // header template
    val sized = new Array[Byte](54 + dstStride * dstH)
    System.arraycopy(out, 0, sized, 0, 54)
    // patch header: file size, dims, image size
    def put32(off: Int, v: Int): Unit = {
      sized(off) = (v & 0xFF).toByte
      sized(off + 1) = ((v >>> 8) & 0xFF).toByte
      sized(off + 2) = ((v >>> 16) & 0xFF).toByte
      sized(off + 3) = ((v >>> 24) & 0xFF).toByte
    }
    put32(2, sized.length); put32(18, dstW); put32(22, dstH)
    put32(34, dstStride * dstH)
    var y = 0
    while (y < dstH) {
      val sy = y * srcH / dstH
      var x = 0
      while (x < dstW) {
        val sx = x * srcW / dstW
        val so = 54 + sy * srcStride + sx * 3
        val dof = 54 + y * dstStride + x * 3
        sized(dof) = b(so); sized(dof + 1) = b(so + 1); sized(dof + 2) = b(so + 2)
        x += 1
      }
      y += 1
    }
    sized
  }

  /** Partition-wise resize: parse source dims from the input header, resample
    * the pixel array, re-encode, and report dims parsed back from the NEW
    * payload's header — so the output proves the encode/decode round trip. */
  def resizeFeatures(spark: SparkSession, media: DataFrame,
                     dstW: Int, dstH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val whole = isWholeBmp(b)
          if (whole) {
            val r = resizeBmp(b, dstW, dstH)
            ResizeFeature(id, le32(b, 18), le32(b, 22),
              le32(r, 18), le32(r, 22), le32(r, 2))
          } else ResizeFeature(id, -1, -1, -1, -1, b.length)
        }
      }.toDF()
  }

  /** Partition-wise frame sampling: treat the pixel rows of the payload as a
    * frame sequence and keep every `stride`-th frame — the video analog of
    * the decode stage (counting is real parsing; a codec would hand back the
    * kept frames the same way). */
  def frameSampleFeatures(spark: SparkSession, media: DataFrame,
                          stride: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          // the SAME whole-payload guard as every other extractor
          // (round-7 review: this one had drifted to magic-only, so a
          // corrupt header yielded garbage frame counts instead of the
          // -1 sentinel its siblings emit)
          if (isWholeBmp(b)) {
            val h = le32(b, 22)
            val rowBytes = (le32(b, 18) * 3 + 3) / 4 * 4
            FrameSample(id, h, (h + stride - 1) / stride, rowBytes)
          } else FrameSample(id, -1, -1, -1)
        }
      }.toDF()
  }

  /** Partition-wise shot-boundary detection: per frame (pixel row, the
    * [[frameSampleFeatures]] convention) an integer luma sum; a CUT fires
    * between consecutive frames when the delta is large relative to the
    * item's mean frame luma, tested in cross-product form
    * (`thresholdNum·|Δ|·n_frames > thresholdDen·Σ luma` — the mean is
    * never divided, so the detector is exact integer arithmetic end to
    * end and any engine reproduces it bit-for-bit). This is the step a
    * video pipeline runs BEFORE frame dedup/captioning: sample one frame
    * per shot, not per stride. Invalid payloads surface as −1 sentinels —
    * one bad blob must not kill a 100 TB scan. */
  def sceneCutFeatures(spark: SparkSession, media: DataFrame,
                       thresholdNum: Long = 3, thresholdDen: Long = 2): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val whole = isWholeBmp(b)
          if (whole) {
            val w = le32(b, 18); val h = le32(b, 22)
            val stride = (w.toLong * 3 + 3) / 4 * 4
            val sums = new Array[Long](h)
            var total = 0L
            var y = 0
            while (y < h) {
              var s = 0L
              var x = 0
              val base = 54L + y * stride
              while (x < w * 3) {
                s += (b((base + x).toInt) & 0xFF)
                x += 1
              }
              sums(y) = s; total += s; y += 1
            }
            var cuts = 0; var first = -1; var maxD = 0L
            var i = 1
            while (i < h) {
              val d = math.abs(sums(i) - sums(i - 1))
              if (d > maxD) maxD = d
              if (thresholdNum * d * h > thresholdDen * total) {
                cuts += 1
                if (first < 0) first = i
              }
              i += 1
            }
            SceneCut(id, h, cuts, first, maxD)
          } else SceneCut(id, -1, -1, -1, -1L)
        }
      }.toDF()
  }

  /** 64-bit perceptual hash (average-hash) of a 24-bit BMP payload: sample
    * the pixel array on a nearest-neighbor 8×8 grid, sum each sample's
    * three channels (integer luma — no float), and set bit (y·8+x) when the
    * sample is STRICTLY above the grid mean (`64·s > Σs` — cross-product
    * form, so the mean is never divided and the hash is exact integer
    * arithmetic end to end). Visually-close images differ in few bits, so
    * image near-dup becomes the same Hamming-ball join the text SimHash
    * tier runs.
    *
    * The nearest-neighbor grid makes the hash EXACTLY invariant under
    * integer-factor upscaling (floor(floor(x·kw/8)/k) = floor(x·w/8)) —
    * the resize-robustness a perceptual hash promises, here provable and
    * spec-asserted rather than approximate. */
  def pHash64(b: Array[Byte]): Long = {
    val w = le32(b, 18)
    val h = le32(b, 22)
    val stride = (w.toLong * 3 + 3) / 4 * 4
    val s = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < 8) {
      val sy = y.toLong * h / 8
      var x = 0
      while (x < 8) {
        val sx = x.toLong * w / 8
        val off = (54L + sy * stride + sx * 3).toInt
        val v = ((b(off) & 0xFF) + (b(off + 1) & 0xFF) +
          (b(off + 2) & 0xFF)).toLong
        s(y * 8 + x) = v
        total += v
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (s(i) * 64 > total) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Partition-wise perceptual hashing: (doc_id, phash) per decodable
    * payload; corrupt payloads surface as a null hash (sentinel row, same
    * contract as the other feature extractors — one bad blob must not kill
    * the scan). */
  def phashFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          val whole = isWholeBmp(b)
          (id, if (whole) Some(pHash64(b)) else None)
        }
      }.toDF("doc_id", "phash")
  }

  /** Id offset distinguishing re-encoded copies from originals in the
    * perceptual-dedup fixture. */
  val UpscaleIdOffset: Long = 1L << 20

  /** The corpus re-encoded at k× resolution — the scenario perceptual
    * dedup exists for (the same image circulating at different
    * resolutions/encodings), synthesized from the corpus itself. Valid
    * payloads are genuinely resampled and re-encoded ([[resizeBmp]]);
    * corrupt ones pass through untouched (the hasher nulls them).
    * Copies carry `doc_id + UpscaleIdOffset`. */
  def upscaledMedia(spark: SparkSession, media: DataFrame,
                    k: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, b) =>
          // the DESTINATION dims must also pass the MaxDim bound (round-7
          // review: a source at MaxDim × MaxDim passes isWholeBmp but its
          // k× destination overflows Int in the allocation — one bad blob
          // must not kill a 100 TB scan). Over-bound sources pass through
          // untouched (a 1× copy is still a valid near-dup of itself).
          val whole = isWholeBmp(b) &&
            le32(b, 18).toLong * k <= MaxDim && le32(b, 22).toLong * k <= MaxDim
          val out =
            if (whole) resizeBmp(b, le32(b, 18) * k, le32(b, 22) * k) else b
          (id + UpscaleIdOffset, out)
        }
      }.toDF("doc_id", "payload")
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
      it.map { case (id, b) =>
        if (isBmp(b))
          MediaFeature(id, le32(b, 2), le32(b, 18), le32(b, 22), le16(b, 28))
        else MediaFeature(id, b.length, -1, -1, -1)
      }
    }.toDF()
  }

  /** Audio sample rate used by the WAV fixture (8 kHz mono PCM-16). */
  val WavRate = 8000

  /** The ONE canonical-WAV validator every PCM-reading extractor shares
    * (round-7 review): RIFF/WAVE magic, the 'data' chunk tag actually AT
    * the canonical offset 36 (a perfectly valid WAV with a LIST/INFO chunk
    * between fmt and data would otherwise have its metadata bytes parsed
    * as PCM samples — non-canonical layouts must surface the sentinel, not
    * garbage features), and the declared data size present. Size math in
    * Long so a corrupt header cannot overflow the bounds check. */
  private[mm] def isCanonicalWav(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
      b(36) == 'd' && b(37) == 'a' && b(38) == 't' && b(39) == 'a' &&
      le32(b, 40) >= 0 && 44L + le32(b, 40).toLong <= b.length.toLong

  /** A valid RIFF/WAVE PCM-16 mono payload whose samples derive from the
    * text bytes — the audio twin of [[encodeBmp]]: 44-byte canonical header
    * (RIFF size, fmt chunk, data chunk) + little-endian 16-bit samples
    * `(b[i] − b[i+1]) << 6` over the cycled text (ADJACENT-byte
    * differences, which oscillate around zero like a real signal — raw
    * byte levels would sit entirely below the midline and degenerate the
    * zero-crossing stat). Deterministic stand-in for a real recording; the
    * header is genuinely parseable by any WAV reader. */
  def encodeWav(textBytes: Array[Byte], nChars: Int): Array[Byte] = {
    val nSamples = 64 + nChars % 193
    val dataSize = nSamples * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)            // fmt chunk size
    putLe16(out, 20, 1)             // PCM
    putLe16(out, 22, 1)             // mono
    putLe32(out, 24, WavRate)       // sample rate
    putLe32(out, 28, WavRate * 2)   // byte rate
    putLe16(out, 32, 2)             // block align
    putLe16(out, 34, 16)            // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    val L = textBytes.length
    while (i < nSamples) {
      val s = if (L == 0) 0
        else (((textBytes(i % L) & 0xFF) -
          (textBytes((i + 1) % L) & 0xFF)) << 6)
      putLe16(out, 44 + 2 * i, s & 0xFFFF)
      i += 1
    }
    out
  }

  /** Present documents as an audio table: opaque WAV payload + typed
    * metadata struct — the audio twin of [[asMedia]]. */
  def asAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text"),
        col("n_chars").cast(IntegerType).as("n_chars"), col("lang"))
      .as[(Long, String, Int, String)]
      .map { case (id, text, nChars, lang) =>
        (id, encodeWav(text.getBytes("UTF-8"), nChars), "audio/wav",
          nChars, lang)
      }
      .toDF("doc_id", "payload", "mime", "n_chars", "lang")
      .select(col("doc_id"), col("payload"),
        struct(col("mime"), col("n_chars"), col("lang")).as("meta"))
  }

  /** Partition-wise audio feature extraction: verify the RIFF/WAVE magic,
    * parse sample rate and data size from the header, then one pass over
    * the PCM-16 samples computing zero crossings (sign changes, 0 counted
    * non-negative), peak |sample|, and Σ sample² — all exact integers, the
    * stats an ingest pipeline gates on (silence/clipping detection) before
    * paying for a real codec. Invalid payloads surface as a −1 sentinel
    * row, never an exception: one bad blob must not kill a 100 TB scan.
    * Size math in Long so a corrupt header cannot overflow the bounds
    * check. */
  def audioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      it.map { case (id, b) =>
        val ok = isCanonicalWav(b)
        if (!ok) AudioFeature(id, -1, -1L, -1L, -1, -1L)
        else {
          val n = le32(b, 40) / 2
          var i = 0; var zc = 0L; var peak = 0; var energy = 0L
          var prevNeg = false
          while (i < n) {
            val s = le16s(b, 44 + 2 * i)
            val neg = s < 0
            if (i > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            val a = math.abs(s)
            if (a > peak) peak = a
            energy += s.toLong * s.toLong
            i += 1
          }
          AudioFeature(id, le32(b, 24), n.toLong, zc, peak, energy)
        }
      }
    }.toDF()
  }

  /** Partition-wise energy-threshold voice-activity detection: frame the
    * PCM-16 stream into 16-sample windows, per-frame energy Σs² (exact
    * long), mark a frame SPEECH when its energy strictly beats half the
    * per-doc mean frame energy by exact integer cross-multiplication
    * (2·e_f·F > Σe — no float threshold, so the segmentation is
    * deterministic), then reduce the speech mask to islands. The codec
    * seam is the same `mapPartitions` as [[audioFeatures]] — one pass per
    * payload, no state across rows, corrupt blobs yield −1 sentinels. */
  def audioVad(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      val W = 16
      it.map { case (id, b) =>
        val ok = isCanonicalWav(b)
        if (!ok) VadResult(id, -1, -1, -1, -1, -1, -1L)
        else {
          val n = le32(b, 40) / 2
          val nf = n / W                    // trailing partial frame dropped
          val e = new Array[Long](nf)
          var f = 0
          while (f < nf) {
            var i = 0; var acc = 0L
            while (i < W) {
              val s = le16s(b, 44 + 2 * (f * W + i))
              acc += s.toLong * s.toLong
              i += 1
            }
            e(f) = acc; f += 1
          }
          val total = e.sum
          var nSpeech = 0; var nSeg = 0; var first = -1
          var run = 0; var longest = 0
          f = 0
          while (f < nf) {
            val speech = 2L * e(f) * nf > total
            if (speech) {
              nSpeech += 1
              if (first < 0) first = f
              if (run == 0) nSeg += 1
              run += 1
              if (run > longest) longest = run
            } else run = 0
            f += 1
          }
          val ppm = if (nf == 0) 0L else nSpeech.toLong * 1000000L / nf
          VadResult(id, nf, nSpeech, nSeg, first, longest, ppm)
        }
      }
    }.toDF()
  }

  /** Content-defined chunk boundaries over a byte payload — the
    * storage-dedup primitive (Muthitacharoen 2001 LBFS shape): a rolling
    * polynomial hash over a [[CdcWindow]]-byte window declares a boundary
    * wherever `hash & (avg-1) == avg-1`, clamped to [min, max] chunk
    * sizes, so a byte edit only reshapes the chunks around it and every
    * shared run between two payloads re-aligns to identical chunks.
    * Returns (offset, length, digestHex) per chunk. Pure function of the
    * bytes — the spec replays it driver-side verbatim. */
  val CdcWindow = 16
  val CdcMin = 32
  val CdcMax = 256
  val CdcMask = 63L // avg 64-byte chunks

  def cdcChunks(bytes: Array[Byte]): Seq[(Int, Int, String)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var start = 0
    var h = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      // rolling poly hash: h = h*31 + b, with the byte leaving the
      // window removed (31^(w-1) factor precomputed)
      h = h * 31 + (bytes(i) & 0xff)
      if (i - start + 1 > CdcWindow)
        h -= Pow31W * (bytes(i - CdcWindow) & 0xff)
      val len = i - start + 1
      if (len >= CdcMax ||
          (len >= CdcMin && (h & CdcMask) == CdcMask)) {
        out += emit(md, bytes, start, len)
        start = i + 1; h = 0L
      }
      i += 1
    }
    if (start < n) out += emit(md, bytes, start, n - start)
    out.toSeq
  }

  private val Pow31W: Long = {
    var p = 1L; var i = 0
    while (i < CdcWindow) { p *= 31; i += 1 }
    p
  }

  private def emit(md: java.security.MessageDigest, bytes: Array[Byte],
                   off: Int, len: Int): (Int, Int, String) = {
    md.reset(); md.update(bytes, off, len)
    (off, len, md.digest().map("%02x".format(_)).mkString)
  }

  // ── audio landmark fingerprinting (Wang 2003 constellation shape) ──

  val FpFrame = 16   // samples per analysis frame
  val FpHop = 8      // frame hop
  val FpFanout = 3   // pairs emitted per anchor landmark

  /** Landmarks of a WAV payload: per analysis frame (16 samples, hop 8)
    * the peak-magnitude bucket (|s| >> 9 clamped to 6 bits, 0..63) — the
    * deterministic stand-in for a spectrogram constellation. The clamp
    * matters at full scale (round-7 review): |−32768| >> 9 = 64, which a
    * bare `& 0x3F` would alias to bucket 0, colliding the loudest clipped
    * frames with silence. Returns (frameIdx, bucket). Pure function of
    * the bytes; the spec and the DuckDB oracle replay it. */
  def audioLandmarks(bytes: Array[Byte]): Seq[(Int, Int)] = {
    // the shared canonical-WAV validator (magic + 'data' tag + declared
    // data-chunk bounds): a truncated/padded/non-canonical payload is
    // rejected, never fingerprinted from junk or metadata bytes
    if (bytes == null || !isCanonicalWav(bytes)) return Seq.empty
    val n = le32(bytes, 40) / 2
    def sample(i: Int): Int = {
      val lo = bytes(44 + 2 * i) & 0xFF
      val hi = bytes(45 + 2 * i)
      (hi << 8) | lo
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var f = 0
    var start = 0
    while (start + FpFrame <= n) {
      var best = 0
      var i = start
      while (i < start + FpFrame) {
        val a = math.abs(sample(i)); if (a > best) best = a
        i += 1
      }
      out += ((f, math.min(best >> 9, 63)))
      f += 1; start += FpHop
    }
    out.toSeq
  }

  /** Constellation fingerprints: each landmark pairs with the next
    * [[FpFanout]] landmarks into hash = b1<<12 | b2<<6 | dt, anchored at
    * the first landmark's frame time. Returns (hash, t1). */
  def audioFingerprints(bytes: Array[Byte]): Seq[(Int, Int)] = {
    val lm = audioLandmarks(bytes)
    for {
      i <- lm.indices
      j <- (i + 1) to math.min(i + FpFanout, lm.length - 1)
    } yield {
      val dt = lm(j)._1 - lm(i)._1
      ((lm(i)._2 << 12) | (lm(j)._2 << 6) | (dt & 0x3F), lm(i)._1)
    }
  }

  /** Explode a media frame into its content-defined chunks:
    * (doc_id, chunk_digest, chunk_len). The codec-seam `mapPartitions`
    * (same seam as decode — no Catalyst expression chunks binaries); one
    * narrow pass, linear in payload bytes. */
  def chunked(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          cdcChunks(if (payload == null) Array.emptyByteArray else payload)
            .map { case (_, len, dig) => (id, dig, len.toLong) }
        }
      }.toDF("doc_id", "chunk_digest", "chunk_len")
  }
}

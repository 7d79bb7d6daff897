package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection over a documents table: exact content hashing,
  * word n-gram Jaccard, MinHash+LSH banding, and SimHash.
  *
  * Scale design (the point of this module): exact pairwise Jaccard is
  * O(n²·|shingles|) and exists only as the verification tier over a bounded
  * candidate set. The scale path is MinHash signatures (one narrow map),
  * LSH band-bucket explosion (×`Bands` rows), a bucket equi-join (one hash
  * shuffle on the band key, never a cross join), a pathological-bucket cap
  * (stop-shingle spam buckets are dropped, the standard skew guard), and
  * exact Jaccard computed only on surviving candidate pairs. All hashing is
  * `xxhash64` — deterministic across runs and engines, so results are
  * reproducible cluster-wide.
  */
object NearDup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // P(candidate | j) = 1-(1-j^4)^8 → ~1.0 at j≥0.9

  /** Distinct word n-gram shingles of the text (default trigrams). */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
  }

  /** MinHash signature: per seed, the min xxhash64 over the shingle set. */
  def minhashSig(sh: Column): Column =
    array((0 until NumHashes).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)

  /** LSH band keys: hash of each `RowsPerBand`-slice of the signature. */
  def bandHashes(sig: Column): Column =
    array((0 until Bands).map(b =>
      xxhash64((0 until RowsPerBand).map(r =>
        element_at(sig, b * RowsPerBand + r + 1)): _*)): _*)

  /** Exact Jaccard between two shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    inter / (size(a) + size(b) - size(array_intersect(a, b))).cast(DoubleType)
  }

  /** Candidate pairs via band-bucket join. `maxBucket` drops spam buckets
    * (every-doc-shares-this-shingle skew) before the join explodes. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     maxBucket: Int = 1000): DataFrame = {
    val banded = docs
      .select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .select(col("id"), posexplode(bandHashes(minhashSig(col("sh")))))
      .toDF("id", "band", "bh")
    val ok = banded.groupBy("band", "bh").count()
      .filter(col("count") <= maxBucket).drop("count")
    val pruned = banded.join(ok, Seq("band", "bh"))
    pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard ≥ threshold.
    * The verify join fetches shingles by id (narrow re-scan) instead of
    * carrying shingle arrays through the bucket shuffle. */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
    candidatePairs(docs, idCol, textCol)
      .join(sh.toDF("a_id", "a_sh"), "a_id")
      .join(sh.toDF("b_id", "b_sh"), "b_id")
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_sh"), col("b_sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit b is the sign of the sum
    * of ±1 votes from each token-hash's bit b. Pure nested higher-order
    * expressions — no UDF, fully distributed. */
  def simhash64(text: Column): Column = {
    val hs = transform(split(text, " "), t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, b) => acc + when(
        aggregate(hs, lit(0),
          (s, h) => s + when(call_function("shiftright", h, b)
            .bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)) > 0,
        call_function("shiftleft", lit(1L), b)).otherwise(0L))
  }

  /** SimHash near-dup pairs: 16-bit chunk buckets (a pair within hamming
    * distance ≤3 of 64 bits must agree on ≥1 of 4 chunks), then exact
    * hamming ≤ maxHamming via bit_count(xor). */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 6): DataFrame = {
    val sim = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
    val chunked = sim.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sim"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .toDF("id", "sim", "chunk", "ck")
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }
}

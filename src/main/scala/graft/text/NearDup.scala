package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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
  * xxhash64 — deterministic across runs and engines, so results are
  * reproducible cluster-wide.
  *
  * The text kernels (shingling, signatures, Jaccard, SimHash) are custom
  * Catalyst expressions ([[graft.functions.GraftFunctions]]) — single-pass
  * loops instead of interpreted higher-order-function trees. The shingle/
  * signature table is persisted before the self-join: it is read three
  * times (banding + both verify sides), and at 100 TB this intermediate is
  * exactly what you'd materialize (memory-and-disk here; a checkpoint table
  * on a cluster).
  */
object NearDup {

  val NumHashes = 32
  val Bands = 8
  val RowsPerBand = 4 // P(candidate | j) = 1-(1-j^4)^8 → ~1.0 at j≥0.9

  /** Distinct word n-gram shingles of the text (trigrams). */
  def shingles(text: Column): Column = call_function("graft_shingles", text)

  /** MinHash signature: per seed, the min xxhash64 over the shingle set. */
  def minhashSig(sh: Column): Column = call_function("graft_minhash_sig", sh)

  /** LSH band keys: hash of each `RowsPerBand`-slice of the signature. */
  def bandHashes(sig: Column): Column =
    array((0 until Bands).map(b =>
      xxhash64((0 until RowsPerBand).map(r =>
        element_at(sig, b * RowsPerBand + r + 1)): _*)): _*)

  /** Exact Jaccard between two distinct-shingle-set columns. */
  def jaccard(a: Column, b: Column): Column = call_function("graft_jaccard", a, b)

  /** id → shingle-set table, persisted (re-read by banding + both verify
    * join sides). */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)

  /** Candidate pairs via band-bucket join over a shingle table. `maxBucket`
    * drops spam buckets (every-doc-shares-this-shingle skew) before the
    * join explodes. */
  def candidatePairsFromShingles(sh: DataFrame, maxBucket: Int = 1000): DataFrame = {
    val banded = sh
      .select(col("id"), posexplode(bandHashes(minhashSig(col("sh")))))
      .toDF("id", "band", "bh")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ok = banded.groupBy("band", "bh").count()
      .filter(col("count") <= maxBucket).drop("count")
    val pruned = banded.join(ok, Seq("band", "bh"))
    pruned.as("a").join(pruned.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
  }

  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     maxBucket: Int = 1000): DataFrame =
    candidatePairsFromShingles(shingleTable(docs, idCol, textCol), maxBucket)

  /** MinHash+LSH near-dup pairs, verified with exact Jaccard ≥ threshold.
    * The verify join fetches shingle sets by id from the persisted shingle
    * table instead of carrying arrays through the bucket shuffle. */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol)
    candidatePairsFromShingles(sh)
      .join(sh.toDF("a_id", "a_sh"), "a_id")
      .join(sh.toDF("b_id", "b_sh"), "b_id")
      .select(col("a_id"), col("b_id"),
        round(jaccard(col("a_sh"), col("b_sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset (custom expression). */
  def simhash64(text: Column): Column = call_function("graft_simhash64", text)

  /** SimHash near-dup pairs: 16-bit chunk buckets (a pair within hamming
    * distance ≤3 of 64 bits must agree on ≥1 of 4 chunks), then exact
    * hamming ≤ maxHamming via bit_count(xor). */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 6): DataFrame = {
    val sim = docs.select(col(idCol).as("id"), simhash64(col(textCol)).as("sim"))
      .persist(StorageLevel.MEMORY_AND_DISK)
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

  /** SimHash candidates re-verified with exact Jaccard — same precision
    * contract as the MinHash path, so the two scale paths are directly
    * comparable on recall. */
  def simhashVerifiedPairs(docs: DataFrame, idCol: String, textCol: String,
                           threshold: Double, maxHamming: Int = 6): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol)
    simhashDupPairs(docs, idCol, textCol, maxHamming)
      .join(sh.toDF("a_id", "a_sh"), "a_id")
      .join(sh.toDF("b_id", "b_sh"), "b_id")
      .select(col("a_id"), col("b_id"), col("hamming"),
        round(jaccard(col("a_sh"), col("b_sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}

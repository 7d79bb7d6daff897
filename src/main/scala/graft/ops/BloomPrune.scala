package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join reduction — the "small filtered dim,
  * huge fact" shuffle cutter, complementing Spark's automatic runtime
  * bloom filter (spec'd in RuntimeFilterSpec) for the shapes the
  * optimizer's thresholds or stats don't fire on.
  *
  * Spark-first shape: the bitset is BUILT with built-in aggregates (each
  * key explodes to its k probe positions, positions fold into 64-bit words
  * via one tiny `bit_or` aggregate) and collected to the driver — at most
  * `numBits / 64` longs, a model parameter like the IVF centroid table,
  * NOT a join side. The probe is a pure narrow `Column` predicate over the
  * fact scan (xxhash64 + shift/mask arithmetic, all codegen'd built-ins),
  * so pruning happens BEFORE the join shuffle and costs no exchange.
  *
  * Correctness-transparent by construction: a bloom filter has no false
  * negatives, so `join(dim)` after `mightContain` pruning returns exactly
  * the unpruned join's rows (false positives are eliminated by the real
  * join). Queries using it therefore keep their exact-SQL oracle. */
object BloomPrune {

  /** The k probe positions of a key in a `numBits`-wide filter: seeded
    * xxhash64 per probe, folded into [0, numBits). */
  private def positions(key: Column, numBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(numBits.toLong)))

  /** Aggregate the filter over the (already filtered) dim side. The
    * aggregate output is one row per touched 64-bit word — bounded by
    * `numBits / 64` rows regardless of dim cardinality. */
  def buildBits(dim: DataFrame, key: Column, numBits: Int = 1 << 14,
                k: Int = 3): Array[Long] = {
    require(numBits % 64 == 0 && numBits > 0, s"numBits $numBits not a multiple of 64")
    val pos = explode(array(positions(key, numBits, k): _*)).as("pos")
    val words = dim.select(pos)
      .select(shiftright(col("pos"), 6).as("w"),
        call_function("shiftleft", lit(1L),
          col("pos").bitwiseAND(lit(63L)).cast("int")).as("b"))
      .groupBy("w").agg(bit_or(col("b")).as("bits"))
      .collect()
    val arr = new Array[Long](numBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Membership predicate: all k probed bits set. False negatives are
    * impossible; false-positive rate ~ (k·n/m)^k for n keys in m bits. */
  def mightContain(key: Column, bits: Array[Long], k: Int = 3): Column = {
    val words = typedlit(bits.toSeq)
    positions(key, bits.length * 64, k).map { p =>
      call_function("shiftrightunsigned",
          element_at(words, shiftright(p, 6).cast("int") + 1),
          p.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === 1
    }.reduce(_ && _)
  }
}

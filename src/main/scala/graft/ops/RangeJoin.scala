package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Binned (bucketed) range join: points with value `v` matched to intervals
  * `[lo, hi)` WITHOUT a nested-loop join. Spark plans a raw
  * `v >= lo AND v < hi` theta-join as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side fits in memory) — a scale-killer the
  * moment both sides are big. The standard fix, used by every interval-join
  * engine: quantize the value domain into fixed-width bins; an interval
  * covers `ceil(span/binWidth)+1` bins, a point falls in EXACTLY one bin, so
  * an equi-join on the bin id finds every candidate pair exactly once (no
  * dedup needed) and the exact range predicate refines survivors.
  *
  * Cost at any scale: one narrow bin-explode of the interval side (bounded
  * by span/binWidth — pick binWidth near the typical span so the factor
  * stays small), then ONE hash shuffle on the bin key. Both sides
  * partition; neither broadcasts; skewed bins split under AQE like any
  * other equi-join key.
  */
object RangeJoin {

  /** Join `points` (carrying numeric `valueCol`) to `intervals` (carrying
    * numeric `loCol`/`hiCol`, half-open `[lo, hi)`). Intervals with
    * `lo > hi` are empty and dropped (a descending `sequence` would
    * otherwise fabricate bins). Column names must be disjoint enough that
    * the exact predicate is unambiguous after the equi-join. */
  /** Interval×interval OVERLAP join: pairs from `a` (`[aLo, aHi)`) and `b`
    * (`[bLo, bHi)`) with `aLo < bHi AND bLo < aHi` — again without a
    * nested loop. Both sides explode to their covered bins and equi-join on
    * the bin id; since overlapping intervals can share MANY bins, each pair
    * is kept only at its canonical bin — the bin of the intersection start
    * `max(aLo, bLo)`, i.e. `greatest(floor(aLo/w), floor(bLo/w))` — which
    * both sides provably cover exactly when they overlap, so every true
    * pair survives exactly once and no dedup shuffle is ever needed. The
    * exact predicate still refines (bin co-residence is necessary, not
    * sufficient). Cost: two narrow explodes bounded by span/binWidth + ONE
    * hash shuffle on the bin key; no broadcast, AQE splits skewed bins. */
  def overlapBinned(a: DataFrame, aLoCol: String, aHiCol: String,
                    b: DataFrame, bLoCol: String, bHiCol: String,
                    binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: String) = floor(col(c) / binWidth).cast(LongType)
    val ab = a.filter(col(aLoCol) <= col(aHiCol))
      .withColumn("__bin", explode(sequence(bin(aLoCol), bin(aHiCol))))
    val bb = b.filter(col(bLoCol) <= col(bHiCol))
      .withColumn("__bin", explode(sequence(bin(bLoCol), bin(bHiCol))))
    ab.join(bb, Seq("__bin"))
      .filter(col("__bin") === greatest(bin(aLoCol), bin(bLoCol)) &&
        col(aLoCol) < col(bHiCol) && col(bLoCol) < col(aHiCol))
      .drop("__bin")
  }

  def binned(points: DataFrame, valueCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val pb = points.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast(LongType))
    val ib = intervals.filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast(LongType),
        floor(col(hiCol) / binWidth).cast(LongType))))
    pb.join(ib, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}

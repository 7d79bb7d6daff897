package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution-drift measurement between two slices of one table — the
  * gate a pipeline runs between a fresh corpus snapshot and its baseline
  * before retraining on it.
  *
  * The two-sample Kolmogorov–Smirnov statistic needs both empirical CDFs
  * over the merged value order — a GLOBAL running sum, exactly the shape
  * that naively plans a single-task window. Both cumulative counts run
  * through the two-pass distributed scan ([[PrefixSum.cumSum]]) instead,
  * and they run over the per-VALUE count table, which is bounded by the
  * number of distinct values, not rows — for a discrete-ish measurement
  * column (lengths, scores rounded to fixed precision) that table is tiny
  * relative to the corpus however large the corpus grows. All arithmetic
  * is exact integer counts until one final division per distinct value, so
  * the statistic is bit-identical across engines.
  */
object Drift {

  /** One row: (ks_stat, at_value = smallest value attaining the max CDF
    * gap, n_a, n_b), where membership in sample A is `inACol` (boolean;
    * false = sample B). Rows with NULL `valueCol` are excluded from both
    * CDFs (KS is defined over the ordered support). */
  def ks(df: DataFrame, valueCol: String, inACol: String): DataFrame = {
    val perValue = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol))
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col(inACol), 1L).otherwise(0L)).as("cnt_b"))
    val totals = perValue.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"))
    val cum = PrefixSum.cumSum(
      PrefixSum.cumSum(perValue, Nil, Seq(valueCol), col("cnt_a"), "cum_a"),
      Nil, Seq(valueCol), col("cnt_b"), "cum_b")
    val gaps = cum.crossJoin(broadcast(totals))
      .select(col(valueCol), col("n_a"), col("n_b"),
        round(abs(col("cum_a").cast(DoubleType) / col("n_a")
          - col("cum_b").cast(DoubleType) / col("n_b")), 6).as("gap"))
    val ksMax = gaps.agg(max(col("gap")).as("ks_stat"))
    gaps.crossJoin(broadcast(ksMax))
      .filter(col("gap") === col("ks_stat"))
      .groupBy(col("ks_stat"), col("n_a"), col("n_b"))
      .agg(min(col(valueCol)).as("at_value"))
      .select(col("ks_stat"), col("at_value"), col("n_a"), col("n_b"))
  }
}

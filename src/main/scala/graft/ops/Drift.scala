package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Per-group exact-integer moment stats (n, Σx, Σx²) over an integer
    * measurement column `x` (e.g. cents) — DECIMAL(38,0) partials, exact
    * and mergeable at any corpus size. The input to
    * [[sigmaOutlierCounts]]. */
  def sigmaStats(ev: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // square AFTER widening to DECIMAL (round-7 review): x·x in the native
    // integer type wraps silently past ~3.04e9 for Long cents (a $40M
    // transaction), corrupting s2 with no error — the cast must reach the
    // leaves, not the product
    val xd = col("x").cast(DecimalType(38, 0))
    ev.groupBy(col(groupCol)).agg(
      count(lit(1)).cast(DecimalType(38, 0)).as("n"),
      sum(xd).cast(DecimalType(38, 0)).as("s1"),
      sum(xd * xd).cast(DecimalType(38, 0)).as("s2"))
  }

  /** Count rows outside three standard deviations of their group mean,
    * with the WHOLE threshold test in exact integers:
    * `(n·x − Σx)² > 9·(n·Σx² − (Σx)²)` — no float σ is ever computed, so
    * the boundary cannot waver between engines or partitionings.
    * `stats` may come from the same slice (self-audit, `dq_anomaly`) or a
    * frozen baseline (streaming gate, `stream_anomaly`). */
  def sigmaOutlierCounts(ev: DataFrame, stats: DataFrame,
                         groupCol: String): DataFrame = {
    val dev = col("n") * col("x") - col("s1")
    ev.join(broadcast(stats), Seq(groupCol))
      .withColumn("is_outlier",
        dev * dev > lit(9) * (col("n") * col("s2") - col("s1") * col("s1")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"))
  }

  /** Categorical drift between the same two slices — the language-mix /
    * source-mix shift a KS-over-ordinals cannot express. Output is ONE row
    * per category with its Jensen–Shannon divergence contribution
    * (`js_term`, base-2: the sum over categories is the JS divergence in
    * bits, 0 = identical mix, 1 = disjoint) and its Vincze–Le Cam
    * contribution (`lecam_term`, also summing to at most 1). Everything is
    * exact integer counts until ONE closed-form double expression per row
    * — no cross-row float accumulation anywhere, so any drift threshold
    * applied downstream sums a handful of per-category doubles, not the
    * corpus. `lecam_term` is pure rational arithmetic (bit-identical on
    * any engine, the vocab_pmi precedent); `js_term` carries a log2 whose
    * libm can differ by an ulp between engines — round(·, 9) absorbs that
    * everywhere except the measure-zero case of a value landing within an
    * ulp of a rounding boundary. Ratios inside the logs are cross-products
    * (`2·a·n_b / (a·n_b + b·n_a)`), cast to double at the leaves so no
    * BIGINT product can overflow at corpus scale. */
  def jsDivergence(df: DataFrame, catCol: String, inACol: String): DataFrame = {
    val perCat = df.filter(col(catCol).isNotNull)
      .groupBy(col(catCol))
      .agg(sum(when(col(inACol), 1L).otherwise(0L)).as("cnt_a"),
        sum(when(!col(inACol), 1L).otherwise(0L)).as("cnt_b"))
    val totals = perCat.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"))
    val ca = col("cnt_a").cast(DoubleType)
    val cb = col("cnt_b").cast(DoubleType)
    val na = col("n_a").cast(DoubleType)
    val nb = col("n_b").cast(DoubleType)
    val denom = ca * nb + cb * na
    val termA = when(col("cnt_a") > 0,
      ca / na * log2(lit(2.0) * ca * nb / denom)).otherwise(lit(0.0))
    val termB = when(col("cnt_b") > 0,
      cb / nb * log2(lit(2.0) * cb * na / denom)).otherwise(lit(0.0))
    val diff = ca * nb - cb * na
    val leCam = lit(0.5) * (diff * diff) / ((na * nb) * denom)
    perCat.crossJoin(broadcast(totals))
      .select(col(catCol), col("cnt_a"), col("cnt_b"),
        round(lit(0.5) * (termA + termB), 9).as("js_term"),
        round(leCam, 9).as("lecam_term"))
  }

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

  /** CUSUM changepoint per key: the cumulative deviation of `valCol` from
    * its per-key series mean, maximized over prefixes — "did the level
    * shift, and when". The statistic stays in exact integer arithmetic by
    * scaling out the mean's division: `cusum_k = n·Σ_{i≤k}x − k·Σx`
    * (×n of the textbook definition — same argmax, no float anywhere).
    * Returns one row per key: (keyCol, n_points, max_dev = max |cusum_k|,
    * at = the `ordCol` value attaining it, earliest on ties). The running
    * sums ride windows KEYED by `keyCol`; partitions are series-length
    * bounded (e.g. calendar days), never corpus-sized.
    *
    * `ordCol` must be UNIQUE per key (callers pre-aggregate to one row
    * per day). The prefix sum uses an explicit ROWS frame (round-7
    * review): the default RANGE frame hands every ordCol-tied row the
    * full peer-group sum while `k` comes from row_number, silently
    * skewing the statistic if a caller ever passed a non-unique order. */
  def cusum(series: DataFrame, keyCol: String, ordCol: String,
      valCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    series
      .withColumn("k", row_number().over(byKey.orderBy(col(ordCol))))
      .withColumn("cx", sum(col(valCol)).over(byKey.orderBy(col(ordCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(byKey))
      .withColumn("sx", sum(col(valCol)).over(byKey))
      .withColumn("cusum", col("n") * col("cx") - col("k") * col("sx"))
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n_points"),
        max(struct(abs(col("cusum")).as("d"), (-col("k")).as("nk"),
          col(ordCol).as("at"))).as("m"))
      .select(col(keyCol), col("n_points"),
        col("m.d").as("max_dev"), col("m.at").as("at"))
  }
}

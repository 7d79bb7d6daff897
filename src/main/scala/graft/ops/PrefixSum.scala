package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix sums and global ranks — the two-pass parallel scan.
  *
  * An unpartitioned window (`sum(x).over(Window.orderBy(k))`,
  * `ntile(n).over(Window.orderBy(k))`) funnels EVERY row through one task;
  * a window partitioned by a skewed group key serializes its dominant group
  * the same way. Both are correct on a laptop and dead at 100 TB. The
  * distributed equivalent is the textbook two-pass scan:
  *
  *   1. `repartitionByRange` on (group, order) keys — the same sampled range
  *      exchange a global ORDER BY uses, so partition `i` holds keys wholly
  *      before partition `i+1` and rows spread over ALL partitions
  *      regardless of group skew;
  *   2. a LOCAL cumulative window inside each range partition (partition
  *      spec = the materialized partition id + group, so no window partition
  *      ever exceeds a range-partition's bounded size);
  *   3. ONE aggregate of per-(partition, group) totals — `numPartitions ×
  *      |groups-per-partition|` rows, model-parameter-sized — folded into
  *      exclusive per-partition offsets IN-PLAN (collect_list + an
  *      `aggregate` over the sorted struct array; O(P²) adds for P shuffle
  *      partitions, pennies for any realistic P) and broadcast-joined back
  *      on the partition id.
  *
  * Cost: one range shuffle of the narrow input, materialized ONCE for both
  * passes (see [[ranged]] — the materialization is load-bearing, not an
  * optimization), one tiny agg, one broadcast hash join — vs the
  * single-task sort of the naive form. The result is independent of where
  * the sampled range boundaries land, so the output is deterministic even
  * though the partitioning itself is an execution detail.
  *
  * Reference semantics: the pandas `cumsum`/`qcut` idioms of
  * `card_funnel/kafka_s3_to_silver.py`-style frame code, re-expressed as a
  * scan that survives a 1000-executor cluster.
  */
object PrefixSum {

  private val Pid = "__ps_pid"
  private val Loc = "__ps_loc"
  private val Off = "__ps_off"
  private val Tot = "__ps_tot"
  private val NTot = "__ps_n"

  /** Exclusive per-(partition, group) offsets from a totals table of
    * (Pid, groupCols..., Tot): for each group, offset(p) = Σ Tot over the
    * group's earlier partitions, plus NTot = the group's grand total. The
    * fold happens in-plan over a per-group struct array sorted by partition
    * id — no driver collect, no unpartitioned window. */
  private def exclusiveOffsets(totals: DataFrame,
                               groupCols: Seq[String]): DataFrame = {
    val arr = sort_array(collect_list(struct(col(Pid), col(Tot))))
    val agged =
      if (groupCols.isEmpty) totals.agg(arr.as("__ps_arr"))
      else totals.groupBy(groupCols.map(col): _*).agg(arr.as("__ps_arr"))
    val offArr = transform(col("__ps_arr"), (x, i) =>
      struct(x.getField(Pid).as(Pid),
        aggregate(slice(col("__ps_arr"), lit(1), i), lit(0L),
          (acc, y) => acc + y.getField(Tot)).as(Off)))
    val n = aggregate(col("__ps_arr"), lit(0L),
      (acc, y) => acc + y.getField(Tot))
    agged
      .select(groupCols.map(col) ++ Seq(n.as(NTot), explode(offArr).as("__ps_o")): _*)
      .select(groupCols.map(col) ++ Seq(col(NTot),
        col(s"__ps_o.$Pid").as(Pid), col(s"__ps_o.$Off").as(Off)): _*)
  }

  /** Range-partition `df` on (group, order) keys, materialize the partition
    * id as a column, and pin BOTH consumers (local window + totals) to the
    * same physical partitioning with an eager `localCheckpoint`.
    *
    * The checkpoint is load-bearing, not an optimization: the two passes
    * must observe the SAME partition ids, and without materialization each
    * pass re-executes the range exchange independently — column pruning
    * makes the subtrees non-identical, so exchange reuse does not apply,
    * and range boundaries are SAMPLED from the input row order, which is
    * nondeterministic whenever `df` sits downstream of a shuffle (reduce
    * tasks interleave map outputs differently per execution). Divergent
    * boundaries would silently mis-rank rows. Materializing the narrow
    * (key, value) frame once — exactly what a production pipeline does by
    * checkpointing its stats table — makes the scan correct for ANY input,
    * and as a side effect halves the scan+shuffle work. Storage is freed by
    * the ContextCleaner when the frame is garbage-collected. */
  private def ranged(df: DataFrame, groupCols: Seq[String],
                     orderCols: Seq[String]): DataFrame =
    df.repartitionByRange((groupCols ++ orderCols).map(col): _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint()

  /** `df` + `out` = cumulative sum of `value` ordered by `orderCols` within
    * each `groupCols` group (the whole frame when `groupCols` is empty) —
    * semantically `sum(value).over(Window.partitionBy(groups).orderBy(order)
    * .rowsBetween(unboundedPreceding, 0))`, with no global or per-group
    * single-task window. `orderCols` must be a total order per group (the
    * cumulative sum is otherwise underdetermined); `value` must be integral
    * (the offset fold accumulates in Long). */
  def cumSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
             value: Column, out: String): DataFrame = {
    val r = ranged(df, groupCols, orderCols)
    val localW = Window.partitionBy((Pid +: groupCols).map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val offsets = exclusiveOffsets(
      r.groupBy((Pid +: groupCols).map(col): _*)
        .agg(sum(value.cast(LongType)).as(Tot)),
      groupCols)
    // NULL-SAFE join on the group keys (round-7 review): a window keeps a
    // NULL group as its own partition, but a plain equi-join evaluates
    // NULL = NULL to NULL and would silently DROP every null-keyed row
    // from the output — breaking the documented window equivalence
    val keyCols = Pid +: groupCols
    val oRenamed = keyCols.foldLeft(offsets) { (d, c) =>
      d.withColumnRenamed(c, s"__ps_o_$c")
    }
    val cond = keyCols.map(c => col(c) <=> col(s"__ps_o_$c")).reduce(_ && _)
    keyCols.foldLeft(
      r.withColumn(Loc, sum(value.cast(LongType)).over(localW))
        .join(broadcast(oRenamed), cond)
        .withColumn(out, col(Loc) + col(Off))
        .drop(Pid, Loc, Off, NTot)) { (d, c) => d.drop(s"__ps_o_$c") }
  }

  /** `df` + `out` = the 1-based global rank over the total order `orderCols`
    * (ties must be broken by the caller's key list), plus `nTotalCol` = the
    * total row count — `row_number().over(Window.orderBy(orderCols))`
    * without the single-task window. */
  def globalRank(df: DataFrame, orderCols: Seq[String], out: String,
                 nTotalCol: String): DataFrame = {
    val r = ranged(df, Nil, orderCols)
    val localW = Window.partitionBy(col(Pid))
      .orderBy(orderCols.map(col): _*)
    val offsets = exclusiveOffsets(
      r.groupBy(col(Pid)).agg(count(lit(1)).as(Tot)), Nil)
    r.withColumn(Loc, row_number().over(localW).cast(LongType))
      .join(broadcast(offsets), Seq(Pid))
      .withColumn(out, col(Loc) + col(Off))
      .withColumnRenamed(NTot, nTotalCol)
      .drop(Pid, Loc, Off)
  }

  /** The SQL-standard NTILE(k) bucket for 1-based rank `r` of `n` rows: the
    * first n % k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋. Closed-form over
    * (rank, total), so the bucket assignment needs no window at all.
    * Double-precision floor division is exact below 2^53 rows. */
  def ntileFromRank(r: Column, n: Column, k: Int): Column = {
    val q = floor(n / lit(k))
    val rem = n - q * lit(k)
    val big = q + lit(1)
    when(r <= rem * big, floor((r - lit(1)) / big) + lit(1))
      .otherwise(rem + floor((r - rem * big - lit(1)) / q) + lit(1))
      .cast(LongType)
  }

  /** `df` + `out` = `ntile(k).over(Window.orderBy(orderCols))` — exact,
    * including the standard's tie-splitting by position — distributed via
    * [[globalRank]] + [[ntileFromRank]]. */
  def ntileGlobal(df: DataFrame, orderCols: Seq[String], k: Int,
                  out: String): DataFrame = {
    val rankCol = "__ps_rank"
    globalRank(df, orderCols, rankCol, NTot)
      .withColumn(out, ntileFromRank(col(rankCol), col(NTot), k))
      .drop(rankCol, NTot)
  }

  /** APPROXIMATE global ntile: bucket by VALUE against `approx_percentile`
    * cut points — one aggregate plus a narrow when-chain, no shuffle of the
    * data at all (vs [[ntileGlobal]]'s range exchange). The cut points are
    * the k-1 quantiles collected to the driver as model parameters (k-1
    * doubles — the [[Ivf]] centroid pattern). Two semantic trades vs the
    * exact form: ties cannot be split by position (every row with the same
    * value lands in one bucket, so bucket populations are only approximately
    * equal), and the quantile estimate itself is within `accuracy`
    * (G-K sketch). Nulls land in bucket 1, matching ntile's ASC NULLS
    * FIRST ordering. Right for threshold-picking over a distribution; use
    * [[ntileGlobal]] when exact bucket populations matter. */
  def approxNtile(df: DataFrame, orderCol: String, k: Int, out: String,
                  accuracy: Int = 10000): DataFrame = {
    val qs = (1 until k).map(_.toDouble / k)
    val cuts = df
      .agg(percentile_approx(col(orderCol).cast("double"),
        array(qs.map(lit): _*), lit(accuracy)).as("__ps_cuts"))
      .head().getSeq[Double](0)
    val chain = cuts.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (c, i)) =>
        val cond =
          if (i == 0) col(orderCol).isNull || col(orderCol) <= lit(c)
          else col(orderCol) <= lit(c)
        Some(acc.fold(when(cond, i + 1))(_.when(cond, i + 1)))
    }
    val bucket = chain.fold(lit(1))(_.otherwise(k))
    df.withColumn(out, bucket.cast(LongType))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave S: feature scaling and the KMV distinct sketch. */
class WaveSSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("feature_scale: per-group histogram covers every row, buckets in " +
    "0-9, mean ppm inside [0, 1e6]") {
    val out = Queries.featureScale(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("bucket") >= 0 &&
      r.getAs[Long]("bucket") <= 9))
    val byType = out.groupBy(_.getString(0))
    val ev = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    byType.foreach { case (tpe, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum == ev(tpe),
        s"$tpe histogram must cover every row")
      val (sumPpm, n) = (rows.map(_.getAs[Long]("sum_ppm")).sum,
        rows.map(_.getAs[Long]("n")).sum)
      assert(sumPpm >= 0 && sumPpm <= 1000000L * n)
    }
  }

  test("feature_scale plan: group stats reach rows via a BROADCAST join, " +
    "and no window touches the full table") {
    val plan = Queries.featureScale(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "stats must broadcast, not shuffle the table")
    assert(!plan.contains("Window"),
      "min/max must come from an aggregate, never a per-row window")
  }

  test("sketch_kmv: estimates within KMV error bounds of the exact " +
    "count; small groups report exactly") {
    val out = Queries.sketchKmv(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nk, est, exact) = (r.getAs[Long]("n_kmv"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      assert(nk == math.min(64L, exact))
      if (nk < 64) assert(est == exact, "under-full sketch must be exact")
      else {
        // sigma ~ 1/sqrt(k-2) ~ 12.7%; 3-sigma envelope
        val rel = math.abs(est.toDouble - exact) / exact
        assert(rel < 0.4, s"${r.getString(0)}: est $est vs exact $exact")
      }
    }
    // the ALL row is the merged union, never less than the biggest group
    val all = out.find(_.getString(0) == "ALL").get
    val grps = out.filter(_.getString(0) != "ALL")
    assert(all.getAs[Long]("exact_distinct") >=
      grps.map(_.getAs[Long]("exact_distinct")).max)
  }

  test("sketch_kmv plan: the per-group top-k runs as WindowGroupLimit " +
    "(map-side partial top-k, not a full per-group sort)") {
    val plan = Queries.sketchKmv(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("sketch_kmv_setops: inclusion-exclusion estimates track the exact " +
    "sets within sketch error") {
    val out = Queries.sketchKmvSetops(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = ops.Tables.table(spark, sf, "events")
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val exactU = ev.filter(col("event_type").isin(a, b))
        .select(col("user_id")).distinct().count()
      val estU = r.getAs[Long]("est_union")
      assert(math.abs(estU.toDouble - exactU) <= 0.4 * exactU + 1,
        s"($a,$b): est_union $estU vs exact $exactU")
      val estI = r.getAs[Long]("est_intersect")
      val exactI = r.getAs[Long]("exact_intersect")
      // intersection error compounds three sketch errors, each O(est/sqrt(k))
      assert(math.abs(estI.toDouble - exactI) <= 0.6 * exactU + 1,
        s"($a,$b): est_intersect $estI vs exact $exactI (union $exactU)")
    }
  }

  test("stream_kmv equals the batch sketch EXACTLY (the k-set is " +
    "batching-invariant, not just convergent)") {
    val stream = streaming.StreamTwins.streamKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kmv"),
        r.getAs[Long]("est_distinct"))).toSeq
    val batch = Queries.sketchKmv(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_kmv"),
        r.getAs[Long]("est_distinct"))).toSeq
    assert(stream == batch, s"stream $stream != batch $batch")
  }
}

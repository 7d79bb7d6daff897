package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, MortonCodes}

/** Morton-code properties and the point of Z-ordering: a layout sorted by
  * the interleaved code bounds per-file spans in BOTH dimensions, so footer
  * min/max stats can skip files for predicates on either dimension — which
  * a single-key sort only gives for its one key. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  test("zEncode is a bijection on the 64x64 grid and nests 2^k boxes " +
    "into contiguous code ranges") {
    val grid = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val codes = grid.map { case (a, b) => MortonCodes.zEncode(a, b) }
    assert(codes.distinct.size == grid.size)
    // every aligned 2^k-box is one contiguous code range: the box's codes
    // are exactly [z(lo,lo), z(lo,lo) + 4^k)
    for (k <- Seq(1, 2, 3); boxA <- Seq(0, 32); boxB <- Seq(16, 48)) {
      val n = 1 << k
      val box = for (a <- boxA until boxA + n; b <- boxB until boxB + n)
        yield MortonCodes.zEncode(a.toLong, b.toLong)
      val base = MortonCodes.zEncode(boxA.toLong, boxB.toLong)
      assert(box.min == base && box.max == base + n.toLong * n - 1 &&
        box.distinct.size == n * n, s"k=$k box=($boxA,$boxB)")
    }
  }

  test("graft_morton kernel equals MortonCodes.zEncode and survives codegen") {
    val df = Seq((3L, 5L), (1023L, 0L), (0L, 1023L), (123L, 456L))
      .toDF("a", "b")
    val got = df.select(call_function("graft_morton", $"a", $"b"))
      .collect().map(_.getLong(0)).toSeq
    val want = Seq((3L, 5L), (1023L, 0L), (0L, 1023L), (123L, 456L))
      .map { case (a, b) => MortonCodes.zEncode(a, b) }
    assert(got == want)
  }

  test("z-order layout bounds per-file spans on BOTH dims; a single-key " +
    "sort leaves the other dim unclustered") {
    // uniform 256x256 grid of (x, y) points
    val pts = spark.range(0, 256L * 256)
      .select((col("id") / 256).cast("long").as("x"),
        pmod(col("id"), lit(256)).cast("long").as("y"))
      .select($"x", $"y", call_function("graft_morton", $"x", $"y").as("z"))
    def meanSpans(sorted: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = sorted.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(((max($"x") - min($"x")) / 255.0).as("sx"),
          ((max($"y") - min($"y")) / 255.0).as("sy"))
        .agg(avg($"sx"), avg($"sy")).head()
      (spans.getDouble(0), spans.getDouble(1))
    }
    val (zx, zy) = meanSpans(
      pts.repartitionByRange(16, $"z").sortWithinPartitions($"z"))
    val (yx, yy) = meanSpans(
      pts.repartitionByRange(16, $"y").sortWithinPartitions($"y"))
    // z-order: both dims contracted (16 files on a square grid → each file
    // covers about a quarter of each side)
    assert(zx <= 0.5 && zy <= 0.5, f"z-order spans x=$zx%.2f y=$zy%.2f")
    // single-key: the sorted dim contracts hard, the other spans everything
    assert(yy <= 0.15 && yx >= 0.9, f"y-sort spans x=$yx%.2f y=$yy%.2f")
    // so a rectangle filter on x can skip most z-ordered files but NO
    // y-sorted file: count files whose x-range intersects x in [0, 63]
    def filesTouched(sorted: org.apache.spark.sql.DataFrame): Long =
      sorted.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg(min($"x").as("lo"), max($"x").as("hi"))
        .filter($"lo" <= 63 && $"hi" >= 0).count()
    val zTouched = filesTouched(
      pts.repartitionByRange(16, $"z").sortWithinPartitions($"z"))
    val yTouched = filesTouched(
      pts.repartitionByRange(16, $"y").sortWithinPartitions($"y"))
    // ideal alignment touches ~4-8 of 16; repartitionByRange SAMPLES its
    // boundaries (nondeterministic per run), so a boundary straddling a
    // z-box edge can add a file or two — 10 keeps the claim strong (the
    // y-sort control below touches ALL 16) without flaking on sampling
    assert(zTouched <= 10, s"z-order should skip most files, touched $zTouched/16")
    assert(yTouched == 16, s"y-sort can never skip on x, touched $yTouched/16")
  }
}

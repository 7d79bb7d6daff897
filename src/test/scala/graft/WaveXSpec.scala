package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave X: duplicated-span removal and the corrupt-file-tolerant scan. */
class WaveXSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dedup_span_apply: untouched docs round-trip verbatim, touched " +
    "docs shrink by exactly n_removed tokens") {
    val out = Queries.dedupSpanApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val orig = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == orig.keySet, "every document must survive")
    var removedSomething = false
    out.foreach { case (id, (nRemoved, clean)) =>
      val origToks = orig(id).split(" ", -1)
      val cleanToks = if (clean.isEmpty) Array.empty[String]
        else clean.split(" ", -1)
      assert(cleanToks.length == origToks.length - nRemoved)
      if (nRemoved == 0) assert(clean == orig(id),
        s"doc $id untouched but text changed")
      else {
        removedSomething = true
        // survivors must be a subsequence of the original token stream
        var j = 0
        origToks.foreach { t0 =>
          if (j < cleanToks.length && cleanToks(j) == t0) j += 1
        }
        assert(j == cleanToks.length,
          s"doc $id: cleaned text is not a subsequence of the original")
      }
    }
    assert(removedSomething, "the dup-heavy fixture must trigger removals")
  }

  test("dedup_span_apply equals a full driver-side recompute of the " +
    "keep-first span semantics") {
    val out = Queries.dedupSpanApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val docs = ops.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val occs = docs.flatMap { case (id, t0) =>
      if (t0.length < 5) Nil
      else (0 to t0.length - 5).map(i =>
        (t0.slice(i, i + 5).mkString(" "), id, i))
    }
    val owner = occs.groupBy(_._1)
      .filter(_._2.map(_._2).distinct.length > 1)
      .map { case (g, os) => g -> os.map(_._2).min }
    val cover = occs.filter { case (g, id, _) =>
      owner.get(g).exists(_ < id)
    }.flatMap { case (_, id, i) => (i until i + 5).map(p => (id, p)) }.toSet
    var removals = 0L
    docs.foreach { case (id, t0) =>
      val kept = t0.zipWithIndex.collect {
        case (tok, p) if !cover((id, p)) => tok
      }
      val (nRemoved, clean) = out(id)
      assert(nRemoved == (t0.length - kept.length).toLong, s"doc $id count")
      assert(clean == kept.mkString(" "), s"doc $id text")
      removals += nRemoved
    }
    assert(removals > 0)
  }

  test("resample_decompose: components reassemble to the observation " +
    "and weekly seasonals balance to zero") {
    val out = Queries.resampleDecompose(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (x, tr, se, res) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(x - tr - se - res) < 2e-6,
        s"identity broken for ${r.getString(0)} ${r.getString(1)}")
    }
    // day-of-week seasonals are means of detrended values, so each
    // type's seasonal components weighted by their day counts sum to 0
    out.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      val resSum = rows.map(_.getDouble(5)).sum
      val seSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(seSum + resSum -
        rows.map(r => r.getLong(2) - r.getDouble(3)).sum) < 1e-3, tpe)
    }
  }

  test("scan_ignore_corrupt skips the garbage file but a strict read " +
    "refuses it (the fixture is genuinely corrupt)") {
    val out = Queries.scanIgnoreCorrupt(spark, sf).collect()
    val expect = ops.Tables.table(spark, sf, "events")
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap == expect,
      "tolerant read must see every row of the good files")
    val root = ops.TempFiles.dir(s"corrupt_tbl_${ops.TempFiles.tag(sf)}")
    val strict = intercept[Exception] {
      spark.read
        .schema(ops.Tables.table(spark, sf, "events").schema)
        .option("ignoreCorruptFiles", "false")
        .parquet(root).count()
    }
    assert(strict != null)
  }
}

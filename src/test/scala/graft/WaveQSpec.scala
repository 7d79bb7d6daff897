package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave Q: PQ-ADC ANN, exact two-sample KS drift, k-fold splits. */
class WaveQSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("PQ codes are m positions each within its subspace codebook") {
    val emb = ops.Tables.table(spark, sf, "embeddings")
    val cb = sim.Pq.codebookCached(emb, "vec_id", "embedding",
      m = 8, k = 64, iters = 3, cacheKey = sf)
    val coded = sim.Pq.encode(emb, "vec_id", "embedding", 8, 64, cb)
    val bad = coded.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 64)).count()
    assert(bad == 0)
    // codes genuinely discriminate: many distinct code words over the corpus
    val distinctWords = coded.select(col("codes")).distinct().count()
    val n = coded.count()
    assert(distinctWords > n / 4,
      s"only $distinctWords distinct code words over $n vectors")
  }

  test("declared ann_pq_recall clears its floor (PQ's published quality number)") {
    val rows = Queries.annPqRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    info(f"declared PQ mean recall@10 $mean%.2f min ${recalls.min}%.2f")
    assert(mean >= 0.75, s"mean PQ recall@10 $mean below floor 0.75")
    assert(recalls.min >= 0.4, s"worst-query PQ recall@10 ${recalls.min} below 0.4")
  }

  test("declared ann_ivfpq_recall clears its floor (the composed index)") {
    val rows = Queries.annIvfPqRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    info(f"declared IVF-PQ mean recall@10 $mean%.2f min ${recalls.min}%.2f")
    assert(mean >= 0.7, s"mean IVF-PQ recall@10 $mean below floor 0.7")
    assert(recalls.min >= 0.4, s"worst-query IVF-PQ recall@10 ${recalls.min} below 0.4")
  }

  test("IVF-PQ candidate volume is genuinely bounded below the corpus") {
    val rows = Queries.annIvfPqTopK(spark, sf).collect()
    val n = ops.Tables.table(spark, sf, "embeddings").count()
    val worst = rows.map(_.getAs[Long]("n_candidates")).max
    info(s"worst-query candidates $worst of ${n - 1}")
    assert(worst < n - 1, "IVF-PQ scanned the whole corpus — no pruning")
  }

  test("dq_ks equals a driver-side exact KS recomputation per event type") {
    val rows = Queries.dqKs(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val vals = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val types = vals.map(_._1).distinct.sorted
    assert(rows.keySet == types.toSet)
    val nAll = vals.length.toLong
    for (ty <- types) {
      val inT = vals.filter(_._1 == ty).map(_._2)
      val rest = vals.filter(_._1 != ty).map(_._2)
      val grid = vals.map(_._2).distinct.sorted
      val nT = inT.length.toLong
      val nR = nAll - nT
      val dnum = grid.map { x =>
        val cT = inT.count(_ <= x).toLong
        val cR = rest.count(_ <= x).toLong
        math.abs(cT * nR - cR * nT)
      }.max
      val expect = BigDecimal(dnum.toDouble / (nT.toDouble * nR.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (gotNT, gotNR, gotKs) = rows(ty)
      assert(gotNT == nT && gotNR == nR)
      assert(gotKs == expect, s"$ty: ks $gotKs != exact $expect")
    }
  }

  test("dq_ks of a type against itself would be 0; stats lie in [0, 1]") {
    val rows = Queries.dqKs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getDouble(3)
      assert(ks >= 0.0 && ks <= 1.0, s"ks $ks out of [0,1]")
    }
  }

  test("graph_common_neighbors: jaccard bounded and consistent with degrees") {
    val rows = Queries.graphCommonNeighbors(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("nbr_jaccard")
      assert(j > 0.0 && j <= 1.0, s"nbr_jaccard $j out of (0,1]")
      assert(r.getAs[Long]("n_common") >= 1)
    }
  }

  test("recommend_item_knn: contiguous per-item ranks, bounded cosine, " +
    "and n_co equals an independent shared-basket recount for the top row") {
    val out = Queries.recommendItemKnn(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c > 0.0 && c <= 1.0, s"cos_sim $c out of (0,1]")
    }
    val byPart = out.groupBy(_.getAs[Long]("part_id"))
    byPart.foreach { case (p, rs) =>
      val ranks = rs.map(_.getAs[Long]("rn")).sorted.toSeq
      assert(ranks == (1L to ranks.length),
        s"part $p ranks not contiguous: $ranks")
    }
    // independent recount of one pair's co-occurrence from the raw table
    val first = out.head
    val (a, b) = (first.getAs[Long]("part_id"), first.getAs[Long]("rec_part_id"))
    val li = ops.Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long](0), r.getAs[Long](1)))
    val ordersA = li.filter(_._2 == a).map(_._1).toSet
    val ordersB = li.filter(_._2 == b).map(_._1).toSet
    assert(first.getAs[Long]("n_co") == (ordersA & ordersB).size.toLong)
  }

  test("Markov attribution: closed-form chains solve exactly") {
    // start → A → purchase(0.5) / null(0.5): P = 0.5, removing A kills
    // every conversion path → A takes all credit
    val c1 = Seq(("start", "A", 10L), ("A", "purchase", 5L), ("A", "null", 5L))
    assert(math.abs(ops.Markov.absorption(c1, Set.empty) - 0.5) < 1e-12)
    val a1 = ops.Markov.attribute(c1)
    assert(a1 == Seq(("A", 1.0, 1.0)))
    // two parallel channels: start splits 50/50 to A (converts 100%) and
    // B (converts 50%): P = 0.75; remove A → 0.25 (RE_A = 2/3),
    // remove B → 0.5 (RE_B = 1/3) → shares 2/3 vs 1/3
    val c2 = Seq(("start", "A", 5L), ("start", "B", 5L),
      ("A", "purchase", 5L), ("B", "purchase", 5L), ("B", "null", 5L))
    assert(math.abs(ops.Markov.absorption(c2, Set.empty) - 0.75) < 1e-12)
    val a2 = ops.Markov.attribute(c2).map(t => (t._1, t._3)).toMap
    assert(math.abs(a2("A") - 2.0 / 3) < 1e-6)
    assert(math.abs(a2("B") - 1.0 / 3) < 1e-6)
    // a self-loop chain still solves: A loops 50%, converts 25%, dies 25%
    val c3 = Seq(("start", "A", 4L), ("A", "A", 2L),
      ("A", "purchase", 1L), ("A", "null", 1L))
    assert(math.abs(ops.Markov.absorption(c3, Set.empty) - 0.5) < 1e-12)
  }

  test("Markov attribution on the real corpus: direct solve equals " +
    "independent power iteration; shares conserve") {
    val out = Queries.attributionMarkov(spark, sf).collect()
    assert(out.nonEmpty)
    // integer ppm shares conserve up to the documented floor slack
    val shareSum = out.map(_.getAs[Long]("attribution_ppm")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 100L * out.length,
      s"shares sum to $shareSum ppm")
    out.foreach { r =>
      val re = r.getAs[Long]("re_ppm")
      assert(re >= 0L && re <= 1000000L)
    }
    // independent recompute: rebuild the transition counts the same way
    // and diff Gauss-Jordan vs power iteration on base + each removal
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = ops.Tables.table(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("cr", sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)).over(w))
      .filter(col("cr") === 0 ||
        (col("cr") === 1 && col("event_type") === "purchase"))
    val tr = ev
      .withColumn("from", coalesce(lag(col("event_type"), 1).over(w),
        lit("start")))
      .withColumn("isLast", lead(col("event_type"), 1).over(w).isNull)
    val counts = tr.select(col("from"), col("event_type").as("to"))
      .unionAll(tr.filter(col("isLast") && col("event_type") =!= "purchase")
        .select(col("event_type").as("from"), lit("null").as("to")))
      .groupBy("from", "to").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    for (rm <- Set.empty[String] :: out.map(r =>
        Set(r.getString(0))).toList) {
      val direct = ops.Markov.absorption(counts, rm)
      val iter = ops.Markov.absorptionIterative(counts, rm)
      assert(math.abs(direct - iter) < 1e-9,
        s"removal $rm: solve $direct vs iterate $iter")
      // and the declared query's exact integer fixed point tracks the
      // float solve to well past ppm resolution
      val fp = ops.Markov.absorptionFixedPointScaled(counts, rm)
      assert(math.abs(fp.toDouble / ops.Markov.FpScale - direct) < 1e-9,
        s"removal $rm: fixed point $fp vs solve $direct")
    }
  }

  test("the fixed-point fold fails LOUDLY past its overflow bound " +
    "instead of wrapping (round-7, ADVICE r6)") {
    // a state whose outgoing count exceeds 2^63/FpScale would overflow
    // the Long accumulator; the require must fire, not wrap silently
    val over = Long.MaxValue / ops.Markov.FpScale + 1
    val counts = Seq(("start", "click", over), ("click", "purchase", over))
    val e = intercept[IllegalArgumentException] {
      ops.Markov.absorptionFixedPointScaled(counts, Set.empty)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
    // and the bound is tight: the same shape ONE below the limit folds fine
    val ok = Seq(("start", "click", over - 2), ("click", "purchase", over - 2))
    val fp = ops.Markov.absorptionFixedPointScaled(ok, Set.empty)
    assert(fp == ops.Markov.FpScale,
      s"deterministic chain must absorb with certainty, got $fp")
  }

  test("dq_bootstrap_ci: ordered bounds that cover the plain mean") {
    val out = Queries.dqBootstrapCi(spark, sf).collect()
    assert(out.nonEmpty)
    val means = ops.Tables.table(spark, sf, "events")
      .select(col("event_type"),
        (ops.Cleanse.dec2(col("value")) * 100).cast("long").as("x"))
      .groupBy("event_type")
      .agg((sum(col("x")).cast("double") / count(lit(1)).cast("double"))
        .as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val (ty, lo, hi) = (r.getString(0), r.getAs[Double]("ci_lo_cents"),
        r.getAs[Double]("ci_hi_cents"))
      assert(lo <= hi, s"$ty: lo $lo > hi $hi")
      // a 95% bootstrap CI over thousands of events covers the plain mean
      assert(means(ty) >= lo && means(ty) <= hi,
        s"$ty: mean ${means(ty)} outside [$lo, $hi]")
    }
  }

  test("scan_time_travel: the AS-OF read touches exactly the snapshot's " +
    "manifest files (pure manifest selection, no data movement)") {
    val out = Queries.scanTimeTravel(spark, sf).collect()
    assert(out.nonEmpty)
    val root = ops.TempFiles.dir(s"tt_tbl_${ops.TempFiles.tag(sf)}")
    val log = java.nio.file.Paths.get(root, "log")
    def manifest(v: Int): Seq[String] = Queries.ttManifest(log, v)
    val (m1, m2) = (manifest(1), manifest(2))
    assert(m1.size == 2 && m2.size == 4 && m2.startsWith(m1),
      "v2 must structurally share v1's files")
    val v1Files = spark.read.parquet(m1: _*).inputFiles.toSet
    assert(v1Files == m1.map(p => "file://" + p).toSet ||
      v1Files == m1.toSet,
      s"v1 scan read ${v1Files.size} files, expected exactly v1's manifest")
    // isolation: v1's numbers are a strict subset of v2's
    val byV = out.groupBy(_.getAs[Long]("version"))
    val n1 = byV(1L).map(_.getAs[Long]("n_events")).sum
    val n2 = byV(2L).map(_.getAs[Long]("n_events")).sum
    assert(n1 < n2, s"v1 $n1 should be strictly smaller than v2 $n2")
  }

  test("merge_cow: the delete rewrites exactly one file; v3 shares the " +
    "other three with v2 structurally") {
    Queries.mergeCow(spark, sf).collect()
    val root = ops.TempFiles.dir(s"tt_tbl_${ops.TempFiles.tag(sf)}")
    val log = java.nio.file.Paths.get(root, "log")
    val (m2, m3) = (Queries.ttManifest(log, 2), Queries.ttManifest(log, 3))
    assert(m2.size == 4 && m3.size == 4)
    val shared = m2.toSet & m3.toSet
    assert(shared.size == 3,
      s"expected 3 shared files, got ${shared.size}")
    // the rewritten file really lost only the targeted rows
    val rewritten = (m3.toSet -- shared).head
    val original = (m2.toSet -- shared).head
    val before = spark.read.parquet(original).count()
    val after = spark.read.parquet(rewritten).count()
    val deleted = spark.read.parquet(original)
      .filter(col("event_type") === "error").count()
    assert(after == before - deleted)
  }

  test("merge-on-read equals copy-on-write row for row (two delete " +
    "mechanisms, one truth)") {
    val cow = Queries.mergeCow(spark, sf).collect()
      .filter(_.getAs[Long]("version") == 3L)
      .map(r => r.getString(1) -> r.getAs[Long]("n_events")).toMap
    val mor = Queries.scanMergeOnRead(spark, sf).collect()
      .filter(_.getAs[Long]("version") == 4L)
      .map(r => r.getString(1) -> r.getAs[Long]("n_events")).toMap
    assert(cow == mor, s"COW $cow != MOR $mor")
  }

  test("scan_changes: the v2->v3 feed is exactly the deleted rows and " +
    "reads only changed files") {
    val out = Queries.scanChanges(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(0) == "delete"), "no inserts expected")
    val expected = ops.Tables.table(spark, sf, "events")
      .filter(col("event_type") === "error" &&
        col("ts") >= lit("2024-01-22 00:00:00").cast("timestamp"))
      .count()
    assert(out.map(_.getAs[Long]("n")).sum == expected)
  }

  test("sink_vacuum collects a planted orphan and spares every file any " +
    "snapshot references") {
    Queries.mergeCow(spark, sf).collect() // ensure the log + v3 exist
    val root = java.nio.file.Paths.get(
      ops.TempFiles.dir(s"tt_tbl_${ops.TempFiles.tag(sf)}"))
    val orphan = root.resolve("orphan_leak.parquet")
    java.nio.file.Files.write(orphan, "junk".getBytes("UTF-8"))
    val out = Queries.sinkVacuum(spark, sf).collect()(0)
    assert(!java.nio.file.Files.exists(orphan), "orphan survived vacuum")
    assert(out.getAs[Long]("n_deleted") >= 1L)
    val log = root.resolve("log")
    val referenced = (1 to 3).flatMap(v => Queries.ttManifest(log, v)).toSet
    referenced.foreach(p => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"vacuum deleted referenced file $p"))
    // the table is still fully readable at every version
    assert(Queries.scanTimeTravel(spark, sf).count() > 0)
    assert(Queries.mergeCow(spark, sf).count() > 0)
  }

  test("stream_snapshot_commit: each version appends structurally; " +
    "re-running the stream commits nothing new") {
    val first = streaming.StreamTwins.streamSnapshotCommit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val root = java.nio.file.Paths.get(
      ops.TempFiles.dir(s"stream_snap_tbl_${ops.TempFiles.tag(sf)}"))
    val log = ops.SnapLog.logDir(root)
    def manifests: Map[Long, Seq[ops.SnapEntry]] =
      ops.SnapLog.versions(log)
        .map(v => v -> ops.SnapLog.read(log, v)).toMap
    val m = manifests
    assert(m.size == 3, s"expected 3 committed versions, got ${m.keySet}")
    val ordered = m.toSeq.sortBy(_._1).map(_._2)
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(b.startsWith(a), "later snapshot must append to earlier")
    }
    // idempotence: the checkpoint makes a re-run a no-op
    val second = streaming.StreamTwins.streamSnapshotCommit(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == first && manifests.size == 3)
  }

  test("snapshot_expire frees exactly the superseded file, keeps every " +
    "latest-referenced one, and is idempotent") {
    val first = Queries.snapshotExpire(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val root = java.nio.file.Paths.get(
      ops.TempFiles.dir(s"tt_exp_tbl_${ops.TempFiles.tag(sf)}"))
    val log = root.resolve("log")
    // only the latest manifest survives
    val s = java.nio.file.Files.list(log)
    val manifests = try {
      scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
        .asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".manifest")).toVector
    } finally s.close()
    assert(manifests == Vector("v3.manifest"))
    // the superseded pre-rewrite file is gone; referenced files survive
    assert(!java.nio.file.Files.exists(root.resolve("w3.parquet")),
      "superseded w3 should have been freed")
    Queries.ttManifest(log, 3).foreach(p => assert(
      java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    // idempotent re-run
    val second = Queries.snapshotExpire(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(second == first)
  }

  test("k-core: closed-form graphs peel exactly; cores nest on the real corpus") {
    import spark.implicits._
    def edges(ps: (Long, Long)*) = ps.toSeq.toDF("a_id", "b_id")
    // K5 clique: every vertex has degree 4 → the 4-core is the whole
    // clique, the 5-core is empty
    val k5 = edges((for { i <- 0L to 4; j <- (i + 1) to 4 } yield (i, j)): _*)
    val c4 = ops.KCore.kCoreEdges(k5, "a_id", "b_id", 4)
    assert(c4.count() == 10)
    assert(ops.KCore.kCoreEdges(k5, "a_id", "b_id", 5).count() == 0)
    // star: leaves have degree 1 → the 2-core is empty
    val star = edges((1L to 6).map(i => (0L, i)): _*)
    assert(ops.KCore.kCoreEdges(star, "a_id", "b_id", 2).count() == 0)
    // barbell with a PATH bridge (3—20—21—10): the path's interior
    // vertices have degree 2 < 3, so the whole bridge peels and the
    // 3-core is exactly the two K4s (12 edges) — note a DIRECT bridge
    // edge would survive (its endpoints keep degree 4), which is why the
    // vertex-induced definition needs the path to show peeling
    val k4a = for { i <- 0L to 3; j <- (i + 1) to 3 } yield (i, j)
    val k4b = for { i <- 10L to 13; j <- (i + 1) to 13 } yield (i, j)
    val barbell = edges(
      (k4a ++ k4b ++ Seq((3L, 20L), (20L, 21L), (21L, 10L))): _*)
    val core3 = ops.KCore.kCoreEdges(barbell, "a_id", "b_id", 3)
    assert(core3.count() == 12)
    // real corpus: cores nest (monotone non-increasing sizes)
    val prof = Queries.graphKCore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(prof.map(_._1).toSeq == Seq(2L, 3L, 4L))
    prof.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"cores must nest: $a vs $b")
    }
  }

  test("SnapLog tolerates legacy bare-path manifest lines with " +
    "conservative (always-touch) stats") {
    val log = java.nio.file.Paths.get(
      ops.TempFiles.dir("snaplog_legacy_spec"), "log")
    java.nio.file.Files.createDirectories(log)
    java.nio.file.Files.write(log.resolve("v1.manifest"),
      "/some/old/format/w0.parquet\ndata\t5\t9\t/new/format/w1.parquet"
        .getBytes("UTF-8"))
    val entries = ops.SnapLog.read(log, 1)
    assert(entries == Seq(
      ops.SnapEntry("data", Long.MinValue, Long.MaxValue,
        "/some/old/format/w0.parquet"),
      ops.SnapEntry("data", 5L, 9L, "/new/format/w1.parquet")))
  }

  test("split_kfold partitions every document exactly once, stable under re-run") {
    val out = Queries.splitKfold(spark, sf)
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    val nDocs = ops.Tables.table(spark, sf, "documents").count()
    assert(total == nDocs)
    val folds = out.select(col("fold")).distinct().collect().map(_.getLong(0)).toSet
    assert(folds.subsetOf(Set(0L, 1L, 2L, 3L)))
    // determinism: re-running yields byte-identical assignment counts
    assert(out.collect().toSeq == Queries.splitKfold(spark, sf).collect().toSeq)
  }
}

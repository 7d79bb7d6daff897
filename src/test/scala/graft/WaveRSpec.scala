package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave R: snapshot-log completion — MERGE upsert, bin-packing OPTIMIZE,
  * bloom-filter file skipping, additive schema evolution. Each test pins
  * the FILE-LEVEL mechanic (sharing, pruning, skipping) the correctness
  * gate cannot see. */
class WaveRSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("merge_snapshot: files disjoint from the batch's key range are " +
    "shared untouched; the insert file is new; updates change only " +
    "matched rows") {
    Queries.mergeSnapshot(spark, sf).collect()
    val log = Queries.ttLog(spark, sf, "tt_mrg_tbl")
    val (m2, m3) = (Queries.ttManifest(log, 2), Queries.ttManifest(log, 3))
    assert(m2.size == 4 && m3.size == 5,
      s"v3 = 3 shared + 1 rewritten + 1 insert file, got ${m3.size}")
    val shared = m2.toSet & m3.toSet
    assert(shared.size == 3, s"expected 3 shared files, got ${shared.size}")
    // the rewritten file keeps every row (MERGE updates, never deletes)
    val orig = (m2.toSet -- shared).head
    val rewr = m3.filter(p => !shared.contains(p) && !p.endsWith("merge_ins.parquet"))
    assert(rewr.size == 1)
    assert(spark.read.parquet(orig).count() ==
      spark.read.parquet(rewr.head).count())
    // unmatched rows are byte-identical; matched rows doubled
    val before = spark.read.parquet(orig)
    val after = spark.read.parquet(rewr.head)
    val changed = after.alias("a")
      .join(before.alias("b"), Seq("event_id"))
      .filter(col("a.value") =!= col("b.value"))
    assert(changed.filter(col("a.event_type") =!= "view").count() == 0,
      "only view rows may change")
  }

  test("sink_optimize: compaction shrinks the file count, shares the " +
    "already-compact file, and preserves the table bit-for-bit") {
    Queries.sinkOptimize(spark, sf).collect()
    val log = Queries.optLog(spark, sf)
    val (m1, m2) = (Queries.ttManifest(log, 1), Queries.ttManifest(log, 2))
    assert(m1.size > 8, s"fixture should land many small files, got ${m1.size}")
    assert(m2.size < m1.size / 2,
      s"OPTIMIZE should at least halve the file count: ${m1.size} -> ${m2.size}")
    val shared = m1.toSet & m2.toSet
    assert(shared.nonEmpty, "the pre-compacted file must be shared, not rewritten")
    // the shared file is the largest one (nothing compact gets recopied)
    val sizes = m1.map(p =>
      p -> java.nio.file.Files.size(java.nio.file.Paths.get(p))).toMap
    assert(shared.contains(sizes.maxBy(_._2)._1))
    // invariance: identical multiset of rows before and after
    val a = spark.read.parquet(m1: _*).agg(
      count(lit(1)), sum(col("event_id")), sum(hash(col("event_id"),
        col("event_type"), col("user_id")).cast("long"))).collect()(0)
    val b = spark.read.parquet(m2: _*).agg(
      count(lit(1)), sum(col("event_id")), sum(hash(col("event_id"),
        col("event_type"), col("user_id")).cast("long"))).collect()(0)
    assert(a == b, s"compaction changed the data: $a vs $b")
  }

  test("scan_bloom_skip: per-key candidates ~1 file (real skipping), " +
    "zero false negatives vs the direct scan") {
    val viaBloom = Queries.scanBloomSkip(spark, sf).collect()
    val nKeys = viaBloom.length
    val cand = Queries.scanBloomCandidates.get(sf)
    assert(cand >= nKeys, "every present key must hit its own file")
    assert(cand <= 2 * nKeys,
      s"bloom should prune to ~1 file/key: $cand candidates for $nKeys keys " +
      "(no-skip would be 4x)")
    // false-negative check: the bloom-pruned read equals the full scan
    val ev = ops.Tables.table(spark, sf, "events")
    val keys = ev.groupBy(col("event_type")).agg(min(col("event_id")).as("k"))
      .collect().map(_.getAs[Long]("k")).toSet
    val direct = ev.filter(col("event_id").isin(keys.toSeq: _*))
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .orderBy(col("event_id")).collect()
    assert(viaBloom.toSeq == direct.toSeq)
  }

  test("snapshot_rollback: the restore head re-references v2's files " +
    "byte-for-byte (zero copies) and history stays readable") {
    val out = Queries.snapshotRollback(spark, sf).collect()
    val log = Queries.ttLog(spark, sf, "tt_rb_tbl")
    val (m2, m3, m4) = (Queries.ttManifest(log, 2),
      Queries.ttManifest(log, 3), Queries.ttManifest(log, 4))
    assert(m4 == m2, "restore must re-reference, never copy")
    assert(m3 != m2, "the rolled-back version must remain distinct")
    // v3 (the rolled-back delete) still reads — rollback appends, never erases
    assert(spark.read.parquet(m3: _*).count() <
      spark.read.parquet(m4: _*).count())
    // the declared output really shows the resurrection
    val byV = out.groupBy(_.getAs[Long]("version"))
    assert(byV(3L).map(_.getAs[Long]("n_events")).sum <
      byV(4L).map(_.getAs[Long]("n_events")).sum)
  }

  test("scan_schema_evolution: old snapshots keep the old shape; the " +
    "merged read nulls exactly the pre-evolution rows") {
    Queries.scanSchemaEvolution(spark, sf).collect()
    val log = Queries.seLog(spark, sf)
    val v1 = spark.read.option("mergeSchema", "true")
      .parquet(Queries.ttManifest(log, 1): _*)
    assert(!v1.columns.contains("ingest_src"),
      "reading v1 AS-OF must surface the original schema")
    val v2 = spark.read.option("mergeSchema", "true")
      .parquet(Queries.ttManifest(log, 2): _*)
    assert(v2.columns.contains("ingest_src"))
    val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
    assert(v2.filter(col("ingest_src").isNull && col("ts") >= cutoff).count() == 0)
    assert(v2.filter(col("ingest_src").isNotNull && col("ts") < cutoff).count() == 0)
  }

  test("SnapLog.gc grace window spares a FRESH unreferenced file (an " +
    "in-flight writer's moved-but-uncommitted data) and collects it once " +
    "aged past the window") {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(ops.TempFiles.dir("gc_grace_tbl"))
    Files.createDirectories(root)
    ops.SnapLog.commit(ops.SnapLog.logDir(root), 1, Seq(
      ops.SnapEntry("data", 0L, 0L, root.resolve("kept.parquet").toString)))
    Files.write(root.resolve("kept.parquet"), Array[Byte](1))
    val orphan = root.resolve("inflight.parquet")
    Files.write(orphan, Array[Byte](1))
    // fresh orphan inside the grace window: spared (the round-7 review
    // scenario — writeFile has landed the file, commit hasn't run yet;
    // collecting it would poison the imminent manifest forever)
    val (_, _, del1) = ops.SnapLog.gc(root, graceMs = 60000L)
    assert(del1 == 0L && Files.exists(orphan),
      "gc collected a file younger than the grace window")
    // age it past the window (the spec plants mtime in the past exactly
    // like RETAIN-0 tests do): now it is garbage
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120000L))
    val (_, _, del2) = ops.SnapLog.gc(root, graceMs = 60000L)
    assert(del2 == 1L && !Files.exists(orphan) &&
      Files.exists(root.resolve("kept.parquet")),
      "gc must collect the aged orphan and keep every referenced file")
  }

  test("SnapLog.gc sweeps a STALE orphaned .staging file (a committer " +
    "killed mid-commit) and spares a fresh in-flight one") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val root = Paths.get(ops.TempFiles.dir("gc_staging_tbl"))
    val log = ops.SnapLog.logDir(root)
    Files.createDirectories(log)
    ops.SnapLog.commit(log, 1, Seq.empty)
    val stale = Files.createTempFile(log, ".v2-", ".staging")
    Files.setLastModifiedTime(stale,
      FileTime.fromMillis(System.currentTimeMillis() - 120000L))
    val fresh = Files.createTempFile(log, ".v3-", ".staging")
    ops.SnapLog.gc(root, graceMs = 60000L)
    assert(!Files.exists(stale),
      "gc must sweep a staging file older than the grace window")
    assert(Files.exists(fresh),
      "gc must spare a staging file inside the grace window")
    assert(Files.exists(log.resolve("v1.manifest")),
      "the committed manifest is never touched")
  }

  test("SnapLog.commitNext: racing committers (no JVM lock involved) land " +
    "DISTINCT consecutive versions, never a torn or overwritten one") {
    import java.nio.file.{Files, Paths}
    // unique root per JVM run: the scratch dir persists across runs, and
    // a rerun against surviving v1..v8 would start numbering at v9
    val root = Paths.get(ops.TempFiles.dir(
      s"commit_next_tbl/${System.nanoTime()}"))
    val log = ops.SnapLog.logDir(root)
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futs = (1 to writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await() // maximize the publish collision window
            // independent-manifest publish: each writer's snapshot is its
            // own one entry, ignoring the head (the `_ =>` rebase no-op)
            ops.SnapLog.commitNext(log)(_ => Seq(
              ops.SnapEntry("data", w.toLong, w.toLong, s"w$w.parquet")))
          }
        })
      }
      gate.countDown()
      val got = futs.map(_.get()).sorted
      assert(got == (1L to writers.toLong),
        s"racing commitNext calls must land versions 1..$writers, got $got")
      // every published manifest is COMPLETE (the conditional-PUT content
      // is the fully-staged file, never a partial write)
      (1L to writers.toLong).foreach { v =>
        val es = ops.SnapLog.read(log, v)
        assert(es.size == 1 && es.head.path.matches("w\\d+\\.parquet"),
          s"v$v manifest must be one complete entry, got $es")
      }
      // distinct writers each landed exactly once
      val paths = (1L to writers.toLong).map(v =>
        ops.SnapLog.read(log, v).head.path).toSet
      assert(paths.size == writers, "every writer's manifest must survive")
      // no staging litter after a clean race
      import scala.jdk.CollectionConverters._
      val ls = Files.list(log)
      val staging = try ls.iterator().asScala
        .count(_.getFileName.toString.endsWith(".staging")) finally ls.close()
      assert(staging == 0, "commitNext must clean its staging files")
    } finally pool.shutdownNow()
  }

  test("SnapLog.commitNext APPEND race: every racing appender passes " +
    "head ++ ownFile and EVERY file survives in the final visible head " +
    "(the round-8 lost-update scenario — a fixed entry list would " +
    "republish the loser's stale head and erase the winner)") {
    import java.nio.file.Paths
    val root = Paths.get(ops.TempFiles.dir(
      s"commit_rebase_tbl/${System.nanoTime()}"))
    val log = ops.SnapLog.logDir(root)
    // v1: a pre-existing base file both appenders build on
    ops.SnapLog.commit(log, 1, Seq(
      ops.SnapEntry("data", 0L, 0L, "base.parquet")))
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futs = (1 to writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            gate.await()
            // the append shape: new snapshot = observed head + own file,
            // re-evaluated by commitNext against the FRESH head on retry
            ops.SnapLog.commitNext(log)(head => head :+
              ops.SnapEntry("data", w.toLong, w.toLong, s"app$w.parquet"))
          }
        })
      }
      gate.countDown()
      val got = futs.map(_.get()).sorted
      assert(got == (2L to (writers + 1).toLong),
        s"appenders must land versions 2..${writers + 1}, got $got")
      // THE invariant: the final head carries the base file plus all 8
      // appended files — nothing was erased by a losing retry
      val headPaths = ops.SnapLog.read(log, writers + 1L).map(_.path)
      assert(headPaths.size == writers + 1 &&
        headPaths.toSet == (1 to writers).map(w => s"app$w.parquet").toSet
          + "base.parquet",
        s"final head must union every append, got $headPaths")
      // monotone growth: each intermediate snapshot appended exactly once
      (1L to (writers + 1).toLong).foreach { v =>
        assert(ops.SnapLog.read(log, v).size == v,
          s"v$v must carry exactly $v entries")
      }
    } finally pool.shutdownNow()
  }

  test("SnapLog.commitNext conflict detection: a commit whose plan READ " +
    "a file the head has since rewritten away fails with " +
    "SnapshotConflictException instead of silently merging; a " +
    "non-conflicting read set still commits") {
    import java.nio.file.Paths
    val root = Paths.get(ops.TempFiles.dir(
      s"commit_conflict_tbl/${System.nanoTime()}"))
    val log = ops.SnapLog.logDir(root)
    ops.SnapLog.commit(log, 1, Seq(
      ops.SnapEntry("data", 0L, 0L, "x.parquet"),
      ops.SnapEntry("data", 0L, 0L, "y.parquet")))
    // a concurrent OPTIMIZE wins first: rewrites x.parquet into z.parquet
    ops.SnapLog.commitNext(log)(head => head.filterNot(_.path == "x.parquet")
      :+ ops.SnapEntry("data", 0L, 0L, "z.parquet"))
    // committer A planned against v1 reading x.parquet → must be told
    intercept[ops.SnapshotConflictException] {
      ops.SnapLog.commitNext(log, readSet = Set("x.parquet"))(head =>
        head :+ ops.SnapEntry("data", 0L, 0L, "a.parquet"))
    }
    // the failed attempt must not have published anything
    assert(ops.SnapLog.versions(log).max == 2L)
    // committer B read only y.parquet, which survived the rewrite → fine
    val v = ops.SnapLog.commitNext(log, readSet = Set("y.parquet"))(head =>
      head :+ ops.SnapEntry("data", 0L, 0L, "b.parquet"))
    assert(v == 3L &&
      ops.SnapLog.read(log, 3L).map(_.path).contains("b.parquet"))
  }
}

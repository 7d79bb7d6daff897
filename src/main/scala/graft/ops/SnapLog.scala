package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One manifest entry of a snapshot: an immutable file plus the metadata
  * the log needs to PLAN without touching data — file-level ts min/max
  * (the S11 pruning statistics, carried in the log itself) and a kind
  * ("data" or "delete" for merge-on-read equality-delete sidecars). */
final case class SnapEntry(kind: String, minUs: Long, maxUs: Long,
                           path: String)

/** Thrown by [[SnapLog.commitNext]] when the observed head lost a file
  * the committer's plan read — the concurrent-delete/rewrite case where
  * a blind rebase would silently merge two conflicting transactions.
  * The caller's recovery is a full re-plan from the new head, not a
  * retry of the same entries. */
final class SnapshotConflictException(msg: String)
  extends RuntimeException(msg)

/** THE manifest-log format — the single reader/writer/GC shared by every
  * snapshot mechanic (time travel, copy-on-write, merge-on-read, change
  * feed, vacuum, expiration, the streaming committer). A versioned table
  * is: immutable `.parquet` files directly under `root`, plus
  * `root/log/v<N>.manifest` files, each line
  * `kind \t minUs \t maxUs \t path`. Manifests land by ATOMIC move, so a
  * reader at any instant sees a fully-committed snapshot. One format,
  * one parser — a change here (a new stat, a new kind) reaches every
  * mechanic at once instead of desynchronizing five hand-rolled copies. */
object SnapLog {

  def logDir(root: Path): Path = root.resolve("log")

  /** Strip the `file:`/`file://` scheme `input_file_name()` reports so the
    * path compares equal to the manifest's `Path.toString` form — the ONE
    * normalization (previously pasted into both the OPTIMIZE stats pass
    * and the bloom-index builder; a drifted copy silently stops matching
    * manifest entries instead of erroring). */
  def localPath(uri: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(uri, "^file:(//)?", "")

  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Serialize same-JVM mutations of one table root (fixture builds, GC):
    * every manifest-exists-then-build sequence and every [[gc]] runs under
    * the root's lock, closing the check-then-act races between concurrent
    * sessions of ONE JVM (the gate's world — the repo documents that two
    * sbt processes against the repo are unsupported). Cross-PROCESS
    * writers need what production object stores provide anyway:
    * conditional PUT / rename-if-absent at the commit, plus [[gc]]'s
    * modification-time grace window for in-flight files. */
  def withTableLock[T](root: Path)(f: => T): T =
    tableLocks.computeIfAbsent(root.toAbsolutePath.normalize.toString,
      _ => new Object).synchronized(f)

  /** Commit version `v`: staging write + atomic move (readers see the
    * old log or the new one, never a partial file). Re-committing the
    * same version replaces it — the batchId-keyed exactly-once seam. The
    * staging file is UNIQUE per call (not `.v$v.staging`): two concurrent
    * committers of the same version must each publish a complete
    * manifest, never one mover racing the other's in-progress write (a
    * truncation landing on a newline boundary would read as a silently
    * shorter snapshot). */
  def commit(log: Path, v: Long, entries: Seq[SnapEntry]): Unit = {
    Files.createDirectories(log)
    val staged = stage(log, v, entries)
    Files.move(staged, log.resolve(s"v$v.manifest"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Write the manifest body to a unique `.staging` temp file and return
    * it. On ANY failure the temp file is deleted before rethrowing — a
    * crashed committer must not leave `.vN-*.staging` litter for the
    * table's lifetime (round-8 ADVICE; [[gc]] additionally sweeps staging
    * files orphaned by a hard process kill, which no finally can cover). */
  private def stage(log: Path, v: Long, entries: Seq[SnapEntry]): Path = {
    val staged = Files.createTempFile(log, s".v$v-", ".staging")
    try {
      Files.write(staged, entries.map(e =>
        s"${e.kind}\t${e.minUs}\t${e.maxUs}\t${e.path}")
        .mkString("\n").getBytes("UTF-8"))
      staged
    } catch { case t: Throwable =>
      try Files.deleteIfExists(staged) catch { case _: Throwable => () }
      throw t
    }
  }

  /** Cross-PROCESS commit: publish a new snapshot at the NEXT free
    * version and return it. The publish primitive is
    * `Files.createLink(manifest, staged)` — the local-filesystem analog
    * of an object store's conditional PUT: link(2) creates the target
    * name ATOMICALLY and fails with EEXIST if it is already taken, and
    * the linked content is the fully-written staging file, so readers
    * never observe a partial manifest. (A `Files.move` without
    * `REPLACE_EXISTING` would NOT do: it is exists-check-then-rename,
    * and POSIX rename() silently replaces — the exact
    * torn/overwritten-version race this method exists to close.)
    *
    * `build` maps the OBSERVED head's full entry list to the new
    * snapshot's full entry list and is RE-EVALUATED against the fresh
    * head inside the retry loop — the read-REBASE-retry shape real
    * Delta/Iceberg committers use. Under this format a manifest is the
    * whole snapshot, so an appender must write `head ++ ownFiles`; a
    * fixed pre-computed list would republish the loser's STALE pre-race
    * head at v+1 and silently erase the winner's files (the round-8
    * lost-update finding). Losing the version race therefore costs one
    * re-read + re-stage, never data.
    *
    * `readSet` is the Delta-style conflict check: the paths this
    * committer's PLAN depended on (the files it read to compute its
    * writes). If the observed head no longer carries one of them — a
    * concurrent committer deleted or rewrote it — blind rebase would
    * merge two logically conflicting transactions, so the commit fails
    * with [[SnapshotConflictException]] instead and the caller re-plans
    * from the new head. Pure appends pass the default empty set (append
    * vs append never conflicts); read-modify-write commits (MERGE,
    * OPTIMIZE, DELETE) pass the files they rewrote or deleted.
    *
    * Use [[commit]] only for the batchId-keyed exactly-once seam, where
    * REPLACING one's own version is the contract; use this for
    * optimistic multi-writer commits. */
  def commitNext(log: Path, maxAttempts: Int = 64,
                 readSet: Set[String] = Set.empty)
                (build: Seq[SnapEntry] => Seq[SnapEntry]): Long = {
    Files.createDirectories(log)
    var attempt = 0
    while (attempt < maxAttempts) {
      val headV = versions(log).lastOption.getOrElse(0L)
      val head = if (headV == 0L) Seq.empty[SnapEntry] else read(log, headV)
      val gone = readSet.diff(head.iterator.map(_.path).toSet)
      if (gone.nonEmpty) throw new SnapshotConflictException(
        s"commitNext under $log: head v$headV no longer references " +
        s"${gone.size} file(s) this commit's plan read (${gone.take(3)
          .mkString(", ")}${if (gone.size > 3) ", …" else ""}) — a " +
        "concurrent delete/rewrite; re-plan from the new head instead " +
        "of rebasing blindly")
      val entries = build(head)
      val v = headV + 1
      val staged = stage(log, v, entries)
      try {
        Files.createLink(log.resolve(s"v$v.manifest"), staged)
        Files.deleteIfExists(staged)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(staged) // lost the race; rebase and retry
          attempt += 1
      }
    }
    sys.error(s"commitNext: lost $maxAttempts consecutive version races " +
      s"under $log — a livelocked writer storm; raise maxAttempts or " +
      "serialize the committers")
  }

  def read(log: Path, v: Long): Seq[SnapEntry] =
    Files.readAllLines(log.resolve(s"v$v.manifest")).asScala.toSeq
      .filter(_.nonEmpty).map { line =>
        line.split("\t", 4) match {
          case Array(kind, mn, mx, path) =>
            SnapEntry(kind, mn.toLong, mx.toLong, path)
          // legacy bare-path line (pre-stats format, possibly surviving
          // in warm scratch): treat as data with UNKNOWN stats — the
          // conservative bounds make every stats-pruning planner touch
          // the file instead of silently skipping it
          case Array(path) =>
            SnapEntry("data", Long.MinValue, Long.MaxValue, path)
          case other => sys.error(
            s"unparseable manifest line (${other.length} fields): $line")
        }
      }

  def versions(log: Path): Seq[Long] = {
    if (!Files.exists(log)) return Seq.empty
    val s = Files.list(log)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .toVector.sorted
    finally s.close()
  }

  def dataPaths(entries: Seq[SnapEntry]): Seq[String] =
    entries.filter(_.kind == "data").map(_.path)
  def deletePaths(entries: Seq[SnapEntry]): Seq[String] =
    entries.filter(_.kind == "delete").map(_.path)

  /** Write `df` as ONE parquet file at `dst` (staging dir + move) and
    * return its stats-bearing entry — min/max computed from the frame in
    * one small aggregate at WRITE time, so planners later prune from the
    * manifest without ever scanning the file. */
  def writeFile(df: DataFrame, tsCol: String, stageDir: String,
                dst: Path, kind: String = "data"): SnapEntry = {
    df.repartition(1).write.mode("overwrite").parquet(stageDir)
    val s = Files.list(Paths.get(stageDir))
    val f = try s.filter(p => p.toString.endsWith(".parquet"))
      .findFirst().get() finally s.close()
    Files.move(f, dst, StandardCopyOption.REPLACE_EXISTING)
    // stats from the file just WRITTEN (one columnar scan of one small
    // file) — not a re-execution of the input plan, which would scan the
    // full source a second time and could describe a different
    // evaluation than the bytes actually on disk
    val mm = df.sparkSession.read.parquet(dst.toString)
      .agg(min(unix_micros(col(tsCol))).as("mn"),
        max(unix_micros(col(tsCol))).as("mx")).collect()(0)
    val (mn, mx) =
      if (mm.isNullAt(0)) (Long.MaxValue, Long.MinValue)
      else (mm.getLong(0), mm.getLong(1))
    SnapEntry(kind, mn, mx, dst.toString)
  }

  /** Reachability GC: delete every `.parquet` directly under `root` that
    * no surviving manifest entry (data OR delete) references. Returns
    * (nListed, nReferenced, nDeleted).
    *
    * `graceMs` is the Delta-style retention window: an UNREFERENCED file
    * modified within the last `graceMs` is spared, because "unreferenced"
    * may mean "moved into root by a writer whose manifest has not
    * committed yet" — collecting it would let the imminent commit
    * reference a deleted file and permanently poison the table (the
    * vN-exists build guards never rebuild). Same-JVM writers are already
    * excluded by [[withTableLock]]; the grace covers cross-process
    * writers, exactly like `VACUUM ... RETAIN`. Gate call sites that
    * assert file effects deterministically pass `graceMs = 0` (the
    * RETAIN-0-HOURS test idiom) — safe there because the gate is
    * single-process. A concurrently EXPIRED manifest (listed, then
    * deleted before read) is treated as expired: its references simply
    * don't count. */
  def gc(root: Path, graceMs: Long = 20L * 60 * 1000): (Long, Long, Long) =
    withTableLock(root) {
      val log = logDir(root)
      val referenced = versions(log).flatMap { v =>
        try read(log, v)
        catch { case _: java.nio.file.NoSuchFileException => Seq.empty }
      }.map(_.path).toSet
      val s = Files.list(root)
      val physical = try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(_.toString).toVector
      finally s.close()
      val cutoff = System.currentTimeMillis() - graceMs
      val garbage = physical.filterNot(referenced.contains).filter { p =>
        try Files.getLastModifiedTime(Paths.get(p)).toMillis <= cutoff
        catch { case _: java.nio.file.NoSuchFileException => false }
      }
      garbage.foreach(p => Files.deleteIfExists(Paths.get(p)))
      // staging-file sweep (round-8 ADVICE): a committer killed between
      // createTempFile and the publish leaves `.vN-*.staging` in log/
      // forever — commit()'s own try/finally cannot cover a hard kill.
      // The same grace window spares an in-flight committer's fresh file.
      if (Files.exists(log)) {
        val ls = Files.list(log)
        val stale = try ls.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".staging"))
          .filter { p =>
            try Files.getLastModifiedTime(p).toMillis <= cutoff
            catch { case _: java.nio.file.NoSuchFileException => false }
          }.toVector
        finally ls.close()
        stale.foreach(p => Files.deleteIfExists(p))
      }
      (physical.size.toLong, referenced.size.toLong, garbage.size.toLong)
    }
}

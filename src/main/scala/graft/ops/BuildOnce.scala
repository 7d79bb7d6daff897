package graft.ops

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Cross-PROCESS build-once of a directory fixture (round 9 — VERDICT r8
  * #6 / ADVICE r8 #2): [[SnapLog.withTableLock]] serializes same-JVM
  * builders only, so two PROCESSES (a StressSf1Spec JVM racing a bench
  * JVM over the shared sf1 generator) could both run a check-then-build
  * and REPLACE_EXISTING-swap a table's file while the other process was
  * reading it.
  *
  * Protocol — the commit-protocol shape [[SnapLog.commitNext]] uses,
  * applied to a whole directory:
  *   1. fast path: `dst/_built` exists → the fixture is complete, return;
  *   2. build into a UNIQUE sibling staging dir (same filesystem), write
  *      the `_built` sentinel INSIDE it last;
  *   3. publish with ONE atomic `rename(2)` of the staging dir onto
  *      `dst`. rename replaces an EMPTY target directory atomically (the
  *      path helpers pre-create `dst` empty) and fails with ENOTEMPTY
  *      when a winner already published — so `dst` transitions from
  *      empty to complete-with-sentinel in one step and no reader ever
  *      observes a torn table;
  *   4. losers delete their staging dir and WAIT for the winner's
  *      sentinel instead of re-building.
  *
  * A non-empty `dst` WITHOUT a sentinel cannot arise from this protocol
  * (content and sentinel land in the same rename); it means pre-protocol
  * litter from an in-place builder killed mid-build. Entry moves such a
  * dir aside atomically and deletes it, so the epoch heals itself. */
object BuildOnce {

  val Sentinel = "_built"

  private def rmTree(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.toVector.foreach(rmTree) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  private def nonEmpty(p: Path): Boolean = {
    if (!Files.isDirectory(p)) return false
    val s = Files.list(p)
    try s.iterator().hasNext finally s.close()
  }

  /** Ensure `dst` holds the completed fixture `build` produces, exactly
    * once across processes. `build` receives the STAGING dir and must
    * write the whole fixture into it; it must not touch `dst`. */
  def dirFixture(dst: Path, waitMs: Long = 10L * 60 * 1000)
                (build: Path => Unit): Unit = {
    val sentinel = dst.resolve(Sentinel)
    if (Files.exists(sentinel)) return
    // heal pre-protocol litter: content without a sentinel is a torn
    // in-place build (the protocol publishes both in one rename). Move
    // it aside ATOMICALLY first — deleting dst in place could race a
    // winner's rename and eat its freshly-published files.
    if (nonEmpty(dst)) {
      val aside = dst.resolveSibling(
        s".${dst.getFileName}-stale-${System.nanoTime()}")
      try { Files.move(dst, aside, StandardCopyOption.ATOMIC_MOVE)
            rmTree(aside) }
      catch { case _: java.nio.file.NoSuchFileException => () } // raced: gone
    }
    Files.createDirectories(dst.getParent)
    val tmp = dst.resolveSibling(s".${dst.getFileName}-build-" +
      s"${ProcessHandle.current.pid}-${System.nanoTime()}")
    Files.createDirectories(tmp)
    try {
      build(tmp)
      Files.createFile(tmp.resolve(Sentinel))
      // the publish: one rename(2). Target absent or EMPTY → atomic
      // success; target non-empty → a winner published first.
      try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.DirectoryNotEmptyException => rmTree(tmp)
        case _: java.nio.file.FileAlreadyExistsException => rmTree(tmp)
        case _: java.nio.file.FileSystemException if Files.exists(sentinel) =>
          rmTree(tmp) // some filesystems report the occupied target this way
      }
    } catch { case t: Throwable => rmTree(tmp); throw t }
    // winner or loser, leave only when the fixture is visibly complete
    val deadline = System.currentTimeMillis() + waitMs
    while (!Files.exists(sentinel)) {
      if (System.currentTimeMillis() > deadline)
        sys.error(s"BuildOnce: no builder published $dst within " +
          s"${waitMs} ms — a crashed winner? (its staging dir, if any, " +
          "names its pid)")
      Thread.sleep(100)
    }
  }
}

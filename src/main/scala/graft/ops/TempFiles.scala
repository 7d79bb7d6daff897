package graft.ops

import java.nio.file.{Files, Paths, Path}

/** Deterministic scratch files under the repo's target dir — used by the
  * file-format scan queries to materialize JSON derived from the parquet
  * testdata (the engine never synthesizes its own data; content is always a
  * deterministic re-encoding of a driver table). */
object TempFiles {
  private val root = "/root/repo/target/tmp"

  /** A stable tag for a scale-factor dir ("sf0.01" etc.), extended with a
    * DATA EPOCH — a fingerprint of the dir's file mtimes+sizes. Scratch
    * derived from the testdata (streaming checkpoints, landing-dir
    * symlinks, re-encoded JSON/ORC fixtures) is only valid for the data it
    * was derived FROM; when the lake regenerates a table, a stale
    * checkpoint would silently skip the "already processed" file and a
    * stale fixture would feed the oracle old rows. Keying every scratch
    * path by (dir, epoch) makes regeneration self-invalidating. */
  // epoch computed once per (JVM, sfDir): tag() sits on hot query paths,
  // and a testdata regeneration mid-JVM would leave half the scratch keyed
  // to each epoch anyway — one stat sweep per dir per JVM is the contract.
  private val epochCache =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()

  def tag(sfDir: String): String = {
    val base = sfDir.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9.]", "_")
    val epoch = epochCache.computeIfAbsent(sfDir, computeEpoch)
    s"${base}_e${java.lang.Long.toHexString(epoch)}"
  }

  private def computeEpoch(sfDir: String): Long = {
    val d = Paths.get(sfDir)
    if (!Files.isDirectory(d)) 0L
    else {
      import scala.jdk.CollectionConverters._
      val s = Files.list(d)
      // SUM of per-file mixed hashes: order-independent like XOR, but a
      // pair of changed files can't cancel (XOR of two equal deltas is 0;
      // sums only collide on exact additive inverses of mixed hashes)
      try s.iterator().asScala.foldLeft(0L) { (acc, p) =>
        val m = try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => 0L }
        val z = try Files.size(p) catch { case _: Exception => 0L }
        var h = m * 0x9E3779B97F4A7C15L + z * 0xC2B2AE3D27D4EB4FL +
          p.getFileName.toString.hashCode.toLong
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        acc + h
      } finally s.close()
    }
  }

  def dir(sub: String): String = {
    val p = Paths.get(root, sub)
    Files.createDirectories(p)
    p.toString
  }

  /** Write (overwrite) a file and return its absolute path. */
  def write(sub: String, content: String): String = {
    val p: Path = Paths.get(root, sub)
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p.toString
  }
}

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
  def tag(sfDir: String): String = {
    val base = sfDir.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9.]", "_")
    val d = Paths.get(sfDir)
    val epoch =
      if (!Files.isDirectory(d)) 0L
      else {
        import scala.jdk.CollectionConverters._
        val s = Files.list(d)
        // XOR-fold so the fingerprint is independent of listing order
        try s.iterator().asScala.foldLeft(0L) { (acc, p) =>
          val m = try Files.getLastModifiedTime(p).toMillis catch { case _: Exception => 0L }
          val z = try Files.size(p) catch { case _: Exception => 0L }
          acc ^ java.lang.Long.rotateLeft(m + 31L * z + p.getFileName.toString.hashCode, 17)
        } finally s.close()
      }
    s"${base}_e${java.lang.Long.toHexString(epoch)}"
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

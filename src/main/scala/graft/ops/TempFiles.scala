package graft.ops

import java.nio.file.{Files, Paths, Path}

/** Deterministic scratch files under the repo's target dir — used by the
  * file-format scan queries to materialize JSON derived from the parquet
  * testdata (the engine never synthesizes its own data; content is always a
  * deterministic re-encoding of a driver table). */
object TempFiles {
  private val root = "/root/repo/target/tmp"

  /** A stable tag for a scale-factor dir ("sf0.01" etc.). */
  def tag(sfDir: String): String =
    sfDir.replaceAll(".*/", "").replaceAll("[^A-Za-z0-9.]", "_")

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

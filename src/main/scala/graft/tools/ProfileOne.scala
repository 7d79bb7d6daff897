package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable.ArrayBuffer

/** Empirical profile of ONE declared query (guide §1.1): run it warm N
  * times under the bench's session shape and print per-run wall seconds
  * plus a per-stage breakdown (duration, task count, shuffle bytes) from
  * a SparkListener — the local[k] stand-in for the Stages tab. Usage:
  *   runMain graft.tools.ProfileOne <queryName> <sfDir> [iters]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder.master(s"local[$cpus]")
      .appName("profile-one")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach(profile(spark, sfDir, _, iters))
    spark.stop()
  }

  private def profile(spark: SparkSession, sfDir: String, name: String,
                      iters: Int): Unit = {
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))

    // warm pass: fixtures, JIT, page cache
    fn(spark, sfDir).count()

    case class St(id: Int, name: String, ms: Long, tasks: Int,
                  shufR: Long, shufW: Long, input: Long)
    val stages = ArrayBuffer[St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        synchronized {
          val si = sc.stageInfo
          val ms = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(-1L)
          val m = si.taskMetrics
          stages += St(si.stageId, si.name.takeWhile(_ != '\n'), ms,
            si.numTasks, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain

    println(f"PROFILE $name walls=${walls.map(w => f"$w%.3f").mkString(",")} " +
      f"jobs=${jobs / iters}%d/iter stages=${stages.size / iters}%d/iter")
    val byStage = stages.groupBy(_.name).map { case (n, ss) =>
      (n, ss.map(_.ms).sum, ss.size, ss.map(_.tasks).sum,
        ss.map(_.shufR).sum, ss.map(_.shufW).sum, ss.map(_.input).sum)
    }.toSeq.sortBy(-_._2)
    byStage.take(25).foreach { case (n, ms, cnt, tasks, sr, sw, in) =>
      println(f"  ${ms}%6d ms  x$cnt%-3d tasks=$tasks%-5d " +
        f"shufR=${sr / 1024}%7d KB shufW=${sw / 1024}%7d KB " +
        f"in=${in / 1024}%7d KB  $n%s")
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import scala.collection.mutable.ArrayBuffer

/** Micro-batch breakdown of ONE declared streaming query (guide §1.1 /
  * VERDICT r10 item 1): run it warm N times with a StreamingQueryListener
  * attached to the dedicated stream session and print every batch's
  * durationMs map (triggerExecution, queryPlanning, walCommit, getBatch,
  * addBatch, commitOffsets, …) plus the query start→stop envelope — the
  * part of a stream query's wall time the stage listener can't see.
  * Usage: runMain graft.tools.StreamProbe <queryName[,name2]> <sfDir> [iters]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args(1)
    val iters = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder.master(s"local[$cpus]")
      .appName("stream-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Prog(batchId: Long, rows: Long, durations: Map[String, Long])
    val progress = ArrayBuffer[Prog]()
    var startedAt = 0L
    val events = ArrayBuffer[String]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        synchronized { events += f"started +${(System.nanoTime() - startedAt) / 1e6}%.0fms" }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        synchronized {
          val p = e.progress
          import scala.jdk.CollectionConverters._
          progress += Prog(p.batchId, p.numInputRows,
            p.durationMs.asScala.map { case (k, v) => (k, v.toLong) }.toMap)
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        synchronized { events += f"terminated +${(System.nanoTime() - startedAt) / 1e6}%.0fms" }
    }
    // the declared stream queries run on one of the TWO dedicated stream
    // sessions (watermark-driven shapes on streamSession, arrival-driven
    // ones on streamSessionNoIdle) — listen on both or the no-idle
    // queries report no batches
    val ss = graft.streaming.StreamTwins.streamSession(spark)
    val ssNi = graft.streaming.StreamTwins.streamSessionNoIdle(spark)
    ss.streams.addListener(listener)
    ssNi.streams.addListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'"))
      fn(spark, sfDir).count() // warm: fixtures, JIT, page cache
      (1 to iters).foreach { i =>
        progress.clear(); events.clear()
        startedAt = System.nanoTime()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"STREAM $name iter$i wall=$wall%.3f s  events=${events.mkString(" | ")}")
        progress.foreach { p =>
          val d = p.durations.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(f"  batch ${p.batchId}%2d rows=${p.rows}%-8d $d")
        }
      }
    }
    ss.streams.removeListener(listener)
    ssNi.streams.removeListener(listener)
    spark.stop()
  }
}

package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Round 10 (VERDICT r9 "next" #3): fault-injection proof of the
  * exactly-once seams. The batchId-versioned foreachBatch commits were
  * proven idempotent under REPLAYED batches; this spec injects the other
  * everyday 100×-scale event — a TASK failing mid-batch and being
  * retried by the scheduler — and asserts the committed state is
  * bit-identical to an unfaulted run.
  *
  * Task retries need `spark.task.maxFailures` ≥ 2, which plain `local[n]`
  * pins to 1, and the one-shot fault flag must be a fresh per-JVM
  * static — so each scenario runs in a FORKED JVM (`local[4, 2]`,
  * the BuildOnceSpec two-process pattern) and the spec compares the
  * dumped outcomes. */
class FaultInjectionSpec extends AnyFunSuite {

  private def runHelper(mode: String, faulted: Boolean): (String, Seq[String]) = {
    val out = Paths.get(ops.TempFiles.dir(
      s"fault_${mode}_${if (faulted) "f" else "c"}/${System.nanoTime()}"))
    val java = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ addOpens ++ Seq("-Xmx2g",
      "-Dspark.ui.enabled=false", "-cp",
      System.getProperty("java.class.path"),
      "graft.FaultInjectionHelper", mode, out.toString, faulted.toString)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor() == 0, s"helper($mode, faulted=$faulted) failed:\n" +
      log.linesIterator.toSeq.takeRight(30).mkString("\n"))
    val status = Files.readString(out.resolve("status.txt"))
    val rows = Files.readAllLines(out.resolve("rows.txt"))
    import scala.jdk.CollectionConverters._
    (status, rows.asScala.toSeq)
  }

  for (mode <- Seq("jdbc", "snap")) {
    test(s"$mode seam: a task that fails mid-batch and is RETRIED leaves " +
      "state bit-identical to an unfaulted run (no loss, no duplicates)") {
      val (fs, frows) = runHelper(mode, faulted = true)
      val (cs, crows) = runHelper(mode, faulted = false)
      assert(fs.contains("FIRED=true"),
        s"the injected fault must actually fire: $fs")
      assert(fs.contains("MAXATT=") &&
        fs.split("MAXATT=")(1).trim.split("\\s")(0).toInt >= 1,
        s"a task retry (attemptNumber >= 1) must have run: $fs")
      assert(cs.contains("FIRED=false"),
        s"the control run must be fault-free: $cs")
      assert(frows.nonEmpty, "committed state must not be empty")
      assert(frows == crows,
        s"faulted state diverges from clean run: ${frows.size} vs " +
          s"${crows.size} rows; first diff = " +
          frows.zipAll(crows, "<missing>", "<missing>")
            .find { case (a, b) => a != b })
    }
  }
}

/** Forked-JVM scenario runner. Builds a 4-file landing feed, streams it
  * through the REAL exactly-once seam (`jdbc` →
  * [[streaming.StreamTwins.streamToJdbcExactlyOnce]]; `snap` → the
  * batchId-keyed [[ops.SnapLog]] commit protocol of
  * streamSnapshotCommit), with a one-shot injected task failure when
  * armed, then dumps the committed rows sorted plus a status line. */
object FaultInjectionHelper {
  import org.apache.spark.sql.{SparkSession, functions => F}
  import org.apache.spark.sql.types._

  // one-shot per-JVM fault + attempt telemetry (the injection must be
  // static: the retried task must NOT re-throw)
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
  val maxAttempt = new java.util.concurrent.atomic.AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val (mode, outDir, faulted) = (args(0), args(1), args(2).toBoolean)
    armed.set(faulted)
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val spark = SparkSession.builder()
      .master("local[4, 2]") // 2 = spark.task.maxFailures: retries ON
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 4-slice landing feed: 400 deterministic rows, one file per batch
    val landing = Files.createDirectories(out.resolve("landing"))
    (0 until 4).foreach { s =>
      val stage = out.resolve(s"stage$s")
      (s * 100 until (s + 1) * 100).map(i => (i.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-${s + 1}%02d 00:00:${i % 60}%02d"),
          s"t${i % 5}"))
        .toDF("event_id", "ts", "event_type")
        .coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, landing.resolve(f"s$s%02d.parquet"))
    }
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("ts", TimestampType), StructField("event_type", StringType)))

    // the injected fault rides a filter INSIDE the per-batch write job:
    // it fires once per JVM, mid-stream, on a row in a LATER batch (the
    // table/log already has committed state to corrupt)
    val fault = F.udf { (id: Long) =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) maxAttempt.getAndAccumulate(tc.attemptNumber(), math.max)
      if (id == 250L && armed.get() && fired.compareAndSet(false, true))
        throw new RuntimeException("injected task fault")
      true
    }.asNondeterministic()
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .filter(fault(F.col("event_id")))

    val rows: Seq[String] = mode match {
      case "jdbc" =>
        val url = s"jdbc:derby:memory:fault_${System.nanoTime()};create=true"
        streaming.StreamTwins.streamToJdbcExactlyOnce(src, url, "fault_tbl",
          out.resolve("ck").toString)
        spark.read.format("jdbc").option("url", url)
          .option("dbtable", "fault_tbl").load()
          .collect()
          .map(r => s"${r.getAs[Long]("event_id")}|${r.getAs[java.sql.Timestamp]("ts")}|" +
            s"${r.getAs[String]("event_type")}|${r.getAs[Long]("batch_id")}")
          .sorted.toSeq
      case "snap" =>
        val root = Files.createDirectories(out.resolve("tbl"))
        val log = ops.SnapLog.logDir(root)
        val q = src.writeStream
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
            val entry = ops.SnapLog.writeFile(batch.toDF(), "ts",
              out.resolve(s"snapstage/b$batchId").toString,
              root.resolve(s"b$batchId.parquet"))
            val prev = ops.SnapLog.versions(log).filter(_ < batchId)
            val base = if (prev.isEmpty) Seq.empty
              else ops.SnapLog.read(log, prev.max)
            ops.SnapLog.commit(log, batchId, base :+ entry)
            ()
          }
          .option("checkpointLocation", out.resolve("ck").toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val head = ops.SnapLog.versions(log).max
        val chain = ops.SnapLog.versions(log).sorted.map(v =>
          s"v$v:" + ops.SnapLog.read(log, v)
            .map(e => Paths.get(e.path).getFileName).mkString(","))
        val data = spark.read.parquet(
            ops.SnapLog.dataPaths(ops.SnapLog.read(log, head)): _*)
          .collect()
          .map(r => s"${r.getAs[Long]("event_id")}|${r.getAs[java.sql.Timestamp]("ts")}|" +
            s"${r.getAs[String]("event_type")}")
          .sorted.toSeq
        chain ++ data
    }
    Files.write(out.resolve("rows.txt"),
      String.join("\n", rows: _*).getBytes("UTF-8"))
    Files.writeString(out.resolve("status.txt"),
      s"FIRED=${fired.get()} MAXATT=${maxAttempt.get()}")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query N times (default 3) and
  * reports the per-query MEDIAN — single-shot timings on a shared box swing
  * ±2× (SURVEY.md §6), which made round-over-round regressions undecidable.
  * The one-line stdout JSON keeps the driver contract (`queries` = median
  * seconds); the full per-iteration detail (all iterations, median, min)
  * is also written to BENCH_full.json because the driver's tail capture
  * truncates the stdout map. */
object Bench {
  /** 1-min system load average — recorded at start and end of the run so a
    * contended-machine bench (round-4's official record was ~2x inflated by
    * background load) is self-identifying in the evidence file. */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/session warmup so the first measured query isn't charged
    // for Spark boot costs (measures queries, not cluster startup).
    spark.range(1000000).selectExpr("sum(id)").collect()

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    // fixed (sorted) execution order: hash-map order shifts whenever a
    // query is added, which silently changes each query's cache/JVM
    // context between rounds and poisons round-over-round comparison
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            Some(name)
        }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      (name, times.map(_._1), times.flatMap(_._2).headOption)
    }
    val med = results.map { case (k, ts, _) => k -> median(ts) }
    val qs = med.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.flatMap(_._3)
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = med.map(_._2).sum

    val loadEnd = loadAvg()
    val full = results.map { case (k, ts, _) =>
      s"""  "$k": {"median":${median(ts)},"min":${ts.min},""" +
        s""""iters":[${ts.mkString(",")}]}"""
    }.mkString("{\n", ",\n",
      s""",\n  "total_median":$total,"iters":$iters,"sf":"$sfDir",""" +
      s""""load_avg_start":$loadStart,"load_avg_end":$loadEnd\n}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_full.json"), full)

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir","iters":$iters,"load_avg_start":$loadStart,"load_avg_end":$loadEnd}""")
    spark.stop()
    // a broken query must fail the bench run, not silently inflate it
    if (errors.nonEmpty) sys.exit(1)
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Run ONE declared query at a given scale dir and print its row count
  * (and the first rows with --show) — the spot-check harness for
  * scale-sensitive queries the sf0.01 oracle gate can't cover (recall
  * tiers, bucket-cap behavior at sf0.1). Usage:
  *   runMain graft.tools.RunOne <queryName> <sfDir> [--show]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder.master("local[32]").appName("run-one")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val df = fn(spark, sfDir)
    val n = df.count()
    println(s"RUNONE $name rows=$n")
    if (args.contains("--show")) df.show(20, truncate = false)
    val outIdx = args.indexOf("--out")
    if (outIdx >= 0)
      df.coalesce(1).write.mode("overwrite").parquet(args(outIdx + 1))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Print ONE declared query's executed plan (after an optional warm run,
  * so session-built fixtures/indexes exist) — the spot-check harness for
  * plan-shape work. Usage:
  *   runMain graft.tools.PlanOne <queryName> <sfDir> [--warm]
  */
object PlanOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val spark = SparkSession.builder.master("local[4]").appName("plan-one")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    if (args.contains("--warm")) fn(spark, sfDir).count()
    println(fn(spark, sfDir).queryExecution.executedPlan.toString)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** Flagship smoke: SparkEntry.entry must return rows > 0 on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n")
    assert(n > 0, "flagship returned no rows")
    spark.stop()
  }
}

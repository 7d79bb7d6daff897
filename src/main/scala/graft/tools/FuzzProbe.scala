package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** One-off profiling harness for the deletion-neighborhood fuzzy join:
  * times the verify-before-dedup and dedup-before-verify orders and the
  * raw candidate volumes at a given scale dir. */
object FuzzProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder.master("local[32]").appName("fuzz-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = graft.ops.Tables.table(spark, sfDir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val nm = col("name")
    val deletions = transform(sequence(lit(1), length(nm)), i =>
      concat(nm.substr(lit(1), i - lit(1)),
        nm.substr(i + lit(1), length(nm) - i)))
    def keyed = names.select(col("id"), col("name"),
      explode(array_distinct(concat(array(nm), deletions))).as("k"))
    def joined = {
      val a = keyed.select(col("k"), col("id").as("a_id"), col("name").as("a_name"))
      val b = keyed.select(col("k"), col("id").as("b_id"), col("name").as("b_name"))
      a.join(b, Seq("k")).filter(col("a_id") < col("b_id"))
    }

    def time(label: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label iter$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (n=$n)")
      }
    }

    time("candidates (join only)")(joined.count())
    time("verify-then-dedup (rejected order)")(
      joined.filter(levenshtein(col("a_name"), col("b_name")) <= 1)
        .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"))
        .dropDuplicates("a_id", "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_name"), col("b_name")).cast(LongType).as("dist"))
        .count())
    time("dedup-then-verify (SHIPPED order)")(
      joined.dropDuplicates("a_id", "b_id")
        .filter(levenshtein(col("a_name"), col("b_name")) <= 1)
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_name"), col("b_name")).cast(LongType).as("dist"))
        .count())
    time("explode+shuffle only (keyed count via groupBy)")(
      keyed.groupBy("k").count().count())
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
object ProbePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("probe-pq")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).toSeq
      else Seq("ann_pq_topk", "ann_ivfpq_topk", "dq_ks")
    for (q <- qs; i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      println(f"$q iter$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: flags any declared query whose physical plan contains a
  * cartesian product or nested-loop join. [[PlanSweepSpec]] asserts the
  * findings equal [[Allowlist]] so a plan regression fails `sbt test`. */
object PlanSweep {

  /** Queries DOCUMENTED to plan a BroadcastNestedLoopJoin:
    *  - dedup_ngram_jaccard / dedup_embedding_cosine: bounded O(n²) exact
    *    verification tiers (the declared scale paths are dedup_minhash_lsh
    *    and dedup_embedding_lsh);
    *  - ann_cosine_topk / ann_lsh_recall: exact brute-force baseline (and
    *    the recall query joining against it) — broadcast side is the 8-row
    *    query set, the big side streams with no shuffle;
    *  - text_tfidf: a ONE-row broadcast (the corpus document count) cross-
    *    joined onto the score expression — the scalar-subquery plan shape,
    *    effectively free at any scale. */
  val Allowlist: Set[String] =
    Set("dedup_ngram_jaccard", "dedup_embedding_cosine", "ann_cosine_topk",
      "ann_lsh_recall", "text_tfidf")

  /** name → offending operator names (or PLAN_ERROR) for every declared
    * query whose plan contains a scale-killer operator. */
  def sweep(spark: SparkSession, sf: String): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
          .filter(plan.contains)
        if (bad.nonEmpty) Some(name -> bad.mkString(",")) else None
      } catch {
        case e: Throwable =>
          Some(name -> s"PLAN_ERROR ${e.getMessage.take(80)}")
      }
    }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", "/root/repo/target/warehouse")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sweep(spark, "/root/testdata/sf0.001").foreach { case (n, b) =>
      println(s"$n: $b")
    }
    println("SWEEP_DONE")
    spark.stop()
  }
}

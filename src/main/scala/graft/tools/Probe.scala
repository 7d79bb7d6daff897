package graft.tools

import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = graft.ops.Tables.table(spark, dir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"TIME $label ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val sh = time("shingles") {
      val s = graft.text.NearDup.shingleTable(docs, "doc_id", "text"); s.count(); s }
    val banded = time("sig+band") {
      val b = graft.text.NearDup.bandedTable(sh); b.count(); b }
    time("cand_join") {
      val c = graft.text.NearDup.candidatePairsFromBanded(banded)
      println(s"candidates: ${c.count()}") }
    val ver = time("verify_full") {
      graft.text.NearDup.minhashDupPairs(docs, "doc_id", "text", 0.8) }
    println(s"verified pairs: ${ver.count()}")
    val sv = time("simhash_verified") {
      graft.text.NearDup.simhashVerifiedPairs(docs, "doc_id", "text", 0.8, 13) }
    println(s"simhash verified pairs: ${sv.count()}")
    spark.stop()
  }
}

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
    time("simhash_diag") {
      import org.apache.spark.sql.functions._
      val sim = docs.select(col("doc_id").as("id"),
        graft.text.NearDup.simhash64(col("text")).as("sim"))
      val exact = graft.text.NearDup.exactKeyedDiag(sim)
      val sizes = exact.groupBy("k").count()
      sizes.agg(count(lit(1)), max(col("count")), sum(col("count") * col("count")))
        .show(false)
      val cand = graft.text.NearDup.simhashCandDiag(sim, 13, 1000)
      println(s"simhash raw candidates: $cand")
      for (cap <- Seq(100, 200, 500)) {
        val t0 = System.nanoTime
        val sh = graft.text.NearDup.shingleTable(docs, "doc_id", "text")
        val n = graft.text.NearDup.simhashVerifiedFromShinglesDiag(
          docs, sh, "doc_id", "text", 0.8, 13, cap).count()
        val c = graft.text.NearDup.simhashCandDiag(sim, 13, cap)
        println(f"cap=$cap verified=$n rawcand=$c ${(System.nanoTime - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}

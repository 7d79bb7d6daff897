package graft.tools

import org.apache.spark.sql.SparkSession

object ProbePf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[32]").appName("probe-pf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tok = graft.ops.Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(filter(split(col("text"), " "),
          x => length(x) > 0))).as("token"))
    val docFreq = tok.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val sized = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val ranked = tok.join(docFreq, "token").join(sized, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("token"))))
    val prefix = ranked
      .filter(col("rn") <= col("sz") - expr("(4 * sz + 4) div 5") + 1)
      .select(col("token"), col("df"), col("doc_id"), col("sz"), col("rn"))
    println(s"prefix rows: ${prefix.count()}")
    val joinVol = prefix.select(col("token"), col("doc_id").as("a_id"),
        col("sz").as("a_sz"), col("rn").as("a_rn"))
      .join(prefix.select(col("token"), col("doc_id").as("b_id"),
        col("sz").as("b_sz"), col("rn").as("b_rn")), Seq("token"))
      .filter(col("a_id") < col("b_id") &&
        lit(4) * greatest(col("a_sz"), col("b_sz")) <=
          lit(5) * least(col("a_sz"), col("b_sz")))
    val t0 = System.nanoTime
    println(s"join volume: ${joinVol.count()}")
    println(f"  (count took ${(System.nanoTime - t0) / 1e9}%.1f s)")
    val pos = joinVol.filter(
      lit(9) * (lit(1) + least(col("a_sz") - col("a_rn"), col("b_sz") - col("b_rn"))) >=
        lit(4) * (col("a_sz") + col("b_sz")))
    val t1 = System.nanoTime
    println(s"positional-filtered rows: ${pos.count()}")
    println(s"positional candidates: ${pos.select("a_id", "b_id").distinct().count()}")
    println(f"  (took ${(System.nanoTime - t1) / 1e9}%.1f s)")
    spark.stop()
  }
}

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

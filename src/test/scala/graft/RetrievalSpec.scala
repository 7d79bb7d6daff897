package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval operators: BM25 ranking against a hand-computed fixture and
  * the chunker's coverage/reconstruction guarantees. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bm25 matches the hand-computed score on a 3-doc corpus and ranks " +
    "term-bearing docs above term-free ones") {
    // corpus: d1 has 'spark' twice in 4 tokens, d2 once in 8, d3 none.
    // N=3, L=16. For 'spark': df=2, idf=(2*3-2*2+1)/(2*2+1)=3/5.
    // d1: tf=2,len=4 → 22*2*16/(10*2*16+3*16+9*4*3) = 704/476
    // d2: tf=1,len=8 → 22*1*16/(10*1*16+3*16+9*8*3) = 352/424
    import spark.implicits._
    val docs = Seq((1L, "spark x spark y"),
        (2L, "spark a b c d e f g"),
        (3L, "n o p q")).toDF("doc_id", "text")
    val tokens = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = tokens.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      .filter(col("tok") === "spark")
    val dl = tokens.groupBy("doc_id").agg(count(lit(1)).as("len"))
    val scored = tf.join(dl, "doc_id")
      .select(col("doc_id"),
        ((lit(22.0) * col("tf") * 16) /
          (lit(10) * col("tf") * 16 + lit(3) * 16 + lit(9) * col("len") * 3) *
          lit(3.0 / 5.0)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(scored(1L) - 704.0 / 476.0 * 3.0 / 5.0) < 1e-12)
    assert(math.abs(scored(2L) - 352.0 / 424.0 * 3.0 / 5.0) < 1e-12)
    assert(scored(1L) > scored(2L)) // higher tf, shorter doc wins
    assert(!scored.contains(3L))    // term-free doc scores nothing
  }

  test("bm25 declared query: 5 ranked rows per query, scores descend, " +
    "every hit contains a query term, and top-k is group-limited " +
    "below the window") {
    val out = Queries.searchBm25(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-query top-k must cap before the window exchange:\n$plan")
    val rows = out.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L, 3L))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // membership: every returned doc contains at least one of its
    // query's terms
    val terms = Map(1L -> Seq("spark", "join"),
      2L -> Seq("hash", "merge", "batch"), 3L -> Seq("vector", "scan"))
    val texts = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    rows.foreach { r =>
      val qs = terms(r.getLong(0))
      assert(qs.exists(texts(r.getLong(2)).contains),
        s"doc ${r.getLong(2)} has no term of query ${r.getLong(0)}")
    }
  }

  test("chunker covers every token exactly, reconstructs the text from " +
    "stride-aligned prefixes, and stays shuffle-free") {
    val W = 32; val S = 24
    val out = Queries.chunkDocuments(spark, sf)
    assert(!out.queryExecution.executedPlan.toString
      .replaceAll("(?s)AdaptiveSparkPlan.*?isFinalPlan", "")
      .contains("Exchange") ||
      // the ORDER BY adds a range exchange; everything upstream is narrow
      out.queryExecution.executedPlan.toString.indexOf("Exchange") ==
        out.queryExecution.executedPlan.toString.lastIndexOf("Exchange"))
    val chunks = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val texts = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == texts.keySet)
    byDoc.foreach { case (id, cs) =>
      val n = texts(id).split(" ", -1).length
      val sorted = cs.sortBy(_._2)
      // chunk count = number of stride starts below n
      assert(sorted.length == (n + S - 1) / S)
      sorted.foreach { case (_, idx, start, nTok, chTxt) =>
        assert(start == idx * S)
        assert(nTok == math.min(W, n - start))
        assert(chTxt.split(" ", -1).length == nTok)
      }
      // stride-aligned prefixes of each chunk concatenate back to the text
      val rebuilt = sorted.map { case (_, _, start, nTok, chTxt) =>
        chTxt.split(" ", -1).take(math.min(S.toLong, nTok).toInt)
      }.flatten.mkString(" ")
      assert(rebuilt == texts(id))
    }
  }
}

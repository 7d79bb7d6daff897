package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.TextOps

/** PII redaction + cross-document boilerplate removal semantics. */
class TextCleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextOps.redactPii(col("t")).as("r"))
      .collect().head.getString(0)

  test("redactPii masks emails, phones and IPv4s, leaves prose intact") {
    assert(redact("mail a.b+c@x-y.co.uk now") == "mail <EMAIL> now")
    assert(redact("call +1-202-555-0147 or 44-171-555-0123")
      == "call <PHONE> or <PHONE>")
    assert(redact("host 192.168.0.1 down") == "host <IP> down")
    assert(redact("version 1.2.3 stays, 1.2.3.4 goes")
      == "version 1.2.3 stays, <IP> goes")
    assert(redact("no pii here at all") == "no pii here at all")
  }

  test("redactPii is idempotent and order-safe (email before phone before ip)") {
    val s = "a@b.com +1-202-555-0147 10.0.0.1"
    assert(redact(s) == "<EMAIL> <PHONE> <IP>")
    assert(redact(redact(s)) == redact(s))
  }

  test("wordChunks cuts in order with a short tail and no shuffle") {
    val df = Seq("a b c d e f g h i j").toDF("t")
      .select(TextOps.wordChunks(col("t"), 4).as("c"))
    assert(df.collect().head.getSeq[String](0) == Seq("a b c d", "e f g h", "i j"))
    // chunking is a pure projection: no Exchange in the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("dropBoilerplate drops cross-doc chunks, keeps order, empties full-boiler docs") {
    // docs 1 and 2 share their first chunk (8 words); doc 3 is unique;
    // doc 4 is a pure copy of the shared chunk → fully boilerplate.
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (1L, s"$shared u1 u2 u3"),
      (2L, s"$shared v1 v2 v3 v4 v5 v6 v7 v8 v9"),
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
      (4L, shared)
    ).toDF("doc_id", "text")
    val out = TextOps.dropBoilerplate(docs, "doc_id", "text", chunkWords = 8)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L) == ((2L, 1L, "u1 u2 u3")))
    assert(byId(2L) == ((3L, 1L, "v1 v2 v3 v4 v5 v6 v7 v8 v9")))
    assert(byId(3L) == ((2L, 0L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")))
    assert(byId(4L) == ((1L, 1L, "")))
  }

  test("dropBoilerplate with minDocs above corpus size is the identity") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.dropBoilerplate(docs, "doc_id", "text",
        chunkWords = 2, minDocs = 99)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getLong(2) == 0L))
    assert(out.map(_.getString(3)).toSeq == Seq("a b c", "a b c"))
  }
}

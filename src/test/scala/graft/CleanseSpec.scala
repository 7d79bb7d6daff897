package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Cleanse

class CleanseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("filterNotNullCast drops nulls and casts (emails_import.py:22-24)") {
    val df = Seq(Some("42"), None, Some("7")).toDF("userId")
    val out = Cleanse.filterNotNullCast(df, "userId", LongType)
    assert(out.schema("userId").dataType == LongType)
    assert(out.as[Long].collect().sorted.toSeq == Seq(7L, 42L))
  }

  test("epoch seconds and millis parse to UTC timestamps") {
    val df = Seq((1704067200L, 1704067200123L)).toDF("s", "ms")
    val r = df.select(
      date_format(Cleanse.fromEpochSeconds($"s"), "yyyy-MM-dd HH:mm:ss").as("a"),
      date_format(Cleanse.fromEpochMillis($"ms"), "yyyy-MM-dd HH:mm:ss.SSS").as("b"))
      .collect().head
    assert(r.getString(0) == "2024-01-01 00:00:00")
    assert(r.getString(1) == "2024-01-01 00:00:00.123")
  }

  test("ISO parse + tz handling is session-UTC") {
    val df = Seq("2024-05-06 07:08:09").toDF("s")
    val r = df.select(Cleanse.tsStr(Cleanse.parseIso($"s"))).as[String].collect().head
    assert(r == "2024-05-06 07:08:09.000000")
  }

  test("arrayOverlaps matches any-tag-in-set (emails_import_mailgun.py:22-26)") {
    val df = Seq(
      (1, Seq("x", "purchase.PaidOff")),
      (2, Seq("unrelated")),
      (3, Seq[String]())).toDF("id", "tags")
    val out = df.filter(Cleanse.arrayOverlaps($"tags",
      Seq("purchase.PaidOff", "purchase.OnSchedule"))).select("id")
    assert(out.as[Int].collect().toSeq == Seq(1))
  }

  test("sqlLiteralEscape mirrors sql_utils.py:59-63") {
    val r = Seq("it's 100%").toDF("s")
      .select(Cleanse.sqlLiteralEscape($"s")).as[String].collect().head
    assert(r == "itCHR(39)s 100%%")
  }

  test("referenceDateFormat matches strftime('%b %d,%Y %H:%M:%S')") {
    val r = Seq("2024-01-02 03:04:05").toDF("s")
      .select(Cleanse.referenceDateFormat(to_timestamp($"s"))).as[String]
      .collect().head
    assert(r == "Jan 02,2024 03:04:05")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Cleanse, Normalize, Sources}

/** FIXTURES.md payload shapes driven end-to-end through the same operator
  * chain the reference applies to each feed. */
class FixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Mailgun feed: double-decode, flatten, tag filter, epoch-s parse " +
    "(emails_import_mailgun.py:12-41)") {
    val lines = Seq(
      """"{\"event\":\"delivered\",\"timestamp\":1704067200.5,\"recipient\":\"a@b.c\",\"tags\":[\"com.sunbit.notification.purchase.PaidOff\"],\"delivery-status\":{\"code\":250,\"message\":\"OK\"},\"message\":{\"size\":1234}}"""",
      """"{\"event\":\"delivered\",\"timestamp\":1704067201.0,\"recipient\":\"x@y.z\",\"tags\":[\"irrelevant\"],\"delivery-status\":{\"code\":250,\"message\":\"OK\"},\"message\":{\"size\":99}}"""")
      .toDS()
    val raw = Sources.readDoubleEncodedJson(lines)
    val flat = Normalize.flattenStruct(raw, Seq("delivery-status", "message"))
    assert(flat.columns.toSet.intersect(Set("code", "size")).size == 2)
    val relevant = flat.filter(Cleanse.arrayOverlaps($"tags",
        Seq("com.sunbit.notification.purchase.PaidOff")))
      .withColumn("ts", Cleanse.fromEpochSeconds($"timestamp"))
    val r = Normalize.sanitizeColumnNames(relevant).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("recipient") == "a@b.c")
  }

  test("Mongo feed: extended-JSON $date epoch-ms, $-stripping renames " +
    "(emails_import_mongo.py:42-56)") {
    val docSchema = StructType(Seq(
      StructField("localDateTime", StructType(Seq(StructField("$date", LongType)))),
      StructField("notificationData", StringType)))
    val df = Seq("""{"localDateTime":{"$date":1704067200123},"notificationData":"{\"notificationType\":\"PaymentOnSchedule\"}"}""")
      .toDF("_doc")
      .select(from_json($"_doc", docSchema).as("d"))
      .select($"d.localDateTime.$$date".as("localDateTime.$date"),
        get_json_object($"d.notificationData", "$.notificationType")
          .as("notificationType"))
    val cleaned = Normalize.sanitizeColumnNames(
      df.withColumn("ts", Cleanse.fromEpochMillis($"`localDateTime.$$date`")))
    assert(cleaned.columns.contains("localdatetime_date"))
    val r = cleaned.select(Cleanse.tsStr($"ts")).as[String].collect().head
    assert(r == "2024-01-01 00:00:00.123000")
  }

  test("Iterable feed: schema drift + nullable userId str->long " +
    "(emails_import.py:22-30)") {
    val f1 = Seq("""{"userId":"42","eventName":"open","createdAt":"2024-01-02 10:00:00","profileUpdatedAt":"2024-01-02 11:00:00"}""").toDS()
    val f2 = Seq("""{"userId":null,"eventName":"click","createdAt":"2024-01-03 10:00:00"}""").toDS()
    val u = Sources.readNdjsonLines(f1)
      .unionByName(Sources.readNdjsonLines(f2), allowMissingColumns = true)
    assert(u.count() == 2)
    val typed = Cleanse.filterNotNullCast(u, "userId", LongType)
      .withColumn("createdAt", Cleanse.parseIso($"createdAt"))
    val r = typed.collect()
    assert(r.length == 1 && r.head.getAs[Long]("userId") == 42L)
  }

  test("colors.json: multiline array source, nested code struct flatten " +
    "(s3_to_silver.py:101-110)") {
    val json =
      """{"colors":[{"color":"red","category":"hue","code":{"rgba":[255,0,0,1],"hex":"#f00"}},
        |{"color":"green","category":"hue","code":{"rgba":[0,255,0,1],"hex":"#0f0"}}]}""".stripMargin
    val path = graft.ops.TempFiles.write("fixture_colors/colors.json", json)
    val df = Sources.readJsonMultiline(spark, path)
      .select(explode($"colors").as("c")).select($"c.*")
    val flat = Normalize.flattenStruct(df, Seq("code"))
    assert(flat.columns.toSet == Set("color", "category", "rgba", "hex"))
    assert(flat.filter($"color" === "red").select($"hex").as[String]
      .collect().head == "#f00")
  }
}

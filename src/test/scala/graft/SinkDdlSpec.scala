package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SinkDdl

class SinkDdlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("schemaToDdl widens *url* and lands nested as SUPER (sql_utils.py:20-33)") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("image_url", StringType),
      StructField("name", StringType),
      StructField("tags", ArrayType(StringType)),
      StructField("geo", StructType(Seq(StructField("city", StringType)))),
      StructField("amount", DecimalType(10, 2)),
      StructField("ok", BooleanType)))
    val ddl = SinkDdl.schemaToDdl("t", schema)
    assert(ddl == """CREATE TABLE IF NOT EXISTS t ("id" BIGINT, """ +
      """"image_url" VARCHAR(2048), "name" VARCHAR(256), "tags" SUPER, """ +
      """"geo" SUPER, "amount" DECIMAL(10,2), "ok" BOOLEAN)""")
  }

  test("runSqlScript splits on ; and substitutes {} templates " +
    "(create_card_funnel_schema.py:12-21)") {
    val script =
      """CREATE TABLE {schem}_one (id INT) USING parquet;
        |CREATE TABLE {schem}_two (id INT) USING parquet;
        |""".stripMargin
    try {
      SinkDdl.runSqlScript(spark, script, Map("schem" -> "g"))
      assert(spark.catalog.tableExists("g_one"))
      assert(spark.catalog.tableExists("g_two"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_one")
      spark.sql("DROP TABLE IF EXISTS g_two")
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Normalize

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flattenStruct prefixes only colliding names (df_utils.py:8-11)") {
    val df = Seq((1L, "a")).toDF("id", "name")
      .select(col("id"), col("name"),
        struct(lit(7L).as("k"), lit("inner").as("name")).as("meta"))
    val flat = Normalize.flattenStruct(df, Seq("meta"))
    assert(flat.columns.toSeq == Seq("id", "name", "k", "meta_name"))
    val r = flat.collect().head
    assert(r.getAs[String]("name") == "a")
    assert(r.getAs[String]("meta_name") == "inner")
    assert(r.getAs[Long]("k") == 7L)
  }

  test("flattenStruct handles several structs sequentially") {
    val df = spark.range(1).select(col("id"),
      struct(lit(1).as("x")).as("s1"), struct(lit(2).as("x")).as("s2"))
    val flat = Normalize.flattenStruct(df, Seq("s1", "s2"))
    // s1.x lands bare as "x"; s2.x then collides with it -> s2_x
    assert(flat.columns.toSeq == Seq("id", "x", "s2_x"))
  }

  test("sanitizeName lowercases, maps ./-/space to _, strips $") {
    assert(Normalize.sanitizeName("C.Cust-Key") == "c_cust_key")
    assert(Normalize.sanitizeName("localDateTime.$date") == "localdatetime_date")
    assert(Normalize.sanitizeName("A B") == "a_b")
  }

  test("nullIfEmptyArray maps [] to null, keeps non-empty") {
    val df = Seq((1, Seq[String]()), (2, Seq("a"))).toDF("id", "xs")
    val out = Normalize.nullIfEmptyArray(df, "xs").orderBy("id").collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getSeq[String](1) == Seq("a"))
  }
}

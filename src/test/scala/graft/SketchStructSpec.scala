package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The structural sketch twins (round 7): `vocab_cms_struct` and
  * `agg_hll_struct` re-express the engine-internal sketch tiers
  * (`count_min_sketch` bytes, Datasketches HLL) first-principles over the
  * oracle-replayable FNV-1a hash, so their DuckDB oracles hash-check the
  * MACHINERY — row hashing, counter accumulation, min-probe, register
  * max-merge — that the production sketches' rows-only status leaves
  * uncheckable. This spec pins the kernel hashes to published test
  * vectors and the sketch-theoretic guarantees the oracles cannot state
  * (≥-exact, mergeability, estimate accuracy). */
class SketchStructSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fnv(s: String): Long =
    functions.Fnv1a64(Literal(s)).eval(null).asInstanceOf[Long]

  test("Fnv1a64 matches the published FNV-1a 64 test vectors") {
    // offset basis (empty input) and the reference vectors from the FNV
    // spec page (Noll): "a" -> 0xaf63dc4c8601ec8c
    assert(fnv("") == 0xcbf29ce484222325L)
    assert(fnv("a") == 0xaf63dc4c8601ec8cL)
    assert(fnv("hello") == 0xa430d84680aabd0bL)
  }

  test("MulWrap64 is the wrapping product ANSI mode otherwise blocks") {
    def mw(a: Long, b: Long): Long =
      functions.MulWrap64(Literal(a), Literal(b)).eval(null)
        .asInstanceOf[Long]
    assert(mw(Long.MaxValue, 2L) == -2L) // wraps, never throws
    assert(mw(0x9E3779B97F4A7C15L, 1L) == 0x9E3779B97F4A7C15L)
    // ANSI-on SQL multiply of the same operands throws ARITHMETIC_OVERFLOW
    // — the reason the kernel exists; if this starts passing, ANSI got
    // turned off and the kernel (plus every oracle that assumes wrapping)
    // should be re-audited. Intercepting the SPECIFIC exception (round-8
    // ADVICE): a parse error or missing session must fail the test, not
    // masquerade as the overflow signal.
    // (SparkArithmeticException itself is private[spark] at the Scala
    // level; ArithmeticException + the ARITHMETIC_OVERFLOW condition is
    // the public contract)
    val e = intercept[ArithmeticException] {
      spark.sql(s"SELECT ${Long.MaxValue}L * 2L").collect()
    }
    assert(e.isInstanceOf[org.apache.spark.SparkThrowable] &&
      e.asInstanceOf[org.apache.spark.SparkThrowable]
        .getCondition == "ARITHMETIC_OVERFLOW",
      s"expected the ANSI overflow error class, got: $e")
  }

  test("mistyped kernel calls fail at ANALYSIS with the argument named, " +
    "never executor-side with a ClassCastException (round-8 ADVICE)") {
    val bad1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_fnv1a64(42)").collect()
    }
    assert(bad1.getMessage.contains("must be STRING"), bad1.getMessage)
    val bad2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_mulwrap64('x', 1L)").collect()
    }
    assert(bad2.getMessage.contains("'left' must be BIGINT"), bad2.getMessage)
    val bad3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_mulwrap64(1L, 'x')").collect()
    }
    assert(bad3.getMessage.contains("'right' must be BIGINT"), bad3.getMessage)
    // well-typed calls still work through the same SQL surface
    val ok = spark.sql(
      "SELECT graft_fnv1a64('a') AS f, graft_mulwrap64(2L, 3L) AS m")
      .collect().head
    assert(ok.getLong(0) == 0xaf63dc4c8601ec8cL && ok.getLong(1) == 6L)
    // a bare SQL NULL is NOT a type error (round-9, ADVICE r8 #4): it
    // passes analysis and evaluates to NULL, like the built-in kernels
    val nulls = spark.sql(
      "SELECT graft_fnv1a64(NULL) AS f, graft_mulwrap64(NULL, 1L) AS m," +
        " graft_mulwrap64(1L, NULL) AS m2").collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("vocab_cms_struct: CMS never underestimates and the counter table " +
    "is model-sized with row-sums equal to the token count") {
    val dir = "/root/testdata/sf0.001"
    val out = Queries.vocabCmsStruct(spark, dir).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
        s"CMS underestimated '${r.getAs[String]("tok")}'")
      assert(r.getAs[Long]("overestimate") ==
        r.getAs[Long]("est_cnt") - r.getAs[Long]("exact_cnt"))
    }
    // rebuild the counters the query aggregates internally: each of the 4
    // rows must partition the full token stream (sum of counters = N) and
    // the table stays <= 4 x 1024 rows — the "model-sized, mergeable"
    // claim the 100 TB shape rests on
    val toks = ops.Tables.table(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    // rebuilt from Queries.CmsStructMults — the SAME field the query and
    // the interpolated oracle read, so a drifted multiplier copy cannot
    // slip past this suite
    assert(Queries.CmsStructMults.length == 4 &&
      Queries.CmsStructMults.forall(a => a % 2 == 1 && a > 0 && a < (1L << 36)),
      "CMS multipliers must be four odd 36-bit constants (INT128-safe oracle)")
    val counters = toks
      .select(col("tok"), call_function("graft_fnv1a64", col("tok")).as("h"))
      .select(posexplode(array(Queries.CmsStructMults.map(a =>
        shiftrightunsigned(
          call_function("graft_mulwrap64", col("h"), lit(a)), 54)): _*))
        .as(Seq("r", "bucket")))
      .groupBy($"r", $"bucket").count()
    assert(counters.count() <= 4L * 1024L)
    val rowSums = counters.groupBy($"r").agg(sum($"count").as("s"))
      .collect().map(_.getAs[Long]("s")).toSeq
    assert(rowSums.length == 4 && rowSums.forall(_ == n),
      s"counter rows do not partition the stream: $rowSums != $n")
    // buckets are the top 10 bits of the scrambled hash
    counters.select($"bucket").collect()
      .foreach(r => assert((0L to 1023L).contains(r.getLong(0))))
  }

  test("agg_hll_struct: registers merge by max (sketch mergeability) and " +
    "the raw estimate lands inside the m=32 error envelope") {
    // mergeability on sf0.001: registers of (first half UNION second
    // half) merged by max == registers of the whole — the property that
    // makes daily->weekly rollup exact on sketch state, never raw data
    val ev = ops.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"),
        Queries.hllMixedHash(col("user_id")).as("h"))
      .select(col("event_type"),
        shiftrightunsigned(col("h"), 59).as("bucket"),
        (col("h") bitwiseAND lit(576460752303423487L)).as("rem"))
      .select(col("event_type"), col("bucket"),
        when(col("rem") === 0, 60)
          .otherwise(lit(60) - length(expr("conv(cast(rem as string), 10, 2)")))
          .as("rank"))
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"event_type", $"bucket").agg(max($"rank").as("reg"))
    val whole = regs(ev)
    val halves = regs(ev.filter(pmod($"rem", lit(2)) === 0))
      .union(regs(ev.filter(pmod($"rem", lit(2)) === 1)))
      .groupBy($"event_type", $"bucket").agg(max($"reg").as("reg"))
    assert(whole.exceptAll(halves).isEmpty && halves.exceptAll(whole).isEmpty,
      "register max-merge is not the whole-stream register table")
    // estimate quality on sf0.01, where weekly groups (~150 distinct
    // users) sit inside the raw estimator's validity regime n >= 2.5m=80:
    // measured worst |error| on the fixture is 20.6% (rse for m=32 is
    // ~18%); 35% is the alarm bound, not the expectation
    val rows = Queries.aggHllStruct(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("exact_users") >= 80).foreach { r =>
      val (a, e) = (r.getAs[Long]("approx_users"), r.getAs[Long]("exact_users"))
      assert(math.abs(a - e).toDouble / e <= 0.35,
        s"HLL estimate $a strayed past 35% of exact $e for " +
          s"${r.getAs[String]("event_type")}/wk${r.getAs[Long]("wk")}")
    }
    // registers stay tiny: rank is bounded by the 59 hashed bits + 1, and
    // at fixture cardinality (~150) must sit far below the BIGINT-div
    // safety line discussed in the query doc (several regs >= 58)
    val maxReg = rows.map(_.getAs[Long]("reg")).max
    assert(maxReg <= 40L, s"implausible register $maxReg on the fixture")
  }
}

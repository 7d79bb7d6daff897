package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Sources, TempFiles}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readDoubleEncodedJson decodes JSON-inside-JSON-string (s3_utils.py:73-78)") {
    val lines = Seq(
      """"{\"event\":\"opened\",\"n\":1}"""",
      """"{\"event\":\"clicked\",\"n\":2}"""").toDS()
    val df = Sources.readDoubleEncodedJson(lines)
    assert(df.columns.sorted.toSeq == Seq("event", "n"))
    assert(df.orderBy("n").select("event").as[String].collect().toSeq ==
      Seq("opened", "clicked"))
  }

  test("readPrunedNdjson prunes by modification time (s3_utils.py:84 " +
    "last_modified >= s_date)") {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    val sub = "mtime_prune_spec"
    TempFiles.write(s"$sub/fresh-rows.json", """{"id":1}""" + "\n" + """{"id":2}""")
    val old = TempFiles.write(s"$sub/stale-rows.json", """{"id":3}""")
    Files.setLastModifiedTime(Paths.get(old),
      FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    val cutoff = java.time.LocalDateTime
      .ofInstant(java.time.Instant.now().minusSeconds(3600),
        java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)
    val df = Sources.readPrunedNdjson(spark, TempFiles.dir(sub), "*.json",
      modifiedAfter = Some(cutoff))
    assert(df.orderBy("id").select("id").as[Long].collect().toSeq == Seq(1L, 2L))
  }

  test("readCsvPermissive routes malformed lines to quarantine, parses the rest") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val lines = Seq("1,alice,2.5", "oops,bob,1.0", "2,carol,3.25",
      "3,dave,4.0,extra,cols").toDS()
    val parsed = Sources.readCsvPermissive(lines, schema)
    val good = parsed.filter($"_corrupt_record".isNull)
    val bad = parsed.filter($"_corrupt_record".isNotNull)
    assert(good.count() == 2)
    assert(good.orderBy("id").select("name").as[String].collect().toSeq ==
      Seq("alice", "carol"))
    // quarantine keeps the raw line for replay/debugging
    assert(bad.select("_corrupt_record").as[String].collect().toSet ==
      Set("oops,bob,1.0", "3,dave,4.0,extra,cols"))
  }

  test("readKafkaEnvelope projects payload alongside envelope (kafka_s3_to_silver.py:8-11)") {
    val lines = Seq(
      """{"topic":"t","partition":0,"offset":10,"key":"k1","value":{"appId":5,"status":"OK"}}""")
      .toDS()
    val df = Sources.readKafkaEnvelope(lines)
    assert(df.columns.toSet == Set("topic", "partition", "offset", "key", "appId", "status"))
    val r = df.collect().head
    assert(r.getAs[Long]("appId") == 5L)
    assert(r.getAs[String]("topic") == "t")
  }

  test("readNdjsonLines parses schema-drifting lines with null fill (U1)") {
    val lines = Seq("""{"a":1,"b":"x"}""", """{"a":2,"c":true}""").toDS()
    val df = Sources.readNdjsonLines(lines)
    assert(df.columns.sorted.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 2)
    assert(df.filter($"b".isNull || $"c".isNull).count() == 2)
  }

  test("readParquetMerged unions generations by name; pushdown survives the merge") {
    val base = TempFiles.dir("mergeschema_spec")
    Seq((1L, "x")).toDF("id", "name").write.mode("overwrite")
      .parquet(s"$base/v1")
    Seq((2L, 7L)).toDF("id", "score").write.mode("overwrite")
      .parquet(s"$base/v2")
    val df = Sources.readParquetMerged(spark, Seq(s"$base/v1", s"$base/v2"))
    assert(df.columns.sorted.toSeq == Seq("id", "name", "score"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[String]("name") == "x" && rows(0).isNullAt(rows(0).fieldIndex("score")))
    assert(rows(1).getAs[Long]("score") == 7L && rows(1).isNullAt(rows(1).fieldIndex("name")))
    // predicate on the shared column still reaches the parquet scan
    val plan = df.filter($"id" === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), EqualTo(id,2)]"),
      s"missing pushdown:\n$plan")
  }

  test("manifest-pruned scan plans only the overlapping files and still " +
    "equals the full-table filter") {
    val sf = "/root/testdata/sf0.001"
    val pruned = Queries.scanManifestPruned(spark, sf).collect().map(_.toSeq)
    val survivors = Queries.manifestSurvivors(spark, sf)
    // the 9d window [01-09, 01-18) overlaps exactly weeks w1 and w2 of 4
    assert(survivors.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet ==
      Set("w1.parquet", "w2.parquet"),
      s"pruning should keep exactly 2 of 4 files: $survivors")
    // equality vs the unpruned scan — pruning must be invisible to results
    import org.apache.spark.sql.functions._
    val full = ops.Tables.table(spark, sf, "events")
      .filter(col("ts") >= lit("2024-01-09 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-18 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type")).collect().map(_.toSeq)
    assert(pruned.toSeq == full.toSeq)
  }

  test("dq_mad matches a driver-side exact median/MAD recomputation " +
    "per group") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val out = Queries.dqMad(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val cents = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    cents.groupBy(_._1).foreach { case (et, vs) =>
      val xs = vs.map(_._2.toDouble).toSeq
      val m = med(xs)
      val mad = med(xs.map(x => math.abs(x - m))) // deviations keep .5s
      val outliers = xs.count(x => math.abs(x - m) > 3 * 1.4826 * mad)
      val (n, nOut, madOut) = out(et)
      assert(n == xs.length && madOut == mad && nOut == outliers,
        s"$et: got ${out(et)}, expected (${xs.length}, $outliers, $mad)")
    }
  }

  test("partition-pruned read touches exactly the 3 matching day " +
    "directories (static pruning on the scan node)") {
    val sf = "/root/testdata/sf0.001"
    val q = Queries.scanPartitionPruned(spark, sf)
    q.collect() // force execution so the AQE plan is final
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val fs = scans(q.queryExecution.executedPlan)
    assert(fs.nonEmpty, "expected a FileSourceScanExec in the plan")
    val selected = fs.map(_.selectedPartitions.partitionCount).sum
    assert(selected == 3,
      s"pruning must touch 3 day partitions, touched $selected")
    assert(fs.exists(_.partitionFilters.nonEmpty),
      "scan must carry partition filters")
  }
}

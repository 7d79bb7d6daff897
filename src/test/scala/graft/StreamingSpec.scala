package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamTwins

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("kafka stand-in stream is schema-compatible with the real " +
    "spark-sql-kafka source (one-line connector swap proven by test)") {
    val shaped = StreamTwins.kafkaShapedStream(spark, sf)
    val got = shaped.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val want = StreamTwins.KafkaSourceSchema.fields
      .map(f => (f.name, f.dataType)).toSeq
    // name + type + ORDER must match the connector's row schema exactly
    // (nullability differs only on the stand-in's literal timestamp cols)
    assert(got == want,
      s"stand-in schema diverged from the Kafka connector's:\n" +
        s"  got  $got\n  want $want")
    // and the decode path consumes exactly that schema: binary value →
    // from_json payload with every payload field surfaced
    val decoded = StreamTwins.decodeKafkaEnvelope(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StreamTwins.KafkaSourceSchema))
    val payloadCols = StreamTwins.KafkaPayloadSchema.fieldNames.toSet
    assert(payloadCols.subsetOf(decoded.columns.toSet),
      s"decode must surface payload columns: ${decoded.columns.toSeq}")
  }

  test("appendAvailableNow is incremental: second run appends nothing new") {
    val out = Files.createTempDirectory("graft_append_out").toString
    val ckpt = Files.createTempDirectory("graft_append_ckpt").toString
    val src = StreamTwins.eventsStream(spark, sf)
    StreamTwins.appendAvailableNow(src, out, ckpt)
    val n1 = spark.read.parquet(out).count()
    // same checkpoint, no new files → no new rows (the exists-protocol twin)
    StreamTwins.appendAvailableNow(StreamTwins.eventsStream(spark, sf), out, ckpt)
    val n2 = spark.read.parquet(out).count()
    assert(n1 > 0)
    assert(n1 == n2)
  }

  test("stream sessionize equals batch sessionization minus each user's " +
    "open tail session") {
    val streamed = StreamTwins.streamSessionize(spark, sf)
      .collect().map(_.toSeq)
    val batch = ops.Sessionize.sessionsByWindow(
        ops.Tables.table(spark, sf, "events"), 30)
    val expected = batch
      .withColumn("mx", org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("session_idx")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(org.apache.spark.sql.functions.col("session_idx") <
        org.apache.spark.sql.functions.col("mx"))
      .select("user_id", "session_idx", "n_events",
        "session_start", "session_end")
      .orderBy("user_id", "session_idx")
      .collect().map(_.toSeq)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == expected.toSeq)
  }

  test("flatMapGroupsWithState holds open sessions across runs and emits " +
    "them on event-time timeout (checkpointed state)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_sess_src").toString
    val out = Files.createTempDirectory("graft_sess_out").toString
    val ckpt = Files.createTempDirectory("graft_sess_ckpt").toString
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L

    def runOnce(): Unit = {
      val events = spark.readStream
        .schema("event_id LONG, user_id LONG, tsMicros LONG").json(src)
        .withColumn("ts", org.apache.spark.sql.functions
          .timestamp_micros($"tsMicros".cast("long")))
      val q = StreamTwins.sessionizeStream(events, 30, "1 hour").toDF()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def micros(h: Double): Long = t0 + (h * 3600 * 1000000L).toLong
    def write(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      Files.writeString(java.nio.file.Paths.get(src, name),
        rows.map { case (e, u, ts) =>
          s"""{"event_id":$e,"user_id":$u,"tsMicros":$ts}""" }.mkString("\n"))

    // run 1: user 1 — session A (2 events), then a gap > 30 min opens B
    write("b1.json", Seq((1L, 1L, micros(0)), (2L, 1L, micros(0.1)),
      (3L, 1L, micros(2))))
    runOnce()
    val r1 = spark.read.parquet(out).as[ops.Session].collect()
    assert(r1.map(s => (s.user_id, s.session_idx, s.n_events)).toSet ==
      Set((1L, 1L, 2L))) // session A closed in-batch; B held in state

    // run 2: user 2 far in the future — advances the watermark
    write("b2.json", Seq((4L, 2L, micros(100))))
    runOnce()
    // run 3: another user-2 event; at batch start the watermark (99h) is
    // past user 1's timeout (2h30m) → held session B emitted by timeout
    write("b3.json", Seq((5L, 2L, micros(101))))
    runOnce()
    val r3 = spark.read.parquet(out).as[ops.Session].collect()
    assert(r3.map(s => (s.user_id, s.session_idx, s.n_events)).toSet
      .contains((1L, 2L, 1L)),
      s"timeout session missing from ${r3.toSeq}")
  }

  test("streamToJdbc lands micro-batches in the JDBC table and re-runs " +
    "are incremental (the reference's S3-to-Redshift pipeline shape)") {
    val url = "jdbc:derby:memory:graftstream;create=true"
    val props = new java.util.Properties
    val src = Files.createTempDirectory("graft_sj_src").toString
    val ckpt = Files.createTempDirectory("graft_sj_ckpt").toString
    def run(): Unit = StreamTwins.streamToJdbc(
      spark.readStream.schema("id LONG, name STRING").json(src),
      url, "t_stream_jdbc", ckpt)
    Files.writeString(java.nio.file.Paths.get(src, "a.json"),
      """{"id":1,"name":"a"}""" + "\n" + """{"id":2,"name":"b"}""")
    run()
    assert(spark.read.jdbc(url, "t_stream_jdbc", props).count() == 2)
    // no new files → the checkpoint makes the second run a no-op
    run()
    assert(spark.read.jdbc(url, "t_stream_jdbc", props).count() == 2)
    // a new file appends only its own rows
    Files.writeString(java.nio.file.Paths.get(src, "b.json"),
      """{"id":3,"name":"c"}""")
    run()
    assert(spark.read.jdbc(url, "t_stream_jdbc", props)
      .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("streamToJdbcExactlyOnce: a replayed batch lands no duplicate rows") {
    val url = "jdbc:derby:memory:graftxonce;create=true"
    val props = new java.util.Properties
    val src = Files.createTempDirectory("graft_xo_src").toString
    val ckpt = Files.createTempDirectory("graft_xo_ckpt").toString
    Files.writeString(java.nio.file.Paths.get(src, "a.json"),
      """{"id":1,"name":"a"}""" + "\n" + """{"id":2,"name":"b"}""")
    StreamTwins.streamToJdbcExactlyOnce(
      spark.readStream.schema("id LONG, name STRING").json(src),
      url, "t_stream_xonce", ckpt)
    val n1 = spark.read.jdbc(url, "t_stream_xonce", props).count()
    assert(n1 == 2)
    // simulate a foreachBatch REPLAY of batch 0 (crash after partial write,
    // before the checkpoint commit): the same batch body runs again —
    // the batchId-keyed upsert must converge, not duplicate
    StreamTwins.jdbcBatchUpsert(
      spark.read.schema("id LONG, name STRING").json(src), 0L,
      url, "t_stream_xonce")
    val replayed = spark.read.jdbc(url, "t_stream_xonce", props)
    assert(replayed.count() == 2,
      s"replay duplicated rows: ${replayed.collect().toSeq}")
    // and a genuinely new batch still appends
    Files.writeString(java.nio.file.Paths.get(src, "b.json"),
      """{"id":3,"name":"c"}""")
    StreamTwins.streamToJdbcExactlyOnce(
      spark.readStream.schema("id LONG, name STRING").json(src),
      url, "t_stream_xonce", ckpt)
    assert(spark.read.jdbc(url, "t_stream_xonce", props)
      .orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("stream dedup emits each key exactly once") {
    val keys = StreamTwins.streamDedupKeys(spark, sf)
    val batch = ops.Tables.table(spark, sf, "events")
      .select("user_id", "event_type").distinct()
    assert(keys.count() == batch.count())
  }

  test("stream drift monitors per batch: three landed files → three KS " +
    "rows, single-batch run equals the batch gate") {
    import org.apache.spark.sql.functions.col
    val ss = StreamTwins.streamSession(spark)
    val docs = ops.Tables.table(ss, sf, "documents")
    val baseline = docs.filter(col("doc_id") % 2 === 0)
      .select(col("n_chars"), org.apache.spark.sql.functions.lit(true).as("in_a"))
    // three-file landing: each file is its own micro-batch under
    // maxFilesPerTrigger=1, so the monitor emits one KS row per arrival
    val landing = Files.createTempDirectory("drift3").toString
    val odd = docs.filter(col("doc_id") % 2 === 1)
    Seq(0, 1, 2).foreach { i =>
      odd.filter(col("doc_id") % 3 === i).repartition(1)
        .write.mode("append").parquet(landing)
    }
    val delta = ss.readStream.schema(StreamTwins.docsSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    val perBatch = StreamTwins.drainDriftStream(ss, baseline, delta).collect()
    assert(perBatch.length == 3, s"expected 3 micro-batches: ${perBatch.length}")
    assert(perBatch.forall { r =>
      val ks = r.getAs[Double]("ks_stat"); ks >= 0.0 && ks <= 1.0
    })
    // each batch tests ONLY its own arrivals: sample sizes are per-slice
    assert(perBatch.map(_.getAs[Long]("n_b")).sum == odd.count())

    // and the declared single-batch twin reproduces the batch gate exactly
    val streamed = StreamTwins.streamDrift(spark, sf).collect().map(_.toSeq)
    val batch = Queries.dqDrift(spark, sf).collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("incremental dedup join never broadcasts the corpus index") {
    // the index is O(corpus) — at scale it is not broadcastable; the join
    // must shuffle-partition the index side (same builder drives the
    // streaming query, whose micro-batch planner honors the same hints)
    import org.apache.spark.sql.functions.col
    val docs = ops.Tables.table(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val sh = text.NearDup.shingleTableCached(corpus, "doc_id", "text", "spec-inc")
    val banded = text.NearDup.bandedTableCached(corpus, "doc_id", "text", "spec-inc")
    val joined = StreamTwins.incrementalDedupJoin(
      docs.filter(col("doc_id") % 10 === 0), banded, sh)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastExchange"),
      s"corpus index must not broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"index side should shuffle-hash join:\n$plan")
    // and the de-broadcast join is still the same dedup
    val expected = text.NearDup.minhashDupPairsIncrementalCached(
      docs, "doc_id", "text", 0.8, col("id") % 10 === 0, sf)
    assert(joined.select("new_id", "base_id").exceptAll(
      expected.select("new_id", "base_id")).isEmpty)
  }

  test("cdcMerge converges to the same state under any batching, and " +
    "tombstones out-rank the rows they kill") {
    // the fold picks winners by change TIME, not arrival order, so it is
    // associative/commutative over batches: 1-batch and 3-batch folds of
    // the same feed must be bit-identical (the replay-safety property the
    // streaming CDC apply leans on)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val feed = Seq(
      (1L, "2024-01-01 00:00:00", 10L, "U", "signup"),
      (1L, "2024-01-03 00:00:00", 30L, "U", "click"),
      (1L, "2024-01-02 00:00:00", 20L, "U", "view"),     // late arrival
      (2L, "2024-01-01 00:00:00", 11L, "U", "signup"),
      (2L, "2024-01-05 00:00:00", 50L, "D", "error"),    // tombstone wins
      (2L, "2024-01-04 00:00:00", 40L, "U", "purchase"), // late, pre-delete
      (3L, "2024-01-01 00:00:00", 12L, "D", "error"),
      (3L, "2024-01-02 00:00:00", 22L, "U", "signup"),   // resurrect after D
      (4L, "2024-01-01 00:00:00", 13L, "U", "view"),
      (4L, "2024-01-01 00:00:00", 14L, "U", "click"))    // ts tie → max id
      .toDF("user_id", "ts_s", "event_id", "op", "status")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_id"), col("op"), col("status"))
    val empty = feed.limit(0)
    val oneShot = StreamTwins.cdcMerge(empty, feed)
    val batched = feed.filter(col("event_id") % 3 === 0)
    val b2 = feed.filter(col("event_id") % 3 === 1)
    val b3 = feed.filter(col("event_id") % 3 === 2)
    val folded = StreamTwins.cdcMerge(StreamTwins.cdcMerge(
      StreamTwins.cdcMerge(empty, batched), b2), b3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(rows(oneShot) == rows(folded))
    // read view: tombstoned key 2 is gone, resurrected key 3 survives,
    // tie on key 4 resolved by event_id
    val live = oneShot.filter(col("op") =!= "D")
      .select("user_id", "status").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(live == Seq((1L, "click"), (3L, "signup"), (4L, "click")))
  }

  test("stream-stream left outer: matched rows equal the batch inner " +
    "join; null rows emit exactly for watermark-expired unmatched " +
    "purchases") {
    import org.apache.spark.sql.functions._
    val out = StreamTwins.streamStreamLeftOuter(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.values.map(_._3).sum > 0, "some purchases must be unmatched")
    // matched side must equal the batch interval inner join
    val ev = ops.Tables.table(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("ts").as("v_ts"))
    val inner = p.join(v, col("v_user") === col("user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("v_ts") <= col("p_ts"))
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (u, (_, nMatched, _)) =>
      assert(inner.getOrElse(u, 0L) == nMatched,
        s"user $u matched-count drift vs batch inner join")
    }
  }

  test("streaming SCD2 maintenance converges to the batch rebuild " +
    "across three real micro-batches") {
    val streamed = StreamTwins.streamScd2(spark, sf).collect().map(_.toSeq)
    val batch = Queries.scd2Build(spark, sf).collect().map(_.toSeq)
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("a bucketed signature index joins the delta with no static-side " +
    "shuffle (the 100 TB deployment shape)") {
    // the scale story for the incremental dedup is an index TABLE bucketed
    // on the probe key: the per-batch join then shuffles only the delta —
    // demonstrated, not just documented
    import org.apache.spark.sql.functions.col
    val docs = ops.Tables.table(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val sh = text.NearDup.shingleTableCached(corpus, "doc_id", "text", "spec-bkt")
    val banded = text.NearDup.bandedTableCached(corpus, "doc_id", "text", "spec-bkt")
    val idx = "bk_band_index"
    ops.SinkDdl.dropManagedTable(spark, idx)
    banded.write.bucketBy(4, "band", "bh").format("parquet").saveAsTable(idx)
    val delta = docs.filter(col("doc_id") % 10 === 0)

    val viaBucketed = StreamTwins.incrementalDedupJoin(delta, spark.table(idx), sh)
    val viaCached = StreamTwins.incrementalDedupJoin(delta, banded, sh)
    assert(viaBucketed.select("new_id", "base_id").exceptAll(
      viaCached.select("new_id", "base_id")).isEmpty &&
      viaCached.select("new_id", "base_id").exceptAll(
        viaBucketed.select("new_id", "base_id")).isEmpty)

    // cached (unpartitioned) index: BOTH candidate-join sides shuffle on
    // the band key; bucketed index: only the delta side does
    def bandShuffles(df: org.apache.spark.sql.DataFrame): Int =
      "hashpartitioning\\(band".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(bandShuffles(viaCached) == 2,
      "expected both sides of the cached-index join to shuffle")
    assert(bandShuffles(viaBucketed) == 1,
      "bucketed index must join pre-partitioned (delta-side shuffle only)")
  }

  test("streaming top-k leaderboard equals the batch aggregate over the " +
    "whole feed, folded through 3 mergeable-partial state versions") {
    import org.apache.spark.sql.functions._
    val got = StreamTwins.streamTopK(spark, sf).collect().map(_.toSeq)
    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("total_cents").desc, col("user_id"))
    val expected = ops.Tables.table(spark, sf, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum((ops.Cleanse.dec2(col("value")) * 100).cast("long"))
        .as("total_cents"), count(lit(1)).as("n_events"))
      .withColumn("rk", row_number().over(byType).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("user_id"),
        col("total_cents"), col("n_events"))
      .orderBy(col("event_type"), col("rk"))
      .collect().map(_.toSeq)
    assert(got.toSeq == expected.toSeq)
    // the fold really crossed 3 micro-batches (one per feed file)
    val stateRoot = ops.TempFiles.dir(
      s"stream_topk_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
  }

  test("streaming reservoir converges to the batch draw exactly through " +
    "3 k-row state versions (top-k folds are mergeable)") {
    val got = StreamTwins.streamSample(spark, sf).collect().map(_.toSeq)
    val batch = Queries.sampleReservoir(spark, sf).collect().map(_.toSeq)
    assert(got.toSeq == batch.toSeq)
    val stateRoot = ops.TempFiles.dir(
      s"stream_sample_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
    // the state never outgrows k rows
    assert(spark.read.parquet(
      s"$stateRoot/v${StreamTwins.listStateVersions(stateRoot).max}")
      .count() == 100)
  }

  test("streaming HLL merge equals the batch mergeable-sketch estimates " +
    "exactly (register merges are batching-invariant)") {
    import org.apache.spark.sql.functions._
    val got = StreamTwins.streamHllMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = Queries.aggHllMerge(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("approx_users"))
      .toMap
    assert(got == batch,
      "stream state estimates must equal the batch sketch estimates")
    val stateRoot = ops.TempFiles.dir(
      s"stream_hll_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
  }

  test("streaming OLS equals the batch regression exactly through 3 " +
    "mergeable-sufficient-statistic state versions") {
    val got = StreamTwins.streamOls(spark, sf).collect().map(_.toSeq).toSeq
    val batch = Queries.aggOls(spark, sf).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == batch,
      "folded sufficient statistics must reproduce the batch closed forms bit-for-bit")
    val stateRoot = ops.TempFiles.dir(
      s"stream_ols_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
    // the state table is groups-sized (one row per return flag), never
    // rows-sized — the MV's whole point
    val last = StreamTwins.listStateVersions(stateRoot).max
    assert(spark.read.parquet(s"$stateRoot/v$last").count() == batch.size.toLong)
  }

  test("streaming quantile sketch equals the batch sketch estimates " +
    "exactly (the k-hash-smallest sample fold is batching-invariant) and " +
    "state stays (types x k)-bounded") {
    val got = StreamTwins.streamQuantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    val batch = Queries.aggQuantileSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got.nonEmpty)
    assert(got == batch,
      "three micro-batches must fold to the identical sample and estimates")
    val stateRoot = ops.TempFiles.dir(
      s"stream_qsk_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
    val last = StreamTwins.listStateVersions(stateRoot).max
    val stateRows = spark.read.parquet(s"$stateRoot/v$last").count()
    assert(stateRows <= 5L * 256L, s"state must stay k-bounded, got $stateRows")
  }

  test("streaming entropy equals the batch entropy exactly (additive " +
    "cell-count folds) with cells-sized state") {
    val got = StreamTwins.streamEntropy(spark, sf).collect().map(_.toSeq).toSeq
    val batch = Queries.aggEntropy(spark, sf).collect().map(_.toSeq).toSeq
    assert(got.nonEmpty)
    assert(got == batch)
    val stateRoot = ops.TempFiles.dir(
      s"stream_ent_state_${ops.TempFiles.tag(sf)}")
    assert(StreamTwins.listStateVersions(stateRoot).size == 3)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._
import graft.ops.{Cleanse, Ev, Session}

/** Open-session state carried across micro-batches by
  * [[StreamTwins.sessionizeStream]]. */
case class OpenSess(idx: Long, n: Long, startMicros: Long, endMicros: Long)

/** Streaming event row: keeps the watermarked `ts` column itself so the
  * event-time watermark survives the typed projection into groupByKey. */
case class EvW(user_id: Long, event_id: Long, tsMicros: Long,
               ts: java.sql.Timestamp)

/** Structured Streaming twins of the batch contract (SURVEY.md §2.9).
  *
  * The reference consumes streamed Kafka topics as partitioned S3 JSON with
  * incremental file pickup (`card_funnel/emails_import.py:49-54`) and
  * event-time lower bounds (`:27`) — exactly Spark's file source + watermark
  * model. `Trigger.AvailableNow` runs the same declarative transform over
  * whatever has landed and terminates, which is the batch-twin execution the
  * reference's cron-style jobs imply. At scale the file source tracks
  * processed files in the checkpoint, so each run is incremental — no
  * re-listing-driven reprocessing.
  */
object StreamTwins {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def eventsSchemaWith(tsType: org.apache.spark.sql.types.DataType) =
    StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))

  /** events.ts physical type per sf dir, probed once per JVM: the footer
    * probe is a driver-side job (~60-80 ms) that EVERY events-backed
    * stream query used to re-run on each call — schema is a property of
    * the (immutable) lake files, so one probe per path serves every
    * caller (guide §1.2: don't re-compute what can't have changed). */
  private val tsTypeCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.DataType]()

  /** File-source stream over the events table (ns timestamps normalized to
    * µs exactly like the batch path in [[graft.ops.Tables]]). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file source requires a directory to monitor; expose the single
    // events parquet through a symlinked landing dir (read-only testdata).
    val dir = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_events_${graft.ops.TempFiles.tag(sfDir)}"))
    val link = dir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    // the lake has shipped events.ts both as TIMESTAMP(NANOS) (raw Long
    // under the legacy conf) and as plain µs timestamps — probe the file's
    // actual schema once (file sources need a declared schema up front)
    // and normalize either form to session-zone TIMESTAMP, exactly like
    // the batch path in [[graft.ops.Tables]]
    val physical = tsTypeCache.computeIfAbsent(s"$sfDir/events.parquet",
      p => spark.read.parquet(p).schema("ts").dataType)
    if (physical == LongType)
      spark.readStream.schema(eventsSchema).parquet(dir.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else
      spark.readStream.schema(eventsSchemaWith(physical)).parquet(dir.toString)
        .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  /** Stateful streaming operators bind one state store per shuffle
    * partition (a stream-stream join binds FOUR); inheriting a batch-sized
    * shuffle width makes per-micro-batch store setup dominate (measured at
    * sf0.1: the stream-stream join drops 15 s → 3.5 s going 32 → 8 state
    * partitions). Rather than toggling the shared session's
    * `spark.sql.shuffle.partitions` around each run — not re-entrant: a
    * concurrent batch query on the same session races on the conf
    * (round-2 advice) — each root session gets ONE dedicated streaming
    * session (`newSession()`: shared SparkContext and catalog, independent
    * conf) whose state width is set once at creation. On a real cluster
    * this mirrors sizing the streaming job's conf once — the checkpoint
    * pins it from then on. */
  val StatePartitions = 8

  private val streamSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** Marker conf identifying a session THIS object created: streamSession
    * must be idempotent — helpers like [[kafkaShapedStream]] take the
    * stream session as their `spark` and re-resolve it, which used to
    * nest a session-of-a-session (an extra catalog/conf copy that probe
    * listeners never saw). */
  private val SessionMarker = "spark.graft.stream.session"

  def streamSession(spark: SparkSession): SparkSession =
    if (spark.conf.getOption(SessionMarker).contains("idle")) spark
    else streamSessions.computeIfAbsent(spark, root => {
      val ss = root.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
      ss.conf.set(SessionMarker, "idle")
      // newSession resets runtime confs: re-establish the engine's
      // session invariants (nanos reads AND the UTC pin — the batch and
      // stream twins must agree on timestamp semantics)
      graft.ops.Tables.pinSession(ss)
      ss
    })

  private val noIdleSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** [[streamSession]] with NO-DATA micro-batches disabled — for stream
    * queries whose OUTPUT a no-data batch can never change: inner
    * stream-stream joins (emission is arrival-driven; the trailing batch
    * only evicts state) and first-arrival dedup (rows emit in the batch
    * they arrive). For those shapes the trailing empty batch re-plans the
    * query, reloads and re-commits every state store, and emits nothing —
    * measured 1.0-1.4 s of the stream-stream inner join's 3.3 s at sf0.1
    * (StreamProbe: batch 1, rows=0, addBatch ≈ 950 ms). Queries whose
    * emission is WATERMARK-driven (outer joins, append-mode window aggs,
    * event-time timeouts) must stay on [[streamSession]] — their no-data
    * batch is what flushes expired state. */
  def streamSessionNoIdle(spark: SparkSession): SparkSession =
    if (spark.conf.getOption(SessionMarker).contains("noidle")) spark
    else noIdleSessions.computeIfAbsent(spark, root => {
      val ss = root.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", StatePartitions.toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      ss.conf.set(SessionMarker, "noidle")
      graft.ops.Tables.pinSession(ss)
      ss
    })

  /** Run a streaming transform to completion against the data available now
    * and return the materialized result (memory sink). The caller builds
    * `df` on [[streamSession]]; the memory-sink temp view registers there,
    * keeping the root session's catalog clean. */
  def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** Streaming group-count — must equal the batch `agg_group_count`. */
  def fileSourceCounts(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      eventsStream(streamSession(spark), sfDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt")),
      s"stream_file_source_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}", "complete")
      .orderBy(col("event_type"))

  /** STREAMING Kafka-envelope consumption (S5's streaming mapping, SURVEY
    * §2.1): the reference's topics arrive as Kafka-envelope NDJSON; on a
    * live cluster this is `readStream.format("kafka")` + the SAME
    * `from_json` envelope parse — here the envelope stream is driven
    * through a file-backed landing (one file per Kafka partition, all
    * partitions drained in one AvailableNow batch exactly as the real
    * connector does) because no broker exists in the harness, which
    * exercises everything downstream of the source identically:
    * schema-declared envelope decode, payload projection, per-partition
    * consumption stats under `complete` output.
    * Shares `scan_kafka_envelope`'s oracle verbatim — the batch and
    * streaming reads of the same topic dump must agree. */
  /** The EXACT row schema `readStream.format("kafka")` produces
    * (spark-sql-kafka-0-10's record-to-row conversion: key/value binary,
    * topic string, partition int, offset long, timestamp + timestampType).
    * The file-backed stand-in below shapes its stream to THIS schema
    * before any decode, and `KafkaSchemaSpec` pins the equality — so
    * swapping in the real connector on a cluster is a one-line source
    * change with everything downstream proven compatible by test. */
  val KafkaSourceSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The payload carried in each Kafka message value (the reference's
    * card-application order events). */
  val KafkaPayloadSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  /** Decode a Kafka-schema frame (real connector or the stand-in — both
    * satisfy [[KafkaSourceSchema]]) into the parsed envelope columns:
    * binary key/value → string key + `from_json` payload. This is the
    * ONLY decode path; batch `scan_kafka_envelope`'s oracle applies. */
  def decodeKafkaEnvelope(kafka: DataFrame): DataFrame =
    kafka.select(col("topic"),
      col("partition").cast(LongType).as("partition"), col("offset"),
      col("key").cast(StringType).as("key"),
      from_json(col("value").cast(StringType), KafkaPayloadSchema).as("v"))
      .select(col("topic"), col("partition"), col("offset"), col("key"),
        col("v.*"))

  /** The file-backed Kafka stand-in stream, shaped to
    * [[KafkaSourceSchema]] — one NDJSON landing file per Kafka partition,
    * all four consumed in ONE AvailableNow micro-batch, the way the real
    * connector drains a backlog: topic partitions are PARALLEL within a
    * batch, not sequential batches (the previous `maxFilesPerTrigger=1`
    * serialized one partition per micro-batch — 4× the per-batch
    * planning/state-commit fixed cost for a shape no Kafka consumer has;
    * complete-mode aggregation output is batching-independent, so the
    * result is byte-identical — guide §1.2/§2: cut passes that buy
    * nothing). Multi-batch incremental pickup stays exercised by the
    * date-sliced MV feeds below. On a cluster the body of this method is
    * replaced by
    * `spark.readStream.format("kafka").option("subscribe", …).load()`. */
  def kafkaShapedStream(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val landing = kafkaLanding(ss, sfDir)
    val envelope = StructType(Seq(
      StructField("topic", StringType), StructField("partition", LongType),
      StructField("offset", LongType), StructField("key", StringType),
      StructField("value", KafkaPayloadSchema)))
    ss.readStream
      .text(landing.toString)
      .select(from_json(col("value"), envelope).as("m"))
      .select(col("m.key").cast(BinaryType).as("key"),
        to_json(col("m.value")).cast(BinaryType).as("value"),
        col("m.topic").as("topic"),
        col("m.partition").cast(IntegerType).as("partition"),
        col("m.offset").as("offset"),
        lit("2024-01-01 00:00:00").cast(TimestampType).as("timestamp"),
        lit(0).as("timestampType"))
  }

  private def kafkaLanding(ss: SparkSession,
                           sfDir: String): java.nio.file.Path = {
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_kafka_feed_$tag"))
    // land one NDJSON file per Kafka partition (crash-safe: completeness
    // keyed on ALL expected files; slices staged then moved)
    val complete = (0 to 3).forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"p$i.json")))
    if (!complete) {
      val lines = graft.ops.Tables.table(ss, sfDir, "orders")
        .select(pmod(col("o_orderkey"), lit(4)).cast(LongType).as("part"),
          to_json(struct(
            lit("card.applications").as("topic"),
            pmod(col("o_orderkey"), lit(4)).cast(LongType).as("partition"),
            col("o_orderkey").as("offset"),
            col("o_orderkey").cast(StringType).as("key"),
            struct(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice")).as("value"))).as("value"))
      (0 to 3).foreach { i =>
        val part = java.nio.file.Paths.get(
          graft.ops.TempFiles.dir(s"stream_kafka_feed_build_$tag/p$i"))
        lines.filter(col("part") === i).select(col("value"))
          .repartition(1).write.mode("overwrite").text(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".txt"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"p$i.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    landing
  }

  def streamKafkaEnvelope(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val parsed = decodeKafkaEnvelope(kafkaShapedStream(ss, sfDir))
    runToMemory(
      parsed.groupBy(col("partition"))
        .agg(count(lit(1)).as("n_msgs"), max(col("offset")).as("max_offset"),
          sum(Cleanse.dec2(col("o_totalprice"))).cast(DecimalType(18, 4))
            .cast(DoubleType).as("sum_price")),
      s"stream_kafka_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}", "complete")
      .orderBy(col("partition"))
  }

  /** Append-only load into a silver parquet table (`Trigger.AvailableNow`
    * + checkpoint = the reference's incremental exists-protocol,
    * `emails_import.py:47-54`: the file-source checkpoint remembers
    * processed files, so each run appends only new arrivals). */
  def appendAvailableNow(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Stream → JDBC terminal sink, the reference's actual end-to-end
    * pipeline (incremental S3 pickup → silver → Redshift,
    * `emails_import.py:49-54` + `s3_to_silver.py:112`): `foreachBatch`
    * appends each micro-batch through [[graft.ops.SinkDdl.writeJdbc]]
    * (first batch creates the table with the width-policy DDL). The file
    * source checkpoint makes re-runs incremental — a second AvailableNow
    * run with no new files writes nothing. Append is at-least-once on
    * mid-batch failure (the standard foreachBatch caveat);
    * [[streamToJdbcExactlyOnce]] is the batchId-keyed idempotent form. */
  def streamToJdbc(df: DataFrame, url: String, table: String,
                   checkpointDir: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.SinkDdl.writeJdbc(batch, url, table,
          mode = if (batchId == 0) org.apache.spark.sql.SaveMode.Overwrite
                 else org.apache.spark.sql.SaveMode.Append)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** The idempotent per-batch body of [[streamToJdbcExactlyOnce]], exposed
    * so a replay can be driven deterministically in tests: delete any rows
    * this batch id already landed (a failed attempt's partial write), then
    * append the batch tagged with its id. Same replace-the-key shape as
    * [[graft.ops.Dedup.upsert]], with batch_id as the key and the JDBC
    * DELETE playing the anti-join — DELETE + append commute with retries,
    * so replay converges instead of duplicating. */
  private[graft] def jdbcBatchUpsert(batch: DataFrame, batchId: Long,
                                     url: String, table: String): Unit = {
    val withId = batch.withColumn("batch_id", lit(batchId))
    if (!graft.ops.SinkDdl.jdbcTableExists(url, table))
      graft.ops.SinkDdl.writeJdbc(withId, url, table,
        mode = org.apache.spark.sql.SaveMode.Overwrite)
    else {
      // Spark's JDBC writer quotes column names, so Derby (and ANSI dbs)
      // store them case-sensitively — the DELETE must quote to match
      graft.ops.SinkDdl.execJdbc(url,
        s"""DELETE FROM $table WHERE "batch_id" = $batchId""")
      graft.ops.SinkDdl.writeJdbc(withId, url, table,
        mode = org.apache.spark.sql.SaveMode.Append)
    }
  }

  /** EXACTLY-ONCE stream → JDBC: [[streamToJdbc]] is at-least-once on
    * mid-batch failure (the standard foreachBatch caveat — the checkpoint
    * only records batch completion, so a crash between partial insert and
    * commit replays the whole batch). This variant keys every row by its
    * micro-batch id and makes the batch write idempotent via
    * [[jdbcBatchUpsert]]; the target carries one extra `batch_id` column,
    * which is also the operational lineage a warehouse load wants. */
  def streamToJdbcExactlyOnce(df: DataFrame, url: String, table: String,
                              checkpointDir: String): Unit = {
    val q = df.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        jdbcBatchUpsert(batch, batchId, url, table)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Per-key first-arrival dedup state (`dropDuplicatesWithinWatermark` —
    * the streaming twin of the kafka_s3_to_silver latest-per-key dedup;
    * state is evicted once the watermark passes, bounding it at scale).
    * Arrival order across partitions is racy, so which duplicate survives
    * is not deterministic — batch `Dedup.dedupLatest` is the declared
    * contract; this is the incremental twin. */
  def streamDedupKeys(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      // no-idle session: first-arrival dedup emits rows in the batch they
      // arrive; the trailing no-data batch only evicts state
      eventsStream(streamSessionNoIdle(spark), sfDir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type"),
      s"stream_dedup_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}", "append")
      .select(col("user_id"), col("event_type"))
      .orderBy(col("user_id"), col("event_type"))

  /** Stream-stream interval join — purchase attribution: each purchase
    * joins the same user's view events from the preceding 24 hours. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark evicts join state as the watermark advances — the
    * only state-safe shape for a stream-stream join at scale. Inner-join
    * emission is batching-independent, so the result is deterministic and
    * oracle-checked against the equivalent batch SQL self-join. */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // no-idle session: inner-join emission is arrival-driven, so the
    // trailing no-data batch (state eviction only) cannot change the output
    val ss = streamSessionNoIdle(spark)
    val purchases = eventsStream(ss, sfDir)
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val views = eventsStream(ss, sfDir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "25 hours")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val joined = purchases.join(views,
      col("v_user") === col("user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("v_ts") <= col("p_ts"))
    runToMemory(joined,
      s"stream_join_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}",
      "append")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("v_id")).as("n_views"),
        max(col("p_id")).as("max_purchase"))
      .orderBy(col("user_id"))
  }

  /** Stream-stream LEFT OUTER interval join: purchases left-joined to the
    * user's views in the preceding 24 h. The outer side exercises the
    * semantics the inner join can't: a purchase with no qualifying view is
    * HELD in the join state until the watermark proves no matching view
    * can still arrive (global watermark > its event time, both sides
    * watermarked 1 h), then emits exactly one null-padded row — so
    * null-emission timing is a watermark fact, not an arrival accident.
    * The final no-data micro-batch flushes rows whose expiry the last
    * data batch proved; purchases inside the terminal 1 h hold-back stay
    * in state (checkpointed for the next run) and are excluded from the
    * oracle by the same cutoff. State is interval-bounded on both sides —
    * the 100 TB shape (state ∝ 25 h of keys, not corpus). */
  def streamStreamLeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val purchases = eventsStream(ss, sfDir)
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("p_ts"))
    val views = eventsStream(ss, sfDir)
      .filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val joined = purchases.join(views,
      col("v_user") === col("user_id") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS") &&
        col("v_ts") <= col("p_ts"),
      "leftOuter")
    runToMemory(joined,
      s"stream_left_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}",
      "append")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("v_id")).as("n_matched"),
        sum(when(col("v_id").isNull, 1L).otherwise(0L)).as("n_unmatched"),
        max(col("p_id")).as("max_purchase"))
      .orderBy(col("user_id"))
  }

  /** Streaming gap-sessionization with CUSTOM STATE — the
    * `flatMapGroupsWithState` form of [[graft.ops.Sessionize]]: per user,
    * sessions closed by a later in-batch event are emitted immediately; the
    * open tail session is held in (checkpointed) group state with an
    * event-time timeout of gap past its last event, and is emitted when the
    * watermark passes that timeout in a later micro-batch. State is one
    * small record per SEEN user (after a timeout a closed marker keeps the
    * session counter, so numbering stays monotone like the batch twin) —
    * the same per-user bound the batch numbering inherently needs.
    * In-batch events are sorted per user; cross-batch reordering inside
    * the watermark is the standard streaming caveat. */
  def sessionizeStream(events: DataFrame, gapMinutes: Int,
                       watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val ds = events.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tsMicros"), col("ts")).as[EvW]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSess, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[EvW], state: GroupState[OpenSess]) =>
          if (state.hasTimedOut) {
            val s = state.get
            // keep a CLOSED marker (n = 0) instead of removing state
            // (round-7 review): dropping the counter restarted the next
            // session at idx 1, emitting duplicate (user, idx) keys and
            // diverging from the batch twin's monotone numbering. The
            // marker is one tiny record per seen user — the same bound as
            // the batch numbering requires — and sets no timeout, so it
            // never fires again.
            state.update(s.copy(n = 0))
            Iterator.single(Session(uid, s.idx, s.n, s.startMicros, s.endMicros))
          } else {
            val evs = it.toArray.sortBy(e => (e.tsMicros, e.event_id))
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur = state.getOption
            for (e <- evs) {
              cur = cur match {
                // n = 0 is the closed marker: no open session, but the
                // counter survives — the next session continues monotone
                case Some(s) if s.n == 0 =>
                  Some(OpenSess(s.idx + 1, 1, e.tsMicros, e.tsMicros))
                case Some(s) if e.tsMicros - s.endMicros <= gapMicros =>
                  Some(s.copy(n = s.n + 1, endMicros = e.tsMicros))
                case Some(s) =>
                  out += Session(uid, s.idx, s.n, s.startMicros, s.endMicros)
                  Some(OpenSess(s.idx + 1, 1, e.tsMicros, e.tsMicros))
                case None =>
                  Some(OpenSess(1, 1, e.tsMicros, e.tsMicros))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // clamp past the CURRENT watermark (round-7 review): a
              // late-but-accepted event whose end+gap already trails the
              // watermark would make setTimeoutTimestamp throw and kill
              // the query; clamping emits that session at the next
              // watermark advance instead
              if (s.n > 0)
                state.setTimeoutTimestamp(math.max(
                  s.endMicros / 1000L + gapMinutes * 60L * 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Declared stream-sessionize query: with a watermark delay wider than
    * the corpus's time span no timeout can fire inside the run, so the
    * output is exactly the batch sessionization minus each user's final
    * (still-open) session — deterministic, and SQL-expressible for the
    * oracle. The timeout path is exercised by StreamingSpec's three-run
    * incremental scenario. */
  def streamSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    runToMemory(
      sessionizeStream(eventsStream(ss, sfDir), 30, "720 hours").toDF(),
      s"stream_sessionize_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}",
      "append")
      .select(col("user_id"), col("session_idx"), col("n_events"),
        Cleanse.tsStr(timestamp_micros(col("startMicros"))).as("session_start"),
        Cleanse.tsStr(timestamp_micros(col("endMicros"))).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Candidate + verify join of a (streaming or batch) document delta
    * against the corpus signature index. The index sides carry a
    * `shuffle_hash` hint, NOT a broadcast: the band and shingle tables are
    * O(corpus) — at 100 TB they are not broadcastable, so the join must
    * shuffle-partition the (session-cached) index and probe it with the
    * delta. On a real cluster the index lives as a table bucketed by the
    * join key (`(band, bh)` / `base_id`), which makes even the index-side
    * shuffle a one-time write amortized across every arriving batch. The
    * band-key explode carries the shingle array alongside (×Bands
    * duplication) to keep the verify join static-only — at corpus scale the
    * verify would re-join the delta's own shingle store instead. */
  private[graft] def incrementalDedupJoin(delta: DataFrame,
      bandedBase: DataFrame, shBase: DataFrame,
      maxBucket: Int = 1000): DataFrame = {
    import graft.text.NearDup
    val banded = delta
      .select(col("doc_id").as("new_id"),
        NearDup.shingles(col("text")).as("new_sh"))
      .select(col("new_id"), col("new_sh"),
        posexplode(NearDup.bandHashes(NearDup.minhashSig(col("new_sh")))))
      .toDF("new_id", "new_sh", "band", "bh")
    // spam-bucket cap on the CORPUS side (the skew guard every minhash
    // tier carries): a band mega-bucket would otherwise enumerate
    // |bucket|x|delta-bucket| candidates on ONE join key/task. The size
    // rides a WINDOW over (band, bh) — the exact distribution the
    // candidate join requires anyway — so the cap adds ZERO exchanges:
    // a bucketed index still joins with only the delta-side shuffle, and
    // no O(#buckets) filter table ever broadcasts (it would be
    // corpus-sized at scale).
    // indexes built by [[graft.text.NearDup.bucketedBandIndexCached]]
    // carry the bucket size as a stored column — filter on it directly
    // instead of re-running a corpus-sized count window per batch; a raw
    // (id, band, bh) frame still pays the window here
    val sized =
      if (bandedBase.columns.contains("bucket_n"))
        bandedBase.withColumnRenamed("id", "base_id")
          .withColumnRenamed("bucket_n", "__bsz")
      else bandedBase.toDF("base_id", "band", "bh")
        .withColumn("__bsz", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("band"), col("bh"))))
    val cappedBase = sized.filter(col("__bsz") <= maxBucket).drop("__bsz")
    val cand = banded
      .join(cappedBase.hint("shuffle_hash"), Seq("band", "bh"))
      .dropDuplicates("new_id", "base_id")
    cand
      .join(shBase.toDF("base_id", "base_sh").hint("shuffle_hash"), "base_id")
      .select(col("new_id"), col("base_id"),
        round(NearDup.jaccard(col("new_sh"), col("base_sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
  }

  /** STREAMING incremental ingest dedup: arriving documents stream-static
    * join the session-cached corpus signature index — the real-time form of
    * `dedup_incremental`. The streaming side is all narrow maps (shingle →
    * sig → band explode); the corpus index joins via
    * [[incrementalDedupJoin]] (shuffle-partitioned, never broadcast); the
    * only streaming state is the candidate-pair dedup. The delta (doc_id ≡
    * 0 mod 10) lands as parquet once and is picked up by the file source,
    * so the declared run is deterministic and shares
    * `dedup_incremental`'s oracle. */
  def streamIncrementalDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.text.NearDup
    val ss = streamSession(spark)
    val docs = graft.ops.Tables.table(ss, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    // deliberately NOT dedup_incremental's "#base" key: the streaming
    // twin runs in its own newSession (catalog/shuffle-conf isolation),
    // whose cache map is distinct and whose DataFrames cannot safely mix
    // with the root session's — each session kind builds its corpus
    // tables once; the key only needs uniqueness within THIS session
    val key = s"$sfDir#stream_base"
    // probe the same DEPLOYED index shape as the batch twin: managed
    // tables bucketed on the join keys ((band,bh) / id) with the spam-cap
    // bucket size stored at build — per batch only the delta shuffles,
    // and no corpus-sized window or array exchange re-runs (guide §2.4)
    val shBase = NearDup.bucketedShingleIndexCached(corpus, "doc_id", "text", key)
    val bandedBase = NearDup.bucketedBandIndexCached(corpus, "doc_id", "text", key)

    val landing = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
      s"stream_docs_delta_${graft.ops.TempFiles.tag(sfDir)}"))
    val hasFiles = {
      val s = java.nio.file.Files.list(landing)
      try s.findFirst().isPresent finally s.close()
    }
    if (!hasFiles)
      docs.filter(col("doc_id") % 10 === 0)
        .repartition(1).write.mode("overwrite").parquet(landing.toString)

    val delta = ss.readStream.schema(docsSchema).parquet(landing.toString)
    val verified = incrementalDedupJoin(delta, bandedBase, shBase)
    runToMemory(verified,
      s"stream_inc_dedup_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}",
      "append")
      .orderBy(col("new_id"), col("base_id"))
  }

  /** STREAMING multimodal near-dup gate — the twin of
    * [[graft.Queries.mmPhashIncremental]], the shape an image-ingest
    * pipeline runs in real time: arriving media are header-decoded and
    * pHashed with the SAME [[graft.mm.Multimodal.phashFeatures]] kernel
    * (a narrow per-partition codec map — stream-safe), then probe the
    * session-cached base pHash multi-index through the SAME
    * Norouzi block join ([[graft.text.NearDup.hammingDupPairsIncremental]])
    * the batch op uses — stream-static, never broadcast-corpus. The only
    * streaming state is the candidate-pair dedup. The delta (2×-upscaled
    * media — same content, different bytes) lands as parquet once, so
    * the declared run is deterministic and shares
    * `mm_phash_incremental`'s oracle. */
  def streamPhash(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val media = graft.mm.Multimodal.asMedia(
      graft.ops.Tables.table(ss, sfDir, "documents"))
    // the base index is the BUCKETED managed signature table the batch
    // twin (`mm_phash_incremental`) probes: built once per session (the
    // one-time build pays the corpus decode+pHash), read pre-partitioned
    // on k with the spam-cap bucket size stored — per batch only the
    // delta is decoded, hashed and shuffled (guide §2.4). Previously the
    // stream probe re-decoded and re-pHashed the WHOLE base corpus and
    // re-counted its buckets inside every micro-batch.
    val baseIdx = graft.text.NearDup.bucketedHammingIndexCached(
      graft.mm.Multimodal.phashFeatures(ss, media)
        .filter(col("phash").isNotNull),
      "doc_id", "phash", cacheKey = s"$sfDir#stream_base")
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_phash_delta_$tag"))
    val hasFiles = {
      val s = java.nio.file.Files.list(landing)
      try s.findFirst().isPresent finally s.close()
    }
    if (!hasFiles)
      graft.mm.Multimodal.upscaledMedia(ss, media, 2)
        .repartition(1).write.mode("overwrite").parquet(landing.toString)
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val deltaPh = graft.mm.Multimodal.phashFeatures(ss,
        ss.readStream.schema(mediaSchema).parquet(landing.toString))
      .filter(col("phash").isNotNull)
    val verified = graft.text.NearDup.hammingDupPairsIncrementalBucketed(
      baseIdx, deltaPh, "doc_id", "phash", maxHamming = 4)
    runToMemory(verified,
      s"stream_phash_sink_${tag.replace(".", "_")}", "append")
      .orderBy(col("new_id"), col("base_id"))
  }

  /** STREAMING distribution-drift gate: each arriving micro-batch is
    * KS-tested against the static baseline slice — the monitor a corpus
    * ingest runs continuously ("has the length distribution of what we're
    * crawling drifted from what we trained on?"). The KS computation
    * ([[graft.ops.Drift.ks]]: distributed CDFs, no single-task window) is
    * not incrementalizable, so it runs per batch inside `foreachBatch` —
    * the standard seam for batch-only plans in a stream; per-batch cost is
    * bounded by distinct values, not corpus size. The delta (odd-id docs)
    * lands as ONE parquet file, so AvailableNow yields exactly one batch
    * and the declared result equals the batch `dq_drift` (same oracle);
    * StreamingSpec also drives a 3-file landing to prove the per-batch
    * monitoring behavior. */
  def streamDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val docs = graft.ops.Tables.table(ss, sfDir, "documents")
    val baseline = docs.filter(col("doc_id") % 2 === 0)
      .select(col("n_chars"), lit(true).as("in_a"))
    val landing = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
      s"stream_drift_delta_${graft.ops.TempFiles.tag(sfDir)}"))
    val hasFiles = {
      val s = java.nio.file.Files.list(landing)
      try s.findFirst().isPresent finally s.close()
    }
    if (!hasFiles)
      docs.filter(col("doc_id") % 2 === 1)
        .repartition(1).write.mode("overwrite").parquet(landing.toString)
    drainDriftStream(ss, baseline,
      ss.readStream.schema(docsSchema).parquet(landing.toString))
      .select(col("ks_stat"), col("at_value"), col("n_a"), col("n_b"))
      .orderBy(col("batch_id"))
  }

  /** Stream-static POINT-IN-TIME enrichment: each arriving micro-batch of
    * events is as-of joined (most recent order at or before the event
    * time, [[graft.ops.AsOf.asofJoin]]) against the static orders table
    * and appended to a silver output — the enrich-on-ingest pipeline. The
    * as-of join is per-LEFT-row, so it is embarrassingly incremental on
    * the stream side: each batch computes exactly its own rows and the
    * union over all batches equals the batch twin (`join_asof`'s oracle,
    * shared). The static side re-shuffles per batch here; at scale the
    * orders side would be a bucketed table co-partitioned on the key —
    * the same argument as the dedup signature index (and the checkpoint
    * makes re-runs no-ops, so the output is stable across sessions). */
  def streamAsof(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    // v2: the batchId-keyed layout below is incompatible with pre-round-7
    // flat-append dirs — versioned names keep a stale (dir, checkpoint)
    // pair from aliasing the new layout into an empty read
    val outDir = graft.ops.TempFiles.dir(s"stream_asof_out_v2_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_asof_ck_v2_$tag")
    val orders = graft.ops.Tables.table(ss, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val q = eventsStream(ss, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.ops.AsOf.asofJoin(batch.toDF(), orders, "user_id", "o_custkey",
            col("ts"), col("o_orderdate"), col("o_orderkey"))
          .filter(col("__match").isNotNull)
          .select(col("event_id"),
            col("__match.o_orderkey").as("o_orderkey"),
            col("__match.o_totalprice").as("o_totalprice"))
          // batchId-keyed overwrite, not a raw append (round-7 review): a
          // crash between a partial append and the checkpoint commit would
          // duplicate the whole batch on replay — the same exactly-once
          // seam every sibling MV in this file rides
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.read.parquet(s"$outDir/batch=*").orderBy(col("event_id"))
  }

  /** Per-batch exact-integer 3σ anomaly gate: each arriving micro-batch of
    * events is scored against FROZEN baseline stats (pre-cutoff
    * `Drift.sigmaStats` — the production shape: the gate compares arrivals
    * to history, it does not let arrivals move the threshold). The whole
    * test is the integer cross-product form, so the boundary is identical
    * on any engine at any batching; a one-file landing → one batch → the
    * batch oracle over the same delta. */
  def streamAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val cutoff = lit("2024-01-20").cast(TimestampType)
    def cents(df: DataFrame): DataFrame = df
      .filter(col("value").isNotNull)
      .select(col("event_type"), (Cleanse.dec2(col("value")) * 100)
        .cast(DecimalType(38, 0)).as("x"))
    val ev = graft.ops.Tables.table(ss, sfDir, "events")
    val stats = graft.ops.Drift.sigmaStats(
      cents(ev.filter(col("ts") < cutoff)), "event_type")
    val landing = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
      s"stream_anomaly_delta_${graft.ops.TempFiles.tag(sfDir)}"))
    val hasFiles = {
      val s = java.nio.file.Files.list(landing)
      try s.findFirst().isPresent finally s.close()
    }
    if (!hasFiles)
      ev.filter(col("ts") >= cutoff)
        .repartition(1).write.mode("overwrite").parquet(landing.toString)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long)]()
    val q = ss.readStream.schema(ev.schema).parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Drift.sigmaOutlierCounts(cents(batch.toDF()), stats,
            "event_type")
          .collect().foreach { r =>
            results.add((r.getString(0), r.getLong(1), r.getLong(2)))
          }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    import ss.implicits._
    results.asScala.toSeq.toDF("event_type", "n_rows", "n_outliers")
      .orderBy(col("event_type"))
  }

  /** Land a 3-file date-sliced feed (one file per ~10-day slice of the
    * frame's `ts`) into `landing` if complete — with `maxFilesPerTrigger=1`
    * this yields three REAL multi-key micro-batches from static testdata.
    * Idempotent AND crash-safe: completeness is keyed on ALL expected
    * slice files being present (not "any file"), and slices are built in
    * a staging dir first, so a crash mid-build leaves a partial landing
    * that the next run detects and finishes — never a silently-short feed
    * that the MV would treat as the whole dataset. */
  private[graft] def buildDateSlicedFeed(landing: java.nio.file.Path,
                                         feed: DataFrame,
                                         buildTag: String): Unit = {
    val slices = Seq(("2024-01-01", "2024-01-11", "b0"),
      ("2024-01-11", "2024-01-21", "b1"),
      ("2024-01-21", "2024-02-01", "b2"))
    val complete = slices.forall { case (_, _, name) =>
      java.nio.file.Files.exists(landing.resolve(s"$name.parquet"))
    }
    if (complete) return
    // the slice calendar must COVER the feed (round-7 review): a row
    // outside [2024-01-01, 2024-02-01) would land in NO slice and every
    // downstream "hash-matches the batch oracle" claim would break far
    // from the cause — fail at build time instead
    val total = feed.count()
    val covered = feed.filter(
      col("ts") >= lit(slices.head._1).cast(TimestampType) &&
        col("ts") < lit(slices.last._2).cast(TimestampType)).count()
    require(covered == total,
      s"date-sliced feed would silently drop ${total - covered} of $total " +
        s"rows outside [${slices.head._1}, ${slices.last._2}) — widen the " +
        "slice calendar for this corpus")
    slices.foreach { case (lo, hi, name) =>
      val part = java.nio.file.Paths.get(
        graft.ops.TempFiles.dir(s"$buildTag/staging/$name"))
      feed.filter(col("ts") >= lit(lo).cast(TimestampType) &&
          col("ts") < lit(hi).cast(TimestampType))
        .repartition(1).write.mode("overwrite").parquet(part.toString)
      val src = java.nio.file.Files.list(part)
      val f = try src.filter(p => p.toString.endsWith(".parquet"))
        .findFirst().get() finally src.close()
      java.nio.file.Files.move(f, landing.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** batchId-versioned state dirs present under `root` (the
    * exactly-once-state seam shared by the CDC and SCD2 streaming
    * maintainers). */
  private[graft] def listStateVersions(root: String): Seq[Long] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("v")).map(_.drop(1).toLong).toSeq
    } finally s.close()
  }

  /** Fold one CDC micro-batch into the accumulated state: latest change
    * per key wins (ts, then event id — deterministic at any batching),
    * DELETE tombstones stay IN the state with their change time (they must
    * out-rank the rows they kill and survive until compaction, exactly a
    * log-structured merge); the read view filters them out. Because the
    * winner is picked by change TIME, not arrival order, the fold is
    * associative/commutative over batches — any file batching (1 file or
    * 50) converges to the same state, spec-asserted. */
  private[graft] def cdcMerge(state: DataFrame, batch: DataFrame): DataFrame =
    graft.ops.Dedup.dedupLatest(state.unionByName(batch),
      Seq("user_id"), col("ts"), col("event_id"))

  /** STREAMING CDC apply: a keyed change feed (op ∈ U/D, payload, change
    * ts) folded across micro-batches into a materialized state table — the
    * continuously-maintained silver "current state" a CDC tap (Debezium
    * shape) feeds. Each micro-batch [[cdcMerge]]s into a NEW state
    * version dir keyed by batchId (the foreachBatch seam; versioned dirs +
    * the checkpoint give idempotent re-runs — a replayed batch rewrites
    * the same version, never double-applies: exactly-once state). At scale
    * each version is a MERGE INTO on a key-bucketed table (one keyed
    * shuffle per batch, state never rewritten wholesale); tombstone
    * retention/compaction is the table-maintenance job. The feed fixture
    * derives from events ('error' → D tombstone, else upsert of the event
    * type) split into three time-ordered files, maxFilesPerTrigger=1 →
    * three real multi-key batches. */
  def streamCdcApply(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_cdc_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_cdc_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_cdc_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("op", StringType),
      StructField("status", StringType)))

    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "error", lit("D")).otherwise(lit("U"))
          .as("op"),
        col("event_type").as("status")),
      s"stream_cdc_feed_build_$tag")

    def stateVersions: Seq[Long] = listStateVersions(stateRoot)

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = stateVersions.filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession
            .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
              feedSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        cdcMerge(state, batch.toDF())
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${stateVersions.max}")
      .filter(col("op") =!= "D")
      .select(col("user_id"), col("status"),
        Cleanse.tsStr(col("ts")).as("changed_at"))
      .orderBy(col("user_id"))
  }

  /** STREAMING SCD2 maintenance: the type-2 history table kept current by
    * the stream — each micro-batch compresses its own runs and
    * re-compresses the union with the stored history
    * ([[graft.Queries.mergeScd2Incremental]]'s algebra at the
    * `foreachBatch` seam; the window runs over CHANGE rows, ≪ events).
    * State is batchId-versioned like [[streamCdcApply]] (replay rewrites
    * the same version — exactly-once); at scale each version is a MERGE
    * INTO on the user-bucketed history. The contract survives ANY
    * batching: the composed fold equals the batch [[graft.Queries
    * .scd2Build]] rebuild verbatim — which is exactly the oracle. */
  def streamScd2(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_scd2_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_scd2_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_scd2_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("status", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("status")),
      s"stream_scd2_feed_build_$tag")

    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    def changes(df: DataFrame): DataFrame = df
      .withColumn("prev", lag(col("status"), 1).over(byKey))
      .filter(col("prev").isNull || col("prev") =!= col("status"))
      .drop("prev")

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val base =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), feedSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        changes(base.unionByName(changes(batch.toDF())))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .withColumn("end_ts", lead(col("ts"), 1).over(byKey))
      .select(col("user_id"), col("status"),
        Cleanse.tsStr(col("ts")).as("valid_from"),
        Cleanse.tsStr(col("end_ts")).as("valid_to"),
        col("end_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("status"))
  }

  /** STREAMING maintained top-k: the continuously-updated leaderboard
    * (top spenders per event type) kept current by MERGEABLE partial
    * aggregates — each micro-batch aggregates ITSELF to (event_type,
    * user_id) partials (exact integer cents — sums and counts add
    * associatively at any batching) and folds them into a batchId-versioned
    * state table, [[streamCdcApply]]'s exactly-once seam. The top-k itself
    * is computed ON READ from the compact state (keys-sized, not
    * events-sized) with a keyed window Spark caps below the exchange
    * (WindowGroupLimit) — the heavy stream never sorts. At scale the state
    * fold is a MERGE INTO on a (event_type, user_id)-bucketed table; the
    * read is a dashboard query over it. Oracle: the batch leaderboard over
    * the whole feed, which any batching must converge to. */
  def streamTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_topk_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_topk_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_topk_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("cents", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_type"),
        (Cleanse.dec2(col("value")) * 100).cast(LongType).as("cents")),
      s"stream_topk_feed_build_$tag")

    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("user_id", LongType),
      StructField("total_cents", LongType), StructField("n_events", LongType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n_events"))

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("event_type"), col("user_id"))
          .agg(sum(col("total_cents")).as("total_cents"),
            sum(col("n_events")).as("n_events"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val byType = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("total_cents").desc, col("user_id"))
    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .withColumn("rk", row_number().over(byType).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("event_type"), col("rk"), col("user_id"),
        col("total_cents"), col("n_events"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** STREAMING maintained KMV distinct sketch: the streaming twin of
    * [[graft.Queries.sketchKmv]]. KMV state IS its merge — "the k
    * smallest distinct hashes" is associative, commutative and
    * idempotent, so each micro-batch reduces ITSELF to per-group
    * survivors (≤ k rows per group + the ALL group) and the fold is
    * re-ranking state ∪ batch survivors — the state stays
    * O(groups × k) rows at any corpus size, and any batching produces
    * the IDENTICAL k-set (the oracle hash-matches the estimates, not
    * just floors). Versioned through the batchId-keyed exactly-once
    * seam ([[streamCdcApply]]); under-full groups report their exact
    * count because an under-full sketch has seen every distinct value. */
  def streamKmv(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 64
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_kmv_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_kmv_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_kmv_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type")),
      s"stream_kmv_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("g", StringType), StructField("h", LongType)))
    // rank (g,h) rows to the k smallest per group — used for both the
    // batch's own reduction and the state fold (KMV merge = re-rank)
    def rank(gh: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("h"))
      gh.distinct().withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).select(col("g"), col("h"))
    }
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        val b = batch.toDF()
        val gh = b.select(col("event_type").as("g"), col("user_id"))
          .unionByName(b.select(lit("ALL").as("g"), col("user_id")))
          .select(col("g"),
            conv(substring(md5(col("user_id").cast(StringType)), 1, 12),
              16, 10).cast(LongType).as("h"))
        rank(rank(gh).unionByName(state))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_kmv"), max(col("h")).as("hk"))
      .select(col("g").as("event_type"), col("n_kmv"),
        when(col("n_kmv") < k, col("n_kmv"))
          .otherwise(expr(s"(${k - 1}L * 281474976710656L) div hk"))
          .cast(LongType).as("est_distinct"))
      .orderBy(col("event_type"))
  }

  /** STREAMING maintained distinct-count MV: the streaming twin of
    * [[graft.Queries.aggHllMerge]] — per micro-batch, daily HLL sketch
    * states per event type (`hll_sketch_agg`) fold into a
    * batchId-versioned state table via `hll_union_agg` of the BINARY
    * state column ([[streamCdcApply]]'s exactly-once seam). The state is
    * (types × days)-sized sketches, never events-sized; the weekly
    * estimate is computed ON READ by unioning the daily states upward.
    * HLL register merges are associative, commutative and idempotent, so
    * any batching produces identical registers — the spec asserts the
    * stream's weekly estimates EQUAL the batch query's, exactly. */
  def streamHllMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_hll_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_hll_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_hll_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type")),
      s"stream_hll_feed_build_$tag")

    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("day", DateType),
      StructField("sk", BinaryType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("event_type"), col("day"))
          .agg(hll_union_agg(col("sk")).as("sk"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .groupBy(col("event_type"),
        expr("datediff(day, date'2024-01-01') div 7").as("wk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_users"))
      .orderBy(col("event_type"), col("wk"))
  }

  /** STREAMING maintained regression MV: the streaming twin of
    * [[graft.Queries.aggOls]] — the OLS sufficient statistics
    * (n, Σx, Σy, Σxy, Σx², Σy² per group, DECIMAL(38,0)) are EXACT
    * mergeable partials: sums are associative, commutative and
    * integer-exact, so per-batch partials fold into a batchId-versioned
    * (groups-sized, never rows-sized) state table and ANY batching
    * produces bit-identical statistics — which is why this query shares
    * `agg_ols`'s oracle verbatim. The regression closed forms
    * (slope/intercept/R²) are computed ON READ from the folded
    * statistics; the model updates per batch with no raw rescan — the
    * incremental-training-metric pattern (a 100 TB feed keeps a live
    * regression without ever re-reading history). The feed is the
    * lineitem table landed as 3 orderkey-hash slices (the date-sliced
    * helper targets the events time range; lineitem ships dates span
    * years). */
  def streamOls(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_ols_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_ols_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_ols_ck_$tag")
    val dec380 = DecimalType(38, 0)

    // completeness keyed on ALL three slice files (crash-safe: a partial
    // landing from an interrupted build is detected and finished, with
    // REPLACE_EXISTING making the re-land idempotent — never a silently
    // short feed treated as complete)
    val complete = (0 to 2).forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"b$i.parquet")))
    if (!complete) {
      val feed = graft.ops.Tables.table(ss, sfDir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast(LongType).as("x"),
          (graft.ops.Cleanse.dec2(col("l_extendedprice")) * 100)
            .cast(LongType).as("y"),
          pmod(col("l_orderkey"), lit(3)).as("slice"))
      (0 to 2).foreach { i =>
        val part = java.nio.file.Paths.get(
          graft.ops.TempFiles.dir(s"stream_ols_feed_build_$tag/b$i"))
        feed.filter(col("slice") === i).drop("slice")
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"b$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast(dec380).as("n"),
        sum(col("x")).cast(dec380).as("sx"),
        sum(col("y")).cast(dec380).as("sy"),
        sum((col("x") * col("y")).cast(dec380)).as("sxy"),
        sum((col("x") * col("x")).cast(dec380)).as("sxx"),
        sum((col("y") * col("y")).cast(dec380)).as("syy"))

    val feedSchema = StructType(Seq(
      StructField("l_returnflag", StringType),
      StructField("x", LongType), StructField("y", LongType)))
    val stateSchema = StructType(
      StructField("l_returnflag", StringType) +:
        Seq("n", "sx", "sy", "sxy", "sxx", "syy")
          .map(StructField(_, dec380)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("n")).cast(dec380).as("n"),
            sum(col("sx")).cast(dec380).as("sx"),
            sum(col("sy")).cast(dec380).as("sy"),
            sum(col("sxy")).cast(dec380).as("sxy"),
            sum(col("sxx")).cast(dec380).as("sxx"),
            sum(col("syy")).cast(dec380).as("syy"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val m = ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
    val cov = (col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
    val varx = (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType)
    val vary = (col("n") * col("syy") - col("sy") * col("sy")).cast(DoubleType)
    val slope = cov / varx
    m.select(col("l_returnflag"), col("n").cast(LongType).as("n"),
        round(slope, 6).as("slope_cents_per_unit"),
        round((col("sy").cast(DoubleType) - slope * col("sx").cast(DoubleType)) /
          col("n").cast(DoubleType), 6).as("intercept_cents"),
        round(cov * cov / (varx * vary), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** STREAMING maintained entropy MV: the streaming twin of
    * [[graft.Queries.aggEntropy]] — the (day, type) cell counts are
    * ADDITIVE (the simplest mergeable partial of all), so they fold
    * through batchId-versioned (days × types)-sized state and the
    * entropy closed forms are computed ON READ over exact folded
    * integers; any batching produces identical counts, so the query
    * shares `agg_entropy`'s oracle verbatim. */
  def streamEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_ent_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_ent_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_ent_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("ts"), col("event_type")), s"stream_ent_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("day", StringType), StructField("event_type", StringType),
      StructField("c", LongType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("day"), col("event_type"))
          .agg(sum(col("c")).as("c"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val day = ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .groupBy(col("day"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
        sum(col("c").cast(DoubleType) *
          log(col("c").cast(DoubleType))).as("s"))
    val h = log(col("n").cast(DoubleType)) - col("s") / col("n").cast(DoubleType)
    day.select(col("day"), col("n"), col("k"),
        round(h, 6).as("entropy_nats"),
        round(h / log(col("k").cast(DoubleType)), 6).as("entropy_ratio"))
      .filter(col("k") > 1)
      .orderBy(col("day"))
  }

  /** STREAMING maintained quantile sketch: the streaming twin of
    * [[graft.Queries.aggQuantileSketch]] — the k-hash-smallest sample is
    * a MERGEABLE fold (k smallest of a union = k smallest of per-side
    * k-smallests, the `stream_sample` algebra applied per group), and the
    * per-type row count is additive, so both fold through
    * batchId-versioned state that stays (types × k)-sized forever; the
    * p50/p90 estimates are computed ON READ by running the
    * [[graft.functions.ReservoirQuantile]] aggregate over the state
    * sample itself (k smallest of ≤ k rows is the identity — the custom
    * aggregate doubles as the read-side interpolator). Any batching
    * produces the identical sample, so the estimates are bit-deterministic
    * and the oracle replays them exactly. */
  def streamQuantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_qsk_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_qsk_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_qsk_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type"), col("value")),
      s"stream_qsk_feed_build_$tag")

    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("h", StringType),
      StructField("cents", LongType), StructField("n", LongType)))
    // null h/cents rows are dropped BEFORE ranking: the batch-side
    // ReservoirQuantile.update skips nulls without consuming a sample
    // slot, and Spark's default NULLS FIRST would otherwise let null rows
    // occupy slots (and sort opposite to DuckDB's NULLS LAST)
    def keyed(df: DataFrame): DataFrame = df
      .select(col("event_type"),
        md5(col("event_id").cast(StringType)).as("h"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType).as("cents"))
      .filter(col("h").isNotNull && col("cents").isNotNull)

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        import org.apache.spark.sql.expressions.Window
        val sess = batch.sparkSession
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) sess.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else sess.read.parquet(s"$stateRoot/v${prev.max}")
        val b = keyed(batch.toDF())
        val counts = state.groupBy(col("event_type")).agg(max(col("n")).as("pn"))
          .join(b.groupBy(col("event_type")).agg(count(lit(1)).as("bn")),
            Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("pn"), lit(0L)) + coalesce(col("bn"), lit(0L))).as("n"))
        val rn = row_number().over(Window.partitionBy(col("event_type"))
          .orderBy(col("h"), col("cents")))
        state.select(col("event_type"), col("h"), col("cents"))
          .unionByName(b)
          .withColumn("rn", rn).filter(col("rn") <= 256).drop("rn")
          .join(counts, "event_type")
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        round(call_function("graft_reservoir_quantile",
          col("h"), col("cents"), lit(256), lit(0.5)), 4).as("p50_est"),
        round(call_function("graft_reservoir_quantile",
          col("h"), col("cents"), lit(256), lit(0.9)), 4).as("p90_est"))
      .orderBy(col("event_type"))
  }

  /** STREAMING exact-size reservoir: the streaming twin of
    * [[graft.Queries.sampleReservoir]] — "keep exactly the 100
    * hash-smallest events seen so far". Top-k by a deterministic total
    * order is a MERGEABLE fold (top-k of a union = top-k of per-side
    * top-ks), so each micro-batch reduces ITSELF to ≤ k rows and folds
    * into the batchId-versioned k-row state; any batching converges to
    * the batch draw exactly, which is why this query shares
    * `sample_reservoir`'s oracle verbatim. State is k-sized forever —
    * the stream never accumulates. */
  def streamSample(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_sample_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_sample_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_sample_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("event_id"), col("ts"), col("event_type")),
      s"stream_sample_feed_build_$tag")

    val stateSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("h", StringType)))
    def topK(df: DataFrame): DataFrame = df
      .orderBy(col("h"), col("event_id")).limit(100)

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        val arrived = batch.toDF().select(col("event_id"), col("event_type"),
          md5(col("event_id").cast(StringType)).as("h"))
        topK(state.unionByName(topK(arrived)))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .select(col("event_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** Run the drift stream to completion: per micro-batch, union the
    * arriving slice (in_a = false) with the baseline and collect the
    * one-row KS result into the returned (batch_id-keyed) frame. */
  private[graft] def drainDriftStream(ss: SparkSession, baseline: DataFrame,
                                      delta: DataFrame): DataFrame = {
    val results = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Double, Long, Long, Long)]()
    val q = delta.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val merged = baseline.unionByName(
          batch.select(col("n_chars"), lit(false).as("in_a")))
        graft.ops.Drift.ks(merged, "n_chars", "in_a").collect().foreach { r =>
          results.add((batchId, r.getDouble(0), r.getLong(1),
            r.getLong(2), r.getLong(3)))
        }
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    import ss.implicits._
    results.asScala.toSeq
      .toDF("batch_id", "ks_stat", "at_value", "n_a", "n_b")
  }

  /** Watermarked tumbling-window count in append mode: only windows the
    * watermark (max event time − 1h) has passed are emitted — the streaming
    * twin of the reference's event-time cutoff. */
  def watermarkWindow(spark: SparkSession, sfDir: String): DataFrame =
    runToMemory(
      eventsStream(streamSession(spark), sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("cnt")),
      s"stream_watermark_sink_${graft.ops.TempFiles.tag(sfDir).replace(".", "_")}", "append")
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("win_start"),
        col("event_type"), col("cnt"))
      .orderBy(col("win_start"), col("event_type"))

  /** STREAMING snapshot commits — the lakehouse SINK protocol at the
    * foreachBatch seam: each micro-batch writes its data files under the
    * table root and commits manifest v{batchId} = previous manifest + the
    * new files. Commits are exactly-once by construction: the data dir
    * and the manifest are both KEYED BY batchId, so a replayed batch
    * rewrites the same version instead of double-appending (the
    * [[streamCdcApply]] versioned-state discipline applied to table
    * COMMITS), and the manifest lands by atomic move so a reader at any
    * instant sees a fully-committed snapshot or the previous one — never
    * partial files. The result log is [[graft.Queries.scanTimeTravel]]'s
    * format verbatim: time travel, CDF and VACUUM all work on a
    * stream-built table unchanged. Declared output = the LATEST
    * snapshot's per-type counts; oracle = the whole events table (the
    * stream committed everything exactly once). */
  def streamSnapshotCommit(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.SnapLog
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_snap_feed_$tag"))
    val root = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_snap_tbl_$tag"))
    val log = SnapLog.logDir(root)
    val ckDir = graft.ops.TempFiles.dir(s"stream_snap_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_id", LongType), StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      s"stream_snap_feed_build_$tag")

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // one data file + one manifest per batch, BOTH keyed by batchId
        // (replay rewrites the same version — exactly-once), committed
        // through the shared SnapLog format so stats ride the manifest
        val entry = SnapLog.writeFile(batch.toDF(), "ts",
          graft.ops.TempFiles.dir(s"stream_snap_stage_$tag/b$batchId"),
          root.resolve(s"b$batchId.parquet"))
        val prev = SnapLog.versions(log).filter(_ < batchId)
        val base = if (prev.isEmpty) Seq.empty
          else SnapLog.read(log, prev.max)
        SnapLog.commit(log, batchId, base :+ entry)
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(
        SnapLog.dataPaths(SnapLog.read(log, SnapLog.versions(log).max)): _*)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** STREAMING strict-order funnel — the twin of
    * [[graft.Queries.funnelStrictOrder]]. Strict order ("a click counts
    * only if strictly later than the user's FIRST view") is not
    * incrementalizable with per-stage minima alone: a late-arriving
    * earlier view lowers t1 and can resurrect clicks a smaller state
    * would already have discarded. The maintained state is therefore the
    * DISTINCT (user_id, event_type, ts) set of funnel-relevant events —
    * exactly what a stream-stream join buffers, and bounded the same way
    * in production (a watermark evicts users whose funnel window has
    * closed; here the horizon is the whole fixture). The fold is set
    * union + dropDuplicates — associative, commutative, IDEMPOTENT — so
    * any batching of the feed converges to the identical state, landed
    * through the batchId-keyed exactly-once seam. The declared output
    * replays the shared [[graft.Queries.strictFunnelChain]] over the
    * final state and hash-matches the BATCH oracle. */
  def streamFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_funnel_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_funnel_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_funnel_ck_$tag")

    val feedSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_type")),
      s"stream_funnel_feed_build_$tag")

    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), feedSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF())
          .dropDuplicates("user_id", "event_type", "ts")
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    graft.Queries.strictFunnelChain(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING incremental connected components — the twin of
    * [[graft.Queries.dedupComponents]], maintaining the dup-graph
    * clustering as edges ARRIVE instead of re-pairing the corpus. The
    * state is the NODE→LABEL table, folded as star edges: a label table
    * preserves connectivity exactly (every member connects to its
    * component root), so components(star(state) ∪ batch edges) is the
    * correct updated clustering — the union-find path-compression idea
    * as a dataframe. State stays NODES-sized however many edges ever
    * streamed (the spanning structure, never the edge log), and each
    * fold's propagation converges in few rounds because the warm-started
    * graph is a forest of depth-1 stars plus the delta. Labels are
    * canonical min-ids, so ANY batching converges to the identical final
    * state; landed through the batchId-keyed exactly-once seam. The feed
    * is the minhash dup-pair table split into 3 id-keyed slices; the
    * declared output replays `dedup_components`' shape over final state
    * and hash-matches its oracle verbatim. */
  def streamComponents(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val labels = ccStateFold(ss, sfDir, "stream_cc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("component"))
    labels
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .withColumn("n_members", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  /** The incremental-CC maintenance shared by [[streamComponents]] and
    * [[streamSoftDedup]]: the near-dup pair table lands as 3 deterministic
    * id-keyed slices, each batch folds its delta edges into the maintained
    * node→label star-edge state (nodes-sized union-find compression), and
    * the FINAL label frame is returned for the caller's on-read
    * derivation. `prefix` keys the feed/state/checkpoint dirs so callers
    * maintain independent MVs. */
  private def ccStateFold(ss: SparkSession, sfDir: String,
                          prefix: String): DataFrame = {
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"${prefix}_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"${prefix}_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"${prefix}_ck_$tag")

    // land the pair table as 3 deterministic id-keyed slice files
    val slices = Seq(0, 1, 2)
    val complete = slices.forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet")))
    if (!complete) {
      val pairs = graft.text.NearDup.minhashDupPairsCached(
        graft.ops.Tables.table(ss, sfDir, "documents"), "doc_id", "text",
        threshold = 0.8, cacheKey = sfDir)
        .select(col("a_id"), col("b_id"))
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"${prefix}_feed_build_$tag/staging/s$i"))
        pairs.filter(pmod(col("a_id"), lit(3)) === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val feedSchema = StructType(Seq(
      StructField("a_id", LongType), StructField("b_id", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val edges =
          if (prev.isEmpty) batch.toDF()
          else s.read.parquet(s"$stateRoot/v${prev.max}")
            .select(col("comp").as("a_id"), col("id").as("b_id"))
            .unionByName(batch.toDF())
        val labels = graft.ops.Components.connectedComponents(
          edges, "a_id", "b_id")
        labels.write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        labels.unpersist()
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
  }

  /** STREAMING maintained soft-dedup weights — the twin of
    * [[graft.Queries.sampleSoftDedup]]. The near-dup CC label state is
    * the SAME incremental fold as [[streamComponents]] (own feed/state
    * dirs, so the two MVs stay independent); the cluster sizes and the
    * ⌊10⁶/size⌋ ppm weights — which any newly-arrived edge can shift by
    * merging clusters — derive on read through the shared
    * [[graft.Queries.softDedupWeights]] chain over the static documents
    * table, so any batching hash-matches the batch oracle. Fold what
    * merges (the union-find state), derive what doesn't (the census). */
  def streamSoftDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val labels = ccStateFold(ss, sfDir, "stream_softdd")
    graft.Queries.softDedupWeights(
      graft.ops.Tables.table(ss, sfDir, "documents"), labels)
  }

  /** STREAMING maintained BM25 index — the twin of
    * [[graft.Queries.searchBm25]]. A search index is exactly the
    * incremental-maintenance case: each document contributes its postings
    * ((doc, token, tf) rows) and its length ONCE, and because documents
    * partition across micro-batches, the fold is a DISJOINT append —
    * each batch writes only its own O(delta) postings/lengths files
    * (keyed by batchId, so a replayed batch overwrites itself:
    * exactly-once by idempotence), never rewriting the accumulated
    * index. Query-time df/totals are vocab-/one-row-sized aggregates the
    * scorer derives from the index, so the declared output scores the
    * SAME fixed query set from maintained state and hash-matches the
    * batch oracle bit-for-bit (all BM25 inputs are exact integers). */
  def streamBm25(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_bm25_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_bm25_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_bm25_ck_$tag")

    val slices = Seq(0, 1, 2)
    val complete = slices.forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet")))
    if (!complete) {
      val docs = graft.ops.Tables.table(ss, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_bm25_feed_build_$tag/staging/s$i"))
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val feedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val toks = batch.toDF().select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        toks.groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
          .write.mode("overwrite").parquet(s"$stateRoot/p$batchId")
        toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
          .write.mode("overwrite").parquet(s"$stateRoot/l$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    def stateDirs(prefix: String): Seq[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(stateRoot))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString)
          .filter(_.split("/").last.startsWith(prefix)).toSeq.sorted
      } finally s.close()
    }
    graft.Queries.bm25Score(ss,
      ss.read.parquet(stateDirs("p"): _*),
      ss.read.parquet(stateDirs("l"): _*))
  }

  /** STREAMING maintained embedding-Gram MV — the twin of
    * [[graft.Queries.embedGram]]. Every (i, j) second-moment cell is an
    * ADDITIVE exact integer (⌊v·10⁶⌋ products), so the maintained state
    * is the d(d+3)/2+1-row moment table itself, folded by plain cell
    * addition through the batchId-keyed exactly-once seam — the
    * covariance/PCA feeder kept current as embedding batches land,
    * without ever rescanning the corpus. Any batching yields the
    * identical integers, so the stream hash-matches the BATCH oracle
    * bit-for-bit. Per batch the [[graft.Queries.embedMoments]] kernel
    * runs over the delta only: O(delta) compute, constant-size state. */
  def streamGram(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_gram_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_gram_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_gram_ck_$tag")

    val slices = Seq(0, 1, 2)
    val complete = slices.forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet")))
    if (!complete) {
      val emb = graft.ops.Tables.table(ss, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_gram_feed_build_$tag/staging/s$i"))
        emb.filter(pmod(col("vec_id"), lit(3)) === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

    val feedSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stateSchema = StructType(Seq(StructField("i", LongType),
      StructField("j", LongType), StructField("v", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else s.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(
            graft.Queries.momentsOf(batch.toDF().select(col("embedding"))))
          .groupBy(col("i"), col("j")).agg(sum(col("v")).as("v"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .filter(col("j") >= 0)
      .select(col("i"), col("j"), col("v").as("sum_m2"))
      .orderBy(col("i"), col("j"))
  }

  /** STREAMING maintained drawdown MV — the twin of
    * [[graft.Queries.windowDrawdown]]. Daily revenue cells are ADDITIVE
    * partials ((type, day, cents) — sums add across any batching), so
    * the maintained state is the (types × days)-sized daily frame folded
    * through the batchId-keyed exactly-once seam; the running-peak
    * drawdown — which is NOT itself incrementalizable (a late low day
    * rewrites every later drawdown) — is computed ON READ over the
    * aggregate-sized state, exactly the materialized-view split: fold
    * what merges, derive what doesn't. Shares the batch oracle verbatim
    * (exact integer cents ⇒ hash-match). */
  /** STREAMING maintained Holt forecast — the twin of
    * [[graft.Queries.forecastHolt]]. The daily count cells (event_type,
    * day, n) are ADDITIVE partials (counts sum across any batching), so
    * the MV folds exactly like the drawdown/Gram states: per batch, one
    * delta aggregate unioned into the versioned state. The
    * inherently-sequential Holt recursion is NOT maintained — it derives
    * on read over the calendar-bounded MV through the SAME
    * [[graft.Queries.holtBacktest]] the batch query uses, so any
    * batching hash-matches the batch oracle. Fold what merges, derive
    * what doesn't. */
  def streamHolt(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_holt_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_holt_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_holt_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("ts"), col("event_type")),
      s"stream_holt_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("day", StringType),
      StructField("n", LongType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.holtBacktest(ss,
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
        .select(col("event_type"), to_date(col("day")).as("day"),
          col("n").as("actual")))
  }

  /** STREAMING maintained Pettitt changepoint monitor — the twin of
    * [[graft.Queries.dqPettitt]]. The per-(type, day) count grid is an
    * ADDITIVE MV (counts sum across any batching) folded through the
    * batchId-versioned seam; the rank/prefix U_t derivation — which any
    * late event anywhere in the calendar can shift — is NOT maintained:
    * it derives on read through the SAME
    * [[graft.Queries.pettittFromDaily]] chain the batch query uses, so
    * any batching hash-matches the batch oracle. State is bounded by
    * days × types. Fold what merges, derive what doesn't. */
  def streamPettitt(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_pettitt_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_pettitt_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_pettitt_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("ts"), col("event_type")),
      s"stream_pettitt_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("day", StringType),
      StructField("n", LongType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.pettittFromDaily(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
        .select(col("event_type"), to_date(col("day")).as("day"),
          col("n").as("x")))
  }

  /** The additive (event_type, day, n) daily-count MV fold shared by the
    * time-series monitors ([[streamAdf]], [[streamDurbinWatson]] — same
    * state shape as [[streamPettitt]], own feed/state dirs per caller so
    * the MVs stay independent). Returns the FINAL daily frame for the
    * caller's on-read derivation. */
  private def dailyCountFold(ss: SparkSession, sfDir: String,
                             prefix: String): DataFrame = {
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"${prefix}_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"${prefix}_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"${prefix}_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .select(col("ts"), col("event_type")),
      s"${prefix}_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("day", StringType),
      StructField("n", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("event_type"),
              date_format(col("ts"), "yyyy-MM-dd").as("day"))
            .agg(count(lit(1)).as("n")))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
      .select(col("event_type"), to_date(col("day")).as("day"),
        col("n").as("y"))
  }

  /** STREAMING maintained Dickey–Fuller monitor — the twin of
    * [[graft.Queries.dqAdf]]: the daily-count grid is ADDITIVE, folded
    * through the batchId-versioned seam; the lag pairs and centered
    * co-moments — which any late event shifts through its day's count —
    * derive on read via the shared [[graft.Queries.adfFromDaily]],
    * hash-matching the batch oracle. State bounded by days × types. */
  def streamAdf(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    graft.Queries.adfFromDaily(dailyCountFold(ss, sfDir, "stream_adf"))
  }

  /** STREAMING maintained Durbin–Watson monitor — the twin of
    * [[graft.Queries.dqDurbinWatson]], same additive daily-count MV
    * (own dirs), residual autocorrelation derived on read via the
    * shared [[graft.Queries.dwFromDaily]]. */
  def streamDurbinWatson(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    graft.Queries.dwFromDaily(dailyCountFold(ss, sfDir, "stream_dw"))
  }

  /** STREAMING maintained winsorized mean — the twin of
    * [[graft.Queries.aggWinsorizedMean]]. The (event_type, cents, m)
    * VALUE GRID is an ADDITIVE MV (occurrence counts sum across any
    * batching), folded through the batchId-versioned seam exactly like
    * the Holt daily-count MV; the order-statistic boundaries and the
    * clamped sum — which a late value anywhere can shift — are NOT
    * maintained: they derive on read through the SAME
    * [[graft.Queries.winsorizeFromGrid]] chain the batch query uses,
    * so any batching hash-matches the batch oracle. State is bounded by
    * DISTINCT values per type, never the event log. Fold what merges,
    * derive what doesn't. */
  def streamWinsorized(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_wins_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_wins_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_wins_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("cents", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_type"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType)
          .as("cents")),
      s"stream_wins_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("cents", LongType),
      StructField("m", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("event_type"), col("cents"))
            .agg(count(lit(1)).as("m")))
          .groupBy(col("event_type"), col("cents"))
          .agg(sum(col("m")).as("m"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.winsorizeFromGrid(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained daily-AUC monitor — the twin of
    * [[graft.Queries.evalAuc]], the shape a production scorer is watched
    * with as events land: the (day, cents) value grid with per-cell
    * positive/negative counts is ADDITIVE (each event contributes one
    * cell increment; counts sum across any batching), folded through the
    * batchId-versioned seam; the descending-score cumulative positives
    * and the trapezoid A2 — which a late event at any score shifts —
    * derive on read through the SAME [[graft.Queries.aucFromGrid]] chain
    * the batch query uses, so any batching hash-matches the batch
    * oracle. State is bounded by days × distinct values. The events feed
    * lands as THREE date-sliced files (staged, crash-safe), so
    * AvailableNow exercises a genuine multi-batch fold. */
  def streamAuc(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_auc_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_auc_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_auc_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("cents", LongType),
      StructField("pos", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType)
          .as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L)
          .as("pos")),
      s"stream_auc_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("day", DateType), StructField("cents", LongType),
      StructField("m1", LongType), StructField("m0", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(to_date(col("ts")).as("day"), col("cents"))
            .agg(sum(col("pos")).as("m1"),
              sum(lit(1L) - col("pos")).as("m0")))
          .groupBy(col("day"), col("cents"))
          .agg(sum(col("m1")).as("m1"), sum(col("m0")).as("m0"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.aucFromGrid(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained Kruskal–Wallis monitor — the twin of
    * [[graft.Queries.dqKruskal]]: the (event_type, cents) value grid is
    * ADDITIVE (one cell increment per event), folded through the
    * batchId-versioned seam; the global doubled ranks and the
    * tie-corrected H — which a late event at any value shifts — derive
    * on read through the SAME [[graft.Queries.kruskalFromGrid]] chain
    * the batch query uses, so any batching hash-matches the batch
    * oracle. State bounded by types × distinct values. */
  def streamKruskal(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_kw_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_kw_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_kw_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("cents", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_type"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType)
          .as("cents")),
      s"stream_kw_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("cents", LongType),
      StructField("cnt", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("event_type"), col("cents"))
            .agg(count(lit(1)).as("cnt")))
          .groupBy(col("event_type"), col("cents"))
          .agg(sum(col("cnt")).as("cnt"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.kruskalFromGrid(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained k-anonymity census — the twin of
    * [[graft.Queries.dqKanonymity]], the privacy monitor a publishing
    * pipeline runs as customer rows land: the QI group-count grid
    * (nation, segment, band, cnt) is ADDITIVE, folded through the
    * batchId-versioned seam; the per-threshold suppression census —
    * which any arriving row shifts (a group crossing k flips whole
    * groups between buckets) — derives on read through the SAME
    * [[graft.Queries.kanonymityFromSizes]] chain, so any batching
    * hash-matches the batch oracle. State bounded by QI cardinality.
    * The customer feed (no event time) lands as THREE custkey-sliced
    * files (staged, crash-safe), so AvailableNow exercises a genuine
    * multi-batch fold. */
  def streamKanonymity(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_kanon_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_kanon_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_kanon_ck_$tag")
    val feed = graft.ops.Tables.table(ss, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 500) " +
          "AS BIGINT)").as("band"))
    val slices = Seq(0, 1, 2)
    val complete = slices.forall { i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet"))
    }
    if (!complete) {
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_kanon_feed_build_$tag/staging/s$i"))
        feed.filter(pmod(col("c_custkey"), lit(3)) === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val feedSchema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_nationkey", IntegerType),
      StructField("c_mktsegment", StringType),
      StructField("band", LongType)))
    val stateSchema = StructType(Seq(
      StructField("c_nationkey", IntegerType),
      StructField("c_mktsegment", StringType),
      StructField("band", LongType), StructField("sz", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
            .agg(count(lit(1)).as("sz")))
          .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
          .agg(sum(col("sz")).as("sz"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.kanonymityFromSizes(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained domain-mixture MV — the ingest-side twin of
    * `sample_domain_mix`: the per-domain (n_docs, chars, toks) cells are
    * ADDITIVE, folded through the batchId-versioned seam as document
    * batches land; the Group-DRO multiplicative-weights iterate — whose
    * every round depends on ALL domains' totals — derives on read via
    * the shared [[graft.Queries.domainMixFromStats]], so any batching
    * hash-matches the batch oracle. State is domain-cardinality rows
    * forever: the mixture weights for a 100 TB corpus are maintained by
    * folding a 5-row table per micro-batch. */
  def streamDomainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_dmix_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_dmix_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_dmix_ck_$tag")
    val feed = graft.ops.Tables.table(ss, sfDir, "documents")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast(LongType).as("chars"),
        size(split(col("text"), " ", -1)).cast(LongType).as("toks"))
    val slices = Seq(0, 1, 2)
    val complete = slices.forall { i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet"))
    }
    if (!complete) {
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_dmix_feed_build_$tag/staging/s$i"))
        feed.filter(pmod(col("doc_id"), lit(3)) === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val src = java.nio.file.Files.list(part)
        val f = try src.filter(p => p.toString.endsWith(".parquet"))
          .findFirst().get() finally src.close()
        java.nio.file.Files.move(f, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val feedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("chars", LongType), StructField("toks", LongType)))
    val stateSchema = StructType(Seq(
      StructField("lang", StringType), StructField("n_docs", LongType),
      StructField("chars", LongType), StructField("toks", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("lang"))
            .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("chars"),
              sum(col("toks")).as("toks")))
          .groupBy(col("lang"))
          .agg(sum(col("n_docs")).as("n_docs"), sum(col("chars")).as("chars"),
            sum(col("toks")).as("toks"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.domainMixFromStats(ss,
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained serving-feature table — the feature-store
    * write path: the per-category (n, Σ target) cells are ADDITIVE,
    * folded through the batchId-versioned seam as events land; the
    * smoothed encoding — which every arriving event shifts through both
    * its own category and the global prior — derives on read via the
    * shared [[graft.Queries.encodeFromAgg]], so any batching
    * hash-matches the batch oracle. State is category-cardinality rows
    * forever. */
  def streamFeatureEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_enc_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_enc_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_enc_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("x", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_type"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType)
          .as("x")),
      s"stream_enc_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("n", LongType),
      StructField("s", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(batch.toDF()
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"), sum(col("x")).as("s")))
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.encodeFromAgg(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained weighted sample — the twin of
    * [[graft.Queries.sampleWeighted]]: A-ES top-k by a per-row
    * DETERMINISTIC key is a mergeable fold (union the batch with the
    * kept candidates, truncate to k — any batching yields the same
    * final set), so the state is exactly k candidate rows folded
    * through the batchId-versioned seam, and the output derives on
    * read through the SAME [[graft.Queries.weightedSampleFromRows]]
    * chain, hash-matching the batch oracle. */
  def streamWeightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_ws_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_ws_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_ws_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("cents", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_id"), col("event_type"),
        (graft.ops.Cleanse.dec2(col("value")) * 100).cast(LongType)
          .as("cents"))
      .filter(col("cents") > 0),
      s"stream_ws_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("cents", LongType)))
    def topK(df: DataFrame): DataFrame = {
      val h = expr("CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, " +
        "12), 16, 10) AS BIGINT)")
      val key = (log((h + lit(1)).cast(DoubleType)
          / lit(281474976710657.0)).cast(DoubleType)
        / col("cents").cast(DoubleType))
      df.withColumn("k", key)
        .orderBy(col("k").desc, col("event_id")).limit(200)
        .select(col("event_id"), col("event_type"), col("cents"))
    }
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        topK(state.unionByName(batch.toDF()
            .select(col("event_id"), col("event_type"), col("cents"))))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.weightedSampleFromRows(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** STREAMING maintained classifier-monitoring MV — the twin of
    * [[graft.Queries.evalConfusion]], the shape a production filtering
    * pipeline runs to watch its lang-ID classifier as documents land:
    * confusion CELLS (lang, predicted_lang, n) are ADDITIVE partials
    * (each doc contributes one cell count, counts sum across any
    * batching), folded through the batchId-versioned seam; the
    * true-class totals and recall shares — ratios a late doc anywhere
    * shifts — derive on read through the SAME
    * [[graft.Queries.confusionShares]] chain the batch query uses, so
    * any batching hash-matches the batch oracle. State is (classes)²
    * rows forever. The documents feed lands as THREE doc_id-sliced
    * files (staged, crash-safe), so AvailableNow exercises a genuine
    * multi-batch fold. */
  def streamConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_conf_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_conf_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_conf_ck_$tag")
    val slices = Seq(0, 1, 2)
    val complete = slices.forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet")))
    if (!complete) {
      val docs = graft.ops.Tables.table(ss, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_conf_feed_build_$tag/staging/s$i"))
        docs.filter(col("doc_id") % 3 === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val one = java.nio.file.Files.list(part)
        val src = try {
          import scala.jdk.CollectionConverters._
          one.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        } finally one.close()
        java.nio.file.Files.createDirectories(landing)
        java.nio.file.Files.move(src, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val feedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val stateSchema = StructType(Seq(
      StructField("lang", StringType),
      StructField("predicted_lang", StringType), StructField("n", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        val delta = batch.toDF()
          .select(col("lang"),
            graft.text.TextOps.predictedLang(
              graft.text.TextOps.tokens(col("text"))).as("predicted_lang"))
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n"))
        state.unionByName(delta)
          .groupBy(col("lang"), col("predicted_lang"))
          .agg(sum(col("n")).as("n"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.confusionShares(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  /** Streaming maintained inter-rater-agreement MV (§2.9, round 10): the
    * [[graft.Queries.evalCohenKappa]] contingency grid maintained
    * incrementally — per batch ONE additive delta aggregate of the four
    * (ra, rb) cells, folded into batchId-versioned state through the
    * exactly-once seam; kappa/po/pe/McNemar are DERIVED ON READ through
    * the shared [[graft.Queries.kappaFromGrid]], never stored — the
    * mergeable-sketch discipline every maintained MV here follows. State
    * is at most 4 rows regardless of corpus size; the final output
    * hash-matches the batch query's oracle because fold order cannot
    * change an additive grid. */
  def streamKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_kappa_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_kappa_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_kappa_ck_$tag")
    val slices = Seq(0, 1, 2)
    val complete = slices.forall(i =>
      java.nio.file.Files.exists(landing.resolve(s"s$i.parquet")))
    if (!complete) {
      val docs = graft.ops.Tables.table(ss, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      slices.foreach { i =>
        val part = java.nio.file.Paths.get(graft.ops.TempFiles.dir(
          s"stream_kappa_feed_build_$tag/staging/s$i"))
        docs.filter(col("doc_id") % 3 === i)
          .repartition(1).write.mode("overwrite").parquet(part.toString)
        val one = java.nio.file.Files.list(part)
        val src = try {
          import scala.jdk.CollectionConverters._
          one.iterator().asScala.find(_.toString.endsWith(".parquet")).get
        } finally one.close()
        java.nio.file.Files.createDirectories(landing)
        java.nio.file.Files.move(src, landing.resolve(s"s$i.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    val feedSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val stateSchema = StructType(Seq(
      StructField("ra", LongType), StructField("rb", LongType),
      StructField("m", LongType)))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        val toks = graft.text.TextOps.tokens(col("text"))
        val n = size(toks)
        val stop = graft.text.TextOps.markerCount(toks, "the") +
          graft.text.TextOps.markerCount(toks, "a")
        val delta = batch.toDF()
          .select(
            when(lit(2) * size(array_distinct(toks)) >= n, lit(1L))
              .otherwise(lit(0L)).as("ra"),
            when(lit(20) * stop >= n, lit(1L)).otherwise(lit(0L)).as("rb"))
          .groupBy(col("ra"), col("rb"))
          .agg(count(lit(1)).as("m"))
        state.unionByName(delta)
          .groupBy(col("ra"), col("rb"))
          .agg(sum(col("m")).as("m"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.kappaFromGrid(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}"))
  }

  def streamDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = streamSession(spark)
    val tag = graft.ops.TempFiles.tag(sfDir)
    val landing = java.nio.file.Paths.get(
      graft.ops.TempFiles.dir(s"stream_dd_feed_$tag"))
    val stateRoot = graft.ops.TempFiles.dir(s"stream_dd_state_$tag")
    val ckDir = graft.ops.TempFiles.dir(s"stream_dd_ck_$tag")
    val feedSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("cents", LongType)))
    buildDateSlicedFeed(landing, graft.ops.Tables.table(ss, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("ts"), col("event_type"),
        (Cleanse.dec2(col("value")) * 100).cast(LongType).as("cents")),
      s"stream_dd_feed_build_$tag")
    val stateSchema = StructType(Seq(
      StructField("event_type", StringType), StructField("day", StringType),
      StructField("cents", LongType)))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(sum(col("cents")).as("cents"))
    val q = ss.readStream.schema(feedSchema)
      .option("maxFilesPerTrigger", "1").parquet(landing.toString)
      .writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val prev = listStateVersions(stateRoot).filter(_ < batchId)
        val state =
          if (prev.isEmpty) batch.sparkSession.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](), stateSchema)
          else batch.sparkSession.read.parquet(s"$stateRoot/v${prev.max}")
        state.unionByName(partials(batch.toDF()))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("cents")).as("cents"))
          .write.mode("overwrite").parquet(s"$stateRoot/v$batchId")
        ()
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    graft.Queries.drawdownOverDaily(
      ss.read.parquet(s"$stateRoot/v${listStateVersions(stateRoot).max}")
        .select(col("event_type"), to_date(col("day")).as("day"),
          col("cents")))
  }
}

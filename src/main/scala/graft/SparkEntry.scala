package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query names are SURVEY.md §2's "Query name" column; each pairs with a
  * DuckDB oracle in [[OracleSql]] (omitted only for ops that are not
  * SQL-expressible, which get the driver's rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Funnel.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_flagship"     -> (ops.Funnel.flagship(_, _)),
    "scan_parquet"        -> (Queries.scanParquet(_, _)),
    "agg_group_count"     -> (Queries.aggGroupCount(_, _)),
    "agg_mode"            -> (Queries.aggMode(_, _)),
    "agg_funnel_flags"    -> (Queries.aggFunnelFlags(_, _)),
    "dedup_latest"        -> (Queries.dedupLatest(_, _)),
    "sort_global"         -> (Queries.sortGlobal(_, _)),
    "topk_limit"          -> (Queries.topkLimit(_, _)),
    "join_funnel_inner"   -> (Queries.joinFunnelInner(_, _)),
    "join_left_anti"      -> (Queries.joinLeftAnti(_, _)),
    "join_left_semi"      -> (Queries.joinLeftSemi(_, _)),
    "filter_since"        -> (Queries.filterSince(_, _)),
    "filter_isin"         -> (Queries.filterIsIn(_, _)),
    "filter_not_isin"     -> (Queries.filterNotIsIn(_, _)),
    "filter_notnull_cast" -> (Queries.filterNotNullCast(_, _)),
    "json_extract"        -> (Queries.jsonExtract(_, _)),
    "project_drop"        -> (Queries.projectDrop(_, _)),
    "union_by_name"       -> (Queries.unionByNameDrift(_, _)),
    "set_ops"             -> (Queries.setOps(_, _)),
    "scan_json_multiline" -> (Queries.scanJsonMultiline(_, _)),
    "scan_ndjson"         -> (Queries.scanNdjson(_, _)),
    "scan_double_json"    -> (Queries.scanDoubleJson(_, _)),
    "scan_kafka_envelope" -> (Queries.scanKafkaEnvelope(_, _)),
    "scan_pruned_files"   -> (Queries.scanPrunedFiles(_, _)),
    "scan_orc"            -> (Queries.scanOrc(_, _)),
    "scan_csv_malformed"  -> (Queries.scanCsvMalformed(_, _)),
    "merge_upsert"        -> (Queries.mergeUpsert(_, _)),
    "sink_overwrite"      -> (Queries.sinkOverwrite(_, _)),
    "ddl_from_schema"     -> (Queries.ddlFromSchema(_, _)),
    "flatten_struct"      -> (Queries.flattenStructQ(_, _)),
    "rename_sanitize"     -> (Queries.renameSanitize(_, _)),
    "ts_parse_iso"        -> (Queries.tsParseIso(_, _)),
    "ts_from_epoch_s"     -> (Queries.tsFromEpochS(_, _)),
    "ts_from_epoch_ms"    -> (Queries.tsFromEpochMs(_, _)),
    "date_format_str"     -> (Queries.dateFormatStr(_, _)),
    "null_if_empty"       -> (Queries.nullIfEmptyQ(_, _)),
    "regexp_replace_chain"-> (Queries.regexpReplaceChain(_, _)),
    "filter_array_overlap"-> (Queries.filterArrayOverlap(_, _)),
    "to_json_col"         -> (Queries.toJsonCol(_, _)),
    "stream_file_source"  -> (streaming.StreamTwins.fileSourceCounts(_, _)),
    "stream_watermark"    -> (streaming.StreamTwins.watermarkWindow(_, _)),
    "stream_dedup"        -> (streaming.StreamTwins.streamDedupKeys(_, _)),
    "stream_sessionize"   -> (streaming.StreamTwins.streamSessionize(_, _)),
    "stream_stream_join"  -> (streaming.StreamTwins.streamStreamJoin(_, _)),
    "stream_dedup_incremental" -> (streaming.StreamTwins.streamIncrementalDedup(_, _)),
    "lang_id"             -> (Queries.langId(_, _)),
    "text_quality"        -> (Queries.textQuality(_, _)),
    "token_count"         -> (Queries.tokenCount(_, _)),
    "doc_fingerprint"     -> (Queries.docFingerprint(_, _)),
    "doc_winnow"          -> (Queries.docWinnow(_, _)),
    "text_tfidf"          -> (Queries.textTfidf(_, _)),
    "dedup_exact"         -> (Queries.dedupExact(_, _)),
    "dedup_ngram_jaccard" -> (Queries.dedupNgramJaccard(_, _)),
    "dedup_minhash_lsh"   -> (Queries.dedupMinhashLsh(_, _)),
    "dedup_simhash"       -> (Queries.dedupSimhash(_, _)),
    "dedup_simhash_verified" -> (Queries.dedupSimhashVerified(_, _)),
    "dedup_embedding_cosine" -> (Queries.dedupEmbeddingCosine(_, _)),
    "dedup_embedding_lsh" -> (Queries.dedupEmbeddingLsh(_, _)),
    "ann_cosine_topk"     -> (Queries.annCosineTopK(_, _)),
    "ann_lsh_topk"        -> (Queries.annLshTopK(_, _)),
    "ann_lsh_recall"      -> (Queries.annLshRecall(_, _)),
    "ann_ivf_topk"        -> (Queries.annIvfTopK(_, _)),
    "mm_decode"           -> (Queries.mmDecode(_, _)),
    "mm_resize"           -> (Queries.mmResize(_, _)),
    "mm_frame_sample"     -> (Queries.mmFrameSample(_, _)),
    "sql_surface"         -> (Queries.sqlSurface(_, _)),
    "join_asof"           -> (Queries.joinAsof(_, _)),
    "topk_per_group"      -> (Queries.topkPerGroup(_, _)),
    "dedup_apply"         -> (Queries.dedupApply(_, _)),
    "agg_percentiles"     -> (Queries.aggPercentiles(_, _)),
    "agg_rollup"          -> (Queries.aggRollup(_, _)),
    "agg_pivot"           -> (Queries.aggPivot(_, _)),
    "window_running"      -> (Queries.windowRunning(_, _)),
    "agg_hll_sketch"      -> (Queries.aggHllSketch(_, _)),
    "sink_csv_copy"       -> (Queries.sinkCsvCopy(_, _)),
    "sink_partitioned"    -> (Queries.sinkPartitioned(_, _)),
    "sink_clustered"      -> (Queries.sinkClustered(_, _)),
    "sink_compacted"      -> (Queries.sinkCompacted(_, _)),
    "join_bucketed"       -> (Queries.joinBucketed(_, _)),
    "dedup_latest_agg"    -> (Queries.dedupLatestAgg(_, _)),
    "window_sessionize"   -> (Queries.windowSessionize(_, _)),
    "window_sessionize_native" -> (Queries.windowSessionizeNative(_, _)),
    "dedup_components"    -> (Queries.dedupComponents(_, _)),
    "dedup_components_star" -> (Queries.dedupComponentsStar(_, _)),
    "dedup_apply_cc"      -> (Queries.dedupApplyCc(_, _)),
    "sample_hash"         -> (Queries.sampleHash(_, _)),
    "sample_stratified"   -> (Queries.sampleStratified(_, _)),
    "sample_mix_quota"    -> (Queries.sampleMixQuota(_, _)),
    "vocab_topk"          -> (Queries.vocabTopk(_, _)),
    "corpus_curate"       -> (Queries.corpusCurate(_, _)),
    "profile_table"       -> (Queries.profileTable(_, _)),
    "dedup_incremental"   -> (Queries.dedupIncremental(_, _)),
    "decontaminate"       -> (Queries.decontaminate(_, _)),
    "pack_tokens"         -> (Queries.packTokens(_, _)),
    "quality_deciles"     -> (Queries.qualityDeciles(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}

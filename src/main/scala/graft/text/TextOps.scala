package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for LLM training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are pure
  * Catalyst column expressions (whole-stage-codegen'd, no UDFs), so they
  * stream through a 100 TB documents scan without shuffles — each is a
  * narrow map over the text column.
  */
object TextOps {

  def tokens(text: Column): Column = split(text, " ")

  /** Count of tokens equal to `word` (token-exact, not substring). */
  def markerCount(toks: Column, word: String): Column =
    size(filter(toks, _ === lit(word)))

  /** n-gram-heuristic language ID: per-language marker-token counts,
    * argmax with a fixed priority order (first max wins → deterministic).
    * Real pipelines plug in character-n-gram profiles; the operator shape —
    * a branchless scoring expression over the token array — is the same. */
  val langMarkers: Seq[(String, String)] =
    Seq("en" -> "the", "es" -> "a", "de" -> "data", "fr" -> "key", "zh" -> "spark")

  def predictedLang(toks: Column): Column = {
    val scores = langMarkers.map { case (l, w) => l -> markerCount(toks, w) }
    val mx = greatest(scores.map(_._2): _*)
    scores.init.foldRight(lit(scores.last._1): Column) { case ((l, s), rest) =>
      when(s === mx, lit(l)).otherwise(rest)
    }
  }

  /** Quality metrics: token counts, uniqueness ratio, mean token length,
    * stopword ratio — the standard cheap filters before expensive dedup. */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks)
    val nUniq = size(array_distinct(toks))
    val stop = markerCount(toks, "the") + markerCount(toks, "a")
    Seq(
      n.as("n_tokens"),
      nUniq.as("n_uniq_tokens"),
      round(nUniq.cast(DoubleType) / n.cast(DoubleType), 4).as("uniq_ratio"),
      round((length(text) - (n - lit(1))).cast(DoubleType) / n.cast(DoubleType), 4)
        .as("mean_token_len"),
      round(stop.cast(DoubleType) / n.cast(DoubleType), 4).as("stopword_ratio"))
  }

  /** Whitespace tokens vs regex word tokens (BPE-ish pre-tokenizer shape). */
  def tokenCounts(text: Column): Seq[Column] = Seq(
    size(split(text, " ")).as("n_ws_tokens"),
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+"), lit(0))).as("n_re_tokens"))

  /** Content fingerprint: md5 over whitespace-normalized lowercase text,
    * plus a short prefix bucket (shard key for fingerprint joins). */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, " +", " ")))

  /** Intra-document repetition stats (the Gopher/MassiveText duplicate-
    * n-gram signal): per id — total and distinct trigram-occurrence counts
    * and the fraction of occurrences belonging to a trigram repeated within
    * the same document. Docs shorter than 3 tokens are dropped (no trigram
    * exists). The signal is purely per-document, so it runs as a ZERO-
    * shuffle narrow map (the `RepetitionStats` kernel — one token pass,
    * one count map per row); [[repetitionStatsGrouped]] is the shuffle-
    * based differential form the kernel is spec'd against. */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame =
    df.filter(size(tokens(col(textCol))) >= 3)
      .select(col(idCol),
        call_function("graft_repstats", col(textCol)).as("__r"))
      .select(col(idCol), col("__r.n_tri").as("n_tri"),
        col("__r.n_distinct_tri").as("n_distinct_tri"),
        round(col("__r.rep3_frac"), 4).as("rep3_frac"))

  /** The grouped two-shuffle form of [[repetitionStats]] (occurrence
    * explode → per-gram count → per-doc re-aggregate) — kept as the
    * built-in-operators differential spec for the kernel. */
  def repetitionStatsGrouped(df: org.apache.spark.sql.DataFrame, idCol: String,
                             textCol: String): org.apache.spark.sql.DataFrame = {
    val tri = transform(sequence(lit(0), size(col("__t")) - 3), i =>
      concat_ws(" ", element_at(col("__t"), i + 1),
        element_at(col("__t"), i + 2), element_at(col("__t"), i + 3)))
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(idCol), explode(tri).as("__tri"))
      .groupBy(col(idCol), col("__tri")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_tri"),
        count(lit(1)).as("n_distinct_tri"),
        round(sum(when(col("__cnt") >= 2, col("__cnt")).otherwise(0L))
          .cast(DoubleType) / sum(col("__cnt")).cast(DoubleType), 4)
          .as("rep3_frac"))
  }

  /** Winnowing rolling-hash fingerprints ([[graft.functions.Winnow]]):
    * sorted distinct window-minimum Rabin hashes of k-byte grams — any
    * shared substring of length ≥ w + k − 1 shares a fingerprint. */
  def winnow(text: Column, k: Int = 5, w: Int = 4): Column =
    call_function("graft_winnow", text, lit(k), lit(w))

  /** PII patterns redacted before training-data release, most-specific
    * first (emails before phones before bare IPs so an earlier rewrite
    * never creates a later match). Each is plain POSIX-compatible regex —
    * identical semantics under Java regex (Spark) and RE2 (most engines). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?\\d{1,2}-\\d{3}-\\d{3}-\\d{4}" -> "<PHONE>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>")

  /** PII redaction: a chain of codegen'd `regexp_replace` rewrites — a pure
    * narrow map, so it streams through a 100 TB scan with no shuffle. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** The document cut into fixed-size word chunks ("lines" for line-level
    * dedup when the corpus has no newlines) — a pure HOF composition
    * (sequence → slice → array_join), so chunking itself costs NO shuffle
    * and no row explosion until the caller explodes the (much smaller)
    * chunk array. */
  def wordChunks(text: Column, chunkWords: Int): Column = {
    val toks = tokens(text)
    val nChunks = (size(toks) + lit(chunkWords - 1)) / lit(chunkWords)
    transform(sequence(lit(0), nChunks.cast(IntegerType) - 1), i =>
      array_join(slice(toks, i * chunkWords + 1, lit(chunkWords)), " "))
  }

  /** Corpus unigram-LM quality score — the engine-side shape of the
    * CCNet/KenLM perplexity filter: each document scored by the mean
    * corpus frequency of its token occurrences (gibberish and rare-token
    * spam score low, common prose high; production swaps the in-corpus
    * unigram table for an external LM without changing the plan). All
    * arithmetic is exact integer sums until ONE final double division, so
    * scores are bit-identical across engines (no `ln`/`exp`). Cost at any
    * scale: one vocabulary aggregate, one equi-join of the token stream
    * back to the vocabulary (same key — the exchange is reused), one
    * per-document aggregate; every stage keyed and linear in corpus token
    * count. The corpus-total factor is a one-row broadcast. */
  def lmScore(df: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(vocab, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("sum_cnt"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("n_tokens"),
        round(col("sum_cnt").cast(DoubleType) /
          (col("n_tokens") * col("n_total")).cast(DoubleType), 9)
          .as("mean_tok_freq"))
  }

  /** Bigram collocations by PMI lift — the vocabulary-induction view of a
    * corpus ("new york"-style multiword units). Score is the pure rational
    * lift `P(xy) / (P(x)·P(y))` — rank-equivalent to PMI without the
    * cross-engine `log` — over bigrams occurring ≥ `minCount` times.
    * Bigrams come from a narrow `zip_with` over the shifted token array
    * (no self-join, no positional window); then two token-keyed aggregates
    * and two vocabulary joins, all linear in corpus token count. */
  def pmiCollocations(df: org.apache.spark.sql.DataFrame, textCol: String,
                      minCount: Int = 3,
                      topK: Int = 20): org.apache.spark.sql.DataFrame = {
    val arrs = df.select(tokens(col(textCol)).as("arr"))
    val uni = arrs.select(explode(col("arr")).as("tok"))
    val uniCnt = uni.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val nUni = uni.agg(count(lit(1)).as("n_uni"))
    val bi = arrs.select(explode(expr(
        "zip_with(slice(arr, 1, size(arr) - 1), slice(arr, 2, size(arr) - 1)," +
          " (a, b) -> struct(a AS w1, b AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val biCnt = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val nBi = bi.agg(count(lit(1)).as("n_bi"))
    biCnt.filter(col("c_xy") >= minCount)
      .join(uniCnt.toDF("w1", "c_x"), "w1")
      .join(uniCnt.toDF("w2", "c_y"), "w2")
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c_xy"),
        round((col("c_xy").cast(DoubleType) * col("n_uni").cast(DoubleType)
            * col("n_uni").cast(DoubleType)) /
          (col("n_bi").cast(DoubleType) * col("c_x").cast(DoubleType)
            * col("c_y").cast(DoubleType)), 6).as("pmi_lift"))
      .orderBy(col("pmi_lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Cross-document boilerplate removal (the CCNet/MassiveText line-dedup
    * pass, chunk-granular): any chunk occurring in ≥ `minDocs` distinct
    * documents is boilerplate; every document is reassembled from its
    * surviving chunks in order. Cost at any scale: one narrow chunking map,
    * one partial-agg shuffle on the chunk fingerprint (md5 — the key stays
    * 16 bytes however long the chunk is), one equi-join back, one keyed
    * re-aggregation per document. No windows, no cross joins; the chunk
    * table is bounded by corpus token count. */
  def dropBoilerplate(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String, chunkWords: Int = 8,
                      minDocs: Int = 2): org.apache.spark.sql.DataFrame = {
    val chunks = df
      .select(col(idCol), posexplode(wordChunks(col(textCol), chunkWords))
        .as(Seq("chunk_id", "chunk_text")))
      .withColumn("h", md5(col("chunk_text")))
    val boiler = chunks.groupBy(col("h"))
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("h"), lit(true).as("is_boiler"))
    chunks.join(boiler, Seq("h"), "left")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("is_boiler").cast(LongType)).as("n_dropped"),
        array_join(transform(
          filter(array_sort(collect_list(struct(col("chunk_id"),
            col("chunk_text"), col("is_boiler")))), c => !c("is_boiler")),
          c => c("chunk_text")), " ").as("kept_text"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate for the oracle↔fixture coupling documented at the head of
  * [[OracleSql]] (round-7, ADVICE r6 medium): the byte-derived oracles
  * (the `byteOracles` list below) address text through DuckDB's
  * CODEPOINT-based length()/substr()/ord()/string_split while the engine
  * indexes UTF-8 bytes (audio/scene/winnow/chunker/FNV token hashes) or
  * Java UTF-16 chars (the tokenizers and BPE symbol splits). The three
  * units coincide exactly iff every document text is ASCII-only; the
  * `% length(text)` cycled addressing additionally requires non-empty
  * text. This spec turns that silent-divergence risk into a
  * LOUD failure naming the affected oracles if the generated corpus is
  * ever regenerated with non-ASCII or empty documents — at which point
  * those oracles must be re-expressed over `encode(text)` octet
  * addressing instead.
  */
class OracleCouplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val byteOracles = Seq("mm_audio_features", "mm_audio_vad",
    "mm_audio_fingerprint", "mm_scene_cut", "doc_winnow",
    "mm_chunk_dedup", "dedup_simhash_struct",
    "tokenize_wordpiece", "tokenize_unigram", "vocab_bpe_iterative",
    // round 9: the pHash pipeline replays re-derive BMP pixel bytes via
    // ord(substr(text, (j % length(text)) + 1, 1))
    "mm_phash_dedup", "mm_phash_incremental", "stream_phash")

  test("oracle_sql.json round-trips through a strict JSON parser with " +
    "every declared oracle intact (the driver artifact's escaping seam)") {
    // VERDICT r6 #1: the round-6 driver correctness artifact landed as
    // an empty {} — the builder's side of the insurance is proving the
    // document the driver json.load's is well-formed and complete.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(Verify.oracleJson) // throws on malformed
    assert(node.isObject, "oracle_sql.json must be one JSON object")
    val expected = SparkEntry.oracleSql
    assert(node.size() == expected.size,
      s"parsed ${node.size()} entries, declared ${expected.size}")
    expected.foreach { case (k, v) =>
      val got = node.get(k)
      assert(got != null, s"oracle '$k' missing after round-trip")
      assert(got.asText() == v,
        s"oracle '$k' SQL corrupted by JSON escaping")
    }
  }

  // sf0.1 included: it feeds the bench and the StressSf1 slice builder,
  // and a regeneration could change any sf independently
  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")) {
    test(s"every document text at $sf is ASCII-only and non-empty " +
      "(required for codepoint-addressed oracles to match the engine's " +
      "byte/char addressing)") {
      val docs = ops.Tables.table(spark, sf, "documents")
      val bad = docs.select(col("doc_id"), col("text"))
        .filter(col("text").isNull || length(col("text")) === 0 ||
          // UTF-8 byte length == char length ⟺ ASCII-only; and ASCII
          // text has no surrogate pairs, so Java chars == codepoints too
          octet_length(col("text")) =!= length(col("text")))
        .limit(5).collect()
      assert(bad.isEmpty,
        s"corpus at $sf carries non-ASCII or empty document text " +
          s"(doc_ids ${bad.map(_.getLong(0)).mkString(",")}) — the " +
          s"codepoint-addressed DuckDB oracles for " +
          s"${byteOracles.mkString(", ")} would silently diverge from " +
          "the engine's UTF-8-byte / UTF-16-char addressing; re-express " +
          "them over encode(text) octet addressing before trusting the " +
          "hash gate")
    }
  }
}

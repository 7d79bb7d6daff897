package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.text.NearDup

/** Scale-behavior checks that a correctness oracle can't see: a dup-heavy
  * 10× corpus must keep the LSH pipeline's buckets capped and its wall time
  * bounded (an O(n²) regression would blow the bound by ~100×). */
class StressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH survives a 10x dup-heavy corpus with capped buckets") {
    val docs = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text")
    val nDocs = docs.count()
    val big = (0 until 10).map(i => docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)

    val t0 = System.nanoTime()
    val pairs = NearDup.minhashDupPairs(big, "doc_id", "text", 0.8)
    val n = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9

    // every doc now has 10 byte-identical copies → C(10,2) certain pairs each
    assert(n >= 45L * nDocs, s"expected >= ${45 * nDocs} self-dup pairs, got $n")
    // the candidate join input respects the spam-bucket cap under 10x load
    val sh = NearDup.shingleTable(big, "doc_id", "text")
    val banded = NearDup.bandedTable(sh)
    val overCap = banded.groupBy("band", "bh").count()
      .filter(col("count") > 1000).count()
    val kept = banded.groupBy("band", "bh").count()
      .filter(col("count") <= 1000)
      .agg(max(col("count"))).collect()(0).getLong(0)
    banded.unpersist(); sh.unpersist(); pairs.unpersist()
    assert(kept <= 1000)
    info(f"10x corpus: $n pairs in $secs%.1f s; $overCap spam buckets dropped")
    // an O(n^2) plan at 5000 docs would take minutes; linear-ish takes seconds
    assert(secs < 120, s"10x corpus took $secs s — scale regression")
  }

  test("cached pair table is computed once and reused by the apply step") {
    val docs = ops.Tables.table(spark, sf, "documents")
    val a = NearDup.minhashDupPairsCached(docs, "doc_id", "text", 0.8, "spec-key")
    val b = NearDup.minhashDupPairsCached(docs, "doc_id", "text", 0.8, "spec-key")
    assert(a eq b)
  }

  test("connected components close the 10x dup graph in bounded rounds") {
    // 10 byte-identical copies of every doc → dense near-clique clusters:
    // tens of thousands of edges, the worst realistic load for the
    // clustering step between detection and apply
    val docs = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text")
    val big = (0 until 10).map(i => docs.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val pairs = NearDup.minhashDupPairs(big, "doc_id", "text", 0.8)
    val nEdges = pairs.count()

    val t0 = System.nanoTime()
    val comp = ops.Components.connectedComponents(pairs, "a_id", "b_id")
    val secs = (System.nanoTime() - t0) / 1e9
    import spark.implicits._
    val labels = comp.as[(Long, Long)].collect()
    comp.unpersist(); pairs.unpersist()

    // every vertex of the pair graph is labeled, labels are component minima
    val byComp = labels.groupBy(_._2)
    assert(byComp.forall { case (c, members) => members.map(_._1).min == c })
    // the 10 copies of one doc must always share a component
    assert(labels.filter(_._1 % 1000000L == 0L)
      .groupBy(_._1 % 1000000L).forall(_._2.map(_._2).distinct.length == 1))
    info(f"$nEdges edges -> ${byComp.size} clusters of ${labels.length} docs " +
      f"in $secs%.1f s")
    assert(secs < 60, s"CC over the 10x dup graph took $secs s")
  }

  test("heaviest queries grow sub-linearly from sf0.01 to sf0.1 " +
    "(10x rows, growth slope)") {
    // correctness gates can't see a plan that is right but scales wrong;
    // the slope between scale factors can (SURVEY.md §6). Each of the five
    // heaviest catalog queries must grow by LESS than its 10x row growth —
    // a super-linear (O(n²)-ish) regression would show a slope >> 10.
    // Single-shot timings swing ±2x on this box, so the bound is the row
    // ratio itself, not a tighter constant.
    val names = Seq("corpus_curate", "dedup_incremental",
      "stream_dedup_incremental", "dedup_simhash_verified", "resample_ffill",
      // the two prefix-scan rewrites: their scale shape is the round-4
      // change, so their slope is part of the evidence
      "quality_deciles", "pack_tokens",
      // chunk-dedup pipeline: fingerprint agg + join-back + reassembly
      "dedup_boilerplate",
      // round-4 session additions that carry join/iteration structure:
      // cell-join kNN graph, iterative PageRank, prefix-filter containment
      "knn_graph_ivf", "graph_pagerank", "dedup_containment",
      // seventh-wave additions with join/explode structure: gram-window
      // dup audit, binned overlap join, phash Hamming join over 2n images
      "text_dup_ngrams", "join_interval_overlap", "mm_phash_dedup",
      // retrieval/warehouse waves: corpus-shuffling BM25, the 7-day
      // journey join, delta-scan SCD2 maintenance, the two-pass
      // apportionment rank, and the versioned CDC state fold
      "search_bm25", "attribution_touch", "merge_scd2_incremental",
      "window_allocation", "stream_cdc_apply",
      // the native as-of plan node: its merge pass must stay linear in
      // the shuffled partitions like the sort-merge join it mirrors
      "join_asof_native",
      // wave-J blocking joins: deletion-neighborhood fuzzy edit and the
      // exact prefix-filter Jaccard — both were rewritten for scale this
      // round, so their slope is the regression canary
      "join_fuzzy_edit", "dedup_prefix_filter",
      // wave-O additions that carry window/join/model-parameter structure:
      // the 20-replace tokenizer chain (collect + narrow map), the
      // user-keyed rolling OLS window, the cohort join+cumulative window,
      // and the 3-stage chained strict funnel
      "tokenize_bpe_apply", "window_rolling_regression", "cohort_ltv",
      "funnel_strict_order",
      // wave-Q additions with train/scan/scan-grid structure: the PQ
      // codebook train + ADC code scan, and the KS value grid with its
      // two distributed prefix scans
      "ann_pq_topk", "dq_ks",
      // continuation-wave structure carriers: the basket-bounded item
      // pair join and the B-way multiplier-bootstrap explosion
      "recommend_item_knn", "dq_bootstrap_ci",
      // wave-T/U structure carriers: the two-pass MG heavy-hitter recount
      // and the (label, dim)-keyed centroid aggregation over exploded
      // vectors (64x row multiplier before its shuffle)
      "vocab_heavy_hitters", "embed_centroids",
      // the 6-table TPC-H snowflake: its fact-fact shuffles are the
      // catalog's widest join tree
      "tpch_q5",
      // span removal: positioned-gram explode + ownership join +
      // coverage anti-join + reassembly aggregate
      "dedup_span_apply",
      // wave-AA structure carriers: the frontier-iterated BFS (per-round
      // joins over a persisted edge list) and the Mann-Whitney doubled
      // ranks through the distributed prefix scan
      "graph_bfs", "dq_mannwhitney",
      // wave-AH/AK structure carriers: the day-grouped descending prefix
      // scan (AUC), the CDC chunk explode + digest census, the
      // sample-trained Viterbi tokenizer, and the k-round min-distance
      // fold of the k-center coreset
      "eval_auc", "mm_chunk_dedup", "tokenize_unigram", "sample_kcenter")
    for (n <- names) {
      // min-of-2 per scale point: a single GC/JIT pause on either side of
      // the ratio can push a healthy query past the bound (it flaked once
      // under full-suite contention); the minimum is pause-robust
      val times = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").map {
        dir =>
          Seq.fill(2) {
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }.min
      }
      val slope = times(1) / times(0)
      info(f"$n: ${times(0)}%.2f s -> ${times(1)}%.2f s, " +
        f"growth $slope%.2fx on 10x rows")
      assert(slope < 10.0, s"$n grew ${slope}x on 10x rows — super-linear")
    }
  }
}

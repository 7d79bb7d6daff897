package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import Similarity.{dotd, withNorm}

/** Product quantization (PQ) ANN — the third scale path next to the LSH
  * banding and the IVF cells: compress each unit-normalized vector into `m`
  * small sub-codes (one per contiguous subspace) against per-subspace
  * codebooks of `k` centroids, then answer top-k queries by scanning the
  * CODES with per-query lookup tables (ADC — asymmetric distance
  * computation) instead of scanning raw floats. Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011.
  *
  * Why this is the 100 TB shape: a 64-dim float vector is 256 bytes; its PQ
  * code is `m` small ints (8 here) — a 32× smaller scan, which is the
  * difference between scanning 100 TB of embeddings and scanning ~3 TB of
  * codes. The codebook is a genuine MODEL PARAMETER (m·k·(dim/m) doubles =
  * dim·k total, a few KB regardless of corpus size), trained distributed
  * (no per-iteration driver collect: Lloyd means aggregate into the next
  * codebook table, the [[Ivf]] two-level discipline) and carried as a
  * one-row broadcast bundle — never a plan literal, so the
  * OversizedLiteral plan gate holds by construction. Encoding is a pure
  * narrow map (nested HOFs, whole-stage codegen; no join, no shuffle);
  * query scoring is one broadcast of the (small) query-LUT set against the
  * code scan with a per-query top-k window (WindowGroupLimit pushes the
  * rank bound below the exchange). A final exact re-rank of the top
  * `refine·k` ADC survivors restores exact cosine on the emitted rows, so
  * only RECALL is approximate — precision of returned scores is exact
  * (the [[Ivf]]/[[Similarity]] contract).
  *
  * Reference seam: the reference has no vector ops at all (pandas ETL);
  * this extends SURVEY §2.11's similarity-search family.
  */
object Pq {

  /** Normalized vectors: id, en (unit L2), plus the original e/nrm. Zero
    * vectors are dropped — they have no direction to quantize (same rule
    * as cosine itself, which is undefined at nrm = 0). */
  private def unit(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    withNorm(emb, idCol, vecCol)
      .filter(col("nrm") > 0)
      .withColumn("en", transform(col("e"), x => x / col("nrm")))

  /** Squared L2 between two array<double> columns as the sequential
    * zip_with/aggregate fold (bit-deterministic across engines). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Nearest-centroid position (0-based) of `sv` within `cents`
    * (array<array<double>>): argmin of squared L2, first-minimum
    * tie-break via array_position — deterministic on any engine. */
  private def argminL2(sv: Column, cents: Column): Column = {
    val dists = transform(cents, c => l2sq(sv, c))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Train per-subspace codebooks, distributed: explode each unit vector
    * into its `m` subvectors ONCE (m rows per vector, narrow), seed each
    * subspace by deterministic random partition (content-hash mod k), and
    * refine with `iters` Lloyd passes whose means aggregate straight into
    * the next codebook table (localCheckpoint truncates the iterative
    * lineage — the Components/PageRank discipline; nothing but the final
    * pack ever touches the driver, and even the pack is in-plan).
    * Returns the ONE-ROW bundle: cb = array[m][≤k][dim/m], each subspace's
    * centroid list sorted by cell id for cross-run determinism. */
  def trainCodebook(emb: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, iters: Int = 2): DataFrame = {
    val v = unit(emb, idCol, vecCol)
    val dim = v.select(size(col("en"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val d = dim / m
    val subs = v.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          mm => slice(col("en"), mm * d + 1, lit(d)))))
      .toDF("id", "sub", "sv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def means(assigned: DataFrame): DataFrame =
      assigned.select(col("sub"), col("cell"), posexplode(col("sv")))
        .toDF("sub", "cell", "dimIdx", "x")
        .groupBy(col("sub"), col("cell"), col("dimIdx"))
        .agg(avg(col("x")).as("mn"))
        .groupBy(col("sub"), col("cell"))
        .agg(array_sort(collect_list(struct(col("dimIdx"), col("mn"))))
          .as("dm"))
        .select(col("sub"), col("cell"),
          transform(col("dm"), s => s.getField("mn")).as("c"))

    // per-sub codebook rows grouped into (sub, cents array) for assignment
    def bySub(cb: DataFrame): DataFrame =
      cb.groupBy(col("sub"))
        .agg(array_sort(collect_list(struct(col("cell"), col("c"))))
          .as("kc"))
        .select(col("sub"), transform(col("kc"), s => s.getField("cell"))
          .as("cellIds"),
          transform(col("kc"), s => s.getField("c")).as("cents"))

    var cb = means(subs.select(col("sub"),
        pmod(hash(col("id"), col("sub")), lit(k)).cast("int").as("cell"),
        col("sv")))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      val assigned = subs.join(broadcast(bySub(cb)), "sub")
        .withColumn("cell", element_at(col("cellIds"),
          argminL2(col("sv"), col("cents")) + 1))
        .select(col("sub"), col("cell"), col("sv"))
      cb = means(assigned).localCheckpoint(true)
    }
    subs.unpersist()
    // one-row bundle, subspace-major, centroids sorted by cell id
    bySub(cb)
      .agg(array_sort(collect_list(struct(col("sub"), col("cents"))))
        .as("sc"))
      .select(transform(col("sc"), s => s.getField("cents")).as("cb"))
      .localCheckpoint(true)
  }

  private val dimCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TrieMap[String, Int]]())

  /** Session-memoized embedding dimensionality — stable per corpus, and
    * every query call needs it, so the one-row probe job runs once. */
  private def dimOf(v: DataFrame, idCol: String, vecCol: String,
                    cacheKey: Option[String]): Int = {
    def probe(): Int = v.select(size(col("en"))).head().getInt(0)
    cacheKey match {
      case Some(k) => dimCaches.computeIfAbsent(v.sparkSession,
          _ => TrieMap.empty[String, Int])
        .getOrElseUpdate(s"dim|$k|$idCol|$vecCol", probe())
      case None => probe()
    }
  }

  private val cbCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TrieMap[String, DataFrame]]())

  /** Session-cached codebook (train-once, probe-per-query — the in-session
    * analog of persisting the index artifact; [[Ivf.centroidsCached]]
    * pattern). */
  def codebookCached(emb: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int, cacheKey: String): DataFrame =
    cbCaches.computeIfAbsent(emb.sparkSession,
        _ => TrieMap.empty[String, DataFrame])
      .getOrElseUpdate(s"pq|$cacheKey|$idCol|$vecCol|$m|$k|$iters",
        trainCodebook(emb, idCol, vecCol, m, k, iters))

  /** The per-subspace code expression: position of each subvector's
    * nearest centroid within its codebook (`cb` = the bundle column). */
  private def codesExpr(en: Column, cb: Column, m: Int, d: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      mm => argminL2(slice(en, mm * d + 1, lit(d)),
        element_at(cb, (mm + 1).cast("int"))))

  /** The per-subspace lookup-table expression for a query: lut[m][c] =
    * dot(query subvector, centroid c) — both sides unit vectors, so
    * Σ_m lut[m][code_m] approximates the cosine. */
  private def lutsExpr(en: Column, cb: Column, m: Int, d: Int): Column =
    transform(sequence(lit(0), lit(m - 1)),
      mm => transform(element_at(cb, (mm + 1).cast("int")),
        c => dotd(slice(en, mm * d + 1, lit(d)), c)))

  /** ADC score of a code word against a query's LUT. */
  private def adcExpr(codes: Column, luts: Column): Column =
    aggregate(zip_with(codes, luts,
      (cd, lutm) => element_at(lutm, cd + 1)), lit(0.0), (acc, x) => acc + x)

  /** PQ codes for every vector: one narrow map under a broadcast of the
    * one-row codebook bundle — no shuffle, no join on the big side. Codes
    * are POSITIONS into each subspace's sorted centroid list (the LUT is
    * built from the same bundle, so positional codes are self-consistent
    * without carrying cell ids). */
  def encode(emb: DataFrame, idCol: String, vecCol: String, m: Int,
             dim: Int, cbBundle: DataFrame): DataFrame = {
    val v = unit(emb, idCol, vecCol)
    val d = dim / m
    v.crossJoin(broadcast(cbBundle))
      .withColumn("codes", codesExpr(col("en"), col("cb"), m, d))
      .select(col("id"), col("e"), col("nrm"), col("codes"))
  }

  private val codesCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TrieMap[String, DataFrame]]())

  /** Session-cached CODES table (localCheckpointed): the PQ index artifact
    * a deployment persists as a parquet table — encoded once per corpus,
    * scanned per query. Without this every search re-encodes the corpus it
    * already indexed. */
  def codesCached(emb: DataFrame, idCol: String, vecCol: String, m: Int,
                  dim: Int, nCodes: Int, iters: Int, cbBundle: DataFrame,
                  cacheKey: String): DataFrame =
    codesCaches.computeIfAbsent(emb.sparkSession,
        _ => TrieMap.empty[String, DataFrame])
      // the key must carry EVERY codebook-training parameter (nCodes,
      // iters): codes are positions into one specific codebook, and a
      // cache hit against codes encoded under different parameters would
      // pair them with the wrong LUTs — silently wrong neighbors
      .getOrElseUpdate(
        s"pqcodes|$cacheKey|$idCol|$vecCol|$m|$dim|$nCodes|$iters",
        encode(emb, idCol, vecCol, m, dim, cbBundle).localCheckpoint())

  /** ADC top-k with exact re-rank: scan the CODES against each query's
    * per-subspace lookup table (lut[m][c] = dot(query subvector,
    * centroid c) — since both sides are unit vectors, Σ_m lut[m][code_m]
    * approximates the cosine), keep the `refine`·k best ADC candidates
    * per query (windowed rank; WindowGroupLimit bounds the exchange), and
    * re-rank just those by EXACT cosine against the raw vectors (a
    * refine·k·|queries|-row join — model-parameter sized). Emits the same
    * schema as [[Ivf.ivfTopK]] so the recall twin reads uniformly. */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, m: Int = 8, nCodes: Int = 64,
              iters: Int = 3, refine: Int = 8,
              cacheKey: Option[String] = None): DataFrame = {
    val cb = cacheKey match {
      case Some(key) => codebookCached(emb, idCol, vecCol, m, nCodes, iters, key)
      case None => trainCodebook(emb, idCol, vecCol, m, nCodes, iters)
    }
    val v = unit(emb, idCol, vecCol)
    val dim = dimOf(v, idCol, vecCol, cacheKey)
    val d = dim / m
    val coded = cacheKey match {
      case Some(key) =>
        codesCached(emb, idCol, vecCol, m, dim, nCodes, iters, cb, key)
      case None => encode(emb, idCol, vecCol, m, dim, cb)
    }
    val q = v.filter(queryPred).crossJoin(broadcast(cb))
      .withColumn("luts", lutsExpr(col("en"), col("cb"), m, d))
      .select(col("id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qnrm"), col("luts"))
    val kept = coded.select(col("id"), col("codes"))
      .join(broadcast(q.select(col("q_id"), col("luts"))),
        col("id") =!= col("q_id"))
      .withColumn("adc", adcExpr(col("codes"), col("luts")))
      .withColumn("arn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc").desc, col("id"))))
      .filter(col("arn") <= k * refine)
      .select(col("q_id"), col("id"))
    kept
      .join(broadcast(q.select(col("q_id"), col("qe"), col("qnrm"))), "q_id")
      .join(v.select(col("id"), col("e"), col("nrm")), "id")
      .select(col("q_id"), col("id").as("neighbor_id"),
        (dotd(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
  }

  /** PQ STRUCTURAL twin (round 10, VERDICT r9 "next" #2 — the N7k recipe
    * of [[Ivf.latticeKnnStruct]] applied to the LAST un-twinned
    * approximate tier): the same machinery [[trainCodebook]] /
    * [[encode]] / [[adcTopK]] share — per-subspace slice → seeded Lloyd
    * (assign by squared L2, means, empty cells keep their previous
    * centroid) → positional code assignment → per-query distance LUT →
    * ADC sum over the code word → per-query top-k window — run in EXACT
    * INTEGER arithmetic: micro-lattice coordinates (⌊x·10⁶⌋, the
    * embed_gram discipline), truncating-division means (Spark `DIV` ==
    * DuckDB HUGEINT `//`, proven round 8), integer squared-L2 ADC. Seed
    * = `id mod nCodes` (replayable; production seeds by content hash,
    * the one piece a SQL twin cannot follow). Every step lands in the
    * `ann_pq_struct` recursive-CTE oracle, so codebook training AND ADC
    * scoring are hash-checked end to end; the production float tier
    * keeps its recall-floor specs ([[adcTopK]] via `ann_pq_recall`).
    *
    * Overflow bound: |coord| ≤ 1.2e6 ⇒ per-dim square ≤ 1.5e12, ×8 dims
    * per subspace ×8 subspaces ≈ 1e14 ≪ 2⁶³ — exact longs throughout. */
  def latticePqStruct(emb: DataFrame, idCol: String, vecCol: String,
                      queryPred: Column, k: Int, m: Int = 8,
                      nCodes: Int = 8, iters: Int = 2): DataFrame = {
    val lat = transform(col(vecCol), x =>
      floor(x.cast("double") * lit(1000000.0)).cast("long"))
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val d = dim / m
    // one narrow explode: (id, sub, sv) — m rows per vector, reused by
    // training, encoding, and the query LUTs
    val subs = emb.select(col(idCol).as("id"), posexplode(
        transform(sequence(lit(0), lit(m - 1)),
          mm => slice(lat, mm * d + 1, lit(d)))))
      .toDF("id", "sub", "sv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // exact per-(sub, cell) integer means — model-parameter sized
    // (m·nCodes·d longs), the twin's plan-literal codebook. ONE
    // codegen'd hash aggregate of d per-dimension long sums keyed by
    // (sub, cell) — the previous posexplode → (sub, cell, dim) agg →
    // collect_list regroup shape shuffled d× the rows through two
    // exchanges for the same exact integers (round 11, guide §2.3).
    def means(assigned: DataFrame): Map[(Int, Int), Seq[Long]] = {
      val aggs = (0 until d).map(i =>
        expr(s"sum(element_at(sv, ${i + 1})) DIV count(1)").as(s"m$i"))
      assigned.groupBy(col("sub"), col("cell")).agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) ->
          (0 until d).map(i => r.getLong(i + 2)).toSeq)
        .toMap
    }

    val seed = means(subs.select(col("sub"),
      pmod(col("id"), lit(nCodes)).cast("int").as("cell"), col("sv")))
    val origin = Seq.fill(d)(0L)
    var cents: Map[(Int, Int), Seq[Long]] =
      (for (s <- 0 until m; c <- 0 until nCodes)
        yield (s, c) -> seed.getOrElse((s, c), origin)).toMap
    // integer d² of this row's subvector against ITS subspace's codebook —
    // the single-pass kernel form (identical exact-long math to the former
    // transform/zip_with/aggregate tree, guide step 4)
    def d2s: Column = {
      val lit3 = typedlit((0 until m).map(s =>
        (0 until nCodes).map(c => cents((s, c)))))
      call_function("graft_lattice_d2s", col("sv"),
        element_at(lit3, col("sub") + 1))
    }
    def assign: Column = (array_position(d2s, array_min(d2s)) - 1).cast("int")
    for (_ <- 0 until iters) {
      val mns = means(subs.select(col("sub"), assign.as("cell"), col("sv")))
      cents = cents.map { case (key, old) => key -> mns.getOrElse(key, old) }
    }
    // codes: each (id, sub)'s nearest final centroid (ties → lowest cell)
    val codes = subs.select(col("id"), col("sub"), assign.as("cell"))
    // query LUTs: d² to EVERY cell of every subspace — posexplode position
    // IS the cell id (the codebook literal is cell-ordered)
    val qluts = subs.filter(queryPred)
      .select(col("id").as("q_id"), col("sub"), posexplode(d2s))
      .toDF("q_id", "sub", "cell", "d2")
    // ADC: one broadcast equi-join on (sub, cell) — each code word meets
    // exactly its m LUT entries per query; sum = the ADC distance
    codes.join(broadcast(qluts), Seq("sub", "cell"))
      .filter(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("d2")).as("adc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc").asc, col("id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("id").as("neighbor_id"),
        col("adc"), col("rn").cast("long").as("rn"))
  }

  /** IVF-PQ — the composed production index (the faiss IVFPQ shape): the
    * two-level IVF quantizer ([[Ivf.trainTwoLevel]]) BOUNDS the candidate
    * set (only vectors in the query's probed cells are touched at all),
    * and PQ codes make the touched set CHEAP to score (ADC over m small
    * ints instead of dim doubles). The two models are independent
    * KB-sized broadcasts; the index side is the corpus with (cell, codes)
    * attached by two narrow maps — at deployment that is ONE parquet
    * table bucketed by cell, refreshed incrementally like the signature
    * index. Search: probe `probes` cells per query (O(√nCells) per row),
    * ONE broadcast equi-join of the query-probe set against the
    * cell-keyed codes, ADC score, per-query top `refine`·k, exact-cosine
    * re-rank of the survivors. Candidate volume ≈ probes/nCells of the
    * corpus AND each candidate costs m int lookups — multiplicative
    * savings neither index achieves alone. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, k: Int, nCells: Int, m: Int = 8,
                nCodes: Int = 64, iters: Int = 3, probes: Int = 4,
                refine: Int = 8,
                cacheKey: Option[String] = None): DataFrame = {
    val idx = cacheKey match {
      case Some(key) => Ivf.twoLevelCached(emb, idCol, vecCol, nCells, 2, key)
      case None => Ivf.trainTwoLevel(emb, idCol, vecCol, nCells, 2)
    }
    val cb = cacheKey match {
      case Some(key) => codebookCached(emb, idCol, vecCol, m, nCodes, iters, key)
      case None => trainCodebook(emb, idCol, vecCol, m, nCodes, iters)
    }
    val v = unit(emb, idCol, vecCol)
    val dim = dimOf(v, idCol, vecCol, cacheKey)
    val d = dim / m
    // index side: (cell, codes) attached by two narrow maps — the
    // deployment form of "one bucketed codes table"; session-cached like
    // the signature indexes (built once per corpus, probed per query)
    def buildIndex(): DataFrame = Ivf.assignCells(v, idx, 1)
      .crossJoin(broadcast(cb))
      .withColumn("codes", codesExpr(col("en"), col("cb"), m, d))
      .select(col("cell"), col("id").as("neighbor_id"), col("codes"))
    val indexed = cacheKey match {
      case Some(key) => codesCaches.computeIfAbsent(emb.sparkSession,
          _ => TrieMap.empty[String, DataFrame])
        .getOrElseUpdate(
          s"ivfpq|$key|$idCol|$vecCol|$m|$nCodes|$iters|$nCells",
          buildIndex().localCheckpoint())
      case None => buildIndex()
    }
    val q = v.filter(queryPred)
    // query side probes EXTRA coarse cells (cp+1 beyond the heuristic):
    // a missed coarse cell hides its whole fine fanout, and at small cell
    // counts the default ceil(p/fanout)+1 coarse coverage caps recall
    // well below the fine-probe budget's reach
    val cpq = math.ceil(probes.toDouble / idx.fanout).toInt + 2
    val qProbes = Ivf.assignCells(q, idx, probes, coarseProbes = Some(cpq))
      .select(col("id").as("q_id"), col("cell"))
    val qLuts = q.crossJoin(broadcast(cb))
      .withColumn("luts", lutsExpr(col("en"), col("cb"), m, d))
      .select(col("id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qnrm"), col("luts"))
    val cand = indexed.join(broadcast(qProbes), Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
    val n = cand.groupBy("q_id").agg(count(lit(1)).as("n_candidates"))
    val kept = cand
      .join(broadcast(qLuts.select(col("q_id"), col("luts"))), "q_id")
      .withColumn("adc", adcExpr(col("codes"), col("luts")))
      .withColumn("arn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc").desc, col("neighbor_id"))))
      .filter(col("arn") <= k * refine)
      .select(col("q_id"), col("neighbor_id"))
    kept
      .join(broadcast(qLuts.select(col("q_id"), col("qe"), col("qnrm"))),
        "q_id")
      .join(v.select(col("id").as("neighbor_id"), col("e"), col("nrm")),
        "neighbor_id")
      .select(col("q_id"), col("neighbor_id"),
        (dotd(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .join(n, "q_id")
  }
}

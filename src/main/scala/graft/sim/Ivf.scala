package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap
import Similarity.{dotd, withNorm}

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to the LSH banding in [[Similarity]], and the design production
  * vector stores actually ship: partition the vector space into `nCells`
  * centroid cells, store each vector under its nearest centroid, and at
  * query time score only the cells the query probes.
  *
  * Spark-first shape: the centroid table is a MODEL PARAMETER, not a join
  * side — it is built once (k-means-style Lloyd refinement over the corpus,
  * all DataFrame aggregations), collected to the driver (nCells × dim
  * doubles, a few KB), and baked into the
  * [[graft.functions.NearestCentroids]] kernel as a plan literal. Cell
  * assignment is therefore a pure narrow map over the vector table — no
  * join, no explode, no shuffle — and search is one broadcast equi-join of
  * (query, probed-cell) pairs against the cell-keyed table. Candidate
  * volume is bounded by construction at ~`nProbes / nCells` of the corpus,
  * unlike LSH banding whose volume floats with the similarity threshold. */
object Ivf {

  /** Top-`p` nearest centroid indices for a vector column (narrow map). */
  def nearestCentroids(e: Column, cents: Seq[Seq[Double]], p: Int): Column =
    call_function("graft_nearest_centroids", e, typedlit(cents), lit(p))

  /** K-means-style centroids: deterministic seeding (first `nCells` vectors
    * by id), then `iters` Lloyd passes — assign (narrow map via the kernel),
    * per-dimension mean (one groupBy on the cell id), re-collect. Each pass
    * moves a few KB through the driver; the corpus is only ever scanned. */
  def centroids(emb: DataFrame, idCol: String, vecCol: String,
                nCells: Int, iters: Int = 2): Seq[Seq[Double]] = {
    val v = withNorm(emb, idCol, vecCol)
    var cents: Seq[Seq[Double]] = v.orderBy("id").limit(nCells)
      .select("e").collect().map(_.getSeq[Double](0)).toSeq
    for (_ <- 0 until iters) {
      val assigned = v.select(
        element_at(nearestCentroids(col("e"), cents, 1), 1).as("cell"),
        col("e"))
      val means = assigned
        .select(col("cell"), posexplode(col("e")))
        .toDF("cell", "dim", "x")
        .groupBy("cell", "dim").agg(avg(col("x")).as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("dim"),
          col("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    cents
  }

  /** Session-cached centroid tables keyed by corpus — an IVF index is
    * TRAINED ONCE and probed per query; re-running Lloyd on every search
    * call would re-scan the corpus for a model that hasn't changed (the
    * in-session analog of persisting the index artifact). Same weak-map
    * pattern as the pair caches. */
  private val centroidCaches = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, TrieMap[String, Seq[Seq[Double]]]]())

  def centroidsCached(emb: DataFrame, idCol: String, vecCol: String,
                      nCells: Int, iters: Int, cacheKey: String): Seq[Seq[Double]] =
    centroidCaches.computeIfAbsent(emb.sparkSession,
        _ => TrieMap.empty[String, Seq[Seq[Double]]])
      .getOrElseUpdate(s"ivf|$cacheKey|$idCol|$vecCol|$nCells|$iters",
        centroids(emb, idCol, vecCol, nCells, iters))

  /** SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): cluster
    * the embedding space with the SAME trained k-means centroids the IVF
    * index uses, then compare pairs only WITHIN each cell — the
    * cluster-then-compare recipe that turns the O(n²) pairwise scan into
    * O(Σ cellᵢ²). Cell assignment is the narrow plan-literal kernel map
    * (no join); the within-cell pairing is ONE equi-join on the cell id
    * (shuffle on cell, never a nested loop). Boundary splits (a dup pair
    * straddling two cells) are recovered by ASYMMETRIC multi-probe: every
    * vector is INDEXED under its primary cell only, and additionally
    * PROBES its `probes` nearest cells — a pair is compared iff either
    * endpoint's primary cell is on the other's probe list. Candidate
    * volume is therefore probes/nCells of the quadratic (not probes**2),
    * and with nCells grown ~ sqrt(corpus) at scale the ratio vanishes; the
    * SimilaritySpec floor pins the recall this buys. */
  def semanticDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                       minCos: Double, nCells: Int = 16, iters: Int = 2,
                       probes: Int = 1,
                       cacheKey: Option[String] = None): DataFrame = {
    val cents = cacheKey match {
      case Some(key) => centroidsCached(emb, idCol, vecCol, nCells, iters, key)
      case None => centroids(emb, idCol, vecCol, nCells, iters)
    }
    val v = withNorm(emb, idCol, vecCol)
    // index side: one row per vector under its primary cell
    val idx = v.select(
      element_at(nearestCentroids(col("e"), cents, 1), 1).as("cell"),
      col("id").as("a_id"), col("e").as("ae"), col("nrm").as("an"))
    // probe side: one row per (vector, probed cell)
    val prb = v.select(col("id").as("b_id"), col("e").as("be"),
      col("nrm").as("bn"),
      explode(nearestCentroids(col("e"), cents, probes)).as("cell"))
    idx.join(prb, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("cos", dotd(col("ae"), col("be")) / (col("an") * col("bn")))
      .filter(col("cos") >= minCos)
      // canonicalize: either direction may have found the pair
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("cos"))
      .dropDuplicates("a_id", "b_id")
  }

  /** Approximate kNN GRAPH: every vector's top-k neighbors at once — the
    * input graph-based curation methods consume (connectivity pruning,
    * density-based filtering, SemDeDup-style cluster analysis). Unlike
    * [[ivfTopK]] (a small query set, broadcast), both sides here are the
    * full corpus, so nothing is broadcast: vectors are INDEXED under their
    * primary cell (narrow plan-literal kernel map), every vector PROBES its
    * `probes` nearest cells, and candidates come from ONE shuffle equi-join
    * on the cell id — candidate volume ~ probes/nCells of the quadratic,
    * vanishing as nCells grows ~ sqrt(corpus). The per-query top-k window
    * is keyed by q_id (high cardinality — Spark's WindowGroupLimit pushes
    * `rn ≤ k` below the exchange, bounding skew). Recall floor vs the
    * exact graph is spec-asserted; precision of returned scores is exact
    * (true cosine, not an approximation). */
  def knnGraph(emb: DataFrame, idCol: String, vecCol: String, k: Int,
               nCells: Int = 16, iters: Int = 2, probes: Int = 4,
               cacheKey: Option[String] = None): DataFrame = {
    val cents = cacheKey match {
      case Some(key) => centroidsCached(emb, idCol, vecCol, nCells, iters, key)
      case None => centroids(emb, idCol, vecCol, nCells, iters)
    }
    val v = withNorm(emb, idCol, vecCol)
    val idx = v.select(
      element_at(nearestCentroids(col("e"), cents, 1), 1).as("cell"),
      col("id").as("neighbor_id"), col("e").as("ne"), col("nrm").as("nn"))
    val prb = v.select(col("id").as("q_id"), col("e").as("qe"),
      col("nrm").as("qn"),
      explode(nearestCentroids(col("e"), cents, probes)).as("cell"))
    // (q, neighbor) is unique already: a neighbor is indexed under ONE
    // primary cell and a query probes distinct cells
    idx.join(prb, Seq("cell"))
      .filter(col("q_id") =!= col("neighbor_id"))
      .withColumn("cos", dotd(col("qe"), col("ne")) / (col("qn") * col("nn")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("neighbor_id"),
        round(col("cos"), 6).as("cos_sim"), col("rn").cast("long").as("rn"))
  }

  /** IVF top-k: vectors keyed by their cell (narrow map), queries probe
    * their `nProbes` nearest cells, candidates come from one broadcast
    * equi-join on the cell id, and exact cosine ranks them. `n_candidates`
    * is surfaced per query so the recall/volume trade is observable.
    * `cacheKey` reuses the session's trained centroids (train-once). */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, nCells: Int = 16,
              nProbes: Int = 4, iters: Int = 2,
              cacheKey: Option[String] = None): DataFrame = {
    val cents = cacheKey match {
      case Some(key) => centroidsCached(emb, idCol, vecCol, nCells, iters, key)
      case None => centroids(emb, idCol, vecCol, nCells, iters)
    }
    val v = withNorm(emb, idCol, vecCol)
      .withColumn("cell", element_at(nearestCentroids(col("e"), cents, 1), 1))
    val q = v.filter(queryPred)
    val qProbes = q.select(col("id").as("q_id"),
        explode(nearestCentroids(col("e"), cents, nProbes)).as("cell"))
    val cand = broadcast(qProbes).join(v.select(col("id"), col("cell")), "cell")
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"))
      .dropDuplicates("q_id", "id")
    val scored = cand
      .join(broadcast(q.select(col("id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qnrm"))), "q_id")
      .join(v.select(col("id"), col("e"), col("nrm")), "id")
      .select(col("q_id"), col("id").as("neighbor_id"),
        (dotd(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    val n = scored.groupBy("q_id").agg(count(lit(1)).as("n_candidates"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
      .join(n, "q_id")
  }
}

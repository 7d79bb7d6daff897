package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-core extraction over an undirected pair list — the density filter
  * graph-based curation applies to a near-dup graph (a k-core member has
  * ≥ k neighbors INSIDE the core, so cores isolate genuinely dense
  * duplicate clusters from incidental threshold-bleed chains that
  * components alone cannot distinguish).
  *
  * Algorithm: iterative peeling — drop every vertex with degree < k,
  * recompute, repeat to fixpoint. Each round is one degree aggregation
  * (vertex-sized) plus two semi-joins of the edge list against the
  * surviving vertex set; the edge frame is localCheckpointed per round
  * (the Components/PageRank lineage discipline). Rounds are bounded by
  * the peel depth (the graph's degeneracy ordering length), in practice
  * a handful — each round removes every currently-under-k vertex at
  * once, not one vertex at a time. */
object KCore {

  /** Canonical undirected (x < y) edge frame. */
  private def canonical(pairs: DataFrame, aCol: String,
                        bCol: String): DataFrame =
    pairs
      .select(least(col(aCol), col(bCol)).as("x"),
        greatest(col(aCol), col(bCol)).as("y"))
      .filter(col("x") =!= col("y"))
      .dropDuplicates("x", "y")
      // lazy: both callers count() the canonical frame right away, which
      // materializes the checkpoint in that same job
      .localCheckpoint(false)

  /** Peel `edges` (already canonical/checkpointed) to the k-core. Each
    * round counts ONLY the freshly-pruned frame — the incoming count is
    * carried from the caller/previous round, never recomputed on an
    * already-materialized frame. */
  private def peel(edges0: DataFrame, n0: Long, k: Int): (DataFrame, Long) = {
    var edges = edges0
    var before = n0
    var done = before == 0
    while (!done) {
      val adj = edges.select(col("x").as("n"))
        .unionAll(edges.select(col("y").as("n")))
      val keep = adj.groupBy(col("n")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("n"))
      // LAZY checkpoint: the plan is truncated immediately (LogicalRDD
      // leaf) but materialization happens inside the count that follows —
      // one job per round where eager-checkpoint-then-count paid two
      // (guide §1.2: don't run a pass whose only output the next pass
      // recomputes for free)
      val pruned = edges
        .join(keep.withColumnRenamed("n", "x"), Seq("x"), "left_semi")
        .join(keep.withColumnRenamed("n", "y"), Seq("y"), "left_semi")
        .select(col("x"), col("y"))
        .localCheckpoint(false)
      val after = pruned.count()
      edges = pruned
      done = after == before
      before = after
    }
    (edges, before)
  }

  /** Edges of the k-core (canonical a<b pairs); empty when no k-core
    * exists. */
  def kCoreEdges(pairs: DataFrame, aCol: String, bCol: String,
                 k: Int): DataFrame = {
    val edges = canonical(pairs, aCol, bCol)
    peel(edges, edges.count(), k)._1
  }

  /** (k, n_nodes, n_edges) of the k-core for each requested (ascending)
    * k. Cores NEST, so each peel seeds from the previous core instead of
    * restarting from the raw graph — canonicalization runs once and every
    * later peel starts from a strictly smaller frame. */
  def coreProfile(pairs: DataFrame, aCol: String, bCol: String,
                  ks: Seq[Int]): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    var cur = canonical(pairs, aCol, bCol)
    var curN = cur.count()
    val rows = ks.sorted.map { k =>
      val (core, nE) = peel(cur, curN, k)
      cur = core
      curN = nE
      val nN = core.select(col("x").as("n"))
        .unionAll(core.select(col("y").as("n"))).distinct().count()
      (k.toLong, nN, nE)
    }
    rows.toDF("k", "n_nodes", "n_edges").orderBy(col("k"))
  }
}

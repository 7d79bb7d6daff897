package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an undirected edge list — the graph-importance signal
  * pretraining pipelines use for quality weighting (Common Crawl releases
  * rank hosts by harmonic centrality/PageRank; the same operator over a
  * near-dup or citation graph weights documents by how central they are).
  *
  * Iterative, the [[Components]] shape: per round ONE equi-join of ranks
  * onto edges plus ONE keyed aggregation of contributions (two shuffles,
  * both on node ids), with `localCheckpoint` truncating lineage every
  * round — iterative DataFrame plans otherwise grow geometrically and the
  * analyzer dies long before the data does. The node count enters as a
  * driver-side scalar (the model-parameter pattern: one `count()`, a few
  * bytes). No step depends on a global ordering; rank mass is conserved
  * every round (teleport + damped inflow; an undirected graph has no
  * dangling nodes), which [[graft.PageRankSpec]] asserts.
  *
  * Two variants: [[ranks]] (float — the in-flow sum's last-ulp bits can
  * vary with partitioning; kept for the convergence/contract specs) and
  * [[ranksFixedPoint]] (exact integer arithmetic at a 1e12 scale —
  * deterministic on any engine and partitioning, which is what lets the
  * declared catalog entries hash-check against recursive-CTE DuckDB
  * oracles instead of shipping rows-only). */
object PageRank {

  /** Fixed-point scale for [[ranksFixedPoint]]: ranks as integer
    * pico-units of mass (1e12 = all the mass). 12 digits keeps every
    * intermediate (17·inflow ≤ 1.7e13) far under 2⁶³ while leaving the
    * published 6-decimal rank unchanged by the ≤ n·iters unit floor
    * loss. */
  val Scale: Long = 1000000000000L

  /** EXACT fixed-point PageRank: the same damped power iteration with
    * every arithmetic step integer — contributions ⌊r/deg⌋, inflow an
    * exact Long sum (order-independent, so partitioning cannot move a
    * bit), update ⌊3·Scale/(20n)⌋ + ⌊17·inflow/20⌋ (damping 0.85 =
    * 17/20). Same per-round plan shape as [[ranks]] (one edge equi-join
    * + one keyed aggregation, lineage localCheckpoint-truncated). The
    * point of the integer form: the iterate is deterministic to the last
    * unit on ANY engine, so a recursive-CTE DuckDB oracle replays all
    * `iters` rounds and the declared queries hash-check — the float
    * variant's last-ulp partitioning sensitivity was the one thing
    * keeping PageRank rows-only. Mass is conserved up to the documented
    * floor loss (< n units per round); [[graft.PageRankSpec]] pins
    * agreement with the float fixpoint and the exact symmetry
    * invariants. Returns (node, r) with r in Scale units. */
  def ranksFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                      iters: Int = 10): DataFrame = {
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
    // Degree is joined into the edge list ONCE, up front: the previous
    // form re-joined deg inside the loop, paying an extra join (and its
    // broadcast build or exchange) on the EDGE list every round. With
    // deg folded in, each round is exactly one rank join + the one
    // contribution shuffle that is fundamental to the power iteration
    // (guide §2.4: don't recompute a join-invariant every pass). The
    // rank-side join strategy is left to the planner: node-sized vs
    // edge-sized relations pick broadcast or sort-merge correctly at
    // either scale.
    // All three setup checkpoints are LAZY: the plan truncates to a
    // LogicalRDD leaf either way, and the deg.count() below (the n the
    // teleport term needs anyway) materializes deg + dirM in one job;
    // dirDeg materializes inside round 1. Eager form paid three blocking
    // driver jobs for the same blocks (guide §1.2).
    val dirM = dir.localCheckpoint(false)
    val deg = dirM.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    val dirDeg = dirM.join(deg.hint("shuffle_hash"), "src")
      .localCheckpoint(false)
    val n = deg.count()
    require(n > 0, "PageRank over an empty graph")
    val teleport = 3L * Scale / (20L * n)
    var r = deg.select(col("src").as("node")).withColumn("r", lit(Scale / n))
    for (i <- 1 to iters) {
      // the symmetrized edge list gives every node an incoming edge, so
      // the contribution aggregate already covers the full node set —
      // no nodes-side outer join needed (one join per round, not two)
      r = dirDeg
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(
          (lit(teleport) + expr("(17 * sum(c)) div 20")).as("r"))
      // Checkpoint every 3rd round, not every round: unlike the star ops
      // (which reference the previous frame TWICE per round — geometric
      // plan growth), this loop references r exactly once, so the plan
      // grows LINEARLY between checkpoints and the analyzer stays cheap.
      // Each eager checkpoint is a blocking driver job; at 10 rounds the
      // per-round cadence ran ~6 scheduler jobs per round of sub-ms data
      // work (measured 60 jobs/iter at sf0.1) — pure fixed cost. Values
      // are unchanged: checkpointing has no arithmetic effect and the
      // integer iterate is partitioning-independent by construction.
      // lazy: the next cadence point (or the caller's action) materializes
      // it — the eager form paid a blocking driver job per cadence point
      if (i % 3 == 0 && i < iters) r = r.localCheckpoint(false)
    }
    r
  }

  /** Ranks after `iters` damped power-iteration rounds over the undirected
    * edges (srcCol, dstCol). Returns (node, rank). */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            iters: Int = 10, damping: Double = 0.85): DataFrame = {
    val dir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    val deg = dir.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nodes = dir.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank over an empty graph")
    var r = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 0 until iters) {
      val contrib = dir
        .join(r.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("inflow"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
    }
    r
  }
}

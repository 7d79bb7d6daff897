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
  * The in-flow sum is a floating-point aggregate, so last-ulp bits can
  * vary with partitioning — PageRank is a fixpoint approximation, not an
  * exact query; the declared catalog entry is rows-only with
  * property-spec'd invariants (conservation, symmetry, known closed
  * forms), the honest contract for an iterative numeric op. */
object PageRank {

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

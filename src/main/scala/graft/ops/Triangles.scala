package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle enumeration over an undirected edge list — the
  * graph-audit primitive behind "how clique-like are my duplicate
  * clusters" (a near-dup pair graph whose components are cliques is a
  * clean banding; long chains mean threshold bleed).
  *
  * Scale design: the classic degree-oriented wedge join. Every edge is
  * directed from its lower-(degree, id) endpoint to the higher one — an
  * acyclic orientation under which ANY graph's max out-degree is
  * O(sqrt(m)), so the wedge self-join fans out at most sqrt(m) per vertex
  * even on a power-law graph where a raw id-oriented join would explode at
  * the hubs. Each triangle then has exactly one vertex with both
  * triangle-edges outgoing (its (degree, id)-minimum), so every triangle
  * is emitted exactly once — no distinct pass. Three shuffles total
  * (degree agg, wedge join, closing probe), all on vertex/edge keys.
  */
object Triangles {

  /** All triangles of the undirected simple graph `edges` (one row per
    * edge, endpoints in columns `aCol`/`bCol`, no self-loops). Returns one
    * row per triangle with vertex ids sorted ascending as (a, b, c). */
  def enumerate(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    // Canonical undirected edge list (u < v by id) — also what the
    // closing probe joins against.
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .distinct()

    val deg = und.select(explode(array(col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

    // Orient each edge from its (degree, id)-smaller endpoint: src → dst.
    val oriented = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("d")))
          .otherwise(struct(col("v").as("s"), col("u").as("d"))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))

    // Wedges: unordered pairs of out-neighbours of one source (id-ordered
    // so each out-pair appears once), closed by probing the canonical
    // undirected edge list.
    val x = oriented.select(col("src"), col("dst").as("n1"))
    val y = oriented.select(col("src"), col("dst").as("n2"))
    x.join(y, Seq("src")).filter(col("n1") < col("n2"))
      .join(und, col("n1") === col("u") && col("n2") === col("v"))
      .select(
        least(col("src"), col("n1"), col("n2")).as("a"),
        (col("src") + col("n1") + col("n2") -
          least(col("src"), col("n1"), col("n2")) -
          greatest(col("src"), col("n1"), col("n2"))).as("b"),
        greatest(col("src"), col("n1"), col("n2")).as("c"))
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Components

/** Connected components over pair lists ([[graft.ops.Components]]):
  * min-label propagation must find transitive clusters that edge-local
  * logic cannot. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("a_id", "b_id")
    val comp = Components.connectedComponents(pairs, "a_id", "b_id")
    val got = comp.as[(Long, Long)].collect().toMap
    comp.unpersist()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("cluster-canonical apply keeps exactly one doc per component") {
    // {1,2,3} connected only through 3: edge-local b-side dropping keeps
    // both 1 and 2; the component keeps only min = 1
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("a_id", "b_id")
    val comp = Components.connectedComponents(pairs, "a_id", "b_id")
    val keep = comp.filter(col("id") === col("comp")).as[(Long, Long)]
      .collect().map(_._1).toSet
    comp.unpersist()
    assert(keep == Set(1L))
    val edgeLocalKeep = Set(1L, 2L, 3L) --
      pairs.select("b_id").as[Long].collect().toSet
    assert(edgeLocalKeep == Set(1L, 2L)) // the over-keep this op fixes
  }

  test("propagation converges on an order-reversed chain (labels flow up)") {
    // min id at the chain's far end exercises multi-round propagation
    val pairs = Seq((9L, 8L), (8L, 7L), (7L, 6L), (6L, 1L)).toDF("a_id", "b_id")
    val comp = Components.connectedComponents(pairs, "a_id", "b_id")
    val got = comp.as[(Long, Long)].collect().toMap
    comp.unpersist()
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == Set(1L, 6L, 7L, 8L, 9L))
  }

  test("star rewriting equals propagation on a random multi-component graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }
      .toDF("a_id", "b_id")
    val prop = Components.connectedComponents(pairs, "a_id", "b_id")
    val star = Components.connectedComponentsStar(pairs, "a_id", "b_id")
    val pm = prop.as[(Long, Long)].collect().toMap
    val sm = star.as[(Long, Long)].collect().toMap
    prop.unpersist(); star.unpersist()
    assert(pm == sm)
    assert(pm.nonEmpty)
  }

  test("propagation refuses to return wrong labels past its round budget") {
    // a 40-node chain cannot converge in 3 rounds; silent wrong labels
    // would poison every downstream dedup — it must throw instead
    val pairs = (1L until 40L).map(i => (i + 1, i)).toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(pairs, "a_id", "b_id", maxIter = 3)
    }
    assert(e.getMessage.contains("connectedComponentsStar"))
  }

  test("star rewriting closes a 1024-node chain inside its log-round budget") {
    // diameter 1023: propagation would need ~1023 rounds, star needs ~10
    val pairs = (1L until 1024L).map(i => (i + 1, i)).toDF("a_id", "b_id")
    val star = Components.connectedComponentsStar(pairs, "a_id", "b_id")
    val got = star.as[(Long, Long)].collect()
    star.unpersist()
    assert(got.length == 1024 && got.forall(_._2 == 1L))
  }

  test("dedup_components_cold (uncached propagation) equals the cached " +
    "dedup_components row-for-row") {
    val sf = "/root/testdata/sf0.001"
    val cold = Queries.dedupComponentsCold(spark, sf).collect().toSeq
    val cached = Queries.dedupComponents(spark, sf).collect().toSeq
    assert(cold == cached)
  }

  test("star rewriting closes a 64-node chain (log-round regime)") {
    // worst case for propagation (diameter rounds); star rewriting halves
    // path lengths each round, so 20 iterations is ample headroom
    val pairs = (1L until 64L).map(i => (i + 1, i)).toDF("a_id", "b_id")
    val star = Components.connectedComponentsStar(pairs, "a_id", "b_id")
    val got = star.as[(Long, Long)].collect().toMap
    star.unpersist()
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 64L).toSet)
  }
}

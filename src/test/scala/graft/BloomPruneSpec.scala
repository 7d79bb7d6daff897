package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The explicit bloom semi-join reduction: no false negatives ever, a
  * bounded false-positive rate, result identity with the unpruned join,
  * and a plan whose probe predicate sits on the fact side BELOW the join
  * (pruning before the shuffle — the whole point). */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every built key passes the probe") {
    val dim = ops.Tables.table(spark, sf, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val bits = ops.BloomPrune.buildBits(dim, col("c_custkey"))
    val missed = dim
      .filter(!ops.BloomPrune.mightContain(col("c_custkey"), bits)).count()
    assert(missed == 0)
  }

  test("false-positive rate stays under 1% on disjoint probe keys") {
    val dim = spark.range(0, 200).toDF("k")
    val bits = ops.BloomPrune.buildBits(dim, col("k"))
    // 10k keys guaranteed not in the build set
    val fp = spark.range(1000000, 1010000).toDF("k")
      .filter(ops.BloomPrune.mightContain(col("k"), bits)).count()
    assert(fp < 100, s"fp rate ${fp / 10000.0}")
  }

  test("pruned join returns exactly the unpruned join's rows") {
    val pruned = Queries.joinBloomPruned(spark, sf).collect().toSeq
    val dim = ops.Tables.table(spark, sf, "customer")
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_mktsegment"))
    val plain = ops.Tables.table(spark, sf, "orders")
      .join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
      .collect().toSeq
    assert(pruned.map(r => (r.getString(0), r.getLong(1))) ==
      plain.map(r => (r.getString(0), r.getLong(1))))
  }

  test("probe predicate filters the fact side below the join") {
    val df = Queries.joinBloomPruned(spark, sf)
    val plan = df.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    // the xxhash64 probe must appear in a Filter that is NOT above the join
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val factSideProbe = joins.head.collect {
      case f: Filter if f.condition.toString.contains("xxhash64") => f
    }
    assert(factSideProbe.nonEmpty, "bloom probe not below the join:\n" + plan)
    // and the filter genuinely prunes at this scale
    val dim = ops.Tables.table(spark, sf, "customer")
      .filter(col("c_acctbal") > 9000).select("c_custkey")
    val bits = ops.BloomPrune.buildBits(dim, col("c_custkey"))
    val orders = ops.Tables.table(spark, sf, "orders")
    val kept = orders
      .filter(ops.BloomPrune.mightContain(col("o_custkey"), bits)).count()
    assert(kept < orders.count() / 2, s"bloom kept $kept rows — not selective")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the warehouse-ETL operators that are easy to get subtly
  * wrong: the deterministic train/val/test split and the SCD2 history
  * build. Oracle hash-equality is the driver's job; these pin the
  * properties the oracle cannot see (stability under corpus growth, chain
  * well-formedness per key). */
class EtlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("split_train partitions the corpus with ~80/10/10 mass") {
    val out = Queries.splitTrain(spark, sf).collect()
    val total = ops.Tables.table(spark, sf, "documents").count()
    assert(out.map(_.getLong(2)).sum == total)
    val bySplit = out.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val train = bySplit("train").toDouble / total
    val vl = bySplit("val").toDouble / total
    assert(train > 0.72 && train < 0.88, s"train frac $train")
    assert(vl > 0.04 && vl < 0.16, s"val frac $vl")
  }

  test("split assignment is stable when the corpus grows") {
    // A document's split is a pure function of its id: deriving it over
    // only half the corpus must agree with the full-corpus derivation for
    // every shared doc — the property that lets an incremental pipeline
    // re-split without ever moving a previously assigned document.
    def assign(df: org.apache.spark.sql.DataFrame) = {
      val b = substring(md5(col("doc_id").cast("string")), 1, 2)
      df.select(col("doc_id"),
        when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
          .as("split"))
    }
    val docs = ops.Tables.table(spark, sf, "documents")
    val full = assign(docs)
    val half = assign(docs.filter(col("doc_id") % 2 === 0))
    val moved = half.as("h").join(full.as("f"), Seq("doc_id"))
      .filter($"h.split" =!= $"f.split").count()
    assert(moved == 0)
  }

  test("scd2 history chains are well-formed per key") {
    val h = Queries.scd2Build(spark, sf)
    // exactly one open (is_current) row per user
    val badOpen = h.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1).count()
    assert(badOpen == 0)
    // intervals close forward in time and link into a gapless chain:
    // row N's valid_to equals row N+1's valid_from (string form is
    // chronological), and consecutive statuses actually differ
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val linked = h
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_status", lead(col("status"), 1).over(w))
    assert(linked.filter(col("next_from").isNotNull &&
      col("valid_to") =!= col("next_from")).count() == 0)
    assert(linked.filter(col("next_status").isNotNull &&
      col("status") === col("next_status")).count() == 0)
    assert(linked.filter(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count() == 0)
  }

  test("window_ranks invariants: rank ceiling = partition size, quartiles " +
    "balanced") {
    val r = Queries.windowRanks(spark, sf)
    val perUser = r.groupBy("user_id").agg(
      max(col("rnk")).as("max_rnk"), count(lit(1)).as("n"),
      max(col("cdist")).as("max_cd"),
      (max(col("q4")) - min(col("q4"))).as("q_span"))
    // ties can leave max(rank) < n, never above; cume_dist tops at 1.0
    assert(perUser.filter(col("max_rnk") > col("n")).count() == 0)
    assert(perUser.filter(col("max_cd") =!= 1.0).count() == 0)
    // every user with >= 4 events must see all four quartiles
    assert(perUser.filter(col("n") >= 4 && col("q_span") =!= 3).count() == 0)
  }

  test("dedup_cluster_sizes accounts for every document exactly once") {
    val h = Queries.dedupClusterSizes(spark, sf).collect()
    val total = ops.Tables.table(spark, sf, "documents").count()
    assert(h.map(_.getLong(2)).sum == total)
    assert(h.forall(_.getLong(0) >= 1))
    // the synthetic corpus plants dup groups: both singletons and >= 2
    // clusters must appear
    assert(h.exists(_.getLong(0) == 1) && h.exists(_.getLong(0) >= 2))
  }

  test("scd2 compresses runs: row count equals per-user status changes") {
    val events = ops.Tables.table(spark, sf, "events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val expected = events
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .count()
    assert(Queries.scd2Build(spark, sf).count() == expected)
  }
}

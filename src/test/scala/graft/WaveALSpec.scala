package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave AL: table diff census, dynamic partition pruning. */
class WaveALSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("dq_table_diff census matches a driver replay of the upsert + " +
    "purge against the base table") {
    val base = ops.Tables.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"),
        col("c_acctbal").cast("decimal(12,2)").cast("decimal(18,4)")
          .cast("double"),
        col("c_mktsegment"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    // replay the upsert: +1000 on key%10==0, 5 key-shifted inserts,
    // then purge key%97==3
    val neu = scala.collection.mutable.Map.empty[Long,
      (String, Double, String)]
    base.foreach { case (k, (nm, bal, seg)) =>
      val newBal = if (k % 10 == 0)
        BigDecimal(bal).setScale(2).+(1000).toDouble else bal
      neu(k) = (nm, newBal, seg)
      if (k <= 5) neu(k + 1000000L) = (nm, bal, seg)
    }
    val purged = neu.filter { case (k, _) => k % 97 != 3 }
    var added = 0L; var removed = 0L; var changed = 0L; var same = 0L
    var balDiff = 0L
    (base.keySet ++ purged.keySet).foreach { k =>
      (base.get(k), purged.get(k)) match {
        case (None, Some(_)) => added += 1
        case (Some(_), None) => removed += 1
        case (Some(o), Some(n)) =>
          if (o == n) same += 1
          else { changed += 1; if (o._2 != n._2) balDiff += 1 }
        case _ =>
      }
    }
    val got = Queries.dqTableDiff(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("added")._1 == added && got("removed")._1 == removed &&
      got("changed")._1 == changed && got("unchanged")._1 == same,
      s"got $got want added=$added removed=$removed changed=$changed " +
        s"unchanged=$same")
    assert(got("changed")._3 == balDiff) // only acctbal changes
    assert(got("changed")._2 == 0L && got("changed")._4 == 0L)
    assert(added > 0 && removed > 0 && changed > 0 && same > 0)
  }

  test("join_dpp_pruned plans a dynamicpruning subquery on the partition " +
    "column and matches the unpartitioned computation") {
    val df = Queries.joinDppPruned(spark, sf)
    df.collect() // materialize so the executed plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    val direct = ops.Tables.table(spark, sf, "events")
      .filter(to_date(col("ts")).isin("2024-01-05", "2024-01-12",
        "2024-01-19"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`, on by default)
  * is the first line of defense; these helpers cover the two places AQE
  * can't: aggregation skew (a hot group lands on one task) and broadcast-
  * ineligible joins against a replicable small side.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (keys, salt) —
    * spreading a hot key over `buckets` tasks — then final-aggregate on the
    * keys. `partials` maps each result column to (partialAgg, finalAgg),
    * e.g. "cnt" -> (count(lit(1)), sum(col("cnt"))). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partials: Map[String, (Column, Column)]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head._2._1.as(partials.head._1),
        partials.tail.map { case (n, (p, _)) => p.as(n) }.toSeq: _*)
    partial.groupBy(keys.map(col): _*)
      .agg(partials.head._2._2.as(partials.head._1),
        partials.tail.map { case (n, (_, f)) => f.as(n) }.toSeq: _*)
  }

  /** Salted join for a skewed fact against a small-but-not-broadcastable
    * dimension: the fact side gets a random-ish salt in [0, buckets), the
    * dimension is replicated `buckets` times, and the join key becomes
    * (key, salt) — splitting each hot key across `buckets` tasks. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(buckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}

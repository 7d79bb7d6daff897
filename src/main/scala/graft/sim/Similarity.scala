package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding similarity search: exact cosine (zip_with/aggregate fold —
  * sequential left-to-right, so any engine computing the same fold gets
  * bit-identical doubles), brute-force top-k as the correctness baseline,
  * and random-hyperplane LSH bucketing as the scale path.
  *
  * Scale design: brute force is a broadcast of the (small) query set against
  * a full scan of the vector table — no shuffle on the big side, and per-
  * query top-k is a windowed rank over query-partitioned rows. At 100 TB the
  * LSH variant buckets vectors by sign-pattern once (narrow map + one
  * shuffle on the bucket key) and only scores within buckets; recall is
  * tuned by planes/probes, and the same verify-with-exact-cosine tier as
  * NearDup keeps precision exact.
  */
object Similarity {

  /** Sequential-fold dot product over array<double> columns — a codegen'd
    * custom expression ([[graft.functions.DotProductD]]) with the exact
    * fold order of `aggregate(zip_with(a,b,(x,y)->x*y), 0D, (acc,x)->acc+x)`,
    * so results stay bit-identical to the differential oracle. */
  def dotd(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def toDoubleArr(c: Column): Column = c.cast(ArrayType(DoubleType))

  /** Vectors with a precomputed L2 norm (computed once per row). */
  def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"), toDoubleArr(col(vecCol)).as("e"))
      .withColumn("nrm", sqrt(dotd(col("e"), col("e"))))

  /** Brute-force cosine top-k of every vector against a query subset. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int): DataFrame = {
    val v = withNorm(emb, idCol, vecCol)
    val q = v.filter(queryPred)
      .select(col("id").as("q_id"), col("e").as("qe"), col("nrm").as("qnrm"))
    val scored = broadcast(q).join(v, col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        (dotd(col("qe"), col("e")) / (col("qnrm") * col("nrm"))).as("cos"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rn") <= k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup detection). At
    * scale, swap the inner join for the LSH bucket join below. */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     threshold: Double): DataFrame = {
    val v = withNorm(emb, idCol, vecCol)
    val a = v.select(col("id").as("a_id"), col("e").as("ae"), col("nrm").as("anrm"))
    val b = v.select(col("id").as("b_id"), col("e").as("be"), col("nrm").as("bnrm"))
    a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (dotd(col("ae"), col("be")) / (col("anrm") * col("bnrm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Deterministic random-ish hyperplanes (fixed seed-free formula so every
    * executor and every run derives the same planes with no broadcast of
    * driver state). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    Seq.tabulate(nPlanes)(p => Seq.tabulate(dim)(d =>
      math.sin(1.0 + p * 131.7 + d * 17.3)))

  /** Sign-pattern LSH bucket id for a vector column. */
  def lshBucket(e: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (pl, i) =>
      when(dotd(e, typedlit(pl)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: score only within the query's bucket. Returns per-
    * query candidate count + top-k so recall loss is observable. */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, nPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val v = withNorm(emb, idCol, vecCol)
      .withColumn("bucket", lshBucket(col("e"), planes))
    val q = v.filter(queryPred).select(col("id").as("q_id"),
      col("e").as("qe"), col("nrm").as("qnrm"), col("bucket"))
    val scored = broadcast(q).join(v, Seq("bucket"))
      .filter(col("id") =!= col("q_id"))
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

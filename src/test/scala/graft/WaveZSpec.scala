package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Wave Z: distributed GLM training (IRLS logistic regression) against
  * the documented synthetic teacher. */
class WaveZSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val fitted: Map[String, Double] =
    Queries.trainLogreg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** Driver-side features + teacher labels, mirroring the query. */
  private lazy val rows: Array[(Double, Array[Double])] = {
    val base = ops.Tables.table(spark, sf, "documents").select(
        col("doc_id"),
        lit(1.0).as("x0"),
        (col("n_chars").cast("double") / lit(1000.0)).as("x1"),
        (size(split(col("text"), " ")).cast("double") / lit(100.0)).as("x2"),
        (col("n_chars").cast("double") /
          (size(split(col("text"), " ")) + 1).cast("double")).as("x3"),
        (length(regexp_replace(col("text"), "[^0-9]", "")).cast("double") /
          (col("n_chars") + 1).cast("double")).as("x4"),
        (length(regexp_replace(col("text"), "[aeiou]", "")).cast("double") /
          (col("n_chars") + 1).cast("double")).as("x5"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("h"))
      .collect()
      .map(r => (r.getLong(0),
        Array.tabulate(6)(i => r.getDouble(i + 1)), r.getString(7)))
    val scores = base.map { case (_, x, _) => x(1) - 2.0 * x(5) }.sorted
    // Spark's exact percentile(·, 0.5): middle value for odd n,
    // midpoint of the two middle values for even n
    val exactThr = {
      val n = scores.length
      if (n % 2 == 1) scores(n / 2)
      else (scores(n / 2 - 1) + scores(n / 2)) / 2.0
    }
    base.map { case (_, x, h) =>
      val flip = h == "0" || h == "1"
      val y0 = (x(1) - 2.0 * x(5)) > exactThr
      ((if (y0 != flip) 1.0 else 0.0), x)
    }
  }

  test("train_logreg recovers the teacher: AUC well above the 12.5% " +
    "label-noise ceiling's midpoint") {
    assert(fitted("n_pos") > 0 && fitted("n_pos") < fitted("n_docs"))
    assert(fitted("auc") > 0.8, s"AUC ${fitted("auc")} too low vs teacher")
    assert(fitted("auc") <= 1.0)
  }

  test("train_logreg: the fixpoint satisfies the logistic normal " +
    "equations (gradient near zero) and beats the null model") {
    val beta = (0 until 6).map(i => fitted(s"beta_x$i")).toArray
    val n = rows.length
    val grad = new Array[Double](6)
    var loss = 0.0
    rows.foreach { case (y, x) =>
      val eta = x.zip(beta).map { case (a, b) => a * b }.sum
      val p = 1.0 / (1.0 + math.exp(-eta))
      (0 until 6).foreach(i => grad(i) += (y - p) * x(i))
      loss -= y * math.log(math.max(p, 1e-12)) +
        (1 - y) * math.log(math.max(1 - p, 1e-12))
    }
    val gnorm = math.sqrt(grad.map(g => g * g).sum) / n
    assert(gnorm < 5e-2, s"per-row gradient norm $gnorm not near zero")
    val base = {
      val pos = rows.count(_._1 == 1.0).toDouble
      val p0 = pos / n
      -(pos * math.log(p0) + (n - pos) * math.log(1 - p0))
    }
    assert(loss < base, s"fit loss $loss not below null loss $base")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Dedup, Normalize, Skew}

/** SURVEY.md §5.3 property-based invariants — raw ScalaCheck generators
  * sampled with fixed seeds (the scalatest bridge isn't in the offline
  * dependency set), so failures are reproducible. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("dedup is idempotent and keeps one row per key") {
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 5L), Gen.oneOf("a", "b"), Gen.choose(0L, 100L)))
    samples(gen, 5).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("k", "t", "ts")
        .withColumn("id", monotonically_increasing_id())
      val once = Dedup.dedupLatest(df, Seq("k", "t"), $"ts", $"id")
      val twice = Dedup.dedupLatest(once, Seq("k", "t"), $"ts", $"id")
      assert(once.collect().toSet == twice.collect().toSet)
      assert(once.count() == df.select("k", "t").distinct().count())
    }
  }

  test("unionByName with drift conserves row count") {
    samples(Gen.zip(Gen.choose(1, 30), Gen.choose(1, 30)), 5).foreach {
      case (n, m) =>
        val a = spark.range(n).select($"id", lit(1.5).as("x"))
        val b = spark.range(m).select($"id", lit("s").as("y"))
        assert(a.unionByName(b, allowMissingColumns = true).count() == n + m)
    }
  }

  test("timestamp seconds round-trip truncates, never shifts") {
    val epochs = samples(Gen.choose(0L, 4102444800L), 20)
    val rt = epochs.toDF("s")
      .select($"s", unix_timestamp(timestamp_seconds($"s")).as("rt"))
      .filter($"s" =!= $"rt").count()
    assert(rt == 0)
  }

  test("sanitizeName is idempotent") {
    val gen = Gen.zip(Gen.alphaNumStr, Gen.oneOf(".", "-", " ", "$", ""))
    samples(gen, 30).foreach { case (s, sep) =>
      val n = Normalize.sanitizeName(s + sep + s)
      assert(Normalize.sanitizeName(n) == n)
    }
  }

  test("salted aggregation equals plain aggregation") {
    val df = Seq.tabulate(200)(i => (i % 3, i.toDouble)).toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("s"))
      .orderBy("k").collect().map(_.toSeq)
    val salted = Skew.saltedAggregate(df, Seq("k"), 8, Map(
        "cnt" -> (count(lit(1)), sum(col("cnt"))),
        "s" -> (sum(col("v")), sum(col("s")))))
      .orderBy("k").collect().map(_.toSeq)
    assert(plain.toSeq == salted.toSeq)
  }

  test("salted join equals plain join") {
    val fact = Seq.tabulate(300)(i => (i % 5, i)).toDF("k", "v")
    val dim = Seq.tabulate(5)(i => (i, s"d$i")).toDF("k", "name")
    val plain = fact.join(dim, "k").orderBy("v").collect().map(_.toSeq)
    val salted = Skew.saltedJoin(fact, dim, "k", 4)
      .select("k", "v", "name").orderBy("v").collect().map(_.toSeq)
    assert(plain.toSeq == salted.toSeq)
  }
}

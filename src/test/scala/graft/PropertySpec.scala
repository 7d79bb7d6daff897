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
  lazy val spark = {
    val s = TestSpark.spark
    graft.functions.GraftFunctions.register(s)
    s
  }
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

  test("simhash signatures are token-multiset functions: invariant under " +
    "token order, sensitive to multiplicity (both hash families)") {
    val fnv = (s: String) => graft.functions.SimHash64Fnv(
      org.apache.spark.sql.catalyst.expressions.Literal(s))
      .eval(null).asInstanceOf[Long]
    val xxh = (s: String) => graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal(s))
      .eval(null).asInstanceOf[Long]
    val gen = Gen.listOfN(12, Gen.oneOf("alpha", "beta", "gamma", "d", "ee"))
    samples(gen, 10).filter(_.nonEmpty).foreach { toks =>
      val base = toks.mkString(" ")
      // votes are per-token sums: any permutation signs identically
      val perm = new scala.util.Random(42).shuffle(toks).mkString(" ")
      assert(fnv(base) == fnv(perm), s"FNV sig order-sensitive on '$base'")
      assert(xxh(base) == xxh(perm), s"xxh sig order-sensitive on '$base'")
      // doubling the multiset doubles every vote: the sign — and so the
      // signature — is unchanged (votes of 0 stay 0: unset either way)
      assert(fnv(base + " " + base) == fnv(base),
        s"FNV sig not a multiset-vote function on '$base'")
    }
  }

  test("two-pass prefix scan equals the window form on random grouped data") {
    import graft.ops.PrefixSum
    import org.apache.spark.sql.expressions.Window
    // random (group, key, value) tables with heavy group skew and duplicate
    // keys broken by a unique id — the window form is the executable spec
    val gen = Gen.listOfN(300,
      Gen.zip(Gen.frequency(8 -> Gen.const("hot"), 2 -> Gen.oneOf("a", "b", "c")),
        Gen.choose(0, 20), Gen.choose(-50, 50)))
    samples(gen, 3).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("g", "k", "v")
        .withColumn("id", monotonically_increasing_id())
      val naive = df.withColumn("cum",
        sum($"v").over(Window.partitionBy($"g").orderBy($"k", $"id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val scan = PrefixSum.cumSum(df, Seq("g"), Seq("k", "id"), $"v", "cum")
      assert(scan.exceptAll(naive).isEmpty && naive.exceptAll(scan).isEmpty,
        "random-data cumsum diverges from the window form")
    }
  }

  test("distributed ntile equals the builtin on random tie-heavy data") {
    import graft.ops.PrefixSum
    import org.apache.spark.sql.expressions.Window
    // few distinct values → every decile boundary lands inside a tie run,
    // the case value-based bucketing cannot reproduce but the exact rank
    // scan must
    val gen = Gen.listOfN(137, Gen.choose(0, 5))
    samples(gen, 3).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("v").withColumn("id", monotonically_increasing_id())
      val naive = df.withColumn("b",
        ntile(7).over(Window.orderBy($"v", $"id")).cast("long"))
      val scan = PrefixSum.ntileGlobal(df, Seq("v", "id"), 7, "b")
      assert(scan.exceptAll(naive).isEmpty && naive.exceptAll(scan).isEmpty,
        "random-data ntile diverges from the builtin")
    }
  }

  test("nearest as-of join equals brute force on random tie-heavy data") {
    import graft.ops.AsOf
    // small time domain → frequent exact ties in BOTH distance and time,
    // exercising every branch of the documented tie order: (distance,
    // rightTime asc, tieBreak DESC). Brute force is the executable spec.
    val gen = Gen.zip(
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 12L))),
      Gen.listOfN(30, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 12L))))
    samples(gen, 5).foreach { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "lt")
      val right = rRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("rid", "k", "rt")
      val got = AsOf.asofNearest(left, right, "k", "k",
          col("lt"), col("rt"), col("rid"))
        .select($"lid", $"__nearest.rid".as("rid"), $"__dist")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      val byKey = rRows.zipWithIndex.groupBy(_._1._1)
      val want = lRows.zipWithIndex.map { case ((k, lt), i) =>
        val cands = byKey.getOrElse(k, Nil)
          .map { case ((_, rt), rid) => (math.abs(rt - lt), rt, rid.toLong) }
        if (cands.isEmpty) (i.toLong, None, None)
        else {
          val (d, _, rid) =
            cands.minBy { case (d, rt, rid) => (d, rt, -rid) }
          (i.toLong, Some(rid), Some(d))
        }
      }.toSet
      assert(got == want, "nearest as-of diverges from brute force")
    }
  }

  test("repetition stats hit both extremes and stay in [0,1]") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "x x x x x x x x x x"),             // one trigram repeated → 1.0
      (2L, "a b c d e f g h i j"),             // all trigrams distinct → 0.0
      (3L, "a b c a b c a b c d"),             // partial repetition
      (4L, "a b")                              // < 3 tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!out.contains(4L))
    assert(out(1L) == ((8L, 1L, 1.0)))
    assert(out(2L) == ((8L, 8L, 0.0)))
    val (n3, d3, f3) = out(3L)
    assert(n3 == 8L && d3 < n3 && f3 > 0.0 && f3 < 1.0)
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

  test("LSH band keys: scaling a vector by a positive constant never " +
    "changes its buckets (sign-pattern invariance)") {
    val gen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
    val vecs = samples(gen, 10).filter(_.nonEmpty)
    val df = vecs.zip(samples(Gen.choose(0.1, 50.0), 10))
      .map { case (v, c) => (v, v.map(_ * c)) }.toDF("a", "b")
    val bad = df.select(
        sim.Similarity.bandKeys($"a".cast("array<double>"), 32, 4).as("ka"),
        sim.Similarity.bandKeys($"b".cast("array<double>"), 32, 4).as("kb"))
      .filter($"ka" =!= $"kb").count()
    assert(bad == 0)
  }

  test("winnowing fingerprints of a substring are covered by the text's " +
    "window guarantee (every w+k-1 span shares one)") {
    val gen = Gen.zip(Gen.choose(0, 30), Gen.listOfN(60, Gen.alphaChar))
    samples(gen, 10).foreach { case (off, chars) =>
      val s = chars.mkString
      val df = Seq((s, s.substring(off))).toDF("full", "part")
      val r = df.select(
          graft.text.TextOps.winnow($"full").as("f"),
          graft.text.TextOps.winnow($"part").as("p"))
        .collect().head
      val f = r.getSeq[Long](0).toSet
      val p = r.getSeq[Long](1).toSet
      // the suffix is a shared substring of length >= w+k-1 = 8 → overlap
      if (s.length - off >= 8) assert((f & p).nonEmpty)
    }
  }

  test("nearest-centroid assignment returns p distinct in-range cells " +
    "and is scale-invariant") {
    val cents = Seq.tabulate(8)(c => Seq.tabulate(16)(d =>
      math.sin(c * 3.1 + d * 1.7)))
    val gen = Gen.listOfN(16, Gen.choose(-5.0, 5.0))
    val vecs = samples(gen, 10)
    val df = vecs.map(v => (v, v.map(_ * 7.5))).toDF("a", "b")
    val rows = df.select(
        sim.Ivf.nearestCentroids($"a".cast("array<double>"), cents, 3).as("pa"),
        sim.Ivf.nearestCentroids($"b".cast("array<double>"), cents, 3).as("pb"))
      .collect()
    rows.foreach { r =>
      val pa = r.getSeq[Int](0)
      assert(pa.length == 3 && pa.distinct.length == 3 &&
        pa.forall(c => c >= 0 && c < 8))
      // cosine ranking ignores vector magnitude
      assert(pa == r.getSeq[Int](1))
    }
  }

  test("binned range join equals the theta join on random points and " +
    "intervals at every bin width") {
    import graft.ops.RangeJoin
    val ptsGen = Gen.listOfN(60, Gen.choose(-100.0, 100.0))
    val ivGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(-110.0, 110.0), Gen.choose(0.0, 45.0)))
    for (seed <- 0 until 4) {
      val pts = samples(ptsGen, seed + 1).last.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("pid", "v")
      val ivs = samples(ivGen, seed + 1).last.zipWithIndex
        .map { case ((lo, span), i) => (i.toLong, lo, lo + span) }
        .toDF("iid", "lo", "hi")
      val want = pts.join(ivs, $"v" >= $"lo" && $"v" < $"hi")
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      for (w <- Seq(3.3, 10.0, 64.0)) {
        val got = RangeJoin.binned(pts, "v", ivs, "lo", "hi", w)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == want, s"seed=$seed binWidth=$w")
        assert(got.size == got.distinct.size, s"dup pairs seed=$seed w=$w")
      }
    }
  }
}

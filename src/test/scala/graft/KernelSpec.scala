package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.text.NearDup

/** The custom Catalyst kernels must be drop-in equivalents of the
  * built-in higher-order-function compositions they replace. */
class KernelSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }
  import spark.implicits._

  test("graft_dot equals sequential aggregate/zip_with fold bitwise") {
    val df = Seq((Seq(1.5, -2.25, 3.125), Seq(0.5, 4.75, -1.875)))
      .toDF("a", "b")
    val r = df.select(
      call_function("graft_dot", $"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("ref")).collect().head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("graft_dot matches on real embeddings for every row") {
    val e = ops.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val diff = e.select(
      call_function("graft_dot", $"e", $"e").as("fast"),
      aggregate(zip_with($"e", $"e", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
  }

  test("graft_shingles equals transform/sequence/concat_ws composition") {
    val df = Seq("a b c d e", "x y z", "p q r s").toDF("text")
    val toks = split($"text", " ")
    val ref = array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - lit(2), lit(1))),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2))))
    val bad = df.select(NearDup.shingles($"text").as("fast"), ref.as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(bad == 0)
  }

  test("graft_repstats equals the grouped explode/count composition") {
    import graft.text.TextOps
    val docs = ops.Tables.table(spark, "/root/testdata/sf0.001", "documents")
    val fast = TextOps.repetitionStats(docs, "doc_id", "text")
    val ref = TextOps.repetitionStatsGrouped(docs, "doc_id", "text")
    assert(fast.count() > 0)
    assert(fast.exceptAll(ref).isEmpty && ref.exceptAll(fast).isEmpty,
      "kernel repetition stats diverge from the grouped form")
    // the kernel form is a pure narrow map: no aggregate, no exchange
    // beyond none at all (the query's final ORDER BY lives elsewhere)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("HashAggregate"),
      s"kernel repetition stats must be shuffle-free:\n$plan")
  }

  test("graft_jaccard equals array_intersect formula") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b")),
      (Seq("a", "b"), Seq("a", "b"))).toDF("a", "b")
    val inter = size(array_intersect($"a", $"b")).cast("double")
    val ref = inter / (size($"a") + size($"b") -
      size(array_intersect($"a", $"b"))).cast("double")
    val rows = df.select(NearDup.jaccard($"a", $"b").as("fast"), ref.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("minhash signature is deterministic and monotone under containment") {
    val df = Seq("the quick brown fox jumps over the lazy dog " * 3).toDF("text")
    val sig1 = df.select(NearDup.minhashSig(NearDup.shingles($"text")))
      .collect().head.getSeq[Long](0)
    val sig2 = df.select(NearDup.minhashSig(NearDup.shingles($"text")))
      .collect().head.getSeq[Long](0)
    assert(sig1 == sig2)
    assert(sig1.length == NearDup.NumHashes)
  }

  test("graft_lsh_bands equals the composed per-plane dot-product form " +
    "on real embeddings") {
    val e = ops.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("e"))
    val planes = sim.Similarity.hyperplanes(64, 64)
    val bad = e.select(
        sim.Similarity.bandKeys($"e", 64, 2).as("fast"),
        sim.Similarity.bandKeysComposed($"e", planes, 2).as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(bad == 0)
  }

  test("GraftExtensions installs kernels via spark.sql.extensions — a fresh " +
    "newSession (no imperative register) resolves them") {
    val s2 = TestSpark.spark.newSession()
    val r = s2.sql(
      "SELECT graft_dot(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), " +
        "array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
  }

  test("extension-injected and imperatively-registered minhash agree (one " +
    "builder table — a seed-count drift between paths would split corpora)") {
    val s2 = TestSpark.spark.newSession() // extension path only
    val viaExt = s2.sql(
      "SELECT graft_minhash_sig(graft_shingles('a b c d e f')) AS s")
      .collect().head.getSeq[Long](0)
    val viaReg = spark.sql( // TestSpark session: register() also ran
      "SELECT graft_minhash_sig(graft_shingles('a b c d e f')) AS s")
      .collect().head.getSeq[Long](0)
    assert(viaExt == viaReg)
    assert(viaExt.length == graft.text.NearDup.NumHashes)
  }

  test("jaccard threshold filters gain the length-filter guard (optimizer rule)") {
    import org.apache.spark.sql.functions.{col, concat, lit, round => rnd, split}
    // arrays must derive from a non-foldable column, or the optimizer
    // constant-folds the whole filter before the guard is observable
    val df = spark.range(3)
      .select(split(concat(lit("a b "), col("id")), " ").as("x"),
        split(concat(lit("a b c "), col("id")), " ").as("y"))
      .filter(rnd(NearDup.jaccard(col("x"), col("y")), 4) >= 0.8)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("size("),
      s"length-filter guard missing from:\n$optimized")
    // idempotent under the fixed-point batch: re-applying adds nothing
    val once = functions.SimilarityFilterPruning(df.queryExecution.optimizedPlan)
    assert(once.toString == df.queryExecution.optimizedPlan.toString)
  }

  test("length-filter pruning preserves semantics on edge cases") {
    val df = Seq(
      (1L, Seq("a", "b", "c"), Seq("a", "b", "c")),     // j = 1.0: kept
      (2L, Seq("a", "b", "c"), Seq("a", "b", "x")),     // j = 0.5: dropped
      (3L, Seq("a"), Seq("a", "b", "c", "d", "e")),     // length-mismatch: dropped
      (4L, Seq.empty[String], Seq.empty[String]),       // j = 0/0 = NaN — and
      // Spark's double ordering ranks NaN ABOVE every value, so NaN >= τ is
      // TRUE with or without the rule (size guard 0 >= τ·0 agrees)
      (5L, null, Seq("a"))                              // null: dropped
    ).toDF("id", "x", "y")
    val kept = df
      .filter(org.apache.spark.sql.functions.round(
        NearDup.jaccard($"x", $"y"), 4) >= 0.8)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("kernels are reachable from raw SQL text (registered function surface)") {
    spark.range(1).createOrReplaceTempView("v_one")
    val r = spark.sql(
      """SELECT graft_jaccard(array('a b c', 'b c d'), array('b c d', 'x y z')) AS j,
             graft_simhash64('w1 w2 w3') AS sh,
             size(graft_shingles('a b c d e')) AS n_sh,
             size(graft_lsh_bands(array(CAST(1.0 AS DOUBLE), CAST(-2.0 AS DOUBLE)), 8, 2)) AS n_bands,
             size(graft_winnow('abcdefghijklmnop', 5, 4)) AS n_fp
         FROM v_one""").collect().head
    assert(r.getAs[Double]("j") == 1.0 / 3.0)
    assert(r.getAs[Int]("n_sh") == 3)
    assert(r.getAs[Int]("n_bands") == 4)
    assert(r.getAs[Int]("n_fp") >= 1)
  }

  test("winnowing fingerprints honor the selection guarantees " +
    "(shared-substring and position independence)") {
    import graft.text.TextOps
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val shifted = "PREFIX-PAD " + base           // same content, new position
    val edited = base.replace("fox", "cat")      // small local edit
    val other = "completely different content with no overlap whatsoever!"
    val df = Seq(("base", base), ("shift", shifted), ("edit", edited),
      ("other", other)).toDF("id", "text")
    val fps = df.select($"id", TextOps.winnow($"text").as("f"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    // identical suffix content ⇒ overlapping fingerprints despite the shift
    assert((fps("base") & fps("shift")).size >= fps("base").size / 2)
    // a local edit keeps most fingerprints
    assert((fps("base") & fps("edit")).size >= fps("base").size / 2)
    // unrelated text shares (almost) nothing
    assert((fps("base") & fps("other")).size <= 1)
    // deterministic
    val again = df.filter($"id" === "base")
      .select(TextOps.winnow($"text")).collect().head.getSeq[Long](0).toSet
    assert(again == fps("base"))
  }

  test("winnow's monotone-deque window minimum equals the naive " +
    "O(text*w) scan it replaced, on tie-heavy and random inputs") {
    // the naive reference: min of each w-window of gram hashes,
    // rightmost index on ties — the pre-round-8 implementation verbatim
    def naive(text: String, k: Int, w: Int): Set[Long] = {
      val bytes = text.getBytes("UTF-8")
      val n = bytes.length
      if (n < k) return Set.empty
      val B = 1000003L
      var pow = 1L; var i = 1
      while (i < k) { pow *= B; i += 1 }
      val nGrams = n - k + 1
      val hs = new Array[Long](nGrams)
      var h = 0L; i = 0
      while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
      hs(0) = h; i = 1
      while (i < nGrams) {
        h = (h - (bytes(i - 1) & 0xFF) * pow) * B + (bytes(i + k - 1) & 0xFF)
        hs(i) = h; i += 1
      }
      val sel = scala.collection.mutable.Set[Long]()
      if (nGrams <= w) {
        var m = 0; i = 1
        while (i < nGrams) { if (hs(i) <= hs(m)) m = i; i += 1 }
        sel += hs(m)
      } else {
        var start = 0
        while (start + w <= nGrams) {
          var m = start; i = start + 1
          while (i < start + w) { if (hs(i) <= hs(m)) m = i; i += 1 }
          sel += hs(m)
          start += 1
        }
      }
      sel.toSet
    }
    def deque(text: String, k: Int, w: Int): Set[Long] =
      graft.functions.Winnow(
        org.apache.spark.sql.catalyst.expressions.Literal(text), k, w)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSet
    val rnd = new scala.util.Random(8L) // deterministic
    // tie-heavy alphabets ("ababab…") make identical k-grams recur, so
    // equal hashes share windows and the rightmost-tie rule is exercised
    val alphabets = Seq("ab", "abc", "abcdefghijklmnopqrstuvwxyz ")
    for (_ <- 1 to 200) {
      val alpha = alphabets(rnd.nextInt(alphabets.length))
      val len = rnd.nextInt(120)
      val text = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      val k = 1 + rnd.nextInt(6)
      val w = 1 + rnd.nextInt(8)
      assert(deque(text, k, w) == naive(text, k, w),
        s"winnow mismatch for k=$k w=$w text='$text'")
    }
    // pinned degenerate shapes
    assert(deque("", 5, 4) == naive("", 5, 4))
    assert(deque("abc", 5, 4) == naive("abc", 5, 4))   // text shorter than k
    assert(deque("aaaaaaaaaa", 2, 3) == naive("aaaaaaaaaa", 2, 3)) // all ties
  }

  test("simhash of identical texts is identical; near texts are near") {
    val df = Seq(
      ("a", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      ("b", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      ("c", "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("id", "text")
    val out = df.select($"id", NearDup.simhash64($"text").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a") == out("b"))
    assert(java.lang.Long.bitCount(out("a") ^ out("c")) > 0)
  }

  test("graft_cms_estimate: CMS guarantees hold corpus-wide (est ≥ exact, " +
    "est ≤ exact + ε·N at the sketch's confidence) and probes are deterministic") {
    // zipf-ish synthetic stream: token t_k appears ~1000/k times
    val toks = (1 to 40).flatMap(k => Seq.fill(1000 / k)(s"t$k"))
    val df = toks.toDF("tok")
    val eps = 0.005
    val n = toks.size.toLong
    val sk = df.agg(expr(s"count_min_sketch(tok, ${eps}d, 0.999d, 7)").as("s"))
      .head().getAs[Array[Byte]]("s")
    val est = df.groupBy($"tok").agg(count(lit(1)).as("exact"))
      .select($"tok", $"exact",
        call_function("graft_cms_estimate", $"tok", lit(sk)).as("est"))
      .collect()
    est.foreach { r =>
      val (exact, e) = (r.getLong(1), r.getLong(2))
      assert(e >= exact, s"CMS must never underestimate: ${r.getString(0)}")
      assert(e <= exact + (eps * n).toLong,
        s"estimate ${e} breaches ε·N slack over ${exact} for ${r.getString(0)}")
    }
    val again = df.select(call_function("graft_cms_estimate", $"tok", lit(sk)))
      .collect().map(_.getLong(0)).toSeq
    val first = df.select(call_function("graft_cms_estimate", $"tok", lit(sk)))
      .collect().map(_.getLong(0)).toSeq
    assert(again == first)
  }

  test("graft_cms_estimate rejects a non-literal sketch argument") {
    val df = Seq(("a", Array[Byte](1, 2))).toDF("tok", "sk")
    val e = intercept[Exception] {
      df.select(call_function("graft_cms_estimate", $"tok", $"sk")).collect()
    }
    assert(e.getMessage.contains("BINARY literal"))
  }
}

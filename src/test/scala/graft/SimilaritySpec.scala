package graft

import org.apache.spark.sql.functions.{col, element_at, posexplode}
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the approximate (LSH) tiers against their exact
  * counterparts on the real sf0.001 corpus. */
class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("LSH-banded embedding near-dup equals the exact all-pairs tier") {
    val exact = Queries.dedupEmbeddingCosine(spark, sf).collect().map(_.toSeq)
    val lsh = Queries.dedupEmbeddingLsh(spark, sf).collect().map(_.toSeq)
    assert(exact.nonEmpty)
    assert(lsh.toSeq == exact.toSeq)
  }

  test("ANN LSH recall@10 clears the floor (amplified banding)") {
    val rows = Queries.annLshRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.75, s"mean recall@10 $mean below floor 0.75")
    assert(recalls.min >= 0.4, s"worst-query recall@10 ${recalls.min} below 0.4")
  }

  test("at production thresholds the LSH banding genuinely prunes " +
    "(planted near-identical vectors, cos >= 0.98)") {
    import spark.implicits._
    // deterministic synthetic corpus: 400 random vectors + 40 planted
    // near-dups (base + 10% noise → cos ≈ 0.995)
    def vec(seed: Long): Array[Double] = {
      val r = new java.util.Random(seed)
      Array.fill(64)(r.nextGaussian())
    }
    val base = (0 until 400).map(i => (i.toLong, vec(i)))
    val dups = (0 until 40).map { i =>
      val r = new java.util.Random(10000L + i)
      val b = base(i)._2
      (1000L + i, b.map(x => x + 0.1 * r.nextGaussian()))
    }
    val df = (base ++ dups).toDF("vid", "v")
    val exact = sim.Similarity
      .cosineDupPairs(df, "vid", "v", 0.98)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lsh = sim.Similarity
      .cosineDupPairsLsh(df, "vid", "v", 0.98, nPlanes = 96, rowsPerBand = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.length >= 35) // nearly all plants qualify
    assert(lsh.toSet == exact.toSet)
    // candidate volume: the banding must prune, not enumerate all pairs
    val planes96 = sim.Similarity.bandKeys($"v".cast("array<double>"), 96, 8)
    val banded = df.select($"vid", posexplode(planes96)).toDF("id", "band", "bk")
    val nCand = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bk" === $"b.bk" && $"a.id" < $"b.id")
      .select($"a.id", $"b.id").distinct().count()
    val allPairs = 440L * 439 / 2
    assert(nCand < allPairs / 5,
      s"banding enumerated $nCand of $allPairs pairs — no pruning")
    info(s"candidates $nCand of $allPairs pairs " +
      f"(${100.0 * nCand / allPairs}%.1f%%), ${exact.length} true pairs")
  }

  test("declared ann_ivf_recall clears its floor (IVF's published quality number)") {
    val rows = Queries.annIvfRecall(spark, sf).collect()
    assert(rows.length == 8)
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val mean = recalls.sum / recalls.length
    info(f"declared IVF mean recall@10 $mean%.2f min ${recalls.min}%.2f")
    assert(mean >= 0.75, s"mean IVF recall@10 $mean below floor 0.75")
  }

  test("IVF ANN recall@10 clears its floor with bounded candidate volume") {
    val truth = Queries.annCosineTopK(spark, sf)
      .select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val rows = Queries.annIvfTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 8)
    val recalls = byQ.map { case (q, rs) =>
      rs.map(_.getAs[Long]("neighbor_id")).count(truth(q)) / 10.0
    }.toSeq
    val mean = recalls.sum / recalls.length
    info(f"IVF mean recall@10 $mean%.2f, min ${recalls.min}%.2f, " +
      s"candidates ${rows.head.getAs[Long]("n_candidates")}")
    assert(mean >= 0.3, s"IVF mean recall@10 $mean below floor")
    // the volume bound is the point: probes/cells of the corpus, not all of it
    val nVec = ops.Tables.table(spark, sf, "embeddings").count()
    assert(rows.map(_.getAs[Long]("n_candidates")).max < nVec / 2)
  }

  test("semantic dedup pairs are a subset of the exact tier with recall " +
    "above the floor") {
    val semantic = Queries.dedupSemantic(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact all-pairs tier at the same threshold
    val exact = Queries.dedupEmbeddingCosine(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // precision is exact by construction: within-cell scoring IS exact cosine
    assert((semantic -- exact).isEmpty, "semantic pair not in exact tier")
    assert(exact.nonEmpty)
    // recall loss is only pairs whose 6-cell probe lists don't intersect
    val recall = semantic.size.toDouble / exact.size
    info(f"semantic recall $recall%.2f (${semantic.size}/${exact.size} pairs)")
    assert(recall >= 0.60, s"semantic recall $recall below floor (" +
      s"${semantic.size}/${exact.size} pairs)")
  }

  test("semantic dedup compares within probed cells only: candidate volume " +
    "is the probes/nCells fraction of quadratic") {
    import org.apache.spark.sql.functions.{explode, element_at => elemAt}
    val emb = ops.Tables.table(spark, sf, "embeddings")
    val n = emb.count()
    val cents = sim.Ivf.centroidsCached(emb, "vec_id", "embedding", 16, 2, sf)
    val v = sim.Similarity.withNorm(emb, "vec_id", "embedding")
    val idx = v.select(elemAt(
      sim.Ivf.nearestCentroids(col("e"), cents, 1), 1).as("cell"),
      col("id").as("a_id"))
    val prb = v.select(col("id").as("b_id"),
      explode(sim.Ivf.nearestCentroids(col("e"), cents, 6)).as("cell"))
    val candidates = idx.join(prb, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .selectExpr("least(a_id, b_id) AS x", "greatest(a_id, b_id) AS y")
      .distinct().count()
    val allPairs = n * (n - 1) / 2
    // the ideal ratio is probes/nCells (6/16 = 0.375); at the 500-vector
    // gate scale cell-size skew inflates it to ~0.57 (measured), so the
    // bound is 0.65 here — the probes=6 setting buys recall 0.90 at sf0.1
    // (vs 0.77 at probes=4, measured against the exact tier). At corpus
    // scale nCells grows ~sqrt(n) and the fraction vanishes.
    assert(candidates < allPairs * 65 / 100,
      s"cells too coarse: $candidates of $allPairs pairs compared")
  }

  test("kNN graph via IVF cells: structure sound, recall vs the exact " +
    "graph clears the floor") {
    val emb = ops.Tables.table(spark, sf, "embeddings")
    val approx = Queries.knnGraphIvf(spark, sf).collect()
    // structure: ≤ 5 neighbors per query, rn contiguous from 1, no self
    val byQ = approx.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 5 && rs.map(_.getAs[Long]("rn")).sorted.toSeq
        == (1L to rs.length).toSeq, s"broken rank sequence for $q")
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    // exact top-5 graph by brute force (corpus is small at sf0.001)
    val v = graft.sim.Similarity.withNorm(emb, "vec_id", "embedding")
    val exact = v.select(col("id").as("q_id"), col("e").as("qe"),
        col("nrm").as("qn"))
      .join(v.select(col("id").as("n_id"), col("e").as("ne"),
        col("nrm").as("nn")), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.sim.Similarity.dotd(col("qe"), col("ne")) /
          (col("qn") * col("nn"))).as("cos"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(r => (-r.getDouble(2), r.getLong(1)))
        .take(5).map(_.getLong(1)).toSet).toMap
    val recalls = byQ.map { case (q, rs) =>
      rs.map(_.getAs[Long]("neighbor_id")).count(exact(q)) / 5.0
    }.toSeq
    val mean = recalls.sum / recalls.length
    info(f"kNN-graph mean recall@5 $mean%.2f over ${byQ.size} queries")
    assert(byQ.size == emb.count(), "every vector must appear as a query")
    // 0.73 measured at 6/16 probes on the near-uniform synthetic vectors —
    // the hardest case for cell pruning (real embedding spaces cluster)
    assert(mean >= 0.6, s"kNN-graph mean recall@5 $mean below floor")
  }

  test("simhash-verified pairs equal the minhash-verified pairs (two scale " +
    "paths, one precision contract)") {
    val viaSimhash = Queries.dedupSimhashVerified(spark, sf)
      .collect().map(_.toSeq)
    val viaMinhash = Queries.dedupMinhashLsh(spark, sf)
      .select("a_id", "b_id", "jaccard").collect().map(_.toSeq)
    assert(viaSimhash.nonEmpty)
    assert(viaSimhash.toSeq == viaMinhash.toSeq)
  }

  test("dedup_simhash_struct equals a driver brute-force over FNV-1a " +
    "simhash signatures (the banded join loses no pair at hamming <= 6)") {
    // driver replay of the SimHash64Fnv kernel + exact all-pairs hamming
    val docs = ops.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def fnv(tok: String): Long = {
      var h = 0xcbf29ce484222325L
      tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
      h
    }
    def sig(text: String): Long = {
      val votes = new Array[Int](64)
      text.split(" ", -1).foreach { tok =>
        val h = fnv(tok)
        (0 until 64).foreach(b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, b) => if (votes(b) > 0) s | (1L << b) else s)
    }
    val sigs = docs.map { case (id, t) => (id, sig(t)) }.sortBy(_._1)
    val expect = for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) if h <= 6
    } yield (sigs(i)._1, sigs(j)._1, h)
    val got = Queries.dedupSimhashStruct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got.nonEmpty, "struct tier found no pairs at this sf")
    assert(got == expect.toSeq,
      s"banded pair set != brute force: ${got.size} vs ${expect.size}")
  }

  test("ann_ivf_struct equals a driver replay of the integer-lattice " +
    "Lloyd + multi-probe search (training AND search are value-exact)") {
    // independent in-JVM replay of sim/Ivf.latticeKnnStruct's contract:
    // micro-lattice verts, id%16 seed means, 2 Lloyd passes with
    // truncating-division means (empty cells keep their previous
    // centroid), argmin-d2 assignment with lowest-cell ties, 4-cell
    // probes, exact-d2 top-10 with lowest-neighbor ties
    val (kCells, iters, probes, topK, nQ) = (16, 2, 4, 10, 8L)
    val vecs = ops.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1000000.0).toLong).toIndexedSeq)
      .sortBy(_._1)
    def tdiv(a: Long, b: Long): Long = a / b // Long / truncates toward zero
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def means(assign: Seq[(Int, IndexedSeq[Long])]): Map[Int, IndexedSeq[Long]] =
      assign.groupBy(_._1).map { case (c, vs) =>
        c -> vs.head._2.indices
          .map(d => tdiv(vs.map(_._2(d)).sum, vs.size)).toIndexedSeq
      }
    val seed = means(vecs.map { case (id, v) => ((id % kCells).toInt, v) })
    var cents = (0 until kCells).map(c => seed(c))
    def argmin(v: IndexedSeq[Long]): Int =
      cents.indices.minBy(c => (d2(v, cents(c)), c))
    for (_ <- 0 until iters) {
      val m = means(vecs.map { case (_, v) => (argmin(v), v) }.toSeq)
      cents = cents.indices.map(c => m.getOrElse(c, cents(c)))
    }
    val primary = vecs.map { case (id, v) => id -> argmin(v) }.toMap
    val expect = vecs.filter(_._1 < nQ).flatMap { case (q, qv) =>
      val probed = cents.indices.map(c => (d2(qv, cents(c)), c))
        .sorted.take(probes).map(_._2).toSet
      vecs.filter { case (n, _) => n != q && probed(primary(n)) }
        .map { case (n, nv) => (d2(qv, nv), n) }.sorted.take(topK)
        .zipWithIndex.map { case ((dd, n), i) => (q, n, dd, (i + 1).toLong) }
    }.toSeq
    val got = Queries.annIvfStruct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty && got == expect,
      s"lattice IVF knn != driver replay: ${got.size} vs ${expect.size}")
  }

  test("ann_pq_struct equals a driver replay of the per-subspace integer " +
    "Lloyd + ADC scoring (codebook training AND scoring are value-exact)") {
    // independent in-JVM replay of sim/Pq.latticePqStruct's contract:
    // micro-lattice subvectors (8 subspaces × 8 dims), id%8 seed means
    // per subspace, 2 Lloyd passes with truncating-division means (empty
    // cells keep their previous centroid), argmin-d2 codes with
    // lowest-cell ties, ADC = sum over subspaces of the query's
    // d2-to-centroid LUT at the neighbor's code, top-10 with
    // lowest-neighbor ties
    val (m, d, kCodes, iters, topK, nQ) = (8, 8, 8, 2, 10, 8L)
    val vecs = ops.Tables.table(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1000000.0).toLong).toIndexedSeq)
      .sortBy(_._1)
    def tdiv(a: Long, b: Long): Long = a / b // Long / truncates toward zero
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val subs: Map[(Long, Int), IndexedSeq[Long]] =
      vecs.flatMap { case (id, v) =>
        (0 until m).map(s => (id, s) -> v.slice(s * d, (s + 1) * d)) }.toMap
    def means(assign: Seq[((Int, Int), IndexedSeq[Long])]) =
      assign.groupBy(_._1).map { case (key, vs) =>
        key -> vs.head._2.indices
          .map(dd => tdiv(vs.map(_._2(dd)).sum, vs.size)).toIndexedSeq }
    val seed = means(subs.toSeq.map { case ((id, s), sv) =>
      ((s, (id % kCodes).toInt), sv) })
    var cents: Map[(Int, Int), IndexedSeq[Long]] =
      (for (s <- 0 until m; c <- 0 until kCodes) yield
        (s, c) -> seed.getOrElse((s, c), IndexedSeq.fill(d)(0L))).toMap
    def argmin(s: Int, sv: IndexedSeq[Long]): Int =
      (0 until kCodes).minBy(c => (d2(sv, cents((s, c))), c))
    for (_ <- 0 until iters) {
      val mns = means(subs.toSeq.map { case ((id, s), sv) =>
        ((s, argmin(s, sv)), sv) })
      cents = cents.map { case (key, old) => key -> mns.getOrElse(key, old) }
    }
    val codes: Map[(Long, Int), Int] = subs.map { case ((id, s), sv) =>
      (id, s) -> argmin(s, sv) }
    val ids = vecs.map(_._1)
    val expect = ids.filter(_ < nQ).flatMap { q =>
      val lut = (for (s <- 0 until m; c <- 0 until kCodes) yield
        (s, c) -> d2(subs((q, s)), cents((s, c)))).toMap
      ids.filter(_ != q)
        .map(n => ((0 until m).map(s => lut((s, codes((n, s))))).sum, n))
        .sorted.take(topK).zipWithIndex
        .map { case ((adc, n), i) => (q, n, adc, (i + 1).toLong) }
    }.toSeq
    val got = Queries.annPqStruct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.nonEmpty && got == expect,
      s"lattice PQ ADC != driver replay: ${got.size} vs ${expect.size}")
  }
}

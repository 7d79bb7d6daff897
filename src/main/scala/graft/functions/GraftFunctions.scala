package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hot numeric/text kernels where
  * composing built-in higher-order functions is semantically right but
  * interpretively slow (lambda HOFs don't participate in whole-stage
  * codegen). Each expression is a tight single-pass loop; [[DotProductD]]
  * additionally generates Java for whole-stage codegen. Registered as SQL
  * functions (invoked via `call_function`) so the public API stays on
  * `org.apache.spark.sql.functions`.
  */
object GraftFunctions {

  /** Parameter arguments (band widths, window sizes) are plan-construction
    * inputs, not row data: they must be non-null integer literals. A raw
    * `eval().asInstanceOf[Int]` on a column reference or a null literal
    * throws an opaque cast/eval error at registration time (round-2
    * advice); fail with the argument's name and SQL text instead. */
  private def foldableInt(fn: String, name: String, e: Expression): Int =
    if (e.foldable && e.dataType == IntegerType && e.eval() != null)
      e.eval().asInstanceOf[Int]
    else throw new IllegalArgumentException(
      s"$fn: argument '$name' must be a non-null INT literal, got ${e.sql}")

  private def requireArity(fn: String, es: Seq[Expression], n: Int): Unit =
    if (es.length != n) throw new IllegalArgumentException(
      s"$fn: expected $n arguments, got ${es.length}")

  private def foldableDouble(fn: String, name: String, e: Expression): Double =
    if (e.foldable && e.dataType == DoubleType && e.eval() != null)
      e.eval().asInstanceOf[Double]
    else throw new IllegalArgumentException(
      s"$fn: argument '$name' must be a non-null DOUBLE literal, got ${e.sql}")

  /** The single source of truth for kernel registration — consumed by both
    * the imperative [[register]] path and the config-driven
    * [[GraftExtensions]] injection, so the two can never drift (a
    * parameter that differs between them — e.g. the MinHash seed count —
    * would silently change signatures depending on how the session was
    * built). */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", "sequential-fold dot product of two array<double>",
      es => DotProductD(es.head, es(1))),
    ("graft_shingles", "distinct word trigram shingles",
      es => WordShingles(es.head, 3)),
    ("graft_minhash_sig",
      s"${graft.text.NearDup.NumHashes}-seed MinHash signature of a shingle set",
      es => MinHashSig(es.head, graft.text.NearDup.NumHashes)),
    ("graft_jaccard", "exact Jaccard of two distinct-element arrays",
      es => JaccardSim(es.head, es(1))),
    ("graft_simhash64", "64-bit SimHash of a token stream",
      es => SimHash64(es.head)),
    ("graft_simhash64_fnv",
      "64-bit SimHash of a token stream (FNV-1a token hash)",
      es => SimHash64Fnv(es.head)),
    ("graft_fnv1a64", "FNV-1a 64-bit hash of a string's UTF-8 bytes",
      es => Fnv1a64(es.head)),
    ("graft_mulwrap64", "wrapping (mod 2^64) product of two longs",
      es => MulWrap64(es.head, es(1))),
    ("graft_lsh_bands", "banded hyperplane LSH keys of array<double>",
      es => LshBandKeys(es.head,
        foldableInt("graft_lsh_bands", "nPlanes", es(1)),
        foldableInt("graft_lsh_bands", "rowsPerBand", es(2)))),
    ("graft_nearest_centroids", "p nearest centroid cells by cosine",
      es => {
        // model parameters must be plan literals (round-7 review: the
        // sibling kernels all validate at registration; an unguarded
        // column argument here surfaced as an opaque executor-side
        // eval error instead of this named message)
        if (!es(1).foldable) throw new IllegalArgumentException(
          "graft_nearest_centroids: argument 'cents' must be a foldable " +
            s"array<array<double>> literal (the collected centroid " +
            s"model), got ${es(1).sql}")
        foldableInt("graft_nearest_centroids", "p", es(2))
        NearestCentroids(es.head, es(1), es(2))
      }),
    ("graft_nearest_cells",
      "top-p (cell, score) pairs vs a per-row centroid bundle",
      es => {
        requireArity("graft_nearest_cells", es, 5)
        foldableInt("graft_nearest_cells", "p", es(4))
        NearestCellsScored(es.head, es(1), es(2), es(3), es(4))
      }),
    ("graft_lattice_d2s",
      "integer squared-L2 distances of array<long> vs array<array<long>>",
      es => LatticeD2s(es.head, es(1))),
    ("graft_winnow", "winnowing rolling-hash fingerprints",
      es => Winnow(es.head,
        foldableInt("graft_winnow", "k", es(1)),
        foldableInt("graft_winnow", "w", es(2)))),
    ("graft_repstats", "per-document trigram repetition stats",
      es => RepetitionStats(es.head, 3)),
    ("graft_deflate_len", "deflate byte length of the UTF-8 text (level 6)",
      es => DeflateLen(es.head, 6)),
    ("graft_morton", "64-bit Morton (Z-order) code of two 32-bit dimensions",
      es => MortonCode(es.head, es(1))),
    ("graft_cms_estimate", "count-min-sketch point frequency estimate",
      es => {
        if (!(es(1).foldable && es(1).dataType == BinaryType))
          throw new IllegalArgumentException(
            "graft_cms_estimate: argument 'sketch' must be a BINARY literal " +
              s"(the collected sketch as a plan literal), got ${es(1).sql}")
        CmsEstimate(es.head, es(1))
      }),
    ("graft_reservoir_quantile",
      "deterministic mergeable quantile sketch (k hash-smallest sample)",
      es => {
        requireArity("graft_reservoir_quantile", es, 4)
        ReservoirQuantile(es.head, es(1),
          foldableInt("graft_reservoir_quantile", "k", es(2)),
          foldableDouble("graft_reservoir_quantile", "p", es(3)))
          .toAggregateExpression()
      }))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // the imperative twin of GraftExtensions' injectPlannerStrategy, for
    // sessions created without the extensions conf (idempotent)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    // BOTH session-construction paths must plan identically (round-7
    // review: register() installed the planner strategy but not the
    // Jaccard length-filter pruning rule, so extension-less sessions
    // silently lost the O(1) size pre-filter)
    if (!spark.experimental.extraOptimizations.contains(SimilarityFilterPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimilarityFilterPruning
  }
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * Rabin-style rolling hash over every k-byte gram of the UTF-8 text, then
  * the minimum hash of each w-gram window (rightmost on ties), distinct and
  * sorted. Guarantees: any shared substring of length ≥ w + k − 1 yields at
  * least one shared fingerprint, and fingerprints are position-independent —
  * the rolling-hash fingerprint the plagiarism/near-dup literature uses,
  * complementing the exact md5 fingerprint and the MinHash sketch. The
  * rolling hash is a single pass; the window minimum is a monotone deque
  * (amortized O(1) per window — each gram index enters and leaves the
  * deque once), so the whole kernel is linear in the text. Rightmost-min
  * tie-breaking falls out of evicting on `>=`: an equal hash arriving
  * later replaces the earlier one, so the deque head is always the
  * rightmost minimum of the live window. */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private val B = 1000003L

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // rolling hashes of all k-grams
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    val nGrams = n - k + 1
    val hs = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    hs(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * B + (bytes(i + k - 1) & 0xFF)
      hs(i) = h
      i += 1
    }
    // winnow: min of each w-window of gram hashes, rightmost min on ties,
    // via a monotone deque of indices (values strictly increasing from
    // head to tail; evict-on->= keeps the RIGHTMOST of equal hashes)
    val sel = new java.util.TreeSet[java.lang.Long]()
    val win = if (nGrams <= w) nGrams else w // short text: one full window
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - win) head += 1 // slid out of the window
      if (i >= win - 1) sel.add(hs(dq(head)))
      i += 1
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** The `p` nearest centroid indices (by cosine) for an array<double> vector.
  * Centroids arrive as a foldable array<array<double>> literal — the "model
  * parameter" of an IVF index, shipped once with the plan (a few KB), so
  * cell assignment is a pure narrow map: no join, no per-centroid explode,
  * nothing shuffled. Centroid norms are precomputed once per executor. */
case class NearestCentroids(vec: Expression, cents: Expression, p: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = p
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val centArr: Array[Array[Double]] = {
    val ad = cents.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val centNrm: Array[Double] =
    centArr.map(c => math.sqrt(c.map(x => x * x).sum))
  @transient private lazy val nProbes: Int = p.eval().asInstanceOf[Int]

  override def nullSafeEval(v: Any, c: Any, pp: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val nC = centArr.length
    val scores = new Array[Double](nC)
    var i = 0
    while (i < nC) {
      val ct = centArr(i)
      var s = 0.0
      var d = 0
      val n = math.min(dim, ct.length)
      while (d < n) { s += arr.getDouble(d) * ct(d); d += 1 }
      scores(i) = if (centNrm(i) > 0) s / centNrm(i) else Double.MinValue
      i += 1
    }
    val k = math.min(nProbes, nC)
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nC)
    var j = 0
    while (j < k) {
      var best = -1
      var bestS = Double.MinValue
      var t = 0
      while (t < nC) {
        if (!taken(t) && (best == -1 || scores(t) > bestS)) {
          best = t; bestS = scores(t)
        }
        t += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) =
    copy(vec = f, cents = s, p = t)
}

/** Integer squared-L2 distances of an array<long> vector against a list of
  * array<long> centroids, returned in CENTROID ORDER — the single-pass
  * kernel form of `transform(cents, c -> aggregate(zip_with(v, c, (a,b) ->
  * (a-b)*(a-b)), 0L, (acc,x) -> acc+x))`, whose interpreted higher-order
  * lambda steps (cells × dims per row, per pass) dominated the lattice
  * ANN twins' wall time (round 11, guide step 4: no non-codegen expression
  * trees in the hot path — this module's standing discipline). Arithmetic
  * is IDENTICAL exact-long math, so every hash-checked consumer
  * (`ann_ivf_struct`, `ann_pq_struct`, `sample_kcenter`) is bit-for-bit
  * unchanged. The centroid argument is evaluated per row (it may be an
  * `element_at` of a literal, as the PQ per-subspace codebook is), which
  * is a pointer walk over the already-materialized literal. */
case class LatticeD2s(vec: Expression, cents: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = vec
  override def right: Expression = cents
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any, c: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    val ca = c.asInstanceOf[ArrayData]
    val dim = va.numElements()
    val nC = ca.numElements()
    val out = new Array[Long](nC)
    var i = 0
    while (i < nC) {
      val ct = ca.getArray(i)
      val n = math.min(dim, ct.numElements())
      var s = 0L
      var d = 0
      while (d < n) {
        val df = va.getLong(d) - ct.getLong(d)
        s += df * df
        d += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(vec = l, cents = r)
}

/** Top-`p` `(cell, score)` pairs of an array<double> vector against a
  * PER-ROW centroid bundle `(cells, cents, nrms)` — the two-level IVF
  * assignment kernel. Unlike [[NearestCentroids]], whose centroid list is a
  * foldable PLAN LITERAL (right for constant-size models, an O(n) driver +
  * task-serialization wall when the cell count grows with the corpus), the
  * bundle arrives as ordinary COLUMNS from a broadcast-joined centroid
  * table, so the model scales with the corpus without ever living in the
  * plan or on the driver. Score is dot/centroid-norm (the query norm is
  * constant per row, so rank-invariant); ties break on the smaller cell id
  * for cross-run determinism. */
case class NearestCellsScored(vec: Expression, cells: Expression,
    cents: Expression, nrms: Expression, p: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(vec, cells, cents, nrms, p)
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  @transient private lazy val nProbes: Int = p.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input); val cl = cells.eval(input)
    val ce = cents.eval(input); val nr = nrms.eval(input)
    if (v == null || cl == null || ce == null || nr == null) return null
    val va = v.asInstanceOf[ArrayData]
    val cla = cl.asInstanceOf[ArrayData]
    val cea = ce.asInstanceOf[ArrayData]
    val nra = nr.asInstanceOf[ArrayData]
    val dim = va.numElements()
    val nC = cla.numElements()
    val scores = new Array[Double](nC)
    var i = 0
    while (i < nC) {
      val ct = cea.getArray(i)
      var s = 0.0
      var d = 0
      val n = math.min(dim, ct.numElements())
      while (d < n) { s += va.getDouble(d) * ct.getDouble(d); d += 1 }
      val nm = nra.getDouble(i)
      scores(i) = if (nm > 0) s / nm else Double.MinValue
      i += 1
    }
    val k = math.min(nProbes, nC)
    val out = new Array[Any](k)
    val taken = new Array[Boolean](nC)
    var j = 0
    while (j < k) {
      var best = -1
      var bestS = Double.MinValue
      var bestCell = Int.MaxValue
      var t = 0
      while (t < nC) {
        if (!taken(t)) {
          val cid = cla.getInt(t)
          if (best == -1 || scores(t) > bestS ||
              (scores(t) == bestS && cid < bestCell)) {
            best = t; bestS = scores(t); bestCell = cid
          }
        }
        t += 1
      }
      taken(best) = true
      out(j) = InternalRow(bestCell, bestS)
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NearestCellsScored =
    copy(vec = newChildren(0), cells = newChildren(1), cents = newChildren(2),
      nrms = newChildren(3), p = newChildren(4))
}

/** Banded random-hyperplane LSH keys for an array<double> vector: element b
  * is the packed sign bits of band b's planes. Planes are derived from a
  * SplitMix64 formula of the (plane, dim) index — identical on every
  * executor with nothing to broadcast — and cached per vector dimension.
  * One pass of dim × nPlanes multiply-adds replaces nPlanes separate
  * dot-product expression trees (the composed form plants nPlanes literal
  * arrays in the plan and made codegen compile dominate small inputs).
  * Dot accumulation is sequential left-to-right, so signs are bit-identical
  * to [[DotProductD]] against the same plane literals. */
case class LshBandKeys(child: Expression, nPlanes: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  require(rowsPerBand > 0 && nPlanes % rowsPerBand == 0,
    s"nPlanes ($nPlanes) must be a positive multiple of rowsPerBand " +
      s"($rowsPerBand) — integer division would silently drop leftover planes")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def planes(dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(dim, _ =>
      Array.tabulate(nPlanes, dim)((p, d) =>
        ((mix64(p.toLong * 1000003L + d) >>> 11).toDouble /
          (1L << 53).toDouble) * 2.0 - 1.0))

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val pl = planes(dim)
    val nBands = nPlanes / rowsPerBand
    val keys = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var key = 0
      var r = 0
      while (r < rowsPerBand) {
        val p = pl(b * rowsPerBand + r)
        var s = 0.0
        var d = 0
        while (d < dim) { s += arr.getDouble(d) * p(d); d += 1 }
        if (s > 0) key |= 1 << r
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sequential-fold dot product over two array<double> columns. The fold is
  * left-to-right, so for EQUAL-LENGTH inputs results are bit-identical to
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` and to
  * any engine summing the same way — the property the differential oracle
  * relies on. Length-mismatched inputs TRUNCATE to the shorter array
  * (round-7 review note: the zip_with form instead null-pads and returns
  * NULL there, so the equivalence is stated for equal lengths only —
  * every caller dots same-dimension embeddings). Codegen'd. */
/** Bit-spreading helpers for [[MortonCode]] — a top-level object so the
  * generated whole-stage-codegen Java can call the static forwarders. */
object MortonCodes {
  /** Spread the low 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
  /** Interleave the low 32 bits of `a` (even positions) and `b` (odd). */
  def zEncode(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** 64-bit Morton (Z-order) code: the bits of two 32-bit dimensions
  * interleaved, so sorting by the code gives multi-dimensional locality —
  * rows close in the code are close in BOTH dimensions, and every
  * 2^k-aligned square of the plane is one contiguous code range. Callers
  * should scale both dimensions to comparable bit widths first (equal-width
  * or rank buckets — the Delta OPTIMIZE ZORDER recipe); interleaving a
  * 13-bit key with a 30-bit key lets the wide key's high bits dominate and
  * degenerates to single-key sorting. Participates in whole-stage codegen
  * via [[MortonCodes]]' static forwarders. */
case class MortonCode(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    MortonCodes.zEncode(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MortonCodes.zEncode($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Count-min-sketch point query: the frequency estimate of `item` under a
  * sketch built by Spark's `count_min_sketch` aggregate (Cormode/
  * Muthukrishnan '05 — estimate ≥ true count always; ≤ true + ε·N with
  * probability ≥ confidence). The sketch argument is a FOLDABLE binary
  * literal — the collected one-row aggregate embedded as a plan literal,
  * the same model-parameter pattern as the IVF centroids — so it is
  * deserialized once per task, not per row. Items are hashed through their
  * UTF-8 bytes, matching how the aggregate feeds StringType into the
  * sketch. */
case class CmsEstimate(item: Expression, sketch: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = item
  override def right: Expression = sketch
  override def dataType: DataType = LongType

  @transient private lazy val sk: org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch.eval().asInstanceOf[Array[Byte]]))

  override def nullSafeEval(i: Any, s: Any): Any =
    sk.estimateCount(i.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(item = l, sketch = r)
}

case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Distinct word n-gram shingles of a single-space-tokenized text — one
  * pass, no intermediate token/sequence arrays. Semantics match
  * `array_distinct(transform(sequence(1, size-2), i -> concat_ws(' ',
  * tok[i], tok[i+1], tok[i+2])))` for texts with ≥ n tokens. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val out = new java.util.LinkedHashSet[String]()
    var i = 0
    val last = toks.length - n
    if (last < 0) out.add(toks.mkString(" "))
    while (i <= last) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-document n-gram repetition stats in ONE pass. The repetition signal
  * carries only per-document state, so the grouped two-shuffle form
  * (occurrence explode → per-gram count → per-doc re-aggregate) collapses
  * to a narrow map: token split, one count map, three outputs — plan cost
  * drops from two keyed shuffles to zero. Returns null for texts with
  * fewer than n tokens (no gram exists); callers filter those first. The
  * grouped DataFrame form stays as the differential spec
  * ([[graft.text.TextOps.repetitionStatsGrouped]]). */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("n_distinct_tri", LongType, nullable = false),
    StructField("rep3_frac", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    val last = toks.length - n
    if (last < 0) return null
    val counts = new java.util.HashMap[String, Integer]()
    var total = 0L
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      total += 1
      i += 1
    }
    var rep = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c >= 2) rep += c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, counts.size.toLong, rep.toDouble / total))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Deflate byte length of the UTF-8 text at a pinned level (raw/nowrap
  * stream) — the compression-ratio quality signal (Gopher/MassiveText):
  * templated or repetitive documents compress far below natural prose, so
  * `deflate_len / byte_len` screens them in one narrow pass. The raw byte
  * COUNT surfaces (not a ratio), so callers form exact integer ppm ratios;
  * the value is a property of the zlib algorithm at the pinned level —
  * deterministic per JVM, rows-only at the cross-engine gate (SQL engines
  * carry no deflate). One Deflater per evaluation, buffer reused; the
  * codec cost is the point of the measurement, as at the multimodal
  * seam. */
case class DeflateLen(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes); d.finish()
      val buf = new Array[Byte](4096)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** MinHash signature: each shingle is string-hashed ONCE (xxhash64), and
  * the per-seed family values are a SplitMix64 integer stream off that hash
  * — ~5 ALU ops per seed instead of a full string hash per (shingle, seed),
  * which is ~10× cheaper at 48 seeds and the standard one-hash+mix MinHash
  * construction. Internal hash values never surface in results (candidates
  * are re-verified with exact Jaccard), so only determinism and family
  * independence matter. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def mix64(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var k = 0
      var z = h
      while (k < numHashes) {
        z = mix64(z)
        if (z < sig(k)) sig(k) = z
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Exact Jaccard similarity of two distinct-element string arrays via a
  * hash set — one pass instead of two `array_intersect` evaluations. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val set = new java.util.HashSet[UTF8String](x.numElements() * 2)
    var i = 0
    while (i < x.numElements()) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    var j = 0
    while (j < y.numElements()) {
      if (set.contains(y.getUTF8String(j))) inter += 1
      j += 1
    }
    inter.toDouble / (x.numElements() + y.numElements() - inter).toDouble
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** The ONE FNV-1a 64 fold, shared by the SimHash FNV signature and the
  * scalar [[Fnv1a64]] kernel: `h = (h XOR byte) · prime mod 2⁶⁴` over the
  * UTF-8 bytes, offset basis 0xcbf29ce484222325, prime 0x100000001b3.
  * Plain wrapping integer arithmetic — the property every oracle-replayable
  * twin rests on: a SQL oracle replays the fold exactly in HUGEINT
  * arithmetic reduced mod 2⁶⁴ (the xor touches only the low byte, so it
  * lifts to BIGINT and back). Living in one place means the sketch twins
  * (`vocab_cms_struct`, `agg_hll_struct`) and the SimHash twin can never
  * drift onto different token hashes. */
private[functions] object Fnv {
  def hash64(bs: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
    var j = 0
    while (j < bs.length) {
      h = (h ^ (bs(j) & 0xffL)) * 0x100000001b3L // FNV-1a 64 prime
      j += 1
    }
    h
  }
}

/** Scalar FNV-1a 64 of a string's UTF-8 bytes ([[Fnv.hash64]]) — the
  * oracle-replayable base hash under the structural sketch twins: the CMS
  * twin row-hashes it with [[MulWrap64]] multipliers, the HLL twin splits
  * it into (bucket, rank). Spark's own `xxhash64` stays the production
  * hash everywhere else (better avalanche); this kernel exists precisely
  * because its fold is expressible in ANSI SQL big-integer arithmetic. */
case class Fnv1a64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // analysis-time contract (round-8 ADVICE): a mistyped call like
  // graft_fnv1a64(42) must fail at analysis with the argument named, not
  // executor-side with a ClassCastException. checkInputDataTypes is the
  // repo's seam for this (ExpectsInputTypes needs AbstractDataType, which
  // is private[sql] at the Scala level in Spark 4 — see ReservoirQuantile).
  // NullType is admitted (round-9, ADVICE r8 #4): a bare SQL NULL
  // argument evaluates to NULL through nullSafeEval, the pre-contract
  // surface — only genuinely mistyped arguments are rejected.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_fnv1a64: argument must be STRING, got ${child.dataType.sql}")
  override def nullSafeEval(v: Any): Any =
    Fnv.hash64(v.asInstanceOf[UTF8String]
      .getBytes)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Wrapping (mod 2⁶⁴) product of two longs — the modular-arithmetic seam
  * ANSI mode closes: Spark 4 runs ANSI-on, so `a * b` in SQL throws on
  * overflow and `try_multiply` nulls it, while the sketch twins NEED the
  * ring Z/2⁶⁴ (multiply-shift bucket hashing, replayed by the oracle as
  * `(a·b) % 2⁶⁴` in HUGEINT). Kept a separate two-arg kernel rather than
  * folded into [[Fnv1a64]] so the multiplier stays a visible plan literal
  * next to its oracle twin. */
case class MulWrap64(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  // analysis-time contract (round-8 ADVICE): both operands must already be
  // BIGINT — graft_mulwrap64('x', 1) names the bad argument at analysis
  // instead of throwing ClassCastException mid-job.
  // NullType admitted per operand (ADVICE r8 #4), same rationale as
  // [[Fnv1a64]]: NULL in, NULL out; mistyped operands still rejected.
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(("left", left), ("right", right)).collectFirst {
      case (n, e) if e.dataType != LongType && e.dataType != NullType =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_mulwrap64: argument '$n' must be BIGINT, got ${e.dataType.sql}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any, b: Any): Any =
    a.asInstanceOf[Long] * b.asInstanceOf[Long]
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** The ONE SimHash vote-and-sign fold, shared by both signature
  * expressions: split on single spaces, hash each token to 64 bits, vote
  * ±1 per bit, sign the votes. The per-token hash is the ONLY degree of
  * freedom — `dedup_simhash_struct`'s entire value is being a
  * structurally identical twin of `dedup_simhash`, so the fold lives in
  * exactly one place and a future vote-scheme edit cannot silently split
  * the two tiers. */
private[functions] object SimHashVotes {
  def signature(text: UTF8String, hashToken: String => Long): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hashToken(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }
}

/** The [[SimHash64]] vote scheme with an FNV-1a 64 per-token hash instead
  * of xxhash64 — the ORACLE-REPLAYABLE signature twin (round 7): FNV-1a's
  * fold is plain wrapping integer arithmetic ((h ^ byte) · prime mod 2⁶⁴),
  * which a SQL oracle replays exactly in HUGEINT arithmetic, where
  * xxhash64's rotates/lane merges are not reasonably expressible. Drives
  * `dedup_simhash_struct`, the hash-checked structural twin of the
  * xxhash64 candidate tier — same banding, same Hamming join, hard-gated
  * pair set. */
case class SimHash64Fnv(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashVotes.signature(v.asInstanceOf[UTF8String], { tok =>
      Fnv.hash64(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** 64-bit SimHash over single-space tokens: bit b of the result is the sign
  * of the ±1 votes of each token-hash's bit b (xxhash64, seed 42 — same
  * default as `functions.xxhash64`). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SimHashVotes.signature(v.asInstanceOf[UTF8String], { tok =>
      val t = UTF8String.fromString(tok)
      XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

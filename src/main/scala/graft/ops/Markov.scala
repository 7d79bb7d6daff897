package graft.ops

/** Pure first-order-Markov attribution math over a collected transition
  * count table — the MODEL-PARAMETER half of `attribution_markov` (the
  * distributed half is the transition aggregation; see
  * [[graft.Queries.attributionMarkov]]). Kept free of Spark so the spec
  * can pin closed-form chains exactly.
  *
  * States: "start" (journey source), channel names, "purchase" (absorbing
  * conversion), "null" (absorbing non-conversion). Absorption probability
  * into purchase solves (I − Q)·t = r by Gauss-Jordan with fixed pivot
  * order — deterministic double arithmetic, no data-dependent ordering. */
object Markov {

  /** The chain under removal: transient-to-transient matrix Q, purchase-
    * absorption vector r, and the start-state index — ONE construction
    * shared by the direct solve and the power-iteration recompute, so the
    * removal-effect semantics (removed channels' outgoing mass redirected
    * to null; their incoming edges dropped from Q but kept in the
    * source's normalizer) cannot desynchronize between the two. */
  private def buildChain(counts: Seq[(String, String, Long)],
                         removed: Set[String])
      : (Array[Array[Double]], Array[Double], Int) = {
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "start" && s != "purchase" && s != "null")
      .distinct.sorted
    val states = "start" +: channels
    val idx = states.zipWithIndex.toMap
    val nS = states.length
    val q = Array.ofDim[Double](nS, nS)
    val r = new Array[Double](nS)
    for (s <- states; if !removed.contains(s)) {
      val out = counts.filter(_._1 == s)
      val tot = out.map(_._3).sum.toDouble
      if (tot > 0) out.foreach { case (_, to, n) =>
        if (to == "purchase") r(idx(s)) += n / tot
        else if (to != "null" && idx.contains(to) && !removed.contains(to))
          q(idx(s))(idx(to)) += n / tot
      }
    }
    (q, r, idx("start"))
  }

  /** P(absorb into purchase | start), with `removed` channels' outgoing
    * mass redirected to null — direct Gauss-Jordan solve of (I − Q)t = r
    * with PARTIAL PIVOTING (round-7 review: a closed transient cycle —
    * a state whose outgoing mass loops with no path to purchase — zeroes
    * the natural pivot, and the unpivoted solve returned NaN where the
    * iterative forms correctly return 0). A column whose remaining
    * entries are all ~0 is that degenerate case: the state's absorption
    * is exactly 0, pinned by a synthetic unit row. Row swaps permute
    * equations, not variables, and Jordan elimination leaves the matrix
    * diagonal, so t_p = b(p)/a(p)(p) holds regardless of swap history. */
  def absorption(counts: Seq[(String, String, Long)],
                 removed: Set[String]): Double = {
    val (q, r, start) = buildChain(counts, removed)
    val nS = r.length
    val a = Array.tabulate(nS, nS)((i, j) =>
      (if (i == j) 1.0 else 0.0) - q(i)(j))
    val b = r.clone()
    for (p <- 0 until nS) {
      var best = p
      var i2 = p + 1
      while (i2 < nS) {
        if (math.abs(a(i2)(p)) > math.abs(a(best)(p))) best = i2
        i2 += 1
      }
      if (best != p) {
        val tr = a(p); a(p) = a(best); a(best) = tr
        val tb = b(p); b(p) = b(best); b(best) = tb
      }
      if (math.abs(a(p)(p)) < 1e-12) { a(p)(p) = 1.0; b(p) = 0.0 }
      val piv = a(p)(p)
      for (i <- 0 until nS if i != p && a(i)(p) != 0.0) {
        val f = a(i)(p) / piv
        for (j <- 0 until nS) a(i)(j) -= f * a(p)(j)
        b(i) -= f * b(p)
      }
    }
    b(start) / a(start)(start)
  }

  /** Same absorption probability by plain power iteration — the
    * independent recomputation the spec diffs against the direct solve. */
  def absorptionIterative(counts: Seq[(String, String, Long)],
                          removed: Set[String], iters: Int = 500): Double = {
    val (q, r, start) = buildChain(counts, removed)
    val nS = r.length
    var t = new Array[Double](nS)
    for (_ <- 0 until iters) {
      val next = new Array[Double](nS)
      var i = 0
      while (i < nS) {
        var s = r(i)
        var j = 0
        while (j < nS) { s += q(i)(j) * t(j); j += 1 }
        next(i) = s
        i += 1
      }
      t = next
    }
    t(start)
  }

  /** Fixed-point scale (1e12) and iteration count for the EXACT integer
    * absorption iterate. 400 rounds cover a contraction rate up to
    * ~0.935 at full 1e12 resolution; both the engine and the DuckDB
    * oracle run the same fixed count, so the published integers agree
    * bit-for-bit regardless of convergence state. */
  val FpScale: Long = 1000000000000L
  val FpIters: Int = 400

  /** EXACT fixed-point absorption, scaled by [[FpScale]]: the update
    * t'ᵢ = (nᵢ→purchase·S + Σⱼ nᵢⱼ·tⱼ) div totᵢ is pure integer because
    * each source state's normalizer divides ONCE per update. From t = 0
    * the map is monotone nondecreasing and bounded by S, so the iterate
    * is deterministic on any engine — the property that turns this
    * query's oracle from "matrix solves aren't SQL" into a recursive
    * CTE. Overflow bound: counts·S must stay under 2⁶³ (counts < ~9e5);
    * planet-scale count tables would move the fold to BigInt — the
    * matrix is a model parameter either way. */
  def absorptionFixedPointScaled(counts: Seq[(String, String, Long)],
                                 removed: Set[String],
                                 iters: Int = FpIters): Long = {
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "start" && s != "purchase" && s != "null")
      .distinct.sorted
    val states = "start" +: channels
    val idx = states.zipWithIndex.toMap
    val nS = states.length
    val tot = new Array[Long](nS)
    val toPurchase = new Array[Long](nS)
    val qn = Array.ofDim[Long](nS, nS)
    for (s <- states; if !removed.contains(s)) {
      val out = counts.filter(_._1 == s)
      // checked sum: the guard below must see the TRUE total, not a
      // wrapped one — two 5e18 counts would otherwise sum negative and
      // sneak past the require into the silent-wrap regime
      tot(idx(s)) = out.foldLeft(0L) { (a, c) =>
        try Math.addExact(a, c._3)
        catch {
          case _: ArithmeticException => throw new IllegalArgumentException(
            s"absorption fixed-point would overflow: outgoing counts of " +
              s"'$s' exceed 2^63 — use BigInt")
        }
      }
      out.foreach { case (_, to, n) =>
        if (to == "purchase") toPurchase(idx(s)) += n
        else if (to != "null" && idx.contains(to) && !removed.contains(to))
          qn(idx(s))(idx(to)) += n
      }
    }
    // overflow is a LOUD failure, not a wrap (round-7, ADVICE r6): the
    // accumulator is bounded by tot(i)·FpScale because Σⱼ qnᵢⱼ + nᵢ→purchase
    // ≤ totᵢ and t ≤ FpScale, so the exact-integer form is safe iff every
    // state's outgoing count stays under 2⁶³/FpScale (~9.2e6). Past that,
    // move the fold to BigInt — the matrix is a model parameter either way.
    val maxTot = if (nS == 0) 0L else tot.max
    require(maxTot <= Long.MaxValue / FpScale,
      s"absorption fixed-point would overflow: max outgoing count $maxTot " +
        s"exceeds ${Long.MaxValue / FpScale} (2^63/FpScale) — use BigInt")
    var t = new Array[Long](nS)
    for (_ <- 0 until iters) {
      val next = new Array[Long](nS)
      var i = 0
      while (i < nS) {
        if (tot(i) > 0) {
          var s: Long = toPurchase(i) * FpScale
          var j = 0
          while (j < nS) { s += qn(i)(j) * t(j); j += 1 }
          next(i) = s / tot(i)
        }
        i += 1
      }
      t = next
    }
    t(idx("start"))
  }

  /** (channel, removal-effect ppm, attribution-share ppm) — the exact
    * integer form of [[attribute]]: re = (t_base − t_without_c)·1e6 div
    * t_base, shares normalized over the exact scaled differences.
    * Effects are ≥ 0 by construction (removing mass can only lower the
    * monotone iterate). Channels sorted. */
  def attributeFixedPoint(counts: Seq[(String, String, Long)])
      : Seq[(String, Long, Long)] = {
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "start" && s != "purchase" && s != "null")
      .distinct.sorted
    val tBase = absorptionFixedPointScaled(counts, Set.empty)
    val diffs = channels.map(c =>
      c -> (tBase - absorptionFixedPointScaled(counts, Set(c))))
    val totDiff = diffs.map(_._2).sum
    diffs.map { case (c, d) =>
      (c,
        if (tBase > 0) d * 1000000L / tBase else 0L,
        if (totDiff > 0) d * 1000000L / totDiff else 0L)
    }
  }

  /** (channel, removal effect, normalized attribution share), channels
    * sorted; effects floored at 0 (sampling noise can nudge a useless
    * channel's removal marginally "helpful"). */
  def attribute(counts: Seq[(String, String, Long)])
      : Seq[(String, Double, Double)] = {
    val channels = counts.flatMap(t => Seq(t._1, t._2))
      .filter(s => s != "start" && s != "purchase" && s != "null")
      .distinct.sorted
    val pBase = absorption(counts, Set.empty)
    val effects = channels.map { c =>
      val re = if (pBase > 0) 1.0 - absorption(counts, Set(c)) / pBase else 0.0
      (c, math.max(re, 0.0))
    }
    val total = effects.map(_._2).sum
    effects.map { case (c, re) =>
      (c,
        BigDecimal(re).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(if (total > 0) re / total else 0.0)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}

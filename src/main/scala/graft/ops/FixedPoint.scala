package graft.ops

/** Exact-integer fixed-point linear algebra for the DRIVER-SIDE model
  * fits that want hash-checked oracles (the `graph_pagerank` recipe,
  * round 8: VERDICT r7 #2). Everything here is BigInt with truncating
  * division (Scala BigInt `/` truncates toward zero, exactly like DuckDB
  * HUGEINT `//` — validated on negative operands), so a DuckDB recursive
  * CTE replays every step bit-for-bit. Inputs are KB-sized model
  * summaries (a d×d covariance), never corpus-sized frames. */
object FixedPoint {

  /** The lattice scale: vectors live on the S = 10⁶ integer lattice
    * (|v_i| ≤ S after each normalization), so with |C_ij| ≤ 1e12
    * (micro², n²-normalized) every intermediate stays ≤ ~1e28 — far
    * under DuckDB's signed-INT128 HUGEINT ceiling (~1.7e38) at ANY
    * corpus scale. */
  val S: BigInt = BigInt(1000000)

  /** Exact ⌊√x⌋: double-sqrt seed + integer correction. The SQL twin
    * uses the same seed with a one-step correction, exact for the
    * x ≤ 2⁵³ range the pre-shrink guarantees (Σu² ≤ d·S² ≈ 6.4e13). */
  def isqrt(x: BigInt): BigInt = {
    require(x >= 0, s"isqrt of negative $x")
    if (x < 2) return x
    var r = BigInt(math.floor(math.sqrt(x.toDouble)).toLong)
    while (r * r > x) r -= 1
    while ((r + 1) * (r + 1) <= x) r += 1
    r
  }

  /** `iters` rounds of power iteration on the integer lattice, from the
    * uniform start v = (S, …, S). Each round: w = M·v; pre-shrink
    * u = w·S quot max|w| (so |u| ≤ S and Σu² fits the exact-isqrt
    * range); normalize v' = u·S quot ⌊√Σu²⌋. max|w| = 0 (v exactly in
    * M's null space — never observed, guarded for SQL-twin parity)
    * leaves v unchanged. */
  def powerIteration(m: Array[Array[BigInt]], iters: Int): Array[BigInt] = {
    val d = m.length
    var v = Array.fill(d)(S)
    var t = 0
    while (t < iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(BigInt(0))((acc, j) => acc + m(i)(j) * v(j)))
      val mx = w.map(_.abs).max
      if (mx != 0) {
        val u = w.map(x => x * S / mx)
        val r = isqrt(u.foldLeft(BigInt(0))((acc, x) => acc + x * x))
        v = u.map(x => x * S / r)
      }
      t += 1
    }
    v
  }

  /** Rayleigh quotient on the lattice: λ = (v·Mv) quot (v·v), in M's
    * units. */
  def rayleigh(m: Array[Array[BigInt]], v: Array[BigInt]): BigInt = {
    val d = m.length
    val w = Array.tabulate(d)(i =>
      (0 until d).foldLeft(BigInt(0))((acc, j) => acc + m(i)(j) * v(j)))
    val num = (0 until d).foldLeft(BigInt(0))((acc, i) => acc + v(i) * w(i))
    val den = v.foldLeft(BigInt(0))((acc, x) => acc + x * x)
    num / den
  }

  /** Deterministic sign: flip so the largest-|loading| coordinate
    * (ties → lowest index) is positive. */
  def signFix(v: Array[BigInt]): Array[BigInt] = {
    val k = v.indices.maxBy(i => (v(i).abs, -i))
    if (v(k) < 0) v.map(-_) else v
  }

  /** Top-2 eigenpairs of a symmetric integer matrix by power iteration +
    * one Hotelling deflation (D = C − (λ₁·v₁v₁ᵀ) quot S²), 200 rounds
    * each — enough to reach the integer-lattice fixed point on the tight
    * synthetic embedding spectrum (see [[graft.Queries.embedPca]]).
    * Returns (v₁ sign-fixed, λ₁, v₂ sign-fixed, λ₂); λs are Rayleigh
    * quotients of the PRE-signfix vectors (quadratic — sign-invariant,
    * kept explicit so the SQL twin reads identically). */
  def pca2(cov: Array[Array[BigInt]],
           iters: Int = 200): (Array[BigInt], BigInt, Array[BigInt], BigInt) = {
    val d = cov.length
    val v1 = powerIteration(cov, iters)
    val lam1 = rayleigh(cov, v1)
    val defl = Array.tabulate(d, d)((i, j) =>
      cov(i)(j) - lam1 * v1(i) * v1(j) / (S * S))
    val v2 = powerIteration(defl, iters)
    val lam2 = rayleigh(defl, v2)
    (signFix(v1), lam1, signFix(v2), lam2)
  }
}

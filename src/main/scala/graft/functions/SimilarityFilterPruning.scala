package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.DoubleType

/** Length-filter pre-pruning for Jaccard similarity predicates — the
  * classic size bound of the set-similarity-join literature (length filter,
  * cf. Xiao et al., "Efficient Similarity Joins for Near-Duplicate
  * Detection"): `jaccard(a, b) ≥ τ` implies `|a| ≥ τ·|b|` and `|b| ≥ τ·|a|`
  * (the intersection is bounded by the smaller set, the union by the
  * larger). The rule conjoins those two O(1) size checks IN FRONT of the
  * O(|a|+|b|) hash-set intersection; `And` short-circuits in both
  * interpreted and generated code, so length-mismatched pairs never build
  * the hash set. Injected through `SparkSessionExtensions` (see
  * [[GraftExtensions]]) — the optimizer-rule seam of the extension API.
  *
  * Semantics are preserved exactly: the added conjuncts are implied by the
  * predicate they guard (rows they drop would fail it anyway), nulls
  * propagate identically (`size(null)` is null under
  * `spark.sql.legacy.sizeOfNull=false`, and `null AND null = null`), and a
  * rounded comparison (`round(jaccard, s) ≥ τ`) relaxes the bound by the
  * half-ulp of the rounding. A tree tag keeps the rewrite idempotent under
  * the optimizer's fixed-point batches. */
object SimilarityFilterPruning extends Rule[LogicalPlan] {

  private val Pruned = TreeNodeTag[Boolean]("graft.similarityFilterPruned")

  private def sizeBounds(a: Expression, b: Expression, tau: Double): Expression = {
    val t = Literal(math.max(tau, 0.0))
    val sa = Cast(Size(a), DoubleType)
    val sb = Cast(Size(b), DoubleType)
    And(GreaterThanOrEqual(sa, Multiply(t, sb)),
      GreaterThanOrEqual(sb, Multiply(t, sa)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case cmp @ GreaterThanOrEqual(j: JaccardSim, Literal(tau: Double, DoubleType))
          if cmp.getTagValue(Pruned).isEmpty =>
        cmp.setTagValue(Pruned, true)
        And(sizeBounds(j.left, j.right, tau), cmp)
      case cmp @ GreaterThanOrEqual(r: Round, Literal(tau: Double, DoubleType))
          if cmp.getTagValue(Pruned).isEmpty && r.child.isInstanceOf[JaccardSim] &&
            roundedSlack(r).isDefined =>
        val j = r.child.asInstanceOf[JaccardSim]
        cmp.setTagValue(Pruned, true)
        // round(j, s) >= tau admits j down to tau - 0.5*10^-s; relax the
        // bound by the ACTUAL half-ulp of the rounding scale (round-7
        // review: a fixed 1e-3 slack only covers scales >= 3 — at
        // round(j, 2) >= 0.8 a true match at j = 0.797 passes the
        // predicate but a 1e-3-relaxed guard would DROP it) plus a float
        // safety margin
        And(sizeBounds(j.left, j.right, tau - roundedSlack(r).get), cmp)
    }

  /** The admitted-below-τ slack of `round(·, s) >= τ`: half an ulp of the
    * rounding scale, plus a margin for the double arithmetic — defined
    * only for FOLDABLE non-negative integer scales (a dynamic or negative
    * scale leaves the predicate unpruned rather than mis-bounded). */
  private def roundedSlack(r: Round): Option[Double] = r.scale match {
    case Literal(s: Int, _) if s >= 0 =>
      Some(0.5 * math.pow(10.0, -s) + 1e-9)
    case _ => None
  }
}

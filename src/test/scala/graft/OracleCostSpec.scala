package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static cost gate over the DECLARED oracle SQL (round 8): DuckDB
  * INLINES a CTE referenced from a recursive arm, re-evaluating it on
  * EVERY iteration — `attribution_markov` re-derived its transition
  * counts from the full events table 400× (124 s of a 22-minute gate
  * that had been landing empty driver-side). The fix is `AS
  * MATERIALIZED` on every recursion-referenced base CTE; this spec
  * makes the fix a standing invariant, so a future oracle (or an edit
  * to an existing one) cannot silently reintroduce the per-iteration
  * re-run.
  *
  * Rule: inside each recursive CTE, only references in the ITERATION
  * branch (after the recursive body's first top-level UNION) count —
  * the seed branch runs once, so seed-only references (e.g. the shared
  * dup-pair CTE `p` feeding an edge-list seed) are exempt. */
class OracleCostSpec extends AnyFunSuite {

  /** One top-level CTE of a WITH [RECURSIVE] statement. */
  private case class Cte(name: String, hasColList: Boolean,
                         materialized: Boolean, body: String)

  /** Parse the top-level CTE list (balanced-paren scan; skips nothing —
    * the spec sees the EXPANDED oracle text, fragments included). */
  private def parseCtes(sql: String): Seq[Cte] = {
    val m = "(?s)WITH\\s+(RECURSIVE\\s+)?".r.findFirstMatchIn(sql)
      .getOrElse(return Seq.empty)
    var i = m.end
    val out = Seq.newBuilder[Cte]
    val header =
      "(?s)^(\\w+)\\s*(\\([\\w,\\s]*\\))?\\s+AS\\s+(MATERIALIZED\\s+)?\\(".r
    var continue = true
    while (continue) {
      while (i < sql.length && sql(i).isWhitespace) i += 1
      header.findFirstMatchIn(sql.substring(i)) match {
        case Some(h) =>
          val start = i + h.end - 1 // at '('
          var depth = 0
          var j = start
          while (j < sql.length && {
            if (sql(j) == '(') depth += 1
            else if (sql(j) == ')') depth -= 1
            depth != 0
          }) j += 1
          out += Cte(h.group(1), h.group(2) != null, h.group(3) != null,
            sql.substring(start + 1, j))
          i = j + 1
          while (i < sql.length && sql(i).isWhitespace) i += 1
          if (i < sql.length && sql(i) == ',') i += 1 else continue = false
        case None => continue = false
      }
    }
    out.result()
  }

  /** The body text AFTER the recursive CTE's first top-level UNION —
    * the branch that re-runs per iteration. */
  private def iterationBranch(body: String): String = {
    var depth = 0
    var i = 0
    while (i < body.length) {
      body(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'U' | 'u' if depth == 0 &&
          body.regionMatches(true, i, "UNION", 0, 5) =>
          return body.substring(i + 5)
        case _ =>
      }
      i += 1
    }
    ""
  }

  private def references(text: String, name: String): Boolean =
    ("\\b" + java.util.regex.Pattern.quote(name) + "\\b").r
      .findFirstIn(text).isDefined

  test("every CTE referenced in a recursive oracle's iteration branch " +
    "is MATERIALIZED (per-iteration re-evaluation is the gate's " +
    "dominant failure cost)") {
    val violations = Seq.newBuilder[String]
    for ((qname, sql) <- SparkEntry.oracleSql
         if sql.contains("WITH RECURSIVE")) {
      val ctes = parseCtes(sql)
      val recursive = ctes.filter(c =>
        c.hasColList || references(c.body, c.name))
      val recNames = recursive.map(_.name).toSet
      for (rec <- recursive) {
        val iter = iterationBranch(rec.body)
        for (c <- ctes
             if !recNames.contains(c.name)
             if !c.materialized
             if references(iter, c.name)) {
          violations += s"$qname: CTE '${c.name}' is referenced in " +
            s"'${rec.name}'s iteration branch but not MATERIALIZED"
        }
      }
    }
    val v = violations.result()
    assert(v.isEmpty, v.mkString("\n"))
  }

  test("the parser itself sees the expected recursive catalog (guard " +
    "against the gate silently matching nothing)") {
    val recOracles = SparkEntry.oracleSql.filter(_._2.contains("WITH RECURSIVE"))
    assert(recOracles.size >= 20,
      s"expected >= 20 recursive oracles, parser saw ${recOracles.size}")
    // a known-shape probe: attribution_markov's iteration branch joins
    // the round-9 pre-aggregated cmat/base tables (counts moved OUT of
    // the recursion entirely — the #7 shave); both must parse as
    // MATERIALIZED and actually be the iteration branch's references
    val markov = SparkEntry.oracleSql("attribution_markov")
    val ctes = parseCtes(markov)
    Seq("cmat", "base").foreach { n =>
      val c = ctes.find(_.name == n).get
      assert(c.materialized, s"$n must stay MATERIALIZED")
    }
    val fp = ctes.find(_.name == "fp").get
    val iter = iterationBranch(fp.body)
    assert(references(iter, "cmat") && references(iter, "base"),
      "probe expectation broken: cmat/base no longer in fp's iteration branch")
    assert(!references(iter, "counts"),
      "counts is back in fp's iteration branch — the round-9 " +
        "pre-aggregation regressed")
  }
}

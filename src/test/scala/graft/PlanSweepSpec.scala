package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI gate over the plan audit: a change that sneaks a cartesian product or
  * nested-loop join into a declared query fails the build instead of
  * surfacing at 100× the data. */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet scans keep filter and projection pushdown (scan_parquet)") {
    val plan = Queries.scanParquet(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), s"filter not pushed to scan:\n$plan")
    // projection pruning: the wide comment column must not be read
    assert(!plan.contains("l_comment"), "scan reads pruned columns")
  }

  test("only documented queries plan a nested-loop join or global window") {
    val offenders = PlanSweep.sweep(spark, "/root/testdata/sf0.001")
    val errors = offenders.filter(_._2.startsWith("PLAN_ERROR"))
    assert(errors.isEmpty, s"queries failed to plan: $errors")
    val byOp = offenders.flatMap { case (n, ops) => ops.split(",").map((n, _)) }
    val bnlj = byOp.collect {
      case (n, o) if o != "GlobalWindow" && o != "OversizedLiteral" => n
    }.toSet
    val unexpected = bnlj -- PlanSweep.Allowlist
    assert(unexpected.isEmpty,
      s"undocumented scale-killer plans in: $unexpected " +
        s"(allowlist: ${PlanSweep.Allowlist})")
    // a Window with an empty partition spec funnels every row through ONE
    // task — no declared query may plan one
    val gw = byOp.collect { case (n, "GlobalWindow") => n }.toSet
    assert((gw -- PlanSweep.GlobalWindowAllowlist).isEmpty,
      s"single-task global windows in: $gw")
    // a plan literal that grows with the data (the old IVF centroid list)
    // is driver memory + per-task serialization — models ship as tables
    val lit = byOp.collect { case (n, "OversizedLiteral") => n }.toSet
    assert((lit -- PlanSweep.OversizedLiteralAllowlist).isEmpty,
      s"oversized plan literals in: $lit")
  }

  test("every allowlisted BNLJ's build side is PROVABLY bounded " +
    "(scalar maxRows or runtime row cap) — the allowlist is not name-trust") {
    val violations =
      PlanSweep.bnljShapeViolations(spark, "/root/testdata/sf0.001")
    assert(violations.isEmpty,
      s"allowlisted queries whose nested-loop side is no longer bounded: " +
        s"$violations")
  }

  test("the BNLJ shape checker catches a deliberate corpus×corpus mutation") {
    val dir = "/root/testdata/sf0.001"
    val li = ops.Tables.table(spark, dir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_orderkey"))
    // a corpus-sized cartesian — the mutation the name-trusting allowlist
    // used to wave through
    val mutant = li.crossJoin(li.select(
      org.apache.spark.sql.functions.col("l_orderkey").as("r_orderkey")))
    val flagged = PlanSweep.violationsOf(mutant, "mutant")
    assert(flagged.nonEmpty,
      "shape checker failed to flag an unbounded cartesian")
    // while a genuine one-row scalar broadcast passes
    val scalarSide = li.agg(
      org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("l_orderkey")).as("mx"))
    val scalar = li.crossJoin(scalarSide)
    assert(PlanSweep.violationsOf(scalar, "scalar").isEmpty,
      "shape checker wrongly flagged a one-row scalar broadcast")
  }

  test("decontaminate joins the benchmark side as a broadcast, never a shuffle") {
    val plan = Queries.decontaminate(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark side must broadcast:\n$plan")
  }

  test("hash sampling is a pure pushup-free filter (no pre-sort exchange)") {
    // one range exchange for the final ORDER BY is expected; the sample
    // filter itself must not induce any aggregation or join exchange
    val plan = Queries.sampleHash(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"hash sampling should be filter-only:\n$plan")
  }

  test("bucketed join plans exchange-free on the join key (and reuses the " +
    "session's bucketed tables)") {
    val dir = "/root/testdata/sf0.001"
    Queries.joinBucketed(spark, dir).count() // first call builds the tables
    val plan = Queries.joinBucketed(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected bucketed SMJ:\n$plan")
    assert(!plan.contains("hashpartitioning(o_custkey"),
      s"bucketed join must not re-shuffle the join key:\n$plan")
  }

  test("incremental dedup probes the persisted index instead of re-banding " +
    "the corpus") {
    val dir = "/root/testdata/sf0.001"
    Queries.dedupIncremental(spark, dir).count() // warm the session index
    val plan = Queries.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    // the corpus signatures come from the bucketed managed index table,
    // never recomputed (only the DELTA side shingles + bands: exactly one
    // posexplode in the whole plan). Whether the shingle verify side also
    // hits the session plan-cache is order-dependent across suites, so it
    // is deliberately NOT asserted — the load-bearing property is that the
    // corpus is never re-banded.
    assert(plan.contains("graft_band_index"),
      s"incremental dedup should read the bucketed signature index:\n$plan")
    val explodes = "Generate posexplode".r.findAllIn(plan).size
    assert(explodes == 1,
      s"only the delta may band-explode, found $explodes:\n$plan")
  }

  test("declared dedup_incremental joins the BUCKETED signature index with " +
    "a delta-only band shuffle (the 100 TB deployment shape)") {
    val dir = "/root/testdata/sf0.001"
    Queries.dedupIncremental(spark, dir).count() // build the bucketed index
    val plan = Queries.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    // the corpus index reads pre-partitioned from its bucketed table; the
    // only band-key exchange in the candidate join is the delta side
    val bandShuffles = "hashpartitioning\\(band".r.findAllIn(plan).size
    assert(bandShuffles == 1,
      s"expected ONE (delta-only) band-key exchange, got $bandShuffles:\n$plan")
  }

  test("declared mm_phash_incremental probes the BUCKETED hamming index " +
    "with a delta-only key shuffle (the 100 TB deployment shape)") {
    val dir = "/root/testdata/sf0.001"
    Queries.mmPhashIncremental(spark, dir).count() // build the bucketed index
    val plan = Queries.mmPhashIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_hamming_index"),
      s"incremental pHash dedup should read the bucketed index:\n$plan")
    assert(plan.contains("Bucketed: true"),
      s"the index scan must ride its bucketing (no re-shuffle):\n$plan")
    // the index side arrives pre-partitioned from its bucketed table
    // (its spam-cap window reuses that distribution), so at most the
    // DELTA side may exchange on the block key — at fixture scale the
    // delta broadcasts and the count is zero
    val kShuffles = "hashpartitioning\\(k#".r.findAllIn(plan).size
    assert(kShuffles <= 1,
      s"index side must never re-shuffle on k, got $kShuffles:\n$plan")
  }

  test("dq_checks audits every rule in exactly ONE table scan") {
    val plan = Queries.dqChecks(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one events scan, found $scans:\n$plan")
  }

  test("pii_redact plans no exchange before its ORDER BY (pure narrow map)") {
    val plan = Queries.piiRedact(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    // exactly the one range exchange the deterministic ORDER BY needs
    assert(exchanges == 1,
      s"redaction must not shuffle (1 sort exchange expected, got $exchanges):\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"),
      s"redaction must stay a projection:\n$plan")
  }

  test("dedup_boilerplate never explodes words through a shuffle — only " +
    "chunk-granular keyed exchanges") {
    val df = Queries.dedupBoilerplate(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // chunking is a projection (generate over the chunk array), so every
    // exchange key must be doc- or fingerprint-granular: fingerprint agg,
    // join-back, per-doc reassembly, final sort
    val exchanges = "Exchange (range|hash)partitioning".r.findAllIn(plan).size
    assert(exchanges <= 5, s"unexpected exchange count $exchanges:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop in chunk dedup:\n$plan")
  }
}

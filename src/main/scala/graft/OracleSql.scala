package graft

/** ANSI-SQL oracles for [[Queries]], runnable by DuckDB over the same
  * parquet tables. Design rules (SURVEY.md §5.1): every statement ends with
  * an explicit ORDER BY on a deterministic key; money aggregates cast to
  * exact DECIMAL BEFORE arithmetic (same as the Spark side); counts cast to
  * BIGINT (DuckDB sums of integers widen to HUGEINT otherwise); timestamps
  * leave the query as formatted strings so physical precision (ns vs µs)
  * can never skew the comparison.
  *
  * FIXTURE COUPLING (round-7, ADVICE r6): the byte-derived oracles
  * (mm_audio_features, mm_audio_vad, mm_audio_fingerprint, mm_scene_cut,
  * doc_winnow, mm_chunk_dedup, dedup_simhash_struct, vocab_cms_struct)
  * and the
  * tokenizer/segmentation oracles (tokenize_wordpiece, tokenize_unigram,
  * vocab_bpe_iterative) re-derive samples/pixels/grams/token-hashes via
  * DuckDB length()/substr()/ord()/string_split, which are
  * CODEPOINT-based, while the engine indexes `text.getBytes("UTF-8")`
  * (audio/scene/winnow/chunker/FNV token hashes) or Java UTF-16 chars
  * (tokenizers, BPE symbol splits). The two units agree exactly iff every
  * document text is ASCII-only, and the `% length(text)` cycled-pixel
  * addressing additionally requires non-empty text. That
  * invariant holds for the generated corpus and is GATED, not assumed:
  * `OracleCouplingSpec` fails with a pointed message if a regenerated
  * corpus ever carries non-ASCII or empty text, naming the oracles that
  * would silently diverge.
  */
object OracleSql {

  /** The FNV-1a 64 fold as a DuckDB expression over `arg` (a VARCHAR SQL
    * expression) — ONE fragment interpolated into every oracle that
    * replays `functions.Fnv.hash64` (dedup_simhash_struct,
    * vocab_cms_struct, agg_hll_struct), mirroring the Scala side's
    * single-fold rule so the three twin tiers cannot drift onto
    * different token hashes. The xor touches only the low byte, so it
    * lifts to BIGINT and back; the whole fold stays in HUGEINT mod 2⁶⁴.
    * Valid for ASCII-only text (the gated fixture coupling above). */
  private def fnvSql(arg: String): String =
    s"""list_reduce(
             list_prepend(14695981039346656037::HUGEINT,
               list_transform(range(1, length($arg) + 1),
                 i -> CAST(ord(substr($arg, CAST(i AS INT), 1)) AS HUGEINT))),
             (h, b) -> ((h // 256) * 256
               + CAST(xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT))
               * 1099511628211::HUGEINT % 18446744073709551616::HUGEINT)"""

  /** One fixed-point power-iteration recursive CTE over a materialized
    * matrix CTE `mat(i, j, cv)` — the SQL twin of
    * [[graft.ops.FixedPoint.powerIteration]], interpolated twice into
    * the `embed_pca` oracle (PC1 over the covariance, PC2 over the
    * deflated matrix) so the two phases cannot drift. Per iteration:
    * w = M·v; pre-shrink u = (w·10⁶) // max|w|; exact ⌊√Σu²⌋ via a
    * DOUBLE-sqrt seed + one-step correction (Σu² ≤ 6.4e13 < 2⁵³, so the
    * seed errs by ≤ 1); v' = (u·10⁶) // ⌊√Σu²⌋. The max|w| = 0 guard
    * mirrors the Scala side for parity. NOTE: `mat` MUST be
    * `AS MATERIALIZED` — an inlined CTE referenced from a recursive arm
    * is re-evaluated EVERY iteration, and for the PC2 phase that would
    * re-run the entire PC1 recursion per round (measured: 10×). */
  private def pcaPowerSql(mat: String, pr: String, iters: Int): String =
    s"""$pr(it, i, v) AS (
           SELECT 0 AS it, i, CAST(1000000 AS HUGEINT) AS v FROM dims
           UNION ALL
           SELECT it, i, v FROM (
             WITH prev AS (SELECT * FROM $pr),
               t0 AS (SELECT min(it) AS it FROM prev),
               w AS (SELECT c.i, CAST(sum(c.cv * p.v) AS HUGEINT) AS w
                 FROM $mat c JOIN prev p ON p.i = c.j GROUP BY c.i),
               mx AS (SELECT max(abs(w)) AS m FROM w),
               u AS (SELECT i, (w * 1000000) // (SELECT m FROM mx) AS u
                 FROM w),
               ns AS (SELECT CAST(sum(u * u) AS HUGEINT) AS nsq FROM u),
               r0 AS (SELECT CAST(floor(sqrt(CAST(nsq AS DOUBLE)))
                   AS HUGEINT) AS c0, nsq FROM ns),
               rr AS (SELECT CASE WHEN c0 * c0 > nsq THEN c0 - 1
                   WHEN (c0+1) * (c0+1) <= nsq THEN c0 + 1
                   ELSE c0 END AS r FROM r0),
               nv AS (SELECT u.i,
                   CASE WHEN (SELECT m FROM mx) = 0 THEN p.v
                     ELSE (u.u * 1000000) // (SELECT r FROM rr) END AS v
                 FROM u JOIN prev p ON p.i = u.i)
             SELECT (SELECT it FROM t0) + 1 AS it, nv.i, nv.v FROM nv
             WHERE (SELECT it FROM t0) < $iters))"""

  /** The 3-gram shingle CTE over `documents` — the `t` table every
    * dup-graph oracle starts from (one fragment since round 8; the text
    * was previously pasted per oracle). `where` narrows the source rows
    * (e.g. the bounded `doc_id < 500` verify tier). */
  private def shinglesSql(where: String = ""): String =
    s"""t AS (SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
               i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) sh
           FROM documents$where)"""

  /** LOSSLESS candidate generation for the Jaccard dup-pair oracles
    * (round 8 — VERDICT r7 #1b: ~20 oracles each re-ran the O(n²)
    * `t a JOIN t b` with per-pair list_intersect, ~450 s of the gate's
    * DuckDB half; this prefix-filtered chain is ~10× cheaper and the
    * exact verify predicate downstream is unchanged). Emits
    * `dp_cand(a_id, b_id, a_sh, b_sh)` ⊇ every pair with
    * J ≥ guardPct/100, by two textbook lossless prunes (PPJoin):
    *   - length filter: J ≥ g ⟹ min(|a|,|b|) ≥ g·max(|a|,|b|), checked
    *     in exact integers (100·min ≥ guardPct·max);
    *   - prefix filter: under ONE global element order (list_sort),
    *     sets with J ≥ g must share an element among each one's first
    *     |sh| − ⌈g·|sh|⌉ + 1 elements — so candidates come from an
    *     equi-join on exploded prefix tokens, never from all pairs.
    * guardPct is deliberately BELOW each caller's verify threshold
    * (75 for the ≥ 0.8 tiers, 45 for the ≥ 0.5 tier): the filters only
    * over-generate, and boundary arithmetic (round-to-4dp at exactly
    * τ) never touches them. */
  private def dupCandSql(guardPct: Int = 75,
                         pairCond: String = "a.doc_id < b.doc_id"): String = {
    // the "0.$guardPct" splice below reads 75 as 0.75; a single-digit
    // guard would silently decode as its tenfold (5 -> 0.5)
    require(guardPct >= 10 && guardPct <= 99,
      s"guardPct must be a two-digit percentage, got $guardPct")
    s"""dp_ts AS (SELECT doc_id, list_sort(sh) AS sh FROM t),
         dp_pf AS (SELECT doc_id, sh,
             unnest(sh[1 : CAST(len(sh) - ceil(0.$guardPct * len(sh)) + 1
               AS BIGINT)]) AS tok
           FROM dp_ts),
         dp_c0 AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
           FROM dp_pf a JOIN dp_pf b ON a.tok = b.tok
             AND $pairCond
           WHERE 100 * least(len(a.sh), len(b.sh)) >=
             $guardPct * greatest(len(a.sh), len(b.sh))),
         dp_cand AS (SELECT c.a_id, c.b_id, a.sh AS a_sh, b.sh AS b_sh
           FROM dp_c0 c JOIN dp_ts a ON a.doc_id = c.a_id
             JOIN dp_ts b ON b.doc_id = c.b_id)"""
  }

  /** Full replay of the image-pHash pipeline in SQL (round 9 — VERDICT r8
    * #3: the three pHash oracles were closed forms, exact at sf0.01 by a
    * separation argument but under-predicting at sf0.1 where ORGANIC
    * near-dup images appear; this recipe — re-derive payload bytes from
    * source text, replay the whole pipeline — is the one
    * `mm_audio_fingerprint` already uses). Emits `phs(doc_id, hu, sim)`:
    * the 64-bit average-hash of each document's BMP payload as both the
    * unsigned HUGEINT (for block extraction by exact integer division)
    * and the signed BIGINT two's-complement twin (for xor/bit_count).
    *
    * Replay chain, mirroring `mm/Multimodal.encodeBmp`+`pHash64`: pixel
    * byte j of the BMP is `textBytes[j % L]` where L is the TEXT's byte
    * length — `length(text)`, NOT `n_chars`: the two agree on the driver
    * corpus but diverge on ScaleUp's sf1 lake, whose token suffixes
    * lengthen text without touching n_chars (the encoder's w/h DO come
    * from n_chars). ASCII-only corpus gated by OracleCouplingSpec, so
    * ord(substr) IS the byte and codepoint length IS byte length. The
    * 8×8
    * nearest-neighbor grid samples offset sy·stride+sx·3 with
    * sy=⌊y·h/8⌋, sx=⌊x·w/8⌋, and bit (y·8+x) is set when 64·sample >
    * Σsamples (the cross-product mean compare — exact integers end to
    * end). The hash accumulates in two 32-bit BIGINT halves because a
    * DuckDB sum of `2.0**i` DOUBLEs silently rounds once set bits span
    * more than 53 positions (caught by the python pre-validation).
    * UPSCALED re-encodes hash identically by pHash64's proven
    * integer-upscale invariance, so one hash per document serves both
    * corpus sides. */
  private def phashSql: String =
    s"""d AS MATERIALIZED (
           SELECT doc_id, text, length(text) AS L,
                  4 + n_chars % 29 AS w, 4 + n_chars % 17 AS h,
                  ((4 + n_chars % 29) * 3 + 3) // 4 * 4 AS stride
           FROM documents),
         g AS (SELECT y, x FROM range(8) t1(y), range(8) t2(x)),
         samp AS (
           SELECT d.doc_id, CAST(g.y * 8 + g.x AS INTEGER) AS i,
                  -- L = 0 guard (ADVICE r9 #2): encodeBmp zero-fills the
                  -- pixels of an empty text, so every sample is 0. The
                  -- gated corpora are non-empty by OracleCouplingSpec's
                  -- invariant, but the oracle stays TOTAL either way
                  -- (DuckDB x % 0 is NULL, which would poison the hash).
                  CASE WHEN d.L = 0 THEN 0 ELSE
                  ord(substr(d.text, CAST(((g.y*d.h//8)*d.stride + (g.x*d.w//8)*3 + 0) % d.L + 1 AS INTEGER), 1))
                + ord(substr(d.text, CAST(((g.y*d.h//8)*d.stride + (g.x*d.w//8)*3 + 1) % d.L + 1 AS INTEGER), 1))
                + ord(substr(d.text, CAST(((g.y*d.h//8)*d.stride + (g.x*d.w//8)*3 + 2) % d.L + 1 AS INTEGER), 1))
                  END AS v
           FROM d, g),
         tot AS (SELECT doc_id, i, v,
                        sum(v) OVER (PARTITION BY doc_id) AS total FROM samp),
         ph AS (
           SELECT doc_id,
                  sum(CASE WHEN 64*v > total AND i < 32
                      THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS lo,
                  sum(CASE WHEN 64*v > total AND i >= 32
                      THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END) AS hi
           FROM tot GROUP BY doc_id),
         phs AS MATERIALIZED (
           SELECT doc_id,
                  CAST(hi AS HUGEINT) * 4294967296 + lo AS hu,
                  CAST(CASE WHEN hi >= 2147483648
                       THEN (hi - 4294967296) * 4294967296 + lo
                       ELSE hi * 4294967296 + lo END AS BIGINT) AS sim
           FROM ph)"""

  /** The 7-block key table of `text/NearDup.SimBlocks` as exact
    * power-of-two HUGEINT literals (block b covers bits ⌊64b/7⌋ …):
    * bv = (hu // p2) % wd extracts block b's value with pure integer
    * arithmetic — `2 ** k` is a DOUBLE in DuckDB and floor-dividing a
    * HUGEINT by it detours through 53-bit floats. */
  private val phashBlocksSql: String =
    """(VALUES (0,CAST(1 AS HUGEINT),512),(1,CAST(512 AS HUGEINT),512),
          (2,CAST(262144 AS HUGEINT),512),(3,CAST(134217728 AS HUGEINT),512),
          (4,CAST(68719476736 AS HUGEINT),512),(5,CAST(35184372088832 AS HUGEINT),512),
          (6,CAST(18014398509481984 AS HUGEINT),1024)) b(b,p2,wd)"""

  /** [[shinglesSql]] + [[dupCandSql]] in one prelude, plus the canonical
    * verified pair CTE `p(a_id, b_id)` at the ≥ 0.8 threshold — the
    * exact predicate the all-pairs formulation used, now over
    * candidates. */
  private def dupPairsSql: String =
    s"""${shinglesSql()},
         ${dupCandSql()},
         p AS (SELECT a_id, b_id FROM dp_cand
           WHERE round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                   (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) >= 0.8)"""

  /** One oracle body shared verbatim by `mm_phash_incremental` and
    * `stream_phash` (the streaming gate probes the same base index
    * through the same block join). */
  private def phashIncrementalOracle: String =
    s"""WITH $phashSql,
         bkeys AS MATERIALIZED (
           SELECT s.doc_id AS id, s.sim, b.b, (s.hu // b.p2) % b.wd AS bv
           FROM phs s, $phashBlocksSql),
         okb AS MATERIALIZED (
           SELECT b, bv FROM bkeys GROUP BY b, bv HAVING count(*) <= 1000)
         SELECT DISTINCT d.id AS new_id, b.id AS base_id,
             CAST(bit_count(xor(d.sim, b.sim)) AS INTEGER) AS hamming
         FROM (SELECT id + 1048576 AS id, sim, b, bv FROM bkeys) d
              JOIN okb o ON d.b = o.b AND d.bv = o.bv
              JOIN bkeys b ON b.b = d.b AND b.bv = d.bv
         WHERE bit_count(xor(d.sim, b.sim)) <= 4
         ORDER BY new_id, base_id"""

  /** Group-DRO multiplicative-weights replay shared verbatim by
    * `sample_domain_mix` and `stream_domain_mix` (the streaming MV folds
    * the same additive per-domain cells and derives weights on read
    * through the shared batch chain): the per-domain loss table in one
    * aggregate, then all 50 exact-integer rounds (weighted-mean excess →
    * 1e6 + 1%·relative-excess factor → renormalize to 10⁹) as a
    * recursive CTE over HUGEINT lattice weights. */
  private def domainMixOracle: String =
    """WITH RECURSIVE stats AS MATERIALIZED (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST((sum(length(text)) * 1000000) //
                 sum(len(string_split(text, ' '))) AS BIGINT) AS loss_ppm
           FROM documents GROUP BY lang),
         nd AS (SELECT count(*) AS n FROM stats),
         mw(it, lang, w) AS (
           SELECT 0 AS it, lang,
               CAST(1000000000 // (SELECT n FROM nd) AS HUGEINT) AS w
           FROM stats
           UNION ALL
           SELECT it, lang, w FROM (
             WITH prev AS (SELECT * FROM mw),
               t0 AS (SELECT min(it) AS it FROM prev),
               j AS (SELECT p.lang, p.w, s.loss_ppm
                 FROM prev p JOIN stats s USING (lang)),
               agg AS (SELECT sum(w) AS sw, sum(w * loss_ppm) AS swl FROM j),
               m AS (SELECT swl // sw AS m FROM agg),
               x AS (SELECT lang, w,
                   greatest(loss_ppm - (SELECT m FROM m), 0) AS x FROM j),
               xm AS (SELECT max(x) AS xmax FROM x),
               w1 AS (SELECT lang,
                   CASE WHEN (SELECT xmax FROM xm) = 0 THEN w
                     ELSE w * (1000000 + 10000 * x // (SELECT xmax FROM xm))
                       // 1000000 END AS w1
                 FROM x),
               sw1 AS (SELECT sum(w1) AS s FROM w1),
               nx AS (SELECT lang,
                   CASE WHEN (SELECT xmax FROM xm) = 0 THEN w1
                     ELSE w1 * 1000000000 // (SELECT s FROM sw1) END AS w
                 FROM w1)
             SELECT (SELECT it FROM t0) + 1 AS it, lang, w FROM nx
             WHERE (SELECT it FROM t0) < 50))
         SELECT s.lang, s.n_docs, s.loss_ppm,
             CAST(f.w // 1000 AS BIGINT) AS weight_ppm
         FROM stats s JOIN (SELECT * FROM mw WHERE it = 50) f USING (lang)
         ORDER BY s.lang"""

  /** Shared by `eval_cohen_kappa` and `stream_kappa` — the streaming MV
    * folds the same additive (ra, rb) contingency grid per batch and
    * derives through the same [[graft.Queries.kappaFromGrid]], so both
    * hash-match this one replay. Every statistic is one division over
    * exact integers (kappa via the n²-scaled identity). */
  private val kappaOracle: String =
    """WITH f AS (SELECT
         CASE WHEN 2 * len(list_distinct(string_split(text,' '))) >=
                   len(string_split(text,' ')) THEN 1 ELSE 0 END AS ra,
         CASE WHEN 20 * (len(list_filter(string_split(text,' '), x -> x = 'the'))
                       + len(list_filter(string_split(text,' '), x -> x = 'a'))) >=
                   len(string_split(text,' ')) THEN 1 ELSE 0 END AS rb
       FROM documents),
     g AS (SELECT
         count(*) AS n,
         sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END) AS n11,
         sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END) AS n10,
         sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END) AS n01,
         sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END) AS n00
       FROM f)
     SELECT CAST(n AS BIGINT) AS n_docs, CAST(n11 AS BIGINT) AS n11,
         CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
         CAST(n00 AS BIGINT) AS n00,
         round(CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
         round(CAST((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00) AS DOUBLE)
             / CAST(n*n AS DOUBLE), 6) AS pe,
         round(CAST(n*(n11+n00) - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE)
             / CAST(n*n - ((n11+n10)*(n11+n01) + (n01+n00)*(n10+n00)) AS DOUBLE), 6) AS kappa,
         CASE WHEN n10 + n01 = 0 THEN 0e0 ELSE
           round(CAST((n10-n01)*(n10-n01) AS DOUBLE) / CAST(n10+n01 AS DOUBLE), 6)
         END AS mcnemar_chi2
     FROM g"""

  /** [[graft.Queries.RboWeights]] as a VALUES list — interpolated from
    * the SAME Scala constants the engine sums, so the twin tiers cannot
    * drift onto different depth weights. */
  private def rboWeightsSql: String =
    graft.Queries.RboWeights.map { case (d, w) => s"($d,$w)" }.mkString(",")

  val sql: Map[String, String] = Map(

    "agg_group_count" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",

    "agg_mode" ->
      """SELECT event_type AS mode_value FROM
           (SELECT event_type, count(*) AS c FROM events GROUP BY event_type)
         ORDER BY c DESC, event_type LIMIT 1""",

    "agg_funnel_flags" ->
      """SELECT user_id,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
             strftime(CAST(min(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
             strftime(CAST(max(ts) AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
             CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY user_id ORDER BY user_id""",

    "join_salted" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM events e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "gold_star_schema" ->
      """WITH inv AS (SELECT event_id, user_id FROM events
             WHERE event_type = 'signup'),
           app AS (SELECT e.event_id, e.user_id, e.ts
             FROM events e JOIN inv i ON i.user_id = e.user_id
             WHERE e.event_type = 'purchase'),
           acc AS (SELECT a.event_id, a.user_id,
                 count(CASE WHEN e2.event_type = 'click' THEN 1 END) > 0 AS activated
             FROM (SELECT DISTINCT event_id, user_id, ts FROM app) a
             LEFT JOIN events e2 ON e2.user_id = a.user_id
                 AND CAST(e2.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
             GROUP BY a.event_id, a.user_id),
           summary AS (
             SELECT 'gold_accounts' AS tbl,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(coalesce(sum(CASE WHEN user_id NOT IN
                   (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_orphans
             FROM acc
             UNION ALL
             SELECT 'gold_applications', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN user_id NOT IN
                   (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END), 0) AS BIGINT)
             FROM app
             UNION ALL
             SELECT 'gold_card', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN user_id NOT IN
                   (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END), 0) AS BIGINT)
             FROM acc WHERE activated
             UNION ALL
             SELECT 'gold_customers', CAST(count(*) AS BIGINT),
                 CAST(0 AS BIGINT) FROM customer
             UNION ALL
             SELECT 'gold_invitations', CAST(count(*) AS BIGINT),
                 CAST(coalesce(sum(CASE WHEN user_id NOT IN
                   (SELECT c_custkey FROM customer) THEN 1 ELSE 0 END), 0) AS BIGINT)
             FROM inv)
         SELECT tbl, n_rows, n_orphans FROM summary ORDER BY tbl""",

    "melt_unpivot" ->
      """WITH f AS (SELECT user_id,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
           FROM events GROUP BY user_id)
         SELECT user_id, flag, flag_value FROM (
           SELECT user_id, 'has_signup' AS flag, has_signup AS flag_value FROM f
           UNION ALL
           SELECT user_id, 'has_view', has_view FROM f
           UNION ALL
           SELECT user_id, 'has_click', has_click FROM f
           UNION ALL
           SELECT user_id, 'has_purchase', has_purchase FROM f)
         ORDER BY user_id, flag""",

    "dedup_latest" ->
      """SELECT user_id, event_type, event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
             value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                     ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "sort_global" ->
      """SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str
         FROM events ORDER BY CAST(ts AS TIMESTAMP), event_id""",

    "topk_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "join_funnel_inner" ->
      """SELECT c.c_mktsegment, o.o_orderstatus,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment, o.o_orderstatus
         ORDER BY c.c_mktsegment, o.o_orderstatus""",

    "join_left_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
         ORDER BY c_custkey""",

    "join_left_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
         ORDER BY c_custkey""",

    "filter_since" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE ts >= TIMESTAMP '2024-01-15'
         GROUP BY event_type ORDER BY event_type""",

    "filter_isin" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE event_type IN ('purchase', 'signup')
         GROUP BY event_type ORDER BY event_type""",

    "filter_not_isin" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events
         WHERE event_type NOT IN ('error', 'view')
         GROUP BY event_type ORDER BY event_type""",

    "filter_notnull_cast" ->
      """SELECT event_type,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(count(*) AS BIGINT) AS cnt
         FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",

    "json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
         FROM events ORDER BY event_id""",

    "project_drop" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
             strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate_str
         FROM orders ORDER BY o_orderkey""",

    "union_by_name" ->
      """SELECT o_orderkey % 10 AS bucket,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(o_totalprice) AS BIGINT) AS n_price,
             CAST(count(o_orderstatus) AS BIGINT) AS n_status,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
         FROM (SELECT o_orderkey, o_totalprice FROM orders
               UNION ALL BY NAME
               SELECT o_orderkey, o_orderstatus FROM orders)
         GROUP BY bucket ORDER BY bucket""",

    "set_ops" ->
      """WITH early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
           late AS (SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
           tagged AS (
             SELECT 'both' AS segment, o_custkey FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
             UNION ALL
             SELECT 'early_only' AS segment, o_custkey FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late))
         SELECT segment, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(o_custkey) AS BIGINT) AS key_sum
         FROM tagged GROUP BY segment ORDER BY segment""",

    "scan_json_multiline" ->
      """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""",

    "scan_ndjson" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",

    "scan_double_json" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
         FROM customer ORDER BY c_custkey""",

    "scan_kafka_envelope" ->
      """SELECT CAST(o_orderkey % 4 AS BIGINT) AS partition,
             CAST(count(*) AS BIGINT) AS n_msgs,
             CAST(max(o_orderkey) AS BIGINT) AS max_offset,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY partition""",

    "scan_pruned_files" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n_nationkey) AS BIGINT) AS sum_key FROM nation""",

    "scan_orc" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_acctbal,
             CAST(min(c_custkey) AS BIGINT) AS min_key,
             CAST(max(c_custkey) AS BIGINT) AS max_key
         FROM customer WHERE c_acctbal > 0""",

    "scan_csv_malformed" ->
      """SELECT CAST(count(*) + 3 AS BIGINT) AS n_lines,
             CAST(3 AS BIGINT) AS n_bad,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_acctbal
         FROM customer""",

    "scan_json_malformed" ->
      """SELECT CAST(count(*) + 3 AS BIGINT) AS n_lines,
             CAST(3 AS BIGINT) AS n_bad,
             CAST(CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_acctbal
         FROM supplier""",

    "scan_merge_schema" ->
      """SELECT 'v1' AS src, n_nationkey, n_name,
             CAST(NULL AS INTEGER) AS n_regionkey FROM nation
         UNION ALL
         SELECT 'v2' AS src, n_nationkey, CAST(NULL AS VARCHAR) AS n_name,
             n_regionkey FROM nation
         ORDER BY n_nationkey, src""",

    "dq_checks" ->
      """WITH wide AS (
           SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_null,
               CAST(sum(CASE WHEN event_type NOT IN ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS BIGINT) AS type_unknown,
               CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-01'
                              OR CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-02-01' THEN 1 ELSE 0 END) AS BIGINT) AS ts_out_of_range,
               CAST(sum(CASE WHEN value <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS value_not_positive,
               CAST(sum(CASE WHEN value > 450.0 THEN 1 ELSE 0 END) AS BIGINT) AS value_above_450,
               CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS event_id_dup
           FROM events)
         SELECT rule, n_violations, n_rows, (n_violations = 0) AS pass FROM (
           SELECT 'user_id_null' AS rule, user_id_null AS n_violations, n_rows FROM wide
           UNION ALL SELECT 'type_unknown', type_unknown, n_rows FROM wide
           UNION ALL SELECT 'ts_out_of_range', ts_out_of_range, n_rows FROM wide
           UNION ALL SELECT 'value_not_positive', value_not_positive, n_rows FROM wide
           UNION ALL SELECT 'value_above_450', value_above_450, n_rows FROM wide
           UNION ALL SELECT 'event_id_dup', event_id_dup, n_rows FROM wide)
         ORDER BY rule""",

    "agg_incremental" ->
      """WITH parts AS (
           SELECT user_id, event_type, count(*) AS n_events,
               sum(CAST(value AS DECIMAL(12,2))) AS sum_state
           FROM events
           GROUP BY user_id, event_type, (CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-20'))
         SELECT user_id, event_type, CAST(sum(n_events) AS BIGINT) AS n_events,
             CAST(CAST(sum(sum_state) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM parts GROUP BY user_id, event_type
         ORDER BY user_id, event_type""",

    "join_range" ->
      """WITH bands AS (
           SELECT 'band_' || lpad(CAST(k AS VARCHAR), 2, '0') AS band,
               CAST(k * 40000.0 AS DOUBLE) AS lo,
               CAST(k * 40000.0 + 60000.0 AS DOUBLE) AS hi
           FROM range(0, 12) t(k)),
           j AS (
           SELECT band, lo, hi, o_totalprice
           FROM orders JOIN bands
             ON o_totalprice >= lo AND o_totalprice < hi)
         SELECT band, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price,
             min(lo) AS lo, min(hi) AS hi
         FROM j GROUP BY band ORDER BY band""",

    "join_interval_overlap" ->
      """WITH w AS (
           SELECT o_orderkey,
               datediff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) AS w_lo,
               datediff('day', DATE '1970-01-01',
                 CAST(o_orderdate AS DATE)) + 7 AS w_hi
           FROM orders
           WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995),
           s AS (
           SELECT datediff('day', DATE '1970-01-01',
                 CAST(l_shipdate AS DATE)) AS s_lo,
               datediff('day', DATE '1970-01-01',
                 CAST(l_shipdate AS DATE)) + 1 +
                 ((l_orderkey + l_linenumber) % 14) AS s_hi
           FROM lineitem
           WHERE l_linenumber = 1 AND year(l_shipdate) = 1995)
         SELECT o_orderkey, CAST(count(*) AS BIGINT) AS n_in_transit
         FROM w JOIN s ON w_lo < s_hi AND s_lo < w_hi
         GROUP BY o_orderkey ORDER BY o_orderkey""",

    "merge_upsert" ->
      """WITH updates AS (
           SELECT c_custkey, c_name,
               CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 1000 AS DECIMAL(18,4)) AS DOUBLE) AS c_acctbal,
               c_mktsegment
           FROM customer WHERE c_custkey % 10 = 0),
           inserts AS (
           SELECT c_custkey + 1000000 AS c_custkey, c_name, c_acctbal, c_mktsegment
           FROM customer WHERE c_custkey <= 5),
           merged AS (
           SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
           WHERE c_custkey % 10 <> 0
           UNION ALL SELECT * FROM updates
           UNION ALL SELECT * FROM inserts)
         SELECT c_custkey, c_name,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
             c_mktsegment
         FROM merged ORDER BY c_custkey""",

    "stream_cdc_apply" ->
      """WITH r AS (SELECT user_id, event_type AS status, ts,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             row_number() OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS changed_at
         FROM r WHERE rn = 1 AND op <> 'D' ORDER BY user_id""",

    "stream_stream_left" ->
      """WITH p AS (SELECT user_id, event_id AS p_id,
             CAST(ts AS TIMESTAMP) AS p_ts
           FROM events WHERE event_type = 'purchase'),
         v AS (SELECT user_id AS v_user, event_id AS v_id,
             CAST(ts AS TIMESTAMP) AS v_ts
           FROM events WHERE event_type = 'view'),
         wm AS (SELECT least((SELECT max(p_ts) FROM p),
             (SELECT max(v_ts) FROM v)) - INTERVAL 1 HOUR AS cut),
         m AS (SELECT p.user_id, p.p_id, v.v_id
           FROM p JOIN v ON v.v_user = p.user_id
             AND v.v_ts >= p.p_ts - INTERVAL 24 HOUR
             AND v.v_ts <= p.p_ts),
         um AS (SELECT p.user_id, p.p_id, NULL AS v_id
           FROM p, wm WHERE p.p_ts <= wm.cut AND NOT EXISTS (
             SELECT 1 FROM v WHERE v.v_user = p.user_id
               AND v.v_ts >= p.p_ts - INTERVAL 24 HOUR
               AND v.v_ts <= p.p_ts)),
         a AS (SELECT * FROM m UNION ALL SELECT * FROM um)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(v_id) AS BIGINT) AS n_matched,
             CAST(sum(CASE WHEN v_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unmatched,
             max(p_id) AS max_purchase
         FROM a GROUP BY user_id ORDER BY user_id""",

    "sink_overwrite" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_acctbal
         FROM customer""",

    "ddl_from_schema" ->
      """SELECT 'customer_silver' AS table_name,
             'CREATE TABLE IF NOT EXISTS customer_silver ("c_custkey" BIGINT, "c_name" VARCHAR(256), "c_nationkey" INTEGER, "c_acctbal" DOUBLE PRECISION, "c_mktsegment" VARCHAR(256), "c_url" VARCHAR(2048), "c_tags" SUPER)' AS ddl""",

    "flatten_struct" ->
      """SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
             'T-' || event_type AS meta_event_type
         FROM events ORDER BY event_id""",

    "rename_sanitize" ->
      """SELECT c_custkey AS c_cust_key, c_name AS c_name, c_mktsegment AS mkt_seg
         FROM customer ORDER BY c_cust_key""",

    "ts_parse_iso" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date_str
         FROM orders ORDER BY o_orderkey""",

    "ts_from_epoch_s" ->
      """SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_s
         FROM events ORDER BY event_id""",

    "ts_from_epoch_ms" ->
      """SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%g') AS ts_ms
         FROM events ORDER BY event_id""",

    "date_format_str" ->
      """SELECT event_id,
             strftime(CAST(ts AS TIMESTAMP), '%b %d,%Y %H:%M:%S') AS ts_fmt
         FROM events ORDER BY event_id""",

    "null_if_empty" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(CASE WHEN len(list_filter(string_split(text, ' '),
                  x -> x LIKE 'w%')) = 0 THEN NULL ELSE 1 END) AS BIGINT) AS n_with_w
         FROM documents GROUP BY lang ORDER BY lang""",

    "regexp_replace_chain" ->
      """SELECT doc_id,
             md5(regexp_replace(replace(replace(text, '''', 'CHR(39)'), '%', '%%'),
                 ' +', '_', 'g')) AS fp
         FROM documents ORDER BY doc_id""",

    "filter_array_overlap" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents
         WHERE list_has_any(string_split(text, ' '), ['spark', 'vector'])
         GROUP BY lang ORDER BY lang""",

    "to_json_col" ->
      """SELECT event_id, to_json(struct_pack(et := event_type,
             k := CAST(json_extract_string(props, '$.k') AS BIGINT))) AS js
         FROM events ORDER BY event_id""",

    "stream_file_source" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",

    // the streaming Kafka-envelope twin shares scan_kafka_envelope's
    // oracle verbatim: batch and streaming reads of one topic dump agree
    "stream_kafka" ->
      """SELECT CAST(o_orderkey % 4 AS BIGINT) AS partition,
             CAST(count(*) AS BIGINT) AS n_msgs,
             CAST(max(o_orderkey) AS BIGINT) AS max_offset,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_price
         FROM orders GROUP BY 1 ORDER BY partition""",

    "stream_watermark" ->
      """WITH m AS (SELECT max(CAST(ts AS TIMESTAMP)) AS mx FROM events)
         SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS win_start,
             event_type, CAST(count(*) AS BIGINT) AS cnt
         FROM events
         WHERE date_trunc('day', CAST(ts AS TIMESTAMP)) + INTERVAL 1 DAY
               <= (SELECT mx - INTERVAL 1 HOUR FROM m)
         GROUP BY 1, 2 ORDER BY win_start, event_type""",

    "window_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
                         epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
           sessions AS (
           SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM flagged)
         SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             CAST(count(*) AS BIGINT) AS n_events,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
         FROM sessions GROUP BY user_id, session_idx
         ORDER BY user_id, session_idx""",

    "stream_stream_join" ->
      """SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(count(DISTINCT v.event_id) AS BIGINT) AS n_views,
             CAST(max(p.event_id) AS BIGINT) AS max_purchase
         FROM events p JOIN events v
           ON v.user_id = p.user_id
          AND p.event_type = 'purchase' AND v.event_type = 'view'
          AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 24 HOUR
          AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
         GROUP BY p.user_id ORDER BY p.user_id""",

    "stream_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
                         epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
           sessions AS (
           SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM flagged),
           rolled AS (
           SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               CAST(count(*) AS BIGINT) AS n_events,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
           FROM sessions GROUP BY user_id, session_idx)
         SELECT user_id, session_idx, n_events, session_start, session_end
         FROM (SELECT *, max(session_idx) OVER (PARTITION BY user_id) AS mx
               FROM rolled)
         WHERE session_idx < mx
         ORDER BY user_id, session_idx""",

    "window_sessionize_native" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
                         epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
           sessions AS (
           SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM flagged)
         SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
             strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
             CAST(count(*) AS BIGINT) AS n_events
         FROM sessions GROUP BY user_id, session_idx
         ORDER BY user_id, session_start""",

    "sink_csv_copy" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_acctbal,
             CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
         FROM customer""",

    "sink_compacted" ->
      """SELECT CAST(64 AS BIGINT) AS n_files_before,
             CAST(2 AS BIGINT) AS n_files_after,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM events""",

    "sink_clustered" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events WHERE user_id BETWEEN 100 AND 120""",

    "sink_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events
         WHERE user_id BETWEEN 30 AND 60
           AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08'
           AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'""",

    "sink_partitioned" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM events WHERE event_type = 'purchase'""",

    "join_bucketed" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    "dedup_latest_agg" ->
      """SELECT user_id, event_type, event_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
             value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                     ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id, event_type""",

    "agg_percentiles" ->
      """SELECT o_orderstatus,
             round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
             CAST(count(*) AS BIGINT) AS cnt
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "agg_rollup" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             coalesce(o_orderstatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY ROLLUP (c_mktsegment, o_orderstatus)
         ORDER BY segment, status""",

    "agg_grouping_sets" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             coalesce(o_orderstatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY GROUPING SETS ((c_mktsegment, o_orderstatus), (o_orderstatus), ())
         ORDER BY segment, status""",

    "dedup_modality_agreement" ->
      s"""WITH ${shinglesSql()},
           ${dupCandSql()},
           tp AS (SELECT a_id, b_id FROM dp_cand
             WHERE round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) >= 0.8),
           v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
           ep AS (
             SELECT a.vec_id a_id, b.vec_id b_id
             FROM n a JOIN n b ON a.vec_id < b.vec_id
             WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4)
         SELECT category, CAST(count(*) AS BIGINT) AS n_pairs FROM (
           SELECT CASE
               WHEN t.a_id IS NOT NULL AND e.a_id IS NOT NULL THEN 'both'
               WHEN t.a_id IS NOT NULL THEN 'text_only'
               ELSE 'embedding_only' END AS category
           FROM tp t FULL OUTER JOIN ep e ON t.a_id = e.a_id AND t.b_id = e.b_id)
         GROUP BY category ORDER BY category""",

    "agg_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
             coalesce(o_orderstatus, 'ALL') AS status,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY CUBE (c_mktsegment, o_orderstatus)
         ORDER BY segment, status""",

    "window_rolling_time" ->
      """SELECT user_id, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n_24h,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DECIMAL(18,4)) AS DOUBLE) AS sum_24h
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",

    "agg_pivot" ->
      """SELECT c_mktsegment,
             CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
             CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
             CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "window_running" ->
      """SELECT user_id, event_id,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
                 PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DECIMAL(18,4)) AS DOUBLE) AS running_value,
             coalesce(lag(event_id, 1) OVER (
                 PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id),
               -1) AS prev_event
         FROM events WHERE event_type = 'purchase'
         ORDER BY user_id, event_id""",

    "join_asof" ->
      """SELECT event_id, o_orderkey, o_totalprice FROM (
           SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
           FROM events e JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         WHERE rn = 1 ORDER BY event_id""",

    // the streaming enrichment appends per-batch as-of results; the union
    // over batches must equal the batch as-of join exactly
    "stream_asof" ->
      """SELECT event_id, o_orderkey, o_totalprice FROM (
           SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
           FROM events e JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         WHERE rn = 1 ORDER BY event_id""",

    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) t FROM events),
           c AS (SELECT p.event_id, v.event_id view_id,
                 abs(p.t - v.t) dist,
                 row_number() OVER (PARTITION BY p.event_id
                     ORDER BY abs(p.t - v.t), v.t, v.event_id DESC) rn
               FROM e p JOIN e v ON p.user_id = v.user_id
                 AND p.event_type = 'purchase' AND v.event_type = 'view')
         SELECT event_id, view_id, CAST(dist AS BIGINT) AS dist_us
         FROM c WHERE rn = 1 AND dist <= 3600000000
         ORDER BY event_id""",

    "topk_per_group" ->
      """SELECT o_orderstatus, CAST(rn AS BIGINT) AS rn, o_orderkey, o_totalprice FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey) rn FROM orders)
         WHERE rn <= 3 ORDER BY o_orderstatus, rn""",

    "dedup_apply" ->
      s"""WITH ${dupPairsSql},
           dropped AS (SELECT DISTINCT b_id FROM p)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id NOT IN (SELECT b_id FROM dropped)
         GROUP BY lang ORDER BY lang""",

    "sql_surface" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS total
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         WHERE o.o_orderstatus <> 'F'
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",

    "stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",

    "lang_id" ->
      """WITH s AS (SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), x -> x = 'the')) s_en,
             len(list_filter(string_split(text,' '), x -> x = 'a')) s_es,
             len(list_filter(string_split(text,' '), x -> x = 'data')) s_de,
             len(list_filter(string_split(text,' '), x -> x = 'key')) s_fr,
             len(list_filter(string_split(text,' '), x -> x = 'spark')) s_zh
           FROM documents)
         SELECT doc_id, lang,
             CASE WHEN s_en = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'en'
                  WHEN s_es = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'es'
                  WHEN s_de = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'de'
                  WHEN s_fr = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'fr'
                  ELSE 'zh' END AS predicted_lang
         FROM s ORDER BY doc_id""",

    "text_quality" ->
      """WITH s AS (SELECT doc_id, string_split(text,' ') toks, length(text) lc FROM documents)
         SELECT doc_id,
             CAST(len(toks) AS INTEGER) AS n_tokens,
             CAST(len(list_distinct(toks)) AS INTEGER) AS n_uniq_tokens,
             round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS uniq_ratio,
             round(CAST(lc - (len(toks) - 1) AS DOUBLE) / len(toks), 4) AS mean_token_len,
             round(CAST(len(list_filter(toks, x -> x = 'the')) +
                        len(list_filter(toks, x -> x = 'a')) AS DOUBLE) / len(toks), 4) AS stopword_ratio
         FROM s ORDER BY doc_id""",

    "text_dup_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
             FROM documents),
           g AS (SELECT DISTINCT doc_id,
                 array_to_string(t[i:i+4], ' ') AS gram
               FROM toks CROSS JOIN LATERAL
                 (SELECT unnest(range(1, len(t) - 3)) AS i) sub
               WHERE len(t) >= 5),
           shared AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
           per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_grams
               FROM g GROUP BY doc_id),
           sh_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_shared
               FROM g WHERE gram IN (SELECT gram FROM shared)
               GROUP BY doc_id)
         SELECT p.doc_id, p.n_grams,
             coalesce(s.n_shared, 0) AS n_shared,
             round(CAST(coalesce(s.n_shared, 0) AS DOUBLE) /
                   CAST(p.n_grams AS DOUBLE), 6) AS shared_frac
         FROM per_doc p LEFT JOIN sh_doc s ON p.doc_id = s.doc_id
         ORDER BY p.doc_id""",

    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
             FROM documents WHERE len(string_split(text, ' ')) >= 3),
           tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS tri
             FROM toks),
           cnts AS (SELECT doc_id, tri, count(*) AS cnt
             FROM tri GROUP BY doc_id, tri)
         SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tri,
             CAST(count(*) AS BIGINT) AS n_distinct_tri,
             round(CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
               / sum(cnt), 4) AS rep3_frac
         FROM cnts GROUP BY doc_id ORDER BY doc_id""",

    "token_count" ->
      """SELECT doc_id,
             CAST(len(string_split(text,' ')) AS INTEGER) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INTEGER) AS n_re_tokens
         FROM documents ORDER BY doc_id""",

    "text_tfidf" ->
      """WITH tokens AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) cnt
                  FROM tokens GROUP BY doc_id, tok),
           doclen AS (SELECT doc_id, CAST(count(*) AS BIGINT) len
                      FROM tokens GROUP BY doc_id),
           dftab AS (SELECT tok, CAST(count(*) AS BIGINT) df
                     FROM (SELECT DISTINCT doc_id, tok FROM tokens) GROUP BY tok),
           n AS (SELECT CAST(count(*) AS BIGINT) n_docs FROM documents),
           scored AS (
           SELECT tf.doc_id, tf.tok,
               round((CAST(tf.cnt AS DOUBLE) * (n.n_docs + 1)) /
                     (CAST(doclen.len AS DOUBLE) * (dftab.df + 1)), 6) AS score
           FROM tf JOIN doclen USING (doc_id) JOIN dftab USING (tok) CROSS JOIN n),
           ranked AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, tok) AS rank FROM scored)
         SELECT doc_id, CAST(rank AS BIGINT) AS rank, tok, score
         FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""",

    "doc_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp,
             substr(md5(lower(regexp_replace(text, ' +', ' ', 'g'))), 1, 4) AS bucket
         FROM documents ORDER BY doc_id""",

    "dedup_exact" ->
      """SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id,
             CAST(count(*) AS BIGINT) AS n_copies
         FROM documents GROUP BY text ORDER BY keep_id""",

    "pii_redact" ->
      """WITH pii AS (
           SELECT doc_id,
               concat('reach user', CAST(doc_id AS VARCHAR), '@mail',
                 CAST(doc_id % 7 AS VARCHAR), '.example.com or +1-202-',
                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), '-',
                 lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0'),
                 ' ip 10.', CAST(doc_id % 256 AS VARCHAR), '.0.',
                 CAST((doc_id * 13) % 256 AS VARCHAR), ' :: ', text) AS raw
           FROM documents),
           red AS (
           SELECT doc_id,
               regexp_replace(regexp_replace(regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\+?\d{1,2}-\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
                 '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted
           FROM pii)
         SELECT doc_id, redacted,
             CAST(len(string_split(redacted, '<EMAIL>')) - 1
                + len(string_split(redacted, '<PHONE>')) - 1
                + len(string_split(redacted, '<IP>')) - 1 AS BIGINT) AS n_redactions
         FROM red ORDER BY doc_id""",

    "dedup_boilerplate" ->
      """WITH w AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents),
           c AS (
           SELECT doc_id, CAST(floor((pos - 1) / 8) AS BIGINT) AS chunk_id,
               string_agg(word, ' ' ORDER BY pos) AS chunk_text
           FROM w GROUP BY doc_id, floor((pos - 1) / 8)),
           b AS (
           SELECT md5(chunk_text) AS h FROM c
           GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
           f AS (
           SELECT c.doc_id, c.chunk_id, c.chunk_text,
               (b.h IS NOT NULL) AS is_boiler
           FROM c LEFT JOIN b ON md5(c.chunk_text) = b.h)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_id)
               FILTER (WHERE NOT is_boiler), '') AS kept_text
         FROM f GROUP BY doc_id ORDER BY doc_id""",

    "window_rolling_distinct" ->
      """WITH e AS (SELECT DISTINCT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) d
             FROM events),
           mx AS (SELECT max(d) max_d FROM e),
           x AS (SELECT user_id,
                 unnest(generate_series(d, d + INTERVAL 6 DAY,
                   INTERVAL 1 DAY)) td
               FROM e)
         SELECT strftime(CAST(td AS DATE), '%Y-%m-%d') AS day,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_7d
         FROM x CROSS JOIN mx WHERE CAST(td AS DATE) <= max_d
         GROUP BY 1 ORDER BY 1""",

    "funnel_conversion_window" ->
      """WITH s AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) st,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
             FROM events WHERE event_type = 'signup'),
           p AS (SELECT user_id, CAST(ts AS TIMESTAMP) pt
             FROM events WHERE event_type = 'purchase'),
           conv AS (SELECT DISTINCT s.event_id, s.day
             FROM s JOIN p USING (user_id)
             WHERE pt >= st AND pt <= st + INTERVAL 7 DAY),
           t1 AS (SELECT day, CAST(count(*) AS BIGINT) n_signups
             FROM s GROUP BY day),
           t2 AS (SELECT day, CAST(count(*) AS BIGINT) n_converted
             FROM conv GROUP BY day)
         SELECT strftime(t1.day, '%Y-%m-%d') AS day, n_signups,
             coalesce(n_converted, 0) AS n_converted,
             CAST(coalesce(n_converted, 0) AS DOUBLE) /
               CAST(n_signups AS DOUBLE) AS conv_rate
         FROM t1 LEFT JOIN t2 ON t1.day = t2.day ORDER BY day""",

    "cohort_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id,
             CAST(floor(datediff('day', DATE '2024-01-01',
               CAST(CAST(ts AS TIMESTAMP) AS DATE)) / 7) AS BIGINT) wk
           FROM events),
           f AS (SELECT user_id, min(wk) cohort FROM ev GROUP BY user_id)
         SELECT cohort, wk - cohort AS week_offset,
             CAST(count(*) AS BIGINT) AS n_users
         FROM ev JOIN f USING (user_id)
         GROUP BY cohort, wk - cohort ORDER BY cohort, week_offset""",

    "window_rolling_median" ->
      """WITH daily AS (SELECT
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) d,
               CAST(count(*) AS BIGINT) n
             FROM events GROUP BY 1),
           mx AS (SELECT max(d) max_d FROM daily),
           x AS (SELECT n,
                 unnest(generate_series(d, d + INTERVAL 6 DAY,
                   INTERVAL 1 DAY)) td
               FROM daily)
         SELECT strftime(CAST(td AS DATE), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n_days,
             round(quantile_cont(n, 0.5), 4) AS median_daily_events
         FROM x CROSS JOIN mx WHERE CAST(td AS DATE) <= max_d
         GROUP BY 1 ORDER BY 1""",

    "window_ewma" ->
      """WITH daily AS (SELECT
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) d,
               CAST(count(*) AS BIGINT) n
             FROM events GROUP BY 1),
           mx AS (SELECT max(d) max_d FROM daily),
           x AS (SELECT n,
                 datediff('day', d, CAST(td AS DATE)) lag_d, td
               FROM (SELECT n, d,
                   unnest(generate_series(d, d + INTERVAL 6 DAY,
                     INTERVAL 1 DAY)) td
                 FROM daily) q)
         SELECT strftime(CAST(td AS DATE), '%Y-%m-%d') AS day,
             CAST(sum(n * (1 << (6 - lag_d))) AS DOUBLE) /
               CAST(sum(1 << (6 - lag_d)) AS DOUBLE) AS ewma_events
         FROM x CROSS JOIN mx WHERE CAST(td AS DATE) <= max_d
         GROUP BY 1 ORDER BY 1""",

    "window_transitions" ->
      """WITH e AS (SELECT user_id, event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) from_type
           FROM events)
         SELECT from_type, event_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
         FROM e WHERE from_type IS NOT NULL
         GROUP BY from_type, event_type ORDER BY from_type, to_type""",

    "agg_moments" ->
      """WITH m AS (SELECT lang, CAST(count(*) AS BIGINT) n,
               CAST(sum(n_chars) AS BIGINT) s1,
               sum(CAST(n_chars * n_chars AS DECIMAL(38,0))) s2,
               sum(CAST(n_chars * n_chars * n_chars AS DECIMAL(38,0))) s3,
               sum(CAST(n_chars * n_chars * n_chars * n_chars
                 AS DECIMAL(38,0))) s4
             FROM documents GROUP BY lang),
           e AS (SELECT lang, n,
               CAST(n AS DOUBLE) nd, CAST(s1 AS DOUBLE) s1d,
               CAST(s2 AS DOUBLE) s2d, CAST(s3 AS DOUBLE) s3d,
               CAST(s4 AS DOUBLE) s4d FROM m),
           f AS (SELECT lang, n,
               s1d / nd AS mean,
               s2d / nd - (s1d / nd) * (s1d / nd) AS m2,
               s3d / nd - 3.0 * (s1d / nd) * (s2d / nd)
                 + 2.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m3,
               s4d / nd - 4.0 * (s1d / nd) * (s3d / nd)
                 + 6.0 * (s1d / nd) * (s1d / nd) * (s2d / nd)
                 - 3.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m4
             FROM e)
         SELECT lang, n, round(mean, 6) AS mean,
             round(sqrt(m2), 6) AS stddev_pop,
             round(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)), 6) AS skewness,
             round(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
         FROM f ORDER BY lang""",

    "agg_corr" ->
      """WITH d AS (SELECT lang, n_chars AS x,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS y
             FROM documents),
           m AS (SELECT lang, CAST(count(*) AS BIGINT) n,
                 CAST(sum(x) AS BIGINT) sx, CAST(sum(y) AS BIGINT) sy,
                 CAST(sum(x * y) AS BIGINT) sxy,
                 CAST(sum(x * x) AS BIGINT) sxx,
                 CAST(sum(y * y) AS BIGINT) syy
               FROM d GROUP BY lang)
         SELECT lang, n,
             round(CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                    sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS corr_chars_tokens
         FROM m ORDER BY lang""",

    // the streaming twin lands the odd-id delta as ONE file → exactly one
    // micro-batch → the result equals the batch KS (same SQL)
    "stream_drift" ->
      """WITH d AS (SELECT n_chars, doc_id % 2 = 0 AS in_a FROM documents),
           pv AS (SELECT n_chars,
                 CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_a,
                 CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_b
               FROM d GROUP BY n_chars),
           tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) n_a,
                       CAST(sum(cnt_b) AS BIGINT) n_b FROM pv),
           c AS (SELECT n_chars,
                 sum(cnt_a) OVER (ORDER BY n_chars) cum_a,
                 sum(cnt_b) OVER (ORDER BY n_chars) cum_b FROM pv),
           g AS (SELECT n_chars, n_a, n_b,
                 round(abs(CAST(cum_a AS DOUBLE) / n_a
                       - CAST(cum_b AS DOUBLE) / n_b), 6) gap
               FROM c CROSS JOIN tot),
           m AS (SELECT max(gap) ks_stat FROM g)
         SELECT m.ks_stat, min(g.n_chars) AS at_value, g.n_a, g.n_b
         FROM g JOIN m ON g.gap = m.ks_stat
         GROUP BY m.ks_stat, g.n_a, g.n_b""",

    "dq_drift" ->
      """WITH d AS (SELECT n_chars, doc_id % 2 = 0 AS in_a FROM documents),
           pv AS (SELECT n_chars,
                 CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_a,
                 CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_b
               FROM d GROUP BY n_chars),
           tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) n_a,
                       CAST(sum(cnt_b) AS BIGINT) n_b FROM pv),
           c AS (SELECT n_chars,
                 sum(cnt_a) OVER (ORDER BY n_chars) cum_a,
                 sum(cnt_b) OVER (ORDER BY n_chars) cum_b FROM pv),
           g AS (SELECT n_chars, n_a, n_b,
                 round(abs(CAST(cum_a AS DOUBLE) / n_a
                       - CAST(cum_b AS DOUBLE) / n_b), 6) gap
               FROM c CROSS JOIN tot),
           m AS (SELECT max(gap) ks_stat FROM g)
         SELECT m.ks_stat, min(g.n_chars) AS at_value, g.n_a, g.n_b
         FROM g JOIN m ON g.gap = m.ks_stat
         GROUP BY m.ks_stat, g.n_a, g.n_b""",

    "dq_anomaly" ->
      """WITH ev AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) x
           FROM events WHERE value IS NOT NULL),
           st AS (SELECT event_type, CAST(count(*) AS HUGEINT) n,
               sum(x) s1, sum(x * x) s2
             FROM ev GROUP BY event_type)
         SELECT e.event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN (n * x - s1) * (n * x - s1) >
                 9 * (n * s2 - s1 * s1) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
         FROM ev e JOIN st USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",

    // the streaming gate scores the post-cutoff delta against FROZEN
    // pre-cutoff stats; one-file landing → one batch → this batch form
    "stream_anomaly" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) tts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) x
           FROM events WHERE value IS NOT NULL),
           st AS (SELECT event_type, CAST(count(*) AS HUGEINT) n,
               sum(x) s1, sum(x * x) s2
             FROM ev WHERE tts < TIMESTAMP '2024-01-20'
             GROUP BY event_type),
           d AS (SELECT * FROM ev WHERE tts >= TIMESTAMP '2024-01-20')
         SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN (n * x - s1) * (n * x - s1) >
                 9 * (n * s2 - s1 * s1) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
         FROM d JOIN st USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",

    "agg_histogram" ->
      """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                 AS BIGINT) c FROM orders),
           s AS (SELECT min(c) mnc, max(c) mxc FROM o),
           b AS (SELECT least((c - mnc) * 16 // greatest(mxc - mnc, 1), 15)
                   AS bin, mnc, greatest(mxc - mnc, 1) AS span
               FROM o CROSS JOIN s)
         SELECT bin,
             CAST(mnc * 10000 + bin * span * 625 AS DOUBLE) / 1000000.0
               AS lo,
             CAST(mnc * 10000 + (bin + 1) * span * 625 AS DOUBLE) / 1000000.0
               AS hi,
             CAST(count(*) AS BIGINT) AS n
         FROM b GROUP BY bin, mnc, span ORDER BY bin""",

    "agg_weighted_median" ->
      """WITH d AS (SELECT lang, n_chars, CAST(sum(n_chars) AS BIGINT) w
             FROM documents GROUP BY lang, n_chars),
           c AS (SELECT lang, n_chars, w,
               sum(w) OVER (PARTITION BY lang ORDER BY n_chars) cw,
               sum(w) OVER (PARTITION BY lang) tw
             FROM d)
         SELECT lang, CAST(min(n_chars) AS BIGINT) AS weighted_median_chars,
             CAST(min(tw) AS BIGINT) AS total_chars
         FROM c WHERE cw * 2 >= tw GROUP BY lang ORDER BY lang""",

    "dq_drift_js" ->
      """WITH d AS (SELECT lang, doc_id % 2 = 0 AS in_a FROM documents),
           pv AS (SELECT lang,
                 CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_a,
                 CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) cnt_b
               FROM d GROUP BY lang),
           tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) n_a,
                       CAST(sum(cnt_b) AS BIGINT) n_b FROM pv)
         SELECT lang, cnt_a, cnt_b,
             round(0.5 * (
               CASE WHEN cnt_a > 0 THEN
                 CAST(cnt_a AS DOUBLE) / CAST(n_a AS DOUBLE) *
                 log2(2.0 * CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) /
                   (CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) +
                    CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE)))
               ELSE 0.0 END +
               CASE WHEN cnt_b > 0 THEN
                 CAST(cnt_b AS DOUBLE) / CAST(n_b AS DOUBLE) *
                 log2(2.0 * CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE) /
                   (CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) +
                    CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE)))
               ELSE 0.0 END), 9) AS js_term,
             round(0.5 * ((CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) -
                           CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE)) *
                          (CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) -
                           CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE))) /
                 ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) *
                  (CAST(cnt_a AS DOUBLE) * CAST(n_b AS DOUBLE) +
                   CAST(cnt_b AS DOUBLE) * CAST(n_a AS DOUBLE))), 9)
               AS lecam_term
         FROM pv CROSS JOIN tot ORDER BY lang""",

    "text_lm_score" ->
      """WITH tokens AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           vocab AS (SELECT tok, CAST(count(*) AS BIGINT) cnt
                     FROM tokens GROUP BY tok),
           tot AS (SELECT CAST(count(*) AS BIGINT) n_total FROM tokens),
           d AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) n_tokens,
                     CAST(sum(v.cnt) AS BIGINT) sum_cnt
                 FROM tokens t JOIN vocab v USING (tok) GROUP BY t.doc_id)
         SELECT doc_id, n_tokens,
             round(CAST(sum_cnt AS DOUBLE) /
                   CAST(n_tokens * n_total AS DOUBLE), 9) AS mean_tok_freq
         FROM d CROSS JOIN tot ORDER BY doc_id""",

    "text_gini" ->
      """WITH c AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) c FROM (
               SELECT doc_id, unnest(string_split(text, ' ')) tok
               FROM documents) GROUP BY doc_id, tok),
           s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) n,
                 CAST(sum(c * c) AS BIGINT) ssq FROM c GROUP BY doc_id)
         SELECT doc_id, n AS n_tokens,
             round(1.0 - CAST(ssq AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
               AS gini
         FROM s ORDER BY doc_id""",

    "corpus_report" ->
      """WITH cp AS (SELECT text, CAST(count(*) AS BIGINT) n_copies
             FROM documents GROUP BY text),
           d AS (SELECT lang, cp.n_copies > 1 AS is_dup,
                 CAST(len(string_split(d0.text, ' ')) AS BIGINT) n_tok,
                 CAST(len(list_distinct(string_split(d0.text, ' '))) AS BIGINT) n_uniq,
                 n_chars
               FROM documents d0 JOIN cp ON d0.text = cp.text)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
             CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             round(CAST(sum(n_uniq) AS DOUBLE) / CAST(sum(n_tok) AS DOUBLE), 6)
               AS pooled_uniq_ratio,
             round(CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS mean_chars
         FROM d GROUP BY lang ORDER BY lang""",

    "vocab_pmi" ->
      """WITH t AS (SELECT string_split(text, ' ') arr FROM documents),
           uni AS (SELECT unnest(arr) tok FROM t),
           uc AS (SELECT tok, CAST(count(*) AS BIGINT) c FROM uni GROUP BY tok),
           nu AS (SELECT CAST(count(*) AS BIGINT) n_uni FROM uni),
           bl AS (SELECT list_transform(range(1, len(arr)),
                      i -> arr[i] || ' ' || arr[i+1]) bs FROM t),
           bi AS (SELECT unnest(bs) bg FROM bl),
           bc AS (SELECT string_split(bg, ' ')[1] w1, string_split(bg, ' ')[2] w2,
                      CAST(count(*) AS BIGINT) c_xy FROM bi GROUP BY bg),
           nb AS (SELECT CAST(count(*) AS BIGINT) n_bi FROM bi)
         SELECT w1, w2, c_xy,
             round((CAST(c_xy AS DOUBLE) * CAST(n_uni AS DOUBLE)
                    * CAST(n_uni AS DOUBLE)) /
                   (CAST(n_bi AS DOUBLE) * CAST(cx.c AS DOUBLE)
                    * CAST(cy.c AS DOUBLE)), 6) AS pmi_lift
         FROM bc JOIN uc cx ON bc.w1 = cx.tok JOIN uc cy ON bc.w2 = cy.tok
         CROSS JOIN nu CROSS JOIN nb
         WHERE c_xy >= 3
         ORDER BY pmi_lift DESC, w1, w2 LIMIT 20""",

    // containment's candidate prune is ASYMMETRIC (round 8): the prefix
    // filter applies on the PROBE side only — containment ≥ 0.8 needs
    // |a∩b| ≥ ⌈0.8·|a|⌉, so if a's first |a| − ⌈0.75·|a|⌉ + 1 sorted
    // shingles miss b entirely, |a∩b| ≤ ⌈0.75·|a|⌉ − 1 < 0.8·|a| —
    // lossless; b is indexed on ALL its shingles (no length filter:
    // a small set inside a huge one is exactly the containment case)
    "dedup_containment" ->
      s"""WITH ${shinglesSql()},
         dc_ts AS (SELECT doc_id, list_sort(sh) AS sh FROM t),
         dc_pf AS (SELECT doc_id, sh,
             unnest(sh[1 : CAST(len(sh) - ceil(0.75 * len(sh)) + 1
               AS BIGINT)]) AS tok FROM dc_ts),
         dc_ix AS (SELECT doc_id, unnest(sh) AS tok FROM dc_ts),
         dc_c0 AS (SELECT DISTINCT a.doc_id a_id, b.doc_id b_id
           FROM dc_pf a JOIN dc_ix b ON a.tok = b.tok
             AND a.doc_id != b.doc_id),
         dc_cand AS (SELECT c.a_id, c.b_id, a.sh AS a_sh, b.sh AS b_sh
           FROM dc_c0 c JOIN dc_ts a ON a.doc_id = c.a_id
             JOIN dc_ts b ON b.doc_id = c.b_id)
         SELECT a_id, b_id, containment FROM (
           SELECT a_id, b_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     CAST(len(a_sh) AS DOUBLE), 4) containment
           FROM dc_cand)
         WHERE containment >= 0.8 ORDER BY a_id, b_id""",

    // guardPct 45 — the verify tier's ≥ 0.5 threshold needs the wider
    // prefix/length margin (the 75 default is only lossless above 0.75)
    "dedup_ngram_jaccard" ->
      s"""WITH ${shinglesSql(" WHERE doc_id < 500")},
         ${dupCandSql(45)}
         SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.5 ORDER BY a_id, b_id""",

    "dedup_minhash_lsh" ->
      s"""WITH ${shinglesSql()},
         ${dupCandSql()}
         SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.8 ORDER BY a_id, b_id""",

    // audio features: the WAV fixture's samples re-derived from the
    // SOURCE text (s_i = 64·(b_i − b_{i+1}) over the cycled bytes —
    // the byte-exact synthesis contract), then the same integer
    // zero-crossing/peak/energy pass in SQL
    "mm_audio_features" ->
      """WITH samp AS (
           SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             64 * (ord(substr(text, CAST((u.i % length(text)) + 1 AS INT), 1))
                 - ord(substr(text, CAST(((u.i + 1) % length(text)) + 1 AS INT), 1)))
               AS s
           FROM documents,
             unnest(range(0, 64 + n_chars % 193)) AS u(i)),
         lagd AS (
           SELECT doc_id, i, s,
             lag(s) OVER (PARTITION BY doc_id ORDER BY i) AS ps
           FROM samp)
         SELECT doc_id, 8000 AS sample_rate,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(CASE WHEN ps IS NOT NULL AND ((s < 0) <> (ps < 0))
             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(max(abs(s)) AS INT) AS peak,
           CAST(sum(s * s) AS BIGINT) AS energy
         FROM lagd GROUP BY 1 ORDER BY doc_id""",

    // voice-activity detection: 16-sample frame energies over the same
    // re-derived samples, the exact integer 2·e·F > Σe threshold, and
    // gaps-and-islands for the segment census
    "mm_audio_vad" ->
      """WITH docs AS (SELECT doc_id, text,
             64 + n_chars % 193 AS ns,
             (64 + n_chars % 193) // 16 AS nf FROM documents),
         samp AS (
           SELECT doc_id, nf, CAST(u.i AS BIGINT) AS i,
             CAST(64 * (ord(substr(text, CAST((u.i % length(text)) + 1 AS INT), 1))
                 - ord(substr(text, CAST(((u.i + 1) % length(text)) + 1 AS INT), 1)))
               AS BIGINT) AS s
           FROM docs, unnest(range(0, ns)) AS u(i)
           WHERE u.i < nf * 16),
         fr AS (
           SELECT doc_id, nf, i // 16 AS f, sum(s * s) AS e
           FROM samp GROUP BY 1, 2, 3),
         tot AS (SELECT doc_id, sum(e) AS total FROM fr GROUP BY 1),
         flags AS (
           SELECT fr.doc_id, fr.nf, fr.f,
             CASE WHEN 2 * fr.e * fr.nf > t.total THEN 1 ELSE 0 END AS sp
           FROM fr JOIN tot t USING (doc_id)),
         isl AS (
           SELECT doc_id, f, sp,
             f - row_number() OVER (PARTITION BY doc_id, sp ORDER BY f)
               AS grp
           FROM flags),
         runs AS (
           SELECT doc_id, grp, count(*) AS run
           FROM isl WHERE sp = 1 GROUP BY doc_id, grp),
         runagg AS (
           SELECT doc_id, CAST(count(*) AS INT) AS n_seg,
               CAST(max(run) AS INT) AS longest
           FROM runs GROUP BY 1)
         SELECT f.doc_id,
           CAST(max(f.nf) AS INT) AS n_frames,
           CAST(sum(f.sp) AS INT) AS n_speech,
           coalesce(r.n_seg, 0) AS n_segments,
           CAST(coalesce(min(CASE WHEN f.sp = 1 THEN f.f END), -1) AS INT)
             AS first_speech,
           coalesce(r.longest, 0) AS longest_run,
           CAST(CASE WHEN max(f.nf) = 0 THEN 0
             ELSE sum(f.sp) * 1000000 // max(f.nf) END AS BIGINT)
             AS speech_ppm
         FROM flags f LEFT JOIN runagg r USING (doc_id)
         GROUP BY f.doc_id, r.n_seg, r.longest
         ORDER BY f.doc_id""",

    // WordPiece greedy tokenizer: the sample-trained top-200 gram vocab
    // rebuilt in SQL, then the longest-match cursor walked by a
    // recursive CTE — each doc advances one token per recursion, the
    // match is a max over the 2..5-gram vocab joins
    "tokenize_wordpiece" ->
      """WITH RECURSIVE grams AS (
           SELECT substr(text, CAST(u.i AS INT), CAST(v.l AS INT)) AS g
           FROM documents, unnest([2, 3, 4, 5]) AS v(l),
             unnest(range(1, length(text) - v.l + 2)) AS u(i)
           WHERE doc_id % 10 = 0 AND length(text) >= v.l),
         voc AS (SELECT g FROM grams GROUP BY g
           ORDER BY count(*) DESC, g LIMIT 200),
         mlen AS MATERIALIZED (
           SELECT doc_id, p, CAST(max(l) AS BIGINT) AS l FROM (
             SELECT d.doc_id, CAST(u.i AS BIGINT) AS p,
               CAST(v.l AS BIGINT) AS l,
               substr(d.text, CAST(u.i AS INT), CAST(v.l AS INT)) AS g
             FROM documents d, unnest([2, 3, 4, 5]) AS v(l),
               unnest(range(1, length(d.text) - v.l + 2)) AS u(i)
             WHERE length(d.text) >= v.l) t
           JOIN voc USING (g)
           GROUP BY doc_id, p),
         seg(it, doc_id, i, n, tok, vc) AS (
           SELECT 0 AS it, doc_id, CAST(1 AS BIGINT),
             CAST(length(text) AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           FROM documents
           UNION ALL
           SELECT it, doc_id, i, n, tok, vc FROM (
             WITH prev AS (SELECT * FROM seg),
             alive AS (SELECT * FROM prev WHERE i <= n)
             SELECT a.it + 1 AS it, a.doc_id,
               a.i + coalesce(m.l, 1) AS i, a.n,
               a.tok + 1 AS tok,
               a.vc + CASE WHEN m.l IS NOT NULL THEN 1 ELSE 0 END AS vc
             FROM alive a LEFT JOIN mlen m
               ON m.doc_id = a.doc_id AND m.p = a.i))
         SELECT doc_id, CAST(arg_max(tok, it) AS BIGINT) AS n_tokens,
           CAST(arg_max(vc, it) AS BIGINT) AS n_vocab_tokens,
           CAST(arg_max(tok, it) - arg_max(vc, it) AS BIGINT)
             AS n_fallback,
           CAST(CASE WHEN arg_max(tok, it) = 0 THEN 0
             ELSE max(n) * 1000000 // arg_max(tok, it) END AS BIGINT)
             AS chars_per_token_ppm
         FROM seg GROUP BY doc_id ORDER BY doc_id""",

    // Structural SimHash twin (round-7): FNV-1a token hashes replayed
    // in HUGEINT mod 2^64 (the xor touches only the low byte, so it
    // lifts to BIGINT and back), votes -> bit list -> the same 7-block
    // bucketing, spam cap, and hamming <= 6 cut as the engine's
    // multi-index join — the PAIR SET hash-checks, which hard-gates the
    // banding machinery the xxhash64 tier can't
    "dedup_simhash_struct" ->
      s"""WITH toks AS (
           SELECT doc_id, u.tok
           FROM documents, unnest(string_split(text, ' ')) AS u(tok)),
         th AS (
           SELECT doc_id,
             CAST(CASE WHEN hm >= 9223372036854775808::HUGEINT
               THEN hm - 18446744073709551616::HUGEINT ELSE hm END AS BIGINT) AS hb
           FROM (
             SELECT doc_id,
               ${fnvSql("tok")} AS hm
             FROM toks)),
         votes AS (
           SELECT doc_id, u.b AS bit,
             sum(CASE WHEN ((hb >> CAST(u.b AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS v
           FROM th, unnest(range(0, 64)) AS u(b)
           GROUP BY doc_id, u.b),
         sigs AS (
           SELECT doc_id,
             list(CASE WHEN v > 0 THEN 1 ELSE 0 END ORDER BY bit) AS sb
           FROM votes GROUP BY doc_id),
         blocks AS (
           SELECT doc_id, CAST(u.k AS BIGINT) AS k,
             list_sum(list_transform(
               range(CAST(u.k * 64 // 7 AS INT), CAST((u.k + 1) * 64 // 7 AS INT)),
               b -> sb[b + 1] * (1 << (b - u.k * 64 // 7)))) AS val
           FROM sigs, unnest(range(0, 7)) AS u(k)),
         bsz AS (SELECT k, val, count(*) AS c FROM blocks GROUP BY 1, 2),
         cand AS (
           SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
           FROM blocks l
           JOIN bsz z ON z.k = l.k AND z.val = l.val AND z.c <= 1000
           JOIN blocks r ON r.k = l.k AND r.val = l.val AND l.doc_id < r.doc_id)
         SELECT a_id, b_id, hamming FROM (
           SELECT c.a_id, c.b_id,
             CAST(len(list_filter(range(1, 65),
               i -> sa.sb[CAST(i AS INT)] <> sb2.sb[CAST(i AS INT)])) AS INT)
               AS hamming
           FROM cand c
           JOIN sigs sa ON sa.doc_id = c.a_id
           JOIN sigs sb2 ON sb2.doc_id = c.b_id)
         WHERE hamming <= 6 ORDER BY a_id, b_id""",

    // STRUCTURAL Count-Min twin (round 7): FNV-1a token hash (the
    // dedup_simhash_struct fold), multiply-shift row hashing with 36-bit
    // odd multipliers (INT128-safe: 2^64 · 2^36 ≪ 2^127), 4×1024 integer
    // counters, min-over-rows probe of the exact top-20 — every step
    // integer, value-exact vs the engine
    "vocab_cms_struct" ->
      s"""WITH toks AS (
           SELECT u.tok FROM documents, unnest(string_split(text, ' ')) AS u(tok)),
         th AS (
           SELECT tok, ${fnvSql("tok")} AS hu
           FROM toks),
         mults(r, a) AS (VALUES
           (0, ${Queries.CmsStructMults(0)}::HUGEINT),
           (1, ${Queries.CmsStructMults(1)}::HUGEINT),
           (2, ${Queries.CmsStructMults(2)}::HUGEINT),
           (3, ${Queries.CmsStructMults(3)}::HUGEINT)),
         counters AS (
           SELECT r, (hu * a) % 18446744073709551616::HUGEINT
               // 18014398509481984::HUGEINT AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
           FROM th, mults GROUP BY 1, 2),
         top AS (
           SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
           FROM toks GROUP BY 1 ORDER BY exact_cnt DESC, tok LIMIT 20),
         thd AS (SELECT DISTINCT tok, hu FROM th)
         SELECT t.tok, t.exact_cnt, min(c.cnt) AS est_cnt,
           min(c.cnt) - t.exact_cnt AS overestimate
         FROM top t JOIN thd d USING (tok)
         JOIN mults m ON true
         JOIN counters c ON c.r = m.r
           AND c.bucket = (d.hu * m.a) % 18446744073709551616::HUGEINT
             // 18014398509481984::HUGEINT
         GROUP BY t.tok, t.exact_cnt
         ORDER BY t.exact_cnt DESC, t.tok""",

    // STRUCTURAL HLL twin (round 7): FNV-1a of the user id finished by
    // the splitmix64-style xorshift/multiply finalizer (Queries.
    // hllMixedHash — FNV alone clusters on short sequential decimal ids;
    // xor lifts to HUGEINT directly, unsigned shift is floor division by
    // 2^k), bucket = top 5 bits, rank = 60 − bitlength of the low 59,
    // registers = max per bucket, exact fixed-point raw estimate via
    // HUGEINT floor division (822872359640035678486528000 =
    // α₃₂·m²·2⁶⁰·10⁶ppm with α₃₂ = 0.697 from the HLL paper's small-m
    // table)
    "agg_hll_struct" ->
      s"""WITH ev AS (
           SELECT event_type,
             CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT) AS wk,
             user_id
           FROM events),
         th0 AS (
           SELECT event_type, wk,
             ${fnvSql("CAST(user_id AS VARCHAR)")} AS h
           FROM ev),
         th1 AS (
           SELECT event_type, wk,
             (xor(h, h // 1073741824::HUGEINT)
               * ${Queries.CmsStructMults(0)}::HUGEINT)
               % 18446744073709551616::HUGEINT AS h
           FROM th0),
         th2 AS (
           SELECT event_type, wk,
             (xor(h, h // 134217728::HUGEINT)
               * ${Queries.CmsStructMults(1)}::HUGEINT)
               % 18446744073709551616::HUGEINT AS h
           FROM th1),
         th AS (
           SELECT event_type, wk,
             xor(h, h // 2147483648::HUGEINT) AS hu
           FROM th2),
         rk AS (
           SELECT event_type, wk,
             CAST(hu // 576460752303423488::HUGEINT AS BIGINT) AS bucket,
             CAST(hu % 576460752303423488::HUGEINT AS BIGINT) AS rem
           FROM th),
         regs AS (
           SELECT event_type, wk, bucket,
             CAST(max(CASE WHEN rem = 0 THEN 60
               ELSE 60 - length(bin(rem)) END) AS BIGINT) AS reg
           FROM rk GROUP BY 1, 2, 3),
         est AS (
           SELECT event_type, wk,
             CAST(count(*) AS BIGINT) AS n_buckets_hit,
             CAST(sum(reg) AS BIGINT) AS reg_sum,
             CAST(822872359640035678486528000::HUGEINT //
               ((CAST(sum(1::BIGINT << CAST(60 - reg AS INT)) AS HUGEINT)
                 + (32 - count(*))::HUGEINT * 1152921504606846976::HUGEINT)
                * 1000000::HUGEINT) AS BIGINT) AS approx_users
           FROM regs GROUP BY 1, 2),
         exact AS (
           SELECT event_type, wk,
             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
           FROM ev GROUP BY 1, 2)
         SELECT r.event_type, r.wk, r.bucket, r.reg,
           e.n_buckets_hit, e.reg_sum, e.approx_users, x.exact_users
         FROM regs r JOIN est e USING (event_type, wk)
         JOIN exact x USING (event_type, wk)
         ORDER BY r.event_type, r.wk, r.bucket""",

    // Iterative BPE trainer (round-7 promotion): the 10-round driver
    // merge loop replayed as ONE recursive CTE — per recursion: the
    // adjacent-symbol pair aggregate over the current segmentation, the
    // (count DESC, pair ASC) argmax, and the literal replace that
    // re-segments every word; merge rows ride the same working table
    // tagged kind=1 (the tokenize_bpe_apply precedent run in reverse)
    "vocab_bpe_iterative" ->
      """WITH RECURSIVE vocab0 AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS wc,
             '(' || list_aggregate(list_filter(string_split(w, ''), c -> c <> ''),
               'string_agg', ')(') || ')' AS s
           FROM (
             SELECT u.w FROM documents, unnest(string_split(text, ' ')) AS u(w))
           WHERE regexp_full_match(w, '[a-z]{2,}')
           GROUP BY w),
         st(it, kind, wc, s, l, r, m, n) AS (
           SELECT 0, 0, wc, s, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
           FROM vocab0
           UNION ALL
           SELECT it, kind, wc, s, l, r, m, n FROM (
             WITH prev AS (SELECT * FROM st),
             words AS (SELECT * FROM prev WHERE kind = 0 AND it < 10),
             syms AS (
               SELECT wc, s, string_split(substr(s, 2, length(s) - 2), ')(') AS sy
               FROM words),
             pr AS (
               SELECT '(' || sy[CAST(u.i AS INT)] || ')(' ||
                   sy[CAST(u.i AS INT) + 1] || ')' AS pair,
                 CAST(sum(wc) AS BIGINT) AS pn
               FROM syms, unnest(range(1, len(sy))) AS u(i)
               GROUP BY 1),
             best AS (
               SELECT pair, pn,
                 substr(pair, 2, length(pair) - 2) AS pinner
               FROM pr ORDER BY pn DESC, pair LIMIT 1),
             bparts AS (
               SELECT pair, pn,
                 string_split(pinner, ')(')[1] AS bl,
                 string_split(pinner, ')(')[2] AS br
               FROM best)
             SELECT w.it + 1 AS it, 0 AS kind, w.wc,
               replace(w.s, b.pair, '(' || b.bl || b.br || ')') AS s,
               CAST(NULL AS VARCHAR) AS l, CAST(NULL AS VARCHAR) AS r,
               CAST(NULL AS VARCHAR) AS m, CAST(NULL AS BIGINT) AS n
             FROM words w CROSS JOIN bparts b
             UNION ALL
             SELECT min(w.it) + 1, 1, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
               b.bl, b.br, b.bl || b.br, b.pn
             FROM words w CROSS JOIN bparts b
             GROUP BY b.bl, b.br, b.pn))
         SELECT CAST(it AS BIGINT) AS rank, l AS "left", r AS "right",
           m AS merged, n
         FROM st WHERE kind = 1 ORDER BY rank""",

    // CDC chunk dedup (round-7 promotion): the BMP payload re-derived
    // byte-exactly from the source text (recipe: header fields from
    // n_chars, pixels = text bytes cycled), then the LBFS boundary rule
    // replayed WITHOUT a per-byte cursor — after the first 16 bytes of a
    // chunk the rolling hash is exactly the 16-byte-window hash, and
    // 31^2 ≡ 1 (mod 64) collapses `(h & 63) == 63` to a parity-weighted
    // window sum (wrapping preserves the low 6 bits), so boundary flags
    // are position-local and the recursion advances one CHUNK per step
    // via a next-marked-position table. Chunk identity groups by the
    // byte list itself (md5 equality ⟺ byte equality)
    "mm_chunk_dedup" ->
      """WITH RECURSIVE dims AS (
           SELECT doc_id, text, n_chars,
             4 + n_chars % 29 AS w, 4 + n_chars % 17 AS h
           FROM documents),
         dims2 AS (SELECT *, (w * 3 + 3) // 4 * 4 AS stride FROM dims),
         dims3 AS (SELECT *, 54 + stride * h AS sz FROM dims2),
         hdr AS (
           SELECT doc_id, [66, 77,
             sz % 256, (sz // 256) % 256, (sz // 65536) % 256,
             (sz // 16777216) % 256,
             0, 0, 0, 0,  54, 0, 0, 0,  40, 0, 0, 0,
             w % 256, (w // 256) % 256, 0, 0,
             h % 256, (h // 256) % 256, 0, 0,
             1, 0,  24, 0,  0, 0, 0, 0,
             (stride * h) % 256, (stride * h // 256) % 256,
             (stride * h // 65536) % 256, (stride * h // 16777216) % 256,
             19, 11, 0, 0,  19, 11, 0, 0,
             0, 0, 0, 0, 0, 0, 0, 0] AS hb
           FROM dims3),
         bytes AS (
           SELECT d.doc_id, CAST(u.i AS BIGINT) AS p,
             CASE WHEN u.i <= 54 THEN hb[CAST(u.i AS INT)]
               ELSE ord(substr(d.text,
                 CAST(((u.i - 55) % length(d.text)) + 1 AS INT), 1))
               END AS b,
             CAST(d.sz AS BIGINT) AS n
           FROM dims3 d JOIN hdr USING (doc_id),
             unnest(range(1, sz + 1)) AS u(i)),
         msk AS (
           SELECT doc_id, p, b, n,
             CASE WHEN p >= 16 AND
               ((CASE WHEN p % 2 = 0 THEN se ELSE so END)
                + 31 * (CASE WHEN p % 2 = 0 THEN so ELSE se END))
                % 64 = 63
               THEN TRUE ELSE FALSE END AS mflag
           FROM (
             SELECT doc_id, p, b, n,
               sum(CASE WHEN p % 2 = 0 THEN b ELSE 0 END) OVER w16 AS se,
               sum(CASE WHEN p % 2 = 1 THEN b ELSE 0 END) OVER w16 AS so
             FROM bytes
             WINDOW w16 AS (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW))),
         nx AS MATERIALIZED (
           SELECT doc_id, p, b, n,
             min(CASE WHEN mflag THEN p END) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
           FROM msk),
         walk(doc_id, s, e, n) AS (
           SELECT b.doc_id, CAST(1 AS BIGINT) AS s,
             least(CASE WHEN x.nxt IS NOT NULL AND x.nxt <= 255 THEN x.nxt
               ELSE CAST(256 AS BIGINT) END, b.n) AS e, b.n
           FROM (SELECT DISTINCT doc_id, n FROM nx) b
           LEFT JOIN nx x ON x.doc_id = b.doc_id AND x.p = 32
           UNION ALL
           SELECT w.doc_id, w.e + 1,
             least(CASE WHEN x.nxt IS NOT NULL AND x.nxt <= w.e + 255
               THEN x.nxt ELSE w.e + 256 END, w.n) AS e, w.n
           FROM walk w
           LEFT JOIN nx x ON x.doc_id = w.doc_id AND x.p = w.e + 32
           WHERE w.e < w.n),
         chunks AS (
           SELECT w.doc_id, w.s, w.e, w.e - w.s + 1 AS clen,
             list(y.b ORDER BY y.p) AS content
           FROM walk w
           JOIN nx y ON y.doc_id = w.doc_id AND y.p BETWEEN w.s AND w.e
           GROUP BY w.doc_id, w.s, w.e),
         census AS (
           SELECT content, count(DISTINCT doc_id) AS n_docs
           FROM chunks GROUP BY content)
         SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(c.clen) AS BIGINT) AS total_bytes,
           CAST(sum(CASE WHEN z.n_docs >= 2 THEN c.clen ELSE 0 END)
             AS BIGINT) AS shared_bytes,
           CAST(sum(CASE WHEN z.n_docs >= 2 THEN c.clen ELSE 0 END)
             * 1000000 // sum(c.clen) AS BIGINT) AS shared_ppm
         FROM chunks c JOIN census z USING (content)
         GROUP BY c.doc_id ORDER BY c.doc_id""",

    // k-center greedy coreset (round-7 promotion): the micro-unit
    // quantization is exact integer (trunc matches the engine's
    // double→long cast), so every min-distance fold and argmax is
    // integer-exact — one recursion per greedy round carrying the
    // per-vector running min distance; the pick replays the engine's
    // (distance DESC, vec_id ASC) total order
    "sample_kcenter" ->
      """WITH RECURSIVE emb AS MATERIALIZED (
           SELECT vec_id,
             list_transform(embedding,
               x -> CAST(trunc(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
               AS q
           FROM embeddings),
         state(it, vec_id, q, mind, cid, crad) AS (
           SELECT 0, e.vec_id, e.q, CAST(9223372036854775807 AS BIGINT),
             (SELECT min(vec_id) FROM emb), CAST(0 AS BIGINT)
           FROM emb e
           UNION ALL
           SELECT it + 1, vec_id, q, nmind, pid, prad FROM (
             WITH prev AS (SELECT * FROM state),
             cen AS (SELECT p.q AS cq FROM prev p
               WHERE p.vec_id = (SELECT min(cid) FROM prev) LIMIT 1),
             upd AS (
               SELECT p.it, p.vec_id, p.q,
                 least(p.mind, CAST(list_sum(list_transform(
                   range(1, len(p.q) + 1),
                   i -> (p.q[i] - c.cq[i]) * (p.q[i] - c.cq[i])))
                   AS BIGINT)) AS nmind
               FROM prev p CROSS JOIN cen c
               WHERE p.it < 15),
             pick AS (SELECT vec_id AS pid, nmind AS prad FROM upd
               ORDER BY nmind DESC, vec_id LIMIT 1)
             SELECT u.it, u.vec_id, u.q, u.nmind, p.pid, p.prad
             FROM upd u CROSS JOIN pick p))
         SELECT CAST(it AS BIGINT) AS sel_order, min(cid) AS vec_id,
           min(crad) AS radius_sq
         FROM state GROUP BY it ORDER BY sel_order""",

    // Unigram-Viterbi tokenizer (round-7 promotion): the sample-trained
    // top-200 gram vocab rebuilt in SQL, vocab matches pre-aggregated to
    // one bitmask row per (doc, position), then the engine's EXACT
    // integral-objective backward DP replayed by a recursive CTE — each
    // doc walks one char position per recursion carrying the last five
    // suffix states (score/token/vocab-token triples); the longer-token
    // tie-break is the CASE order (c5 first), and fallback never ties a
    // vocab option (a vocab token adds 1000·l while the l−1 skipped
    // chars can add at most 1000·(l−1)), so pick order is total
    "tokenize_unigram" ->
      """WITH RECURSIVE grams AS (
           SELECT substr(text, CAST(u.i AS INT), CAST(v.l AS INT)) AS g
           FROM documents, unnest([2, 3, 4, 5]) AS v(l),
             unnest(range(1, length(text) - v.l + 2)) AS u(i)
           WHERE doc_id % 10 = 0 AND length(text) >= v.l),
         voc AS (SELECT g FROM grams GROUP BY g
           ORDER BY count(*) DESC, g LIMIT 200),
         m AS MATERIALIZED (
           SELECT doc_id, p,
             max(CASE WHEN l = 2 THEN 1 ELSE 0 END) AS m2,
             max(CASE WHEN l = 3 THEN 1 ELSE 0 END) AS m3,
             max(CASE WHEN l = 4 THEN 1 ELSE 0 END) AS m4,
             max(CASE WHEN l = 5 THEN 1 ELSE 0 END) AS m5
           FROM (
             SELECT d.doc_id, CAST(u.i AS BIGINT) AS p,
               CAST(v.l AS BIGINT) AS l,
               substr(d.text, CAST(u.i AS INT), CAST(v.l AS INT)) AS g
             FROM documents d, unnest([2, 3, 4, 5]) AS v(l),
               unnest(range(1, length(d.text) - v.l + 2)) AS u(i)
             WHERE length(d.text) >= v.l) t
           JOIN voc USING (g)
           GROUP BY doc_id, p),
         dp(doc_id, p, s1, s2, s3, s4, s5, t1, t2, t3, t4, t5,
            v1, v2, v3, v4, v5) AS (
           SELECT doc_id, CAST(length(text) AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT),
             CAST(0 AS BIGINT), CAST(0 AS BIGINT)
           FROM documents WHERE length(text) >= 1
           UNION ALL
           SELECT doc_id, p - 1, ns, s1, s2, s3, s4,
             nt, t1, t2, t3, t4, nv, v1, v2, v3, v4
           FROM (
             WITH prev AS (SELECT * FROM dp),
             alive AS (SELECT * FROM prev WHERE p >= 1),
             sc AS (
               SELECT a.*,
                 CASE WHEN coalesce(c.m2, 0) = 1 THEN 2000 + a.s2
                   ELSE -1 END AS c2,
                 CASE WHEN coalesce(c.m3, 0) = 1 THEN 3000 + a.s3
                   ELSE -1 END AS c3,
                 CASE WHEN coalesce(c.m4, 0) = 1 THEN 4000 + a.s4
                   ELSE -1 END AS c4,
                 CASE WHEN coalesce(c.m5, 0) = 1 THEN 5000 + a.s5
                   ELSE -1 END AS c5
               FROM alive a LEFT JOIN m c USING (doc_id, p)),
             ch AS (
               SELECT *, greatest(c2, c3, c4, c5) AS cb,
                 CASE WHEN greatest(c2, c3, c4, c5) <= 1 + s1 THEN 1
                   WHEN c5 = greatest(c2, c3, c4, c5) THEN 5
                   WHEN c4 = greatest(c2, c3, c4, c5) THEN 4
                   WHEN c3 = greatest(c2, c3, c4, c5) THEN 3
                   ELSE 2 END AS pick
               FROM sc)
             SELECT doc_id, p,
               CASE pick WHEN 1 THEN 1 + s1 ELSE cb END AS ns,
               1 + CASE pick WHEN 1 THEN t1 WHEN 2 THEN t2 WHEN 3 THEN t3
                 WHEN 4 THEN t4 ELSE t5 END AS nt,
               CASE pick WHEN 1 THEN v1 WHEN 2 THEN 1 + v2
                 WHEN 3 THEN 1 + v3 WHEN 4 THEN 1 + v4
                 ELSE 1 + v5 END AS nv,
               s1, s2, s3, s4, t1, t2, t3, t4, v1, v2, v3, v4
             FROM ch))
         SELECT d.doc_id,
           coalesce(f.t1, 0) AS n_tokens,
           coalesce(f.v1, 0) AS n_vocab_tokens,
           coalesce(f.t1 - f.v1, 0) AS n_fallback,
           CAST(CASE WHEN coalesce(f.t1, 0) = 0 THEN 0
             ELSE length(d.text) * 1000000 // f.t1 END AS BIGINT)
             AS chars_per_token_ppm
         FROM documents d
         LEFT JOIN (SELECT * FROM dp WHERE p = 0) f USING (doc_id)
         ORDER BY d.doc_id""",

    // Markov removal-effect attribution: the transition counts in plain
    // SQL, then the engine's 400-round exact integer fixed-point
    // absorption iterate replayed for EVERY removal scenario in one
    // recursive CTE. Round 9 (VERDICT r8 #7): the scenario cross-product
    // is PRE-AGGREGATED into two static MATERIALIZED tables — cmat
    // (scenario-filtered edges) and base (per-(scenario, state)
    // normalizer + purchase seed) — so the recursive arm is ONE join +
    // ONE aggregation instead of a join plus three per-iteration LEFT
    // JOINs (~30% off; output proven byte-identical at both SFs)
    "attribution_markov" ->
      """WITH RECURSIVE ev0 AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS tts, event_id,
             event_type FROM events),
         r0 AS (SELECT *,
             sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY tts, event_id)
               AS convrank FROM ev0),
         kept AS (SELECT * FROM r0
           WHERE convrank = 0
             OR (convrank = 1 AND event_type = 'purchase')),
         tr0 AS (SELECT
             coalesce(lag(event_type) OVER
               (PARTITION BY user_id ORDER BY tts, event_id), 'start') AS f,
             event_type AS t,
             lead(event_type) OVER
               (PARTITION BY user_id ORDER BY tts, event_id) IS NULL
               AND event_type <> 'purchase' AS openend
           FROM kept),
         counts AS MATERIALIZED (
           SELECT f, t, CAST(count(*) AS BIGINT) AS n FROM (
             SELECT f, t FROM tr0
             UNION ALL SELECT t AS f, 'null' AS t FROM tr0 WHERE openend)
           GROUP BY 1, 2),
         chans AS (SELECT DISTINCT s AS c FROM (
             SELECT f AS s FROM counts UNION SELECT t FROM counts)
           WHERE s NOT IN ('start', 'purchase', 'null')),
         scen AS (SELECT '' AS removed UNION ALL SELECT c FROM chans),
         sts AS (SELECT 'start' AS st UNION ALL SELECT c FROM chans),
         base AS MATERIALIZED (
           SELECT s.removed, x.st,
             CASE WHEN x.st = s.removed THEN CAST(0 AS BIGINT)
               ELSE coalesce(tt.tot, 0) END AS tot,
             CASE WHEN x.st = s.removed THEN CAST(0 AS BIGINT)
               ELSE coalesce(p.np, 0) END AS np
           FROM scen s CROSS JOIN sts x
           LEFT JOIN (SELECT f, sum(n) AS tot FROM counts GROUP BY 1) tt
             ON tt.f = x.st
           LEFT JOIN (SELECT f, sum(n) AS np FROM counts
             WHERE t = 'purchase' GROUP BY 1) p ON p.f = x.st),
         cmat AS MATERIALIZED (
           SELECT s.removed, c.f, c.t, c.n
           FROM scen s JOIN counts c
             ON c.t NOT IN ('purchase', 'null')
               AND c.t <> s.removed AND c.f <> s.removed),
         fp(it, removed, st, tv) AS (
           SELECT 0 AS it, removed, st, CAST(0 AS BIGINT) AS tv FROM base
           UNION ALL
           SELECT it, removed, st, tv FROM (
             WITH prev AS (SELECT * FROM fp),
               i AS (SELECT min(it) AS it FROM prev),
               qsum AS (
                 SELECT c.removed, c.f AS st, sum(c.n * pr.tv) AS sq
                 FROM cmat c
                 JOIN prev pr ON pr.removed = c.removed AND pr.st = c.t
                 GROUP BY 1, 2)
             SELECT (SELECT it FROM i) + 1 AS it, b.removed, b.st,
               CASE WHEN b.tot = 0 THEN 0
                 ELSE (b.np * 1000000000000 + coalesce(q.sq, 0)) // b.tot
               END AS tv
             FROM base b
             LEFT JOIN qsum q ON q.removed = b.removed AND q.st = b.st
             WHERE (SELECT it FROM i) < 400)),
         fbase AS (SELECT tv FROM fp
           WHERE it = 400 AND removed = '' AND st = 'start'),
         ab AS (SELECT removed AS channel, tv FROM fp
           WHERE it = 400 AND removed <> '' AND st = 'start'),
         d AS (SELECT channel, (SELECT tv FROM fbase) - tv AS dn FROM ab),
         t2 AS (SELECT sum(dn) AS s FROM d)
         SELECT channel,
           CAST(CASE WHEN (SELECT tv FROM fbase) > 0
             THEN dn * 1000000 // (SELECT tv FROM fbase) ELSE 0 END
             AS BIGINT) AS re_ppm,
           CAST(CASE WHEN (SELECT s FROM t2) > 0
             THEN dn * 1000000 // (SELECT s FROM t2) ELSE 0 END
             AS BIGINT) AS attribution_ppm
         FROM d ORDER BY channel""",

    // scene-cut detection: the BMP fixture's row sums re-derived from
    // the source text (pixel bytes are the text cycled over stride·h;
    // row sums cover only the 3w channel bytes, skipping stride pad),
    // then the same integer threshold census
    "mm_scene_cut" ->
      """WITH docs AS (SELECT doc_id, text, length(text) AS L,
             4 + n_chars % 29 AS w, 4 + n_chars % 17 AS h,
             ((4 + n_chars % 29) * 3 + 3) // 4 * 4 AS stride
           FROM documents),
         px AS (
           SELECT doc_id, CAST(u.y AS BIGINT) AS y, sum(
               ord(substr(text, CAST(((u.y * stride + v.x) % L) + 1 AS INT), 1))
             ) AS rowsum
           FROM docs, unnest(range(0, h)) AS u(y),
             unnest(range(0, 3 * w)) AS v(x)
           GROUP BY doc_id, u.y),
         tot AS (SELECT doc_id, sum(rowsum) AS total, count(*) AS h
           FROM px GROUP BY 1),
         d AS (
           SELECT p.doc_id, p.y,
             abs(p.rowsum - lag(p.rowsum) OVER
               (PARTITION BY p.doc_id ORDER BY p.y)) AS dd
           FROM px p),
         j AS (
           SELECT d.doc_id, d.y, d.dd, t.total, t.h
           FROM d JOIN tot t USING (doc_id) WHERE d.dd IS NOT NULL)
         SELECT doc_id, CAST(max(h) AS INT) AS n_frames,
           CAST(sum(CASE WHEN 3 * dd * h > 2 * total THEN 1 ELSE 0 END)
             AS INT) AS n_cuts,
           CAST(coalesce(min(CASE WHEN 3 * dd * h > 2 * total THEN y END),
             -1) AS INT) AS first_cut,
           CAST(max(dd) AS BIGINT) AS max_delta
         FROM j GROUP BY doc_id ORDER BY doc_id""",

    // audio constellation fingerprints: landmarks (per-frame peak
    // buckets) and anchor-pair hashes re-derived from the source text,
    // then the same cap/join/offset-vote pipeline in SQL
    "mm_audio_fingerprint" ->
      """WITH docs AS (SELECT doc_id, text,
             64 + n_chars % 193 AS ns FROM documents),
         samp AS (
           SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             CAST(64 * (ord(substr(text, CAST((u.i % length(text)) + 1 AS INT), 1))
                 - ord(substr(text, CAST(((u.i + 1) % length(text)) + 1 AS INT), 1)))
               AS BIGINT) AS s
           FROM docs, unnest(range(0, ns)) AS u(i)),
         frames AS (
           SELECT d.doc_id, CAST(u.f AS BIGINT) AS f
           FROM docs d,
             unnest(range(0, greatest((ns - 16) // 8 + 1, 0))) AS u(f)
           WHERE u.f * 8 + 16 <= d.ns),
         lm AS (
           SELECT fr.doc_id, fr.f, least(max(abs(sa.s)) // 512, 63) AS bucket
           FROM frames fr JOIN samp sa ON sa.doc_id = fr.doc_id
             AND sa.i >= fr.f * 8 AND sa.i < fr.f * 8 + 16
           GROUP BY 1, 2),
         fp AS (
           SELECT l1.doc_id,
             l1.bucket * 4096 + l2.bucket * 64 + (l2.f - l1.f) AS h,
             l1.f AS t1
           FROM lm l1 JOIN lm l2 ON l2.doc_id = l1.doc_id
             AND l2.f > l1.f AND l2.f <= l1.f + 3),
         capped AS (
           SELECT * FROM (
             SELECT doc_id, h, t1,
               count(*) OVER (PARTITION BY h) AS postings FROM fp)
           WHERE postings <= 64),
         votes AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.t1 - b.t1 AS dt,
             count(*) AS votes
           FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3)
         SELECT a_id, b_id, CAST(max(votes) AS BIGINT) AS n_aligned
         FROM votes GROUP BY 1, 2 HAVING max(votes) >= 4
         ORDER BY a_id, b_id""",

    // winnowing fingerprints: the k=5/w=4 scheme replayed in SQL — the
    // Java-long wrapping polynomial hash computed directly per gram in
    // HUGEINT then reduced mod 2^64 back to signed (wrap-per-step and
    // sum-mod-2^64 agree: ring homomorphism), per-window rightmost min
    // via min over (h, -gi) structs, distinct survivors per doc
    "doc_winnow" ->
      """WITH chars AS (
           SELECT doc_id, CAST(u.i AS BIGINT) AS i,
               ord(substr(text, CAST(u.i AS INT), 1)) AS b,
               length(text) AS n
           FROM documents, unnest(range(1, length(text) + 1)) AS u(i)),
         grams AS (
           SELECT doc_id, i AS gi, n - 4 AS ngrams,
             CAST(CASE WHEN hm >= 9223372036854775808::HUGEINT
               THEN hm - 18446744073709551616::HUGEINT ELSE hm END
               AS BIGINT) AS h
           FROM (
             SELECT c0.doc_id, c0.i, c0.n,
               (CAST(c0.b AS HUGEINT) * 1000012000054000108000081::HUGEINT
                + CAST(c1.b AS HUGEINT) * 1000009000027000027::HUGEINT
                + CAST(c2.b AS HUGEINT) * 1000006000009::HUGEINT
                + CAST(c3.b AS HUGEINT) * 1000003::HUGEINT
                + CAST(c4.b AS HUGEINT))
                % 18446744073709551616::HUGEINT AS hm
             FROM chars c0
             JOIN chars c1 ON c1.doc_id = c0.doc_id AND c1.i = c0.i + 1
             JOIN chars c2 ON c2.doc_id = c0.doc_id AND c2.i = c0.i + 2
             JOIN chars c3 ON c3.doc_id = c0.doc_id AND c3.i = c0.i + 3
             JOIN chars c4 ON c4.doc_id = c0.doc_id AND c4.i = c0.i + 4
             ) t(doc_id, i, n, hm)),
         win AS (
           SELECT doc_id, gi, ngrams,
             min(ROW(h, -gi)) OVER (PARTITION BY doc_id ORDER BY gi
               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
           FROM grams),
         sel1 AS (
           SELECT doc_id, sel[1] AS h FROM win
           WHERE ngrams > 4 AND gi <= ngrams - 3
           UNION
           SELECT doc_id, min(ROW(h, -gi))[1] AS h FROM grams
           WHERE ngrams <= 4 GROUP BY doc_id),
         agg AS (
           SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps,
               CAST(min(h) AS BIGINT) AS fp_min
           FROM (SELECT DISTINCT doc_id, h FROM sel1) GROUP BY 1)
         SELECT d.doc_id, coalesce(a.n_fps, 0) AS n_fps, a.fp_min
         FROM documents d LEFT JOIN agg a USING (doc_id)
         ORDER BY d.doc_id""",

    // fixed-point PageRank over the exact dup-pair graph: 10 damped
    // rounds of the engine's integer iteration (contrib ⌊r/deg⌋, update
    // ⌊3·1e12/(20n)⌋ + ⌊17·inflow/20⌋) replayed by a recursive CTE —
    // every step integer, so the pico-rank column hash-checks
    "graph_pagerank" ->
      s"""WITH RECURSIVE ${dupPairsSql},
         e AS MATERIALIZED (SELECT s, d FROM (
             SELECT CAST(a_id AS BIGINT) s, CAST(b_id AS BIGINT) d FROM p
             UNION ALL
             SELECT CAST(b_id AS BIGINT), CAST(a_id AS BIGINT) FROM p)
           GROUP BY 1, 2),
         deg AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY 1),
         nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         pr(it, node, r) AS (
           SELECT 0 AS it, node,
             (SELECT 1000000000000 // n FROM nn) AS r FROM nodes
           UNION ALL
           SELECT it, node, r FROM (
             WITH prev AS (SELECT * FROM pr),
               i AS (SELECT min(it) AS it FROM prev),
               c AS (SELECT e.d AS node,
                   CAST(sum(p2.r // dg.dg) AS BIGINT) AS inflow
                 FROM e JOIN prev p2 ON p2.node = e.s
                   JOIN deg dg ON dg.s = e.s
                 GROUP BY 1)
             SELECT (SELECT it FROM i) + 1 AS it, nd.node,
               (SELECT (3 * 1000000000000) // (20 * n) FROM nn)
                 + (17 * coalesce(c.inflow, 0)) // 20 AS r
             FROM nodes nd LEFT JOIN c ON c.node = nd.node
             WHERE (SELECT it FROM i) < 10))
         SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_pp12,
             round(CAST(r AS DOUBLE) / 1e12, 6) AS rank
         FROM pr WHERE it = 10
         ORDER BY rank_pp12 DESC, doc_id""",

    // fixed-point TextRank: the stopword-pruned token bigram graph in
    // plain SQL (vocab_rake's tokenization), then the same integer
    // PageRank recursive CTE, top-20
    "vocab_textrank" ->
      """WITH RECURSIVE tok AS (SELECT doc_id,
             CAST(generate_subscripts(t, 1) AS BIGINT) AS p, unnest(t) AS tk
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
         stop AS (SELECT tk FROM tok GROUP BY tk
           ORDER BY count(*) DESC, tk LIMIT 5),
         ns AS (SELECT doc_id, p, tk FROM tok
           WHERE tk NOT IN (SELECT tk FROM stop)),
         nx AS (SELECT tk, lead(tk) OVER
             (PARTITION BY doc_id ORDER BY p) AS ntk FROM ns),
         e0 AS (SELECT DISTINCT least(tk, ntk) a, greatest(tk, ntk) b
           FROM nx WHERE ntk IS NOT NULL AND tk <> ntk),
         e AS MATERIALIZED (SELECT s, d FROM (
             SELECT a s, b d FROM e0 UNION ALL SELECT b, a FROM e0)
           GROUP BY 1, 2),
         deg AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT) AS dg FROM e GROUP BY 1),
         nodes AS MATERIALIZED (SELECT DISTINCT s AS node FROM e),
         nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         pr(it, node, r) AS (
           SELECT 0 AS it, node,
             (SELECT 1000000000000 // n FROM nn) AS r FROM nodes
           UNION ALL
           SELECT it, node, r FROM (
             WITH prev AS (SELECT * FROM pr),
               i AS (SELECT min(it) AS it FROM prev),
               c AS (SELECT e.d AS node,
                   CAST(sum(p2.r // dg.dg) AS BIGINT) AS inflow
                 FROM e JOIN prev p2 ON p2.node = e.s
                   JOIN deg dg ON dg.s = e.s
                 GROUP BY 1)
             SELECT (SELECT it FROM i) + 1 AS it, nd.node,
               (SELECT (3 * 1000000000000) // (20 * n) FROM nn)
                 + (17 * coalesce(c.inflow, 0)) // 20 AS r
             FROM nodes nd LEFT JOIN c ON c.node = nd.node
             WHERE (SELECT it FROM i) < 10))
         SELECT node AS token, CAST(r AS BIGINT) AS rank_pp12,
             round(CAST(r AS DOUBLE) / 1e12, 6) AS rank
         FROM pr WHERE it = 10
         ORDER BY rank_pp12 DESC, token LIMIT 20""",

    // Kaplan-Meier: risk table in plain SQL, then the engine's documented
    // iterated ⌊s·(n−d)/n⌋ ppm recurrence replayed row-by-row by a
    // recursive CTE — exact BIGINT arithmetic at every step
    "survival_km" ->
      """WITH RECURSIVE per AS (
           SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
           FROM orders GROUP BY 1),
         lt AS (SELECT datediff('day', CAST(f AS DATE), CAST(l AS DATE)) AS t,
             CASE WHEN CAST(l AS TIMESTAMP) < TIMESTAMP '2001-05-01 00:00:00'
               THEN 1 ELSE 0 END AS ev
           FROM per),
         risk AS (SELECT t, count(*) AS m, sum(ev) AS d FROM lt GROUP BY 1),
         w AS (SELECT t, m, d, sum(m) OVER (ORDER BY t) AS cm,
             sum(m) OVER () AS nall FROM risk),
         ev AS MATERIALIZED (SELECT t, nall - (cm - m) AS n_risk, d,
             row_number() OVER (ORDER BY t) AS rn
           FROM w WHERE d > 0),
         km(rn, t, n_risk, d, s) AS (
           SELECT rn, t, n_risk, d,
             (1000000 * (n_risk - d)) // n_risk
           FROM ev WHERE rn = 1
           UNION ALL
           SELECT e.rn, e.t, e.n_risk, e.d,
             (km.s * (e.n_risk - e.d)) // e.n_risk
           FROM km JOIN ev e ON e.rn = km.rn + 1)
         SELECT CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
             CAST(d AS BIGINT) AS d_events, CAST(s AS BIGINT) AS s_ppm
         FROM km ORDER BY t""",

    // isotonic calibration: the 20-bin score table in plain SQL, then PAV
    // replayed by a recursive CTE that merges the FIRST violating
    // adjacent pool per step (the PAV solution is unique, so first-merge
    // and the engine's stack fold reach the same pools); all pool
    // comparisons are exact integer cross-products
    "calibrate_isotonic" ->
      """WITH RECURSIVE raw AS MATERIALIZED (
           SELECT doc_id,
             CAST(n_chars AS DOUBLE) / 1000.0 -
               2.0 * length(regexp_replace(text, '[aeiou]', '', 'g')) /
               CAST(n_chars + 1 AS DOUBLE) AS s,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1') AS flip
           FROM documents),
         thr AS (SELECT quantile_cont(s, 0.5) AS thr FROM raw),
         scored AS (SELECT doc_id, s,
             CASE WHEN (s > thr.thr) <> flip THEN 1 ELSE 0 END AS y
           FROM raw, thr),
         binned AS (SELECT ntile(20) OVER (ORDER BY s, doc_id) AS bin, y
           FROM scored),
         bins AS MATERIALIZED (SELECT CAST(bin AS BIGINT) AS bin,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
           FROM binned GROUP BY 1),
         pav(it, lo, hi, n, pos) AS (
           SELECT 0 AS it, bin, bin, n, pos FROM bins
           UNION ALL
           SELECT it, lo, hi, n, pos FROM (
             WITH w AS (SELECT it, lo, hi, n, pos,
                 lead(lo) OVER (ORDER BY lo) AS nlo,
                 lead(hi) OVER (ORDER BY lo) AS nhi,
                 lead(n) OVER (ORDER BY lo) AS nn,
                 lead(pos) OVER (ORDER BY lo) AS npos
               FROM pav),
             v AS (SELECT lo AS vlo, nlo AS vnext FROM w
               WHERE nlo IS NOT NULL AND pos * nn >= npos * n
               ORDER BY lo LIMIT 1)
             SELECT w.it + 1 AS it, w.lo,
               CASE WHEN w.lo = v.vlo THEN w.nhi ELSE w.hi END AS hi,
               CASE WHEN w.lo = v.vlo THEN w.n + w.nn ELSE w.n END AS n,
               CASE WHEN w.lo = v.vlo THEN w.pos + w.npos ELSE w.pos END AS pos
             FROM w, v
             WHERE w.lo <> v.vnext)),
         final AS (SELECT * FROM pav
           WHERE it = (SELECT max(it) FROM pav))
         SELECT b.bin, b.n, b.pos AS n_pos,
             (b.pos * 1000000) // b.n AS raw_ppm,
             (f.pos * 1000000) // f.n AS iso_ppm
         FROM bins b JOIN final f ON b.bin BETWEEN f.lo AND f.hi
         ORDER BY b.bin""",

    // k-core profile: the same exact pair list, peeled to each k's
    // fixpoint by a recursive CTE (one strict-decrease step per
    // recursion; a -1 sentinel row keeps empty cores representable),
    // cores seeded nested (2 → 3 → 4) exactly as the engine peels
    "graph_k_core" ->
      s"""WITH RECURSIVE ${dupPairsSql},
         peel2(it, x, y) AS (
           SELECT 0 AS it, x, y FROM (
             SELECT CAST(a_id AS BIGINT) AS x, CAST(b_id AS BIGINT) AS y FROM p
             UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
           UNION ALL
           SELECT it, x, y FROM (
             WITH prev AS (SELECT * FROM peel2),
               cur AS (SELECT * FROM prev WHERE x <> -1),
               deg AS (SELECT nd, count(*) AS d FROM (
                   SELECT x AS nd FROM cur UNION ALL SELECT y FROM cur) GROUP BY 1),
               keep AS (SELECT nd FROM deg WHERE d >= 2),
               nxt AS (SELECT c.it + 1 AS it, c.x, c.y FROM cur c
                   JOIN keep kx ON c.x = kx.nd JOIN keep ky ON c.y = ky.nd)
             SELECT it, x, y FROM (
               SELECT it, x, y FROM nxt
               UNION ALL
               SELECT (SELECT max(it) + 1 FROM prev),
                 CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
             WHERE (SELECT count(*) FROM nxt) < (SELECT count(*) FROM cur))),
         core2 AS MATERIALIZED (SELECT x, y FROM peel2
           WHERE it = (SELECT max(it) FROM peel2) AND x <> -1),
         peel3(it, x, y) AS (
           SELECT 0 AS it, x, y FROM (
             SELECT x, y FROM core2
             UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
           UNION ALL
           SELECT it, x, y FROM (
             WITH prev AS (SELECT * FROM peel3),
               cur AS (SELECT * FROM prev WHERE x <> -1),
               deg AS (SELECT nd, count(*) AS d FROM (
                   SELECT x AS nd FROM cur UNION ALL SELECT y FROM cur) GROUP BY 1),
               keep AS (SELECT nd FROM deg WHERE d >= 3),
               nxt AS (SELECT c.it + 1 AS it, c.x, c.y FROM cur c
                   JOIN keep kx ON c.x = kx.nd JOIN keep ky ON c.y = ky.nd)
             SELECT it, x, y FROM (
               SELECT it, x, y FROM nxt
               UNION ALL
               SELECT (SELECT max(it) + 1 FROM prev),
                 CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
             WHERE (SELECT count(*) FROM nxt) < (SELECT count(*) FROM cur))),
         core3 AS MATERIALIZED (SELECT x, y FROM peel3
           WHERE it = (SELECT max(it) FROM peel3) AND x <> -1),
         peel4(it, x, y) AS (
           SELECT 0 AS it, x, y FROM (
             SELECT x, y FROM core3
             UNION ALL SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
           UNION ALL
           SELECT it, x, y FROM (
             WITH prev AS (SELECT * FROM peel4),
               cur AS (SELECT * FROM prev WHERE x <> -1),
               deg AS (SELECT nd, count(*) AS d FROM (
                   SELECT x AS nd FROM cur UNION ALL SELECT y FROM cur) GROUP BY 1),
               keep AS (SELECT nd FROM deg WHERE d >= 4),
               nxt AS (SELECT c.it + 1 AS it, c.x, c.y FROM cur c
                   JOIN keep kx ON c.x = kx.nd JOIN keep ky ON c.y = ky.nd)
             SELECT it, x, y FROM (
               SELECT it, x, y FROM nxt
               UNION ALL
               SELECT (SELECT max(it) + 1 FROM prev),
                 CAST(-1 AS BIGINT), CAST(-1 AS BIGINT))
             WHERE (SELECT count(*) FROM nxt) < (SELECT count(*) FROM cur))),
         core4 AS (SELECT x, y FROM peel4
           WHERE it = (SELECT max(it) FROM peel4) AND x <> -1)
         SELECT k, n_nodes, n_edges FROM (
           SELECT CAST(2 AS BIGINT) AS k,
             CAST((SELECT count(*) FROM (SELECT x FROM core2 UNION SELECT y FROM core2)) AS BIGINT) AS n_nodes,
             CAST((SELECT count(*) FROM core2) AS BIGINT) AS n_edges
           UNION ALL
           SELECT CAST(3 AS BIGINT),
             CAST((SELECT count(*) FROM (SELECT x FROM core3 UNION SELECT y FROM core3)) AS BIGINT),
             CAST((SELECT count(*) FROM core3) AS BIGINT)
           UNION ALL
           SELECT CAST(4 AS BIGINT),
             CAST((SELECT count(*) FROM (SELECT x FROM core4 UNION SELECT y FROM core4)) AS BIGINT),
             CAST((SELECT count(*) FROM core4) AS BIGINT))
         ORDER BY k""",

    "graph_triangles" ->
      s"""WITH ${dupPairsSql}
         SELECT p1.a_id AS a, p1.b_id AS b, p2.b_id AS c
         FROM p p1 JOIN p p2 ON p2.a_id = p1.b_id
           JOIN p p3 ON p3.a_id = p1.a_id AND p3.b_id = p2.b_id
         ORDER BY a, b, c""",

    "dedup_simhash_verified" ->
      s"""WITH ${shinglesSql()},
         ${dupCandSql()}
         SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.8 ORDER BY a_id, b_id""",

    "dedup_embedding_cosine" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v)
         SELECT a_id, b_id, round(cos, 6) AS cos_sim FROM (
           SELECT a.vec_id a_id, b.vec_id b_id,
               list_dot_product(a.e, b.e) / (a.nrm * b.nrm) cos
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         WHERE cos >= 0.4 ORDER BY a_id, b_id""",

    "dedup_embedding_lsh" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v)
         SELECT a_id, b_id, round(cos, 6) AS cos_sim FROM (
           SELECT a.vec_id a_id, b.vec_id b_id,
               list_dot_product(a.e, b.e) / (a.nrm * b.nrm) cos
           FROM n a JOIN n b ON a.vec_id < b.vec_id)
         WHERE cos >= 0.4 ORDER BY a_id, b_id""",

    "ann_cosine_topk" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
           p AS (SELECT q.vec_id q_id, x.vec_id neighbor_id,
                     list_dot_product(q.e, x.e) / (q.nrm * x.nrm) cos
                 FROM n q JOIN n x ON x.vec_id != q.vec_id WHERE q.vec_id < 8),
           r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY cos DESC, neighbor_id) rn FROM p)
         SELECT q_id, neighbor_id, round(cos, 6) AS cos_sim, CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= 10 ORDER BY q_id, rn""",

    "sample_hard_negatives" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
           n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) nrm FROM v),
           p AS (SELECT q.vec_id q_id, x.vec_id neighbor_id,
                     list_dot_product(q.e, x.e) / (q.nrm * x.nrm) cos
                 FROM n q JOIN n x ON x.vec_id != q.vec_id WHERE q.vec_id < 8),
           r AS (SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY cos DESC, neighbor_id) rn FROM p)
         SELECT q_id, neighbor_id AS negative_id, round(cos, 6) AS cos_sim,
             CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn > 10 AND rn <= 20 AND cos < 0.95
         ORDER BY q_id, rn""",

    // same decode formula as mm_decode over the arriving delta batch: the
    // payloads are the same BMPs, only the transport differs (real files
    // via binaryFile vs a column)
    "scan_binary_files" ->
      """SELECT doc_id,
             CAST(54 + (((4 + n_chars % 29) * 3 + 3) // 4 * 4) * (4 + n_chars % 17) AS INTEGER) AS n_bytes,
             CAST(4 + n_chars % 29 AS INTEGER) AS width,
             CAST(4 + n_chars % 17 AS INTEGER) AS height,
             CAST(24 AS INTEGER) AS bpp
         FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""",

    "mm_decode" ->
      """SELECT doc_id,
             CAST(54 + (((4 + n_chars % 29) * 3 + 3) // 4 * 4) * (4 + n_chars % 17) AS INTEGER) AS n_bytes,
             CAST(4 + n_chars % 29 AS INTEGER) AS width,
             CAST(4 + n_chars % 17 AS INTEGER) AS height,
             CAST(24 AS INTEGER) AS bpp
         FROM documents ORDER BY doc_id""",

    // full pipeline replay (scale-robust since round 9): hash every doc,
    // union originals with their upscaled re-encodes (identical hash by
    // the proven integer-upscale invariance), then the same 7-block
    // multi-index Hamming join the engine runs — exact block-key
    // candidates, spam-bucket cap 1000 on both sides, hamming ≤ 4 cut.
    // The oracle now FINDS the organic near-dups instead of closed-forming
    // the planted ones, so it is value-exact at sf0.01 AND sf0.1.
    "mm_phash_dedup" ->
      s"""WITH $phashSql,
         sigs AS MATERIALIZED (
           SELECT doc_id AS id, hu, sim FROM phs
           UNION ALL
           SELECT doc_id + 1048576 AS id, hu, sim FROM phs),
         keys AS MATERIALIZED (
           SELECT s.id, s.sim, b.b, (s.hu // b.p2) % b.wd AS bv
           FROM sigs s, $phashBlocksSql),
         okb AS MATERIALIZED (
           SELECT b, bv FROM keys GROUP BY b, bv HAVING count(*) <= 1000)
         SELECT DISTINCT a.id AS a_id, b.id AS b_id,
             CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
         FROM keys a JOIN okb o ON a.b = o.b AND a.bv = o.bv
              JOIN keys b ON b.b = a.b AND b.bv = a.bv AND a.id < b.id
              JOIN okb o2 ON b.b = o2.b AND b.bv = o2.bv
         WHERE bit_count(xor(a.sim, b.sim)) <= 4
         ORDER BY a_id, b_id""",

    // digest clusters == (text, n_chars) clusters: the BMP encoder is
    // deterministic and injective in those inputs
    "mm_exact_dedup" ->
      """WITH c AS (SELECT text, n_chars, count(*) AS sz FROM documents
           GROUP BY 1, 2)
         SELECT CAST(sz AS BIGINT) AS cluster_size,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(sz) AS BIGINT) AS n_payloads,
             CAST(sum(sz - 1) AS BIGINT) AS n_droppable
         FROM c GROUP BY sz ORDER BY cluster_size""",

    // incremental probe replay (scale-robust since round 9): the base
    // index is the ORIGINALS' exact block keys (spam cap on base buckets
    // only — the side whose skew can explode the join); each upscaled
    // arrival probes with its own block keys. new_id = doc_id + 2^20.
    "mm_phash_incremental" -> phashIncrementalOracle,

    // the streaming phash gate probes the same base index through the
    // same block join -- shared oracle
    "stream_phash" -> phashIncrementalOracle,

    "mm_resize" ->
      """SELECT doc_id,
             CAST(4 + n_chars % 29 AS INTEGER) AS src_width,
             CAST(4 + n_chars % 17 AS INTEGER) AS src_height,
             CAST(16 AS INTEGER) AS dst_width,
             CAST(8 AS INTEGER) AS dst_height,
             CAST(54 + 8 * 48 AS INTEGER) AS n_bytes
         FROM documents ORDER BY doc_id""",

    "mm_frame_sample" ->
      """SELECT doc_id,
             CAST(4 + n_chars % 17 AS INTEGER) AS n_frames,
             CAST((4 + n_chars % 17 + 3) // 4 AS INTEGER) AS n_sampled,
             CAST(((4 + n_chars % 29) * 3 + 3) // 4 * 4 AS INTEGER) AS frame_bytes
         FROM documents ORDER BY doc_id""",

    "scan_parquet" ->
      """SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
             CAST(count(*) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "funnel_flagship" ->
      """WITH latest AS (
           SELECT * FROM (SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts DESC, event_id DESC) AS rn
                 FROM events WHERE ts >= TIMESTAMP '2024-01-10')
           WHERE rn = 1)
         SELECT c.c_mktsegment AS mktsegment,
             CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
             CAST(count(CASE WHEN e.event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
             CAST(count(CASE WHEN e.event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
             CAST(CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM latest e JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY mktsegment""",

    "window_ranks" ->
      """SELECT event_id, user_id,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             round(percent_rank() OVER w, 6) AS prank,
             round(cume_dist() OVER w, 6) AS cdist,
             CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id)
                  AS BIGINT) AS q4
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY value)
         ORDER BY event_id""",

    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           sizes AS (SELECT c, CAST(count(*) AS BIGINT) cluster_size FROM comp GROUP BY c),
           hist AS (
             SELECT cluster_size, CAST(count(*) AS BIGINT) n_clusters
             FROM sizes GROUP BY cluster_size
             UNION ALL
             SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT)
             FROM documents WHERE doc_id NOT IN (SELECT id FROM comp))
         SELECT cluster_size, n_clusters, cluster_size * n_clusters AS n_docs
         FROM hist WHERE n_clusters > 0 ORDER BY cluster_size""",

    "graph_bfs" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           walk(id, d) AS (
             SELECT DISTINCT u, 0 FROM e WHERE u % 10 = 0
             UNION
             SELECT e2.v, walk.d + 1 FROM walk JOIN e e2 ON e2.u = walk.id
             WHERE walk.d < 4)
         SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(d) AS BIGINT) AS dist
         FROM walk GROUP BY id ORDER BY doc_id""",

    "graph_modularity" ->
      s"""WITH ${dupPairsSql},
           lab AS (SELECT p.a_id, p.b_id, da.lang AS la, db.lang AS lb
             FROM p JOIN documents da ON p.a_id = da.doc_id
                    JOIN documents db ON p.b_id = db.doc_id),
           intra AS (SELECT la AS lang, count(*) AS e FROM lab
             WHERE la = lb GROUP BY 1),
           stubs AS (SELECT lang, count(*) AS d FROM
             (SELECT la AS lang FROM lab UNION ALL SELECT lb FROM lab)
             GROUP BY 1),
           mm AS (SELECT count(*) AS m FROM p)
         SELECT s.lang, CAST(coalesce(i.e, 0) AS BIGINT) AS intra_edges,
             CAST(s.d AS BIGINT) AS stubs,
             CAST(4*mm.m*coalesce(i.e, 0) - s.d*s.d AS BIGINT) AS q_num,
             CAST(4*mm.m*mm.m AS BIGINT) AS q_den,
             round(CAST(4*mm.m*coalesce(i.e, 0) - s.d*s.d AS DOUBLE) /
               CAST(4*mm.m*mm.m AS DOUBLE), 9) AS q_term
         FROM stubs s LEFT JOIN intra i USING (lang), mm
         ORDER BY s.lang""",

    "embed_quantize" ->
      """WITH e AS (SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS m
           FROM embeddings),
           st AS (SELECT dim, min(m) mn, max(m) mx FROM e GROUP BY dim),
           c AS (SELECT e.vec_id, e.m, st.mn, st.mx,
               CASE WHEN st.mx = st.mn THEN 0
                    ELSE ((e.m - st.mn) * 255) // (st.mx - st.mn) END AS code
             FROM e JOIN st USING (dim)),
           d AS (SELECT vec_id, m, code,
               CASE WHEN mx = mn THEN mn
                    ELSE mn + (code * (mx - mn)) // 255 END AS deq
             FROM c)
         SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
             CAST(sum(abs(m - deq)) AS BIGINT) AS l1_err_micro,
             CAST(max(abs(m - deq)) AS BIGINT) AS linf_err_micro,
             CAST(sum(code) AS BIGINT) AS code_sum
         FROM d GROUP BY vec_id ORDER BY vec_id""",

    "graph_clustering_coeff" ->
      s"""WITH ${dupPairsSql},
           und AS (SELECT a_id u, b_id w FROM p
             UNION ALL SELECT b_id, a_id FROM p),
           deg AS (SELECT u AS node, count(*) AS d FROM und GROUP BY 1),
           tri AS (SELECT w1.u AS node, count(*) AS tr
             FROM und w1 JOIN und w2 ON w1.u = w2.u AND w1.w < w2.w
             JOIN p ON p.a_id = w1.w AND p.b_id = w2.w GROUP BY 1)
         SELECT deg.node AS doc_id, CAST(deg.d AS BIGINT) AS deg,
             CAST(coalesce(tri.tr, 0) AS BIGINT) AS tri,
             round(CAST(2 * coalesce(tri.tr, 0) AS DOUBLE) /
               CAST(deg.d * (deg.d - 1) AS DOUBLE), 6) AS coeff
         FROM deg LEFT JOIN tri USING (node)
         WHERE deg.d >= 2 ORDER BY doc_id""",

    "trend_mann_kendall" ->
      """WITH d AS (SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS dd, count(*) AS x
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         s AS (SELECT a.event_type,
             sum(CAST(sign(b.x - a.x) AS BIGINT)) AS s
           FROM d a JOIN d b ON a.event_type = b.event_type AND a.dd < b.dd
           GROUP BY 1),
         ties AS (SELECT event_type, sum(tcnt) AS n,
             sum(tcnt * (tcnt - 1) * (2 * tcnt + 5)) AS tie18
           FROM (SELECT event_type, x, count(*) AS tcnt FROM d GROUP BY 1, 2)
           GROUP BY 1)
         SELECT s.event_type, CAST(ties.n AS BIGINT) AS n,
             CAST(s.s AS BIGINT) AS s,
             CAST(ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie18
               AS BIGINT) AS var18,
             round((CASE WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
                    WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
                    ELSE 0e0 END) /
               sqrt(CAST(ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie18
                 AS DOUBLE) / 18e0), 6) AS z
         FROM s JOIN ties USING (event_type) ORDER BY s.event_type""",

    "sink_quarantine" ->
      """WITH f AS (SELECT
             (user_id IS NULL) AS f_user_null,
             coalesce(event_type NOT IN
               ('view','click','purchase','signup','error'), TRUE)
               AS f_type_unknown,
             coalesce(CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-01' OR
               CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-02-01', TRUE)
               AS f_ts_range,
             coalesce(CAST(value AS DECIMAL(12,2)) <= 0, FALSE)
               AS f_value_nonpos
           FROM events)
         SELECT
             CAST(sum(CASE WHEN NOT (f_user_null OR f_type_unknown OR
               f_ts_range OR f_value_nonpos) THEN 1 ELSE 0 END) AS BIGINT)
               AS n_valid,
             CAST(sum(CASE WHEN f_user_null OR f_type_unknown OR
               f_ts_range OR f_value_nonpos THEN 1 ELSE 0 END) AS BIGINT)
               AS n_quarantined,
             CAST(sum(CASE WHEN f_user_null THEN 1 ELSE 0 END) AS BIGINT)
               AS q_user_null,
             CAST(sum(CASE WHEN f_type_unknown THEN 1 ELSE 0 END) AS BIGINT)
               AS q_type_unknown,
             CAST(sum(CASE WHEN f_ts_range THEN 1 ELSE 0 END) AS BIGINT)
               AS q_ts_range,
             CAST(sum(CASE WHEN f_value_nonpos THEN 1 ELSE 0 END) AS BIGINT)
               AS q_value_nonpos
         FROM f""",

    "dq_srm" ->
      """WITH arms AS (SELECT CASE WHEN
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 1))::UBIGINT
               % 2 = 0 THEN 'A' ELSE 'B' END AS arm
           FROM (SELECT DISTINCT user_id FROM events)),
         c AS (SELECT arm, count(*) AS n FROM arms GROUP BY 1)
         SELECT CAST(sum(CASE WHEN arm = 'A' THEN n END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN arm = 'B' THEN n END) AS BIGINT) AS n_b,
             round(CAST((sum(CASE WHEN arm = 'A' THEN n END) -
                 sum(CASE WHEN arm = 'B' THEN n END)) *
                 (sum(CASE WHEN arm = 'A' THEN n END) -
                 sum(CASE WHEN arm = 'B' THEN n END)) AS DOUBLE) /
               CAST(sum(CASE WHEN arm = 'A' THEN n END) +
                 sum(CASE WHEN arm = 'B' THEN n END) AS DOUBLE), 6) AS chi2
         FROM c""",

    "trend_theilsen" ->
      """WITH d AS (SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS x, count(*) AS y
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
           s AS (SELECT a.event_type, b.y - a.y AS p, b.x - a.x AS q,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS sval
             FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x),
           r AS (SELECT event_type, p, q,
               row_number() OVER (PARTITION BY event_type
                 ORDER BY sval, p, q) AS rn,
               count(*) OVER (PARTITION BY event_type) AS cnt
             FROM s),
           mid AS (SELECT * FROM r
             WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2),
           agg AS (SELECT event_type, max(cnt) AS n_pairs,
               count(*) AS n_mid,
               min_by(p, rn) AS p1, min_by(q, rn) AS q1,
               max_by(p, rn) AS p2, max_by(q, rn) AS q2
             FROM mid GROUP BY event_type)
         SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
             CAST(CASE WHEN n_mid = 2 THEN p1*q2 + p2*q1 ELSE p1 END
               AS BIGINT) AS med_num,
             CAST(CASE WHEN n_mid = 2 THEN 2*q1*q2 ELSE q1 END
               AS BIGINT) AS med_den,
             round(CAST(CASE WHEN n_mid = 2 THEN p1*q2 + p2*q1 ELSE p1 END
                 AS DOUBLE) /
               CAST(CASE WHEN n_mid = 2 THEN 2*q1*q2 ELSE q1 END
                 AS DOUBLE), 9) AS slope
         FROM agg ORDER BY event_type""",

    "eval_confusion" ->
      """WITH s AS (SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), x -> x = 'the')) s_en,
             len(list_filter(string_split(text,' '), x -> x = 'a')) s_es,
             len(list_filter(string_split(text,' '), x -> x = 'data')) s_de,
             len(list_filter(string_split(text,' '), x -> x = 'key')) s_fr,
             len(list_filter(string_split(text,' '), x -> x = 'spark')) s_zh
           FROM documents),
           pr AS (SELECT lang,
             CASE WHEN s_en = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'en'
                  WHEN s_es = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'es'
                  WHEN s_de = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'de'
                  WHEN s_fr = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'fr'
                  ELSE 'zh' END AS predicted_lang
           FROM s),
           cells AS (SELECT lang, predicted_lang, count(*) AS n
             FROM pr GROUP BY 1, 2),
           tot AS (SELECT lang, sum(n) AS n_true FROM cells GROUP BY 1)
         SELECT c.lang, c.predicted_lang, CAST(c.n AS BIGINT) AS n,
             CAST(t.n_true AS BIGINT) AS n_true,
             round(CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE), 6)
               AS share_of_true
         FROM cells c JOIN tot t USING (lang)
         ORDER BY c.lang, c.predicted_lang""",

    // the streaming maintained confusion-cell MV derives through the same
    // confusionShares as the batch query -- shared oracle
    "stream_confusion" ->
      """WITH s AS (SELECT doc_id, lang,
             len(list_filter(string_split(text,' '), x -> x = 'the')) s_en,
             len(list_filter(string_split(text,' '), x -> x = 'a')) s_es,
             len(list_filter(string_split(text,' '), x -> x = 'data')) s_de,
             len(list_filter(string_split(text,' '), x -> x = 'key')) s_fr,
             len(list_filter(string_split(text,' '), x -> x = 'spark')) s_zh
           FROM documents),
           pr AS (SELECT lang,
             CASE WHEN s_en = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'en'
                  WHEN s_es = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'es'
                  WHEN s_de = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'de'
                  WHEN s_fr = greatest(s_en,s_es,s_de,s_fr,s_zh) THEN 'fr'
                  ELSE 'zh' END AS predicted_lang
           FROM s),
           cells AS (SELECT lang, predicted_lang, count(*) AS n
             FROM pr GROUP BY 1, 2),
           tot AS (SELECT lang, sum(n) AS n_true FROM cells GROUP BY 1)
         SELECT c.lang, c.predicted_lang, CAST(c.n AS BIGINT) AS n,
             CAST(t.n_true AS BIGINT) AS n_true,
             round(CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE), 6)
               AS share_of_true
         FROM cells c JOIN tot t USING (lang)
         ORDER BY c.lang, c.predicted_lang""",

    "forecast_holt" ->
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS actual FROM events GROUP BY 1, 2),
         train AS MATERIALIZED (SELECT event_type, day, actual,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
           FROM d WHERE day <= DATE '2024-01-23'),
         n AS (SELECT event_type, max(i) AS ni FROM train GROUP BY 1),
         b0 AS MATERIALIZED (SELECT a.event_type,
             CAST(b.actual AS DOUBLE) - CAST(a.actual AS DOUBLE) AS b
           FROM train a JOIN train b
             ON a.event_type = b.event_type AND a.i = 1 AND b.i = 2),
         h(event_type, i, l, b) AS (
           SELECT tr.event_type, 1, CAST(tr.actual AS DOUBLE), b0.b
           FROM train tr JOIN b0 ON b0.event_type = tr.event_type
           WHERE tr.i = 1
           UNION ALL
           SELECT h.event_type, h.i + 1,
             0.5*CAST(tr.actual AS DOUBLE) + 0.5*(h.l + h.b),
             0.3*((0.5*CAST(tr.actual AS DOUBLE) + 0.5*(h.l + h.b)) - h.l)
               + 0.7*h.b
           FROM h JOIN train tr
             ON tr.event_type = h.event_type AND tr.i = h.i + 1),
         fit AS (SELECT h.event_type, h.l, h.b FROM h
           JOIN n ON n.event_type = h.event_type AND h.i = n.ni)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
             CAST(d.actual AS BIGINT) AS actual,
             round(f.l + CAST(datediff('day', DATE '2024-01-23', d.day)
               AS DOUBLE) * f.b, 6) AS yhat,
             round(abs(CAST(d.actual AS DOUBLE) -
               (f.l + CAST(datediff('day', DATE '2024-01-23', d.day)
                 AS DOUBLE) * f.b)), 6) AS abs_err
         FROM d JOIN fit f ON f.event_type = d.event_type
         WHERE d.day > DATE '2024-01-23'
         ORDER BY d.event_type, d.day""",

    "dq_mannwhitney" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         per AS (SELECT cents, count(*) AS m FROM v GROUP BY 1),
         cum AS (SELECT cents, m,
             sum(m) OVER (ORDER BY cents) - m AS cb FROM per),
         pt AS (SELECT cents, event_type, count(*) AS na FROM v GROUP BY 1,2),
         r AS (SELECT pt.event_type,
             CAST(sum(pt.na) AS BIGINT) AS n_a,
             CAST(sum(pt.na * (2*cum.cb + cum.m + 1)) AS BIGINT) AS r2
           FROM pt JOIN cum USING (cents) GROUP BY 1),
         g AS (SELECT CAST(sum(m) AS BIGINT) AS nall,
             CAST(sum(m*m*m - m) AS BIGINT) AS tie FROM per)
         SELECT r.event_type, r.n_a,
             CAST(g.nall - r.n_a AS BIGINT) AS n_b,
             CAST(r.r2 - r.n_a*(r.n_a+1) AS BIGINT) AS u2,
             round((CAST(r.r2 - r.n_a*(r.n_a+1) AS DOUBLE) / 2.0 -
                 CAST(r.n_a AS DOUBLE) * CAST(g.nall - r.n_a AS DOUBLE) / 2.0) /
               sqrt(CAST(r.n_a AS DOUBLE) * CAST(g.nall - r.n_a AS DOUBLE) / 12.0 *
                 ((CAST(g.nall AS DOUBLE) + 1.0) -
                   CAST(g.tie AS DOUBLE) /
                     (CAST(g.nall AS DOUBLE) * (CAST(g.nall AS DOUBLE) - 1.0)))), 6)
               AS z
         FROM r, g ORDER BY r.event_type""",

    "dedup_components" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id)
         SELECT CAST(id AS BIGINT) AS doc_id, CAST(c AS BIGINT) AS component,
             CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS n_members
         FROM comp ORDER BY doc_id""",

    "dedup_components_cold" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id)
         SELECT CAST(id AS BIGINT) AS doc_id, CAST(c AS BIGINT) AS component,
             CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS n_members
         FROM comp ORDER BY doc_id""",

    "dedup_components_star" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id)
         SELECT CAST(id AS BIGINT) AS doc_id, CAST(c AS BIGINT) AS component,
             CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS n_members
         FROM comp ORDER BY doc_id""",

    "dedup_apply_cc" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> c)
         GROUP BY lang ORDER BY lang""",

    // the streaming maintained soft-dedup MV derives the identical census
    // on read, so it shares sample_soft_dedup's oracle verbatim
    "dq_sprt" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS n,
             sum(CASE WHEN CAST(CAST(value AS DECIMAL(12,2)) * 100
               AS BIGINT) >= 20000 THEN 1 ELSE 0 END) AS k
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         base AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n0,
             CAST(sum(k) AS BIGINT) AS k0
           FROM daily WHERE day < DATE '2024-01-11' GROUP BY 1),
         cum AS (SELECT event_type, day,
             CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS nt,
             CAST(sum(k) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS kt
           FROM daily WHERE day >= DATE '2024-01-11'),
         j AS (SELECT c.event_type, c.day, c.nt, c.kt,
             CAST(c.kt AS DOUBLE) * ln(1.2) +
               (CAST(c.nt AS DOUBLE) - CAST(c.kt AS DOUBLE)) *
               ln((10.0 * CAST(b.n0 AS DOUBLE)
                   - 12.0 * CAST(b.k0 AS DOUBLE))
                 / (10.0 * (CAST(b.n0 AS DOUBLE)
                   - CAST(b.k0 AS DOUBLE)))) AS llr
           FROM cum c JOIN base b USING (event_type))
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, nt, kt,
             round(llr, 6) AS llr,
             CASE WHEN llr >= ln(19.0) THEN 'reject_h0'
               WHEN llr <= -ln(19.0) THEN 'accept_h0'
               ELSE 'continue' END AS decision
         FROM j ORDER BY event_type, day""",

    "sample_weighted" ->
      """WITH v AS (SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         vp AS (SELECT * FROM v WHERE cents > 0),
         k AS (SELECT *,
             ln(CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                 1, 12))::UBIGINT AS BIGINT) + 1 AS DOUBLE)
               / 281474976710657.0) / CAST(cents AS DOUBLE) AS k
           FROM vp),
         top AS (SELECT * FROM k ORDER BY k DESC, event_id LIMIT 200)
         SELECT event_id, event_type, cents, round(k, 12) AS key
         FROM top ORDER BY event_id""",

    // the streaming maintained A-ES candidate fold derives the identical
    // draw on read, so it shares sample_weighted's oracle verbatim
    "stream_weighted_sample" ->
      """WITH v AS (SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         vp AS (SELECT * FROM v WHERE cents > 0),
         k AS (SELECT *,
             ln(CAST(CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)),
                 1, 12))::UBIGINT AS BIGINT) + 1 AS DOUBLE)
               / 281474976710657.0) / CAST(cents AS DOUBLE) AS k
           FROM vp),
         top AS (SELECT * FROM k ORDER BY k DESC, event_id LIMIT 200)
         SELECT event_id, event_type, cents, round(k, 12) AS key
         FROM top ORDER BY event_id""",

    "feature_target_encode" ->
      """WITH v AS (SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
           FROM events WHERE value IS NOT NULL),
         per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(x) AS BIGINT) AS sg FROM v GROUP BY 1),
         tot AS (SELECT CAST(sum(ng) AS BIGINT) AS nn,
             CAST(sum(sg) AS BIGINT) AS ss FROM per)
         SELECT v.event_id, v.event_type,
             round(CAST((per.sg - v.x) * t.nn + 10 * t.ss AS DOUBLE)
               / CAST(t.nn * (per.ng + 9) AS DOUBLE), 6) AS enc
         FROM v JOIN per USING (event_type), tot t
         ORDER BY v.event_id""",

    // the streaming maintained feature table derives the identical
    // smoothed encodings on read from the folded (n, s) cells
    "stream_feature_encode" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
           FROM events WHERE value IS NOT NULL),
         per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s FROM v GROUP BY 1),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
             CAST(sum(s) AS BIGINT) AS ss FROM per)
         SELECT per.event_type, per.n, per.s,
             round(CAST(per.s * t.nn + 10 * t.ss AS DOUBLE)
               / CAST(t.nn * (per.n + 10) AS DOUBLE), 6) AS enc
         FROM per, tot t ORDER BY per.event_type""",

    "agg_lorenz" ->
      """WITH per AS (SELECT o_custkey,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS c
           FROM orders GROUP BY 1),
         tiled AS (SELECT c,
             CAST(ntile(10) OVER (ORDER BY c, o_custkey) AS BIGINT)
               AS decile FROM per),
         dec AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(c) AS BIGINT) AS decile_cents
           FROM tiled GROUP BY 1),
         cum AS (SELECT decile, n_customers, decile_cents,
             CAST(sum(decile_cents) OVER (ORDER BY decile) AS BIGINT)
               AS cum_cents FROM dec),
         tot AS (SELECT CAST(sum(decile_cents) AS BIGINT) AS tt FROM dec)
         SELECT decile, n_customers, decile_cents,
             CAST((cum_cents * 1000000) // tt AS BIGINT) AS cum_share_ppm
         FROM cum, tot ORDER BY decile""",

    "dq_table_diff" ->
      """WITH old AS (SELECT c_custkey, c_name AS o_name,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,4))
               AS DOUBLE) AS o_bal,
             c_mktsegment AS o_seg
           FROM customer),
         updates AS (SELECT c_custkey, c_name,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) + 1000
               AS DECIMAL(18,4)) AS DOUBLE) AS acctbal,
             c_mktsegment
           FROM customer WHERE c_custkey % 10 = 0),
         inserts AS (SELECT c_custkey + 1000000 AS c_custkey, c_name,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,4))
               AS DOUBLE) AS acctbal,
             c_mktsegment
           FROM customer WHERE c_custkey <= 5),
         merged AS (SELECT c_custkey, c_name,
             CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DECIMAL(18,4))
               AS DOUBLE) AS acctbal, c_mktsegment
           FROM customer WHERE c_custkey % 10 <> 0
           UNION ALL SELECT * FROM updates
           UNION ALL SELECT * FROM inserts),
         neu AS (SELECT c_custkey, c_name AS n_name, acctbal AS n_bal,
             c_mktsegment AS n_seg
           FROM merged WHERE c_custkey % 97 <> 3),
         j AS (SELECT
             CASE WHEN o.o_name IS NULL THEN 'added'
               WHEN n.n_name IS NULL THEN 'removed'
               WHEN o.o_name <> n.n_name OR o.o_bal <> n.n_bal
                 OR o.o_seg <> n.n_seg THEN 'changed'
               ELSE 'unchanged' END AS status,
             CASE WHEN o.o_name <> n.n_name THEN 1 ELSE 0 END AS dn,
             CASE WHEN o.o_bal <> n.n_bal THEN 1 ELSE 0 END AS db,
             CASE WHEN o.o_seg <> n.n_seg THEN 1 ELSE 0 END AS ds
           FROM old o FULL OUTER JOIN neu n USING (c_custkey))
         SELECT status, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(dn) AS BIGINT) AS n_name_diff,
             CAST(sum(db) AS BIGINT) AS n_acctbal_diff,
             CAST(sum(ds) AS BIGINT) AS n_mktsegment_diff
         FROM j GROUP BY 1 ORDER BY 1""",

    "join_dpp_pruned" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
         FROM events
         -- NOT an IN list: DuckDB 1.0 IN-coerces the TIMESTAMP_NS column
         -- against the DATE list and matches nothing; equality is fine
         WHERE CAST(ts AS DATE) = DATE '2024-01-05'
            OR CAST(ts AS DATE) = DATE '2024-01-12'
            OR CAST(ts AS DATE) = DATE '2024-01-19'
         GROUP BY 1 ORDER BY 1""",

    "sample_preference_pairs" ->
      """WITH scored AS (SELECT doc_id, lang, source,
             CAST(floor(1000000.0 *
               len(list_distinct(string_split(text, ' '))) /
               len(string_split(text, ' '))) AS BIGINT) AS score_ppm
           FROM documents),
         m AS (SELECT *,
             count(*) OVER (PARTITION BY lang, source) AS n_docs,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY score_ppm DESC, doc_id) AS rb,
             row_number() OVER (PARTITION BY lang, source
               ORDER BY score_ppm, doc_id DESC) AS rw
           FROM scored)
         SELECT c.lang, c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
             c.doc_id AS chosen_id, c.score_ppm AS chosen_ppm,
             w.doc_id AS rejected_id, w.score_ppm AS rejected_ppm,
             c.score_ppm - w.score_ppm AS gap_ppm
         FROM (SELECT * FROM m WHERE rb = 1 AND n_docs >= 2) c
         JOIN (SELECT * FROM m WHERE rw = 1) w USING (lang, source)
         ORDER BY c.lang, c.source""",

    "eval_ndcg" ->
      """WITH q(query_id, term_idx, term) AS (VALUES
             (1,1,'spark'),(1,2,'join'),(2,1,'hash'),(2,2,'merge'),
             (2,3,'batch'),(3,1,'vector'),(3,2,'scan')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1,2),
         dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
         dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs, sum(len) AS total_len FROM dl),
         term AS (SELECT qq.query_id, qq.term_idx, f.doc_id,
             ((22e0 * f.tf * t.total_len) /
              (10 * f.tf * t.total_len + 3 * t.total_len + 9 * d.len * t.n_docs)) *
             ((2 * t.n_docs - 2 * v.df + 1) / (2 * v.df + 1)) AS s
           FROM tf f JOIN q qq ON f.tok = qq.term
           JOIN dl d ON f.doc_id = d.doc_id
           JOIN dfv v ON f.tok = v.tok CROSS JOIN tot t),
         sc AS (SELECT query_id, doc_id,
             coalesce(max(CASE WHEN term_idx=1 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=2 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=3 THEN s END), 0e0) AS score
           FROM term GROUP BY 1,2),
         r AS (SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rnk
           FROM sc),
         rel AS (SELECT qq.query_id, f.doc_id,
             count(DISTINCT qq.term) AS rel
           FROM tf f JOIN q qq ON f.tok = qq.term GROUP BY 1, 2),
         gret AS (SELECT r.query_id, r.rnk,
             CASE WHEN rel.rel = 1 THEN 1 WHEN rel.rel = 2 THEN 3
               WHEN rel.rel = 3 THEN 7 ELSE 0 END AS g
           FROM r LEFT JOIN rel ON r.query_id = rel.query_id
             AND r.doc_id = rel.doc_id
           WHERE r.rnk <= 5),
         gp AS (SELECT query_id,
             CAST(coalesce(max(CASE WHEN rnk=1 THEN g END), 0) AS BIGINT) AS g1,
             CAST(coalesce(max(CASE WHEN rnk=2 THEN g END), 0) AS BIGINT) AS g2,
             CAST(coalesce(max(CASE WHEN rnk=3 THEN g END), 0) AS BIGINT) AS g3,
             CAST(coalesce(max(CASE WHEN rnk=4 THEN g END), 0) AS BIGINT) AS g4,
             CAST(coalesce(max(CASE WHEN rnk=5 THEN g END), 0) AS BIGINT) AS g5
           FROM gret GROUP BY 1),
         irk AS (SELECT query_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY rel DESC, doc_id) AS irn,
             CASE WHEN rel = 1 THEN 1 WHEN rel = 2 THEN 3
               WHEN rel = 3 THEN 7 ELSE 0 END AS g
           FROM rel),
         ip AS (SELECT query_id,
             CAST(coalesce(max(CASE WHEN irn=1 THEN g END), 0) AS BIGINT) AS i1,
             CAST(coalesce(max(CASE WHEN irn=2 THEN g END), 0) AS BIGINT) AS i2,
             CAST(coalesce(max(CASE WHEN irn=3 THEN g END), 0) AS BIGINT) AS i3,
             CAST(coalesce(max(CASE WHEN irn=4 THEN g END), 0) AS BIGINT) AS i4,
             CAST(coalesce(max(CASE WHEN irn=5 THEN g END), 0) AS BIGINT) AS i5
           FROM irk WHERE irn <= 5 GROUP BY 1)
         SELECT CAST(gp.query_id AS BIGINT) AS query_id,
             CAST(g1 + g2 + g3 + g4 + g5 AS BIGINT) AS gain_sum,
             round(CAST(g1 AS DOUBLE)
               + CAST(g2 AS DOUBLE) / 1.584962500721156
               + CAST(g3 AS DOUBLE) / 2.0
               + CAST(g4 AS DOUBLE) / 2.321928094887362
               + CAST(g5 AS DOUBLE) / 2.584962500721156, 6) AS dcg,
             round(CAST(i1 AS DOUBLE)
               + CAST(i2 AS DOUBLE) / 1.584962500721156
               + CAST(i3 AS DOUBLE) / 2.0
               + CAST(i4 AS DOUBLE) / 2.321928094887362
               + CAST(i5 AS DOUBLE) / 2.584962500721156, 6) AS idcg,
             round((CAST(g1 AS DOUBLE)
               + CAST(g2 AS DOUBLE) / 1.584962500721156
               + CAST(g3 AS DOUBLE) / 2.0
               + CAST(g4 AS DOUBLE) / 2.321928094887362
               + CAST(g5 AS DOUBLE) / 2.584962500721156)
               / (CAST(i1 AS DOUBLE)
               + CAST(i2 AS DOUBLE) / 1.584962500721156
               + CAST(i3 AS DOUBLE) / 2.0
               + CAST(i4 AS DOUBLE) / 2.321928094887362
               + CAST(i5 AS DOUBLE) / 2.584962500721156), 6) AS ndcg
         FROM gp JOIN ip ON gp.query_id = ip.query_id
         ORDER BY query_id""",

    "dq_adf" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS y FROM events GROUP BY 1, 2),
         lagd AS (SELECT event_type, day, y,
             lag(y) OVER (PARTITION BY event_type ORDER BY day) AS x
           FROM daily),
         p AS (SELECT event_type, x, y - x AS z FROM lagd
           WHERE x IS NOT NULL),
         a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(z*z) AS BIGINT) AS szz,
             CAST(sum(x*z) AS BIGINT) AS sxz
           FROM p GROUP BY 1),
         c AS (SELECT event_type, m,
             CAST(m*sxz - sx*sz AS BIGINT) AS a,
             CAST(m*sxx - sx*sx AS BIGINT) AS b,
             CAST(m*szz - sz*sz AS BIGINT) AS c
           FROM a)
         SELECT event_type, m, a, b, c,
             round(CAST(a AS DOUBLE) * sqrt((CAST(m AS DOUBLE) - 2.0)
               / (CAST(c AS DOUBLE) * CAST(b AS DOUBLE)
                 - CAST(a AS DOUBLE) * CAST(a AS DOUBLE))), 6) AS t_stat
         FROM c ORDER BY event_type""",

// the streaming maintained daily-count MV derives the identical
    // Dickey-Fuller statistic on read, sharing dq_adf's oracle verbatim
    "stream_adf" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS y FROM events GROUP BY 1, 2),
         lagd AS (SELECT event_type, day, y,
             lag(y) OVER (PARTITION BY event_type ORDER BY day) AS x
           FROM daily),
         p AS (SELECT event_type, x, y - x AS z FROM lagd
           WHERE x IS NOT NULL),
         a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(z) AS BIGINT) AS sz,
             CAST(sum(x*x) AS BIGINT) AS sxx,
             CAST(sum(z*z) AS BIGINT) AS szz,
             CAST(sum(x*z) AS BIGINT) AS sxz
           FROM p GROUP BY 1),
         c AS (SELECT event_type, m,
             CAST(m*sxz - sx*sz AS BIGINT) AS a,
             CAST(m*sxx - sx*sx AS BIGINT) AS b,
             CAST(m*szz - sz*sz AS BIGINT) AS c
           FROM a)
         SELECT event_type, m, a, b, c,
             round(CAST(a AS DOUBLE) * sqrt((CAST(m AS DOUBLE) - 2.0)
               / (CAST(c AS DOUBLE) * CAST(b AS DOUBLE)
                 - CAST(a AS DOUBLE) * CAST(a AS DOUBLE))), 6) AS t_stat
         FROM c ORDER BY event_type""",

    "split_group_safe" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           lab AS (SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS cluster
             FROM documents d LEFT JOIN comp ON d.doc_id = comp.id)
         SELECT doc_id, cluster,
             CAST(CASE WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2) < '40' THEN 0
               WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2) < '80' THEN 1
               WHEN substr(md5(CAST(cluster AS VARCHAR)), 1, 2) < 'c0' THEN 2
               ELSE 3 END AS BIGINT) AS fold
         FROM lab ORDER BY doc_id""",

    "dedup_cluster_density" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           sizes AS (SELECT c, count(*) AS sz FROM comp GROUP BY 1),
           edges AS (SELECT comp.c, count(*) AS e
             FROM p JOIN comp ON p.a_id = comp.id GROUP BY 1),
           per AS (SELECT s.sz, coalesce(edges.e, 0) AS e
             FROM sizes s LEFT JOIN edges ON s.c = edges.c),
           band AS (SELECT sz AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(e) AS BIGINT) AS n_edges
             FROM per WHERE sz >= 2 GROUP BY 1)
         SELECT cluster_size, n_clusters, n_edges,
             CAST((n_edges * 2000000) // (n_clusters * cluster_size *
               (cluster_size - 1)) AS BIGINT) AS density_ppm
         FROM band ORDER BY cluster_size""",

    "dq_power" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
           FROM events WHERE value IS NOT NULL),
         a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(x*x) AS BIGINT) AS sxx
           FROM v GROUP BY 1)
         SELECT event_type, n,
             round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS mean_cents,
             round((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6)
               AS var_cents,
             CAST(ceil(7.84886698
               * (2.0 * ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
               / ((0.05 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
                 * (0.05 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))))
               AS BIGINT) AS n_per_arm
         FROM a ORDER BY event_type""",

    // the streaming maintained k-anonymity MV derives the identical
    // census on read, so it shares dq_kanonymity's oracle verbatim
    "stream_kanonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 500)
               AS BIGINT) AS band,
             count(*) AS sz
           FROM customer GROUP BY 1, 2, 3),
         one AS (SELECT
             CAST(sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
             CAST(sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS r5,
             CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS g10,
             CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
               AS r10,
             CAST(sum(CASE WHEN sz < 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS g25,
             CAST(sum(CASE WHEN sz < 25 THEN sz ELSE 0 END) AS BIGINT)
               AS r25,
             CAST(sum(sz) AS BIGINT) AS total FROM g)
         SELECT k, n_groups_below, n_rows_below, total,
             CAST((n_rows_below * 1000000) // total AS BIGINT)
               AS share_ppm
         FROM (
           SELECT CAST(2 AS BIGINT) AS k, g2 AS n_groups_below,
               r2 AS n_rows_below, total FROM one
           UNION ALL SELECT CAST(5 AS BIGINT), g5, r5, total FROM one
           UNION ALL SELECT CAST(10 AS BIGINT), g10, r10, total FROM one
           UNION ALL SELECT CAST(25 AS BIGINT), g25, r25, total FROM one)
         ORDER BY k""",

    "dq_kruskal" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT event_type, cents, count(*) AS cnt
           FROM v GROUP BY 1, 2),
         per AS (SELECT cents, sum(cnt) AS m FROM grid GROUP BY 1),
         cum AS (SELECT cents, m,
             sum(m) OVER (ORDER BY cents) - m AS cb FROM per),
         r AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_a,
             CAST(sum(cnt * (2*cb + m + 1)) AS BIGINT) AS r2
           FROM grid JOIN cum USING (cents) GROUP BY 1),
         g AS (SELECT CAST(sum(m) AS BIGINT) AS nall,
             CAST(sum(m*m*m - m) AS BIGINT) AS tie FROM per),
         one AS (SELECT
             CAST(sum(CASE WHEN event_type = 'click' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_click,
             CAST(sum(CASE WHEN event_type = 'click' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'error' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_error,
             CAST(sum(CASE WHEN event_type = 'error' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_purchase,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_signup,
             CAST(sum(CASE WHEN event_type = 'signup' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_view,
             CAST(sum(CASE WHEN event_type = 'view' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_view
           FROM r),
         oneb AS (SELECT o.*, g.nall, g.tie,
             CAST(o.r_click AS DOUBLE) * CAST(o.r_click AS DOUBLE)
               / CAST(o.n_click AS DOUBLE)
             + CAST(o.r_error AS DOUBLE) * CAST(o.r_error AS DOUBLE)
               / CAST(o.n_error AS DOUBLE)
             + CAST(o.r_purchase AS DOUBLE) * CAST(o.r_purchase AS DOUBLE)
               / CAST(o.n_purchase AS DOUBLE)
             + CAST(o.r_signup AS DOUBLE) * CAST(o.r_signup AS DOUBLE)
               / CAST(o.n_signup AS DOUBLE)
             + CAST(o.r_view AS DOUBLE) * CAST(o.r_view AS DOUBLE)
               / CAST(o.n_view AS DOUBLE) AS b
           FROM one o, g)
         SELECT r.event_type, r.n_a, r.r2,
             round((12.0 * (o.b / 4.0)
                 / (CAST(o.nall AS DOUBLE) * (CAST(o.nall AS DOUBLE) + 1.0))
               - 3.0 * (CAST(o.nall AS DOUBLE) + 1.0))
               / (1.0 - CAST(o.tie AS DOUBLE)
                 / (CAST(o.nall AS DOUBLE) * CAST(o.nall AS DOUBLE)
                     * CAST(o.nall AS DOUBLE)
                   - CAST(o.nall AS DOUBLE))), 6) AS h
         FROM r, oneb o ORDER BY r.event_type""",

    // the streaming maintained Kruskal-Wallis MV derives the identical
    // statistic on read, so it shares dq_kruskal's oracle verbatim
    "stream_kruskal" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT event_type, cents, count(*) AS cnt
           FROM v GROUP BY 1, 2),
         per AS (SELECT cents, sum(cnt) AS m FROM grid GROUP BY 1),
         cum AS (SELECT cents, m,
             sum(m) OVER (ORDER BY cents) - m AS cb FROM per),
         r AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_a,
             CAST(sum(cnt * (2*cb + m + 1)) AS BIGINT) AS r2
           FROM grid JOIN cum USING (cents) GROUP BY 1),
         g AS (SELECT CAST(sum(m) AS BIGINT) AS nall,
             CAST(sum(m*m*m - m) AS BIGINT) AS tie FROM per),
         one AS (SELECT
             CAST(sum(CASE WHEN event_type = 'click' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_click,
             CAST(sum(CASE WHEN event_type = 'click' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'error' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_error,
             CAST(sum(CASE WHEN event_type = 'error' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_purchase,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_signup,
             CAST(sum(CASE WHEN event_type = 'signup' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN r2 ELSE 0 END)
               AS BIGINT) AS r_view,
             CAST(sum(CASE WHEN event_type = 'view' THEN n_a ELSE 0 END)
               AS BIGINT) AS n_view
           FROM r),
         oneb AS (SELECT o.*, g.nall, g.tie,
             CAST(o.r_click AS DOUBLE) * CAST(o.r_click AS DOUBLE)
               / CAST(o.n_click AS DOUBLE)
             + CAST(o.r_error AS DOUBLE) * CAST(o.r_error AS DOUBLE)
               / CAST(o.n_error AS DOUBLE)
             + CAST(o.r_purchase AS DOUBLE) * CAST(o.r_purchase AS DOUBLE)
               / CAST(o.n_purchase AS DOUBLE)
             + CAST(o.r_signup AS DOUBLE) * CAST(o.r_signup AS DOUBLE)
               / CAST(o.n_signup AS DOUBLE)
             + CAST(o.r_view AS DOUBLE) * CAST(o.r_view AS DOUBLE)
               / CAST(o.n_view AS DOUBLE) AS b
           FROM one o, g)
         SELECT r.event_type, r.n_a, r.r2,
             round((12.0 * (o.b / 4.0)
                 / (CAST(o.nall AS DOUBLE) * (CAST(o.nall AS DOUBLE) + 1.0))
               - 3.0 * (CAST(o.nall AS DOUBLE) + 1.0))
               / (1.0 - CAST(o.tie AS DOUBLE)
                 / (CAST(o.nall AS DOUBLE) * CAST(o.nall AS DOUBLE)
                     * CAST(o.nall AS DOUBLE)
                   - CAST(o.nall AS DOUBLE))), 6) AS h
         FROM r, oneb o ORDER BY r.event_type""",

    "dq_friedman" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS x FROM events
           WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-29 00:00:00'
           GROUP BY 1, 2),
         b0 AS (SELECT event_type, day, x,
             datediff('day', DATE '2024-01-01', day) // 7 AS block,
             datediff('day', DATE '2024-01-01', day) % 7 AS dow
           FROM daily),
         b AS (SELECT *, count(*) OVER (PARTITION BY event_type, block)
             AS cells FROM b0),
         bc AS (SELECT * FROM b WHERE cells = 7),
         ranked AS (SELECT event_type, block, dow, x,
             rank() OVER (PARTITION BY event_type, block ORDER BY x)
               AS rmin,
             count(*) OVER (PARTITION BY event_type, block, x) AS ties
           FROM bc),
         d AS (SELECT event_type, block, dow,
             2 * (rmin - 1) + ties + 1 AS d FROM ranked),
         nb AS (SELECT event_type, count(DISTINCT block) AS nb
           FROM d GROUP BY 1),
         perdow AS (SELECT event_type, CAST(dow AS BIGINT) AS dow,
             CAST(sum(d) AS BIGINT) AS r2 FROM d GROUP BY 1, 2),
         pertype AS (SELECT d.event_type,
             CAST(sum(d.d * d.d) AS BIGINT) AS a4 FROM d GROUP BY 1),
         num AS (SELECT p.event_type,
             CAST(sum((p.r2 - nb.nb * 8) * (p.r2 - nb.nb * 8))
               AS BIGINT) AS numsq
           FROM perdow p JOIN nb USING (event_type) GROUP BY 1)
         SELECT p.event_type, p.dow, p.r2, t.a4, num.numsq,
             round(6.0 * CAST(num.numsq AS DOUBLE)
               / CAST(t.a4 - nb.nb * 448 AS DOUBLE), 6) AS q
         FROM perdow p JOIN pertype t USING (event_type)
         JOIN num USING (event_type) JOIN nb USING (event_type)
         ORDER BY p.event_type, p.dow""",

    "dq_durbin_watson" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS y FROM events GROUP BY 1, 2),
         d2 AS (SELECT event_type, day, y,
             datediff('day', DATE '2024-01-01', day) + 1 AS t FROM daily),
         fit AS (SELECT event_type, count(*) AS n, sum(t) AS st,
             sum(y) AS sy, sum(t*t) AS stt, sum(t*y) AS sty
           FROM d2 GROUP BY 1),
         f2 AS (SELECT event_type, n, st, sy,
             n*sty - st*sy AS bnum, n*stt - st*st AS dd FROM fit),
         e AS (SELECT d2.event_type, d2.day,
             f.n*f.dd*d2.y - (f.dd*f.sy - f.bnum*f.st)
               - f.n*f.bnum*d2.t AS ee
           FROM d2 JOIN f2 f USING (event_type)),
         l AS (SELECT event_type, ee,
             ee - lag(ee) OVER (PARTITION BY event_type ORDER BY day)
               AS de FROM e)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(ee*ee) AS BIGINT) AS ss_res,
             CAST(sum(de*de) AS BIGINT) AS ss_diff,
             round(CAST(sum(de*de) AS DOUBLE)
               / CAST(sum(ee*ee) AS DOUBLE), 6) AS dw
         FROM l GROUP BY 1 ORDER BY 1""",

// the streaming maintained daily-count MV derives the identical
    // Durbin-Watson statistic on read, sharing dq_durbin_watson's oracle verbatim
    "stream_dw" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS y FROM events GROUP BY 1, 2),
         d2 AS (SELECT event_type, day, y,
             datediff('day', DATE '2024-01-01', day) + 1 AS t FROM daily),
         fit AS (SELECT event_type, count(*) AS n, sum(t) AS st,
             sum(y) AS sy, sum(t*t) AS stt, sum(t*y) AS sty
           FROM d2 GROUP BY 1),
         f2 AS (SELECT event_type, n, st, sy,
             n*sty - st*sy AS bnum, n*stt - st*st AS dd FROM fit),
         e AS (SELECT d2.event_type, d2.day,
             f.n*f.dd*d2.y - (f.dd*f.sy - f.bnum*f.st)
               - f.n*f.bnum*d2.t AS ee
           FROM d2 JOIN f2 f USING (event_type)),
         l AS (SELECT event_type, ee,
             ee - lag(ee) OVER (PARTITION BY event_type ORDER BY day)
               AS de FROM e)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(ee*ee) AS BIGINT) AS ss_res,
             CAST(sum(de*de) AS BIGINT) AS ss_diff,
             round(CAST(sum(de*de) AS DOUBLE)
               / CAST(sum(ee*ee) AS DOUBLE), 6) AS dw
         FROM l GROUP BY 1 ORDER BY 1""",

    "vocab_coverage" ->
      """WITH wc AS (SELECT lang, unnest(string_split(text, ' ')) AS w
           FROM documents),
         f AS (SELECT lang, w, count(*) AS f FROM wc GROUP BY 1, 2),
         per AS (SELECT lang, CAST(count(*) AS BIGINT) AS v,
             CAST(sum(f) AS BIGINT) AS n,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
           FROM f GROUP BY 1)
         SELECT lang, v, n, f1, f2,
             CAST((f1 * 1000000) // n AS BIGINT) AS p0_ppm,
             CASE WHEN f2 > 0 THEN
               round(CAST(v AS DOUBLE)
                 + CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE)
                   / (2.0 * CAST(f2 AS DOUBLE)), 4)
             END AS chao1
         FROM per ORDER BY lang""",

    "dq_kanonymity" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment,
             CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 500)
               AS BIGINT) AS band,
             count(*) AS sz
           FROM customer GROUP BY 1, 2, 3),
         one AS (SELECT
             CAST(sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
             CAST(sum(CASE WHEN sz < 2 THEN sz ELSE 0 END) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
             CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS r5,
             CAST(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS g10,
             CAST(sum(CASE WHEN sz < 10 THEN sz ELSE 0 END) AS BIGINT)
               AS r10,
             CAST(sum(CASE WHEN sz < 25 THEN 1 ELSE 0 END) AS BIGINT)
               AS g25,
             CAST(sum(CASE WHEN sz < 25 THEN sz ELSE 0 END) AS BIGINT)
               AS r25,
             CAST(sum(sz) AS BIGINT) AS total FROM g)
         SELECT k, n_groups_below, n_rows_below, total,
             CAST((n_rows_below * 1000000) // total AS BIGINT)
               AS share_ppm
         FROM (
           SELECT CAST(2 AS BIGINT) AS k, g2 AS n_groups_below,
               r2 AS n_rows_below, total FROM one
           UNION ALL SELECT CAST(5 AS BIGINT), g5, r5, total FROM one
           UNION ALL SELECT CAST(10 AS BIGINT), g10, r10, total FROM one
           UNION ALL SELECT CAST(25 AS BIGINT), g25, r25, total FROM one)
         ORDER BY k""",

    // distinct l-diversity census: same QI-group shape as dq_kanonymity
    // with a count(DISTINCT sensitive) per group; sensitive attribute =
    // market segment, which is therefore NOT part of the QI here
    "dq_ldiversity" ->
      """WITH g AS (SELECT c_nationkey,
             CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 500)
               AS BIGINT) AS band,
             count(*) AS sz,
             count(DISTINCT c_mktsegment) AS ndist
           FROM customer GROUP BY 1, 2),
         one AS (SELECT
             CAST(sum(CASE WHEN ndist < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
             CAST(sum(CASE WHEN ndist < 2 THEN sz ELSE 0 END) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN ndist < 3 THEN 1 ELSE 0 END) AS BIGINT) AS g3,
             CAST(sum(CASE WHEN ndist < 3 THEN sz ELSE 0 END) AS BIGINT) AS r3,
             CAST(sum(CASE WHEN ndist < 4 THEN 1 ELSE 0 END) AS BIGINT) AS g4,
             CAST(sum(CASE WHEN ndist < 4 THEN sz ELSE 0 END) AS BIGINT) AS r4,
             CAST(sum(CASE WHEN ndist < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
             CAST(sum(CASE WHEN ndist < 5 THEN sz ELSE 0 END) AS BIGINT) AS r5,
             CAST(sum(sz) AS BIGINT) AS total FROM g)
         SELECT l, n_groups_below, n_rows_below, total,
             CAST((n_rows_below * 1000000) // total AS BIGINT)
               AS share_ppm
         FROM (
           SELECT CAST(2 AS BIGINT) AS l, g2 AS n_groups_below,
               r2 AS n_rows_below, total FROM one
           UNION ALL SELECT CAST(3 AS BIGINT), g3, r3, total FROM one
           UNION ALL SELECT CAST(4 AS BIGINT), g4, r4, total FROM one
           UNION ALL SELECT CAST(5 AS BIGINT), g5, r5, total FROM one)
         ORDER BY l""",

    // Group-DRO multiplicative-weights replay: the per-domain loss table
    // in one aggregate, then all 50 exact-integer rounds (weighted-mean
    // excess -> 1e6 + 1% relative-excess factor -> renormalize to 1e9)
    // as a recursive CTE over HUGEINT lattice weights
    "sample_domain_mix" -> domainMixOracle,

    // the streaming MV folds the same additive (n_docs, chars, toks)
    // cells and derives weights on read through the shared batch chain
    // -- shared oracle
    "stream_domain_mix" -> domainMixOracle,

    // calibration bin census: cents -> ppm confidence by the global max,
    // decile bins (1.0 edge clamped to bin 9), exact truncating stats
    "eval_ece" ->
      """WITH e AS (SELECT
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events WHERE value IS NOT NULL),
         mx AS (SELECT max(cents) AS mx FROM e),
         c AS (SELECT (cents * 1000000) // (SELECT mx FROM mx) AS conf_ppm,
             y FROM e),
         b AS (SELECT least(9, conf_ppm * 10 // 1000000) AS bin,
             conf_ppm, y FROM c),
         g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(conf_ppm) AS BIGINT) AS sum_conf
           FROM b GROUP BY bin)
         SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
             CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
             CAST(sum_conf // n AS BIGINT) AS conf_ppm,
             CAST(abs(n_pos * 1000000 // n - sum_conf // n) AS BIGINT)
               AS gap_ppm
         FROM g ORDER BY bin""",

    "eval_auc" ->
      """WITH v AS (SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT day, cents, sum(lab) AS m1,
             count(*) - sum(lab) AS m0 FROM v GROUP BY 1, 2),
         c AS (SELECT day, cents, m1, m0,
             sum(m1) OVER (PARTITION BY day ORDER BY cents DESC) AS c1
           FROM grid),
         a AS (SELECT day, CAST(sum(m1) AS BIGINT) AS n_pos,
             CAST(sum(m0) AS BIGINT) AS n_neg,
             CAST(sum(m0 * (2*c1 - m1)) AS BIGINT) AS a2
           FROM c GROUP BY 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_pos, n_neg, a2,
             CAST((1000000 * a2) // (2 * n_pos * n_neg) AS BIGINT)
               AS auc_ppm
         FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY day""",

    // the streaming maintained daily-AUC MV derives the identical series
    // on read, so it shares eval_auc's oracle verbatim
    "stream_auc" ->
      """WITH v AS (SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT day, cents, sum(lab) AS m1,
             count(*) - sum(lab) AS m0 FROM v GROUP BY 1, 2),
         c AS (SELECT day, cents, m1, m0,
             sum(m1) OVER (PARTITION BY day ORDER BY cents DESC) AS c1
           FROM grid),
         a AS (SELECT day, CAST(sum(m1) AS BIGINT) AS n_pos,
             CAST(sum(m0) AS BIGINT) AS n_neg,
             CAST(sum(m0 * (2*c1 - m1)) AS BIGINT) AS a2
           FROM c GROUP BY 1)
         SELECT strftime(day, '%Y-%m-%d') AS day, n_pos, n_neg, a2,
             CAST((1000000 * a2) // (2 * n_pos * n_neg) AS BIGINT)
               AS auc_ppm
         FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY day""",

    "text_readability" ->
      """WITH c AS (SELECT doc_id,
             CAST(CASE WHEN len(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\s+')) END
               AS BIGINT) AS n_words,
             CAST(len(list_filter(regexp_split_to_array(text, '[.!?]+'),
               s -> len(trim(s)) > 0)) AS BIGINT) AS n_sentences,
             CAST(len(regexp_split_to_array(text, '[aeiouAEIOU]+')) - 1
               AS BIGINT) AS n_vowel_groups
           FROM documents)
         SELECT doc_id, n_words, n_sentences, n_vowel_groups,
             CASE WHEN n_words > 0 AND n_sentences > 0 THEN
               round(206.835
                 - 1.015 * CAST(n_words AS DOUBLE)
                   / CAST(n_sentences AS DOUBLE)
                 - 84.6 * CAST(n_vowel_groups AS DOUBLE)
                   / CAST(n_words AS DOUBLE), 4)
             END AS flesch
         FROM c ORDER BY doc_id""",

    "dq_levene" ->
      """WITH c AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         med AS (SELECT event_type,
             CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
           FROM c GROUP BY 1),
         dev AS (SELECT c.event_type, abs(2 * c.cents - m.med2) AS d
           FROM c JOIN med m USING (event_type)),
         per AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(d) AS BIGINT) AS s2,
             CAST(sum(d*d) AS BIGINT) AS q4
           FROM dev GROUP BY 1),
         one AS (SELECT
             CAST(sum(CASE WHEN event_type = 'click' THEN s2 ELSE 0 END)
               AS BIGINT) AS s_click,
             CAST(sum(CASE WHEN event_type = 'click' THEN n ELSE 0 END)
               AS BIGINT) AS n_click,
             CAST(sum(CASE WHEN event_type = 'error' THEN s2 ELSE 0 END)
               AS BIGINT) AS s_error,
             CAST(sum(CASE WHEN event_type = 'error' THEN n ELSE 0 END)
               AS BIGINT) AS n_error,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN s2 ELSE 0 END)
               AS BIGINT) AS s_purchase,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN n ELSE 0 END)
               AS BIGINT) AS n_purchase,
             CAST(sum(CASE WHEN event_type = 'signup' THEN s2 ELSE 0 END)
               AS BIGINT) AS s_signup,
             CAST(sum(CASE WHEN event_type = 'signup' THEN n ELSE 0 END)
               AS BIGINT) AS n_signup,
             CAST(sum(CASE WHEN event_type = 'view' THEN s2 ELSE 0 END)
               AS BIGINT) AS s_view,
             CAST(sum(CASE WHEN event_type = 'view' THEN n ELSE 0 END)
               AS BIGINT) AS n_view,
             CAST(sum(n) AS BIGINT) AS nall,
             CAST(sum(s2) AS BIGINT) AS sall,
             CAST(sum(q4) AS BIGINT) AS qall
           FROM per),
         oneb AS (SELECT *,
             CAST(s_click AS DOUBLE) * CAST(s_click AS DOUBLE)
               / CAST(n_click AS DOUBLE)
             + CAST(s_error AS DOUBLE) * CAST(s_error AS DOUBLE)
               / CAST(n_error AS DOUBLE)
             + CAST(s_purchase AS DOUBLE) * CAST(s_purchase AS DOUBLE)
               / CAST(n_purchase AS DOUBLE)
             + CAST(s_signup AS DOUBLE) * CAST(s_signup AS DOUBLE)
               / CAST(n_signup AS DOUBLE)
             + CAST(s_view AS DOUBLE) * CAST(s_view AS DOUBLE)
               / CAST(n_view AS DOUBLE) AS b
           FROM one)
         SELECT p.event_type, p.n, p.s2, p.q4,
             round((CAST(o.nall - 5 AS DOUBLE) / 4.0)
               * (o.b - CAST(o.sall AS DOUBLE) * CAST(o.sall AS DOUBLE)
                   / CAST(o.nall AS DOUBLE))
               / (CAST(o.qall AS DOUBLE) - o.b), 6) AS w
         FROM per p, oneb o ORDER BY p.event_type""",

    "agg_hhi" ->
      """WITH per AS (SELECT o_custkey,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS c
           FROM orders GROUP BY 1),
         d AS (SELECT n.n_name, per.c
           FROM per JOIN customer cu ON per.o_custkey = cu.c_custkey
           JOIN nation n ON cu.c_nationkey = n.n_nationkey),
         tot AS (SELECT n_name, CAST(sum(c) AS BIGINT) AS tt,
             CAST(count(*) AS BIGINT) AS n_customers FROM d GROUP BY 1),
         sh AS (SELECT d.n_name, t.n_customers, t.tt,
             (d.c * 1000000) // t.tt AS share_ppm
           FROM d JOIN tot t USING (n_name))
         SELECT n_name, n_customers, tt AS total_cents,
             CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi_e12,
             round(CAST(sum(share_ppm * share_ppm) AS DOUBLE) / 1e12, 6)
               AS hhi
         FROM sh GROUP BY 1, 2, 3 ORDER BY 1""",

    "stream_soft_dedup" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           lab AS (SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS cluster
             FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
           s AS (SELECT cluster, count(*) AS cluster_size
             FROM lab GROUP BY 1)
         SELECT lab.doc_id, lab.cluster,
             CAST(s.cluster_size AS BIGINT) AS cluster_size,
             CAST(floor(1000000 / CAST(s.cluster_size AS DOUBLE)) AS BIGINT)
               AS weight_ppm
         FROM lab JOIN s ON lab.cluster = s.cluster
         ORDER BY lab.doc_id""",

    "sample_soft_dedup" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           lab AS (SELECT d.doc_id, coalesce(comp.c, d.doc_id) AS cluster
             FROM documents d LEFT JOIN comp ON d.doc_id = comp.id),
           s AS (SELECT cluster, count(*) AS cluster_size
             FROM lab GROUP BY 1)
         SELECT lab.doc_id, lab.cluster,
             CAST(s.cluster_size AS BIGINT) AS cluster_size,
             CAST(floor(1000000 / CAST(s.cluster_size AS DOUBLE)) AS BIGINT)
               AS weight_ppm
         FROM lab JOIN s ON lab.cluster = s.cluster
         ORDER BY lab.doc_id""",

    "sample_curriculum" ->
      """WITH s AS (SELECT doc_id, source,
             CAST(floor(1000000.0 *
               len(list_distinct(string_split(text, ' '))) /
               len(string_split(text, ' '))) AS BIGINT) AS score_ppm
           FROM documents),
         r AS (SELECT *, CAST(ntile(4) OVER
             (ORDER BY score_ppm DESC, doc_id) AS BIGINT) AS phase
           FROM s),
         p AS (SELECT *, CAST(row_number() OVER (PARTITION BY phase
             ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 8), doc_id)
               AS BIGINT) AS pos
           FROM r)
         SELECT doc_id, source, score_ppm, phase, pos
         FROM p ORDER BY phase, pos""",

    "sample_hash" ->
      """SELECT event_id, event_type FROM events
         WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '29'
         ORDER BY event_id""",

    "sample_importance" ->
      """WITH d AS (SELECT lang,
             CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS p,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS u
           FROM documents),
           k AS (SELECT lang, CAST(count(*) AS BIGINT) n_docs,
               CAST(sum(CASE WHEN p >= 1 OR u < lpad(lower(hex(
                   CAST(floor(p * 16777216) AS BIGINT))), 6, '0')
                 THEN 1 ELSE 0 END) AS BIGINT) n_kept
             FROM d GROUP BY lang)
         SELECT lang, n_docs, n_kept,
             round(CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS kept_frac
         FROM k ORDER BY lang""",

    "sample_stratified" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept FROM events
         WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) <
           CASE event_type WHEN 'purchase' THEN 'ff' WHEN 'signup' THEN '80'
             WHEN 'view' THEN '40' WHEN 'click' THEN '20'
             WHEN 'error' THEN '08' ELSE '00' END
         GROUP BY event_type ORDER BY event_type""",

    "sample_mix_quota" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 60 ORDER BY lang, doc_id""",

    "sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) n FROM documents GROUP BY lang),
           s AS (SELECT lang,
               CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) sl FROM c),
           q AS (SELECT lang,
               CAST((200 * sl) // (SELECT sum(sl) FROM s) AS BIGINT) AS quota FROM s),
           r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             FROM documents)
         SELECT r.lang, r.doc_id, q.quota
         FROM r JOIN q ON r.lang = q.lang WHERE r.rn <= q.quota
         ORDER BY r.lang, r.doc_id""",

    "vocab_oov_rate" ->
      """WITH toks AS (SELECT lang, doc_id,
             unnest(string_split(text, ' ')) AS tok FROM documents),
         tf AS (SELECT lang, doc_id, tok FROM toks WHERE len(tok) > 0),
         vocab AS (SELECT tok FROM (
             SELECT tok, count(*) AS n FROM tf WHERE doc_id % 10 < 8
             GROUP BY tok ORDER BY n DESC, tok LIMIT 500)),
         test AS (SELECT t.lang, t.tok, v.tok AS vt
           FROM tf t LEFT JOIN vocab v ON t.tok = v.tok
           WHERE t.doc_id % 10 >= 8)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             round(CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
         FROM test GROUP BY lang ORDER BY lang""",

    "text_ngram_novelty" ->
      """WITH t AS (SELECT doc_id, lang,
             list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
               i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) sh
           FROM documents),
         tri AS (SELECT doc_id, lang, unnest(sh) AS s FROM t),
         train AS (SELECT DISTINCT s FROM tri WHERE doc_id % 10 < 8),
         test AS (SELECT tri.lang, tri.s, tr.s AS seen
           FROM tri LEFT JOIN train tr ON tri.s = tr.s
           WHERE tri.doc_id % 10 >= 8)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_trigrams,
             CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel,
             round(CAST(sum(CASE WHEN seen IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty_rate
         FROM test GROUP BY lang ORDER BY lang""",

    "vocab_topk" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
           SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token ORDER BY n DESC, token LIMIT 20""",

    "decontaminate" ->
      """WITH t AS (SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-2, 1)+1),
               i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||string_split(text,' ')[i+2])) sh
           FROM documents),
           ce AS (SELECT doc_id, unnest(sh) s FROM t WHERE doc_id >= 10),
           be AS (SELECT doc_id bench_id, unnest(sh) s FROM t WHERE doc_id < 10)
         SELECT ce.doc_id, CAST(count(DISTINCT ce.s) AS BIGINT) AS n_shared,
             CAST(count(DISTINCT be.bench_id) AS BIGINT) AS n_bench_docs
         FROM ce JOIN be USING (s)
         GROUP BY ce.doc_id ORDER BY ce.doc_id""",

    "pack_tokens" ->
      """SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         FROM (
           SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - n_tokens) / 2048.0) AS BIGINT) AS bin
           FROM (SELECT lang, doc_id,
                     len(string_split(text, ' ')) AS n_tokens FROM documents))
         GROUP BY lang, bin ORDER BY lang, bin""",

    "quality_deciles" ->
      """SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
             min(uniq_ratio) AS min_ratio, max(uniq_ratio) AS max_ratio,
             round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS mean_tokens
         FROM (
           SELECT n_tokens, uniq_ratio,
               ntile(10) OVER (ORDER BY uniq_ratio, doc_id) AS decile
           FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                     round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
                       len(string_split(text, ' ')), 4) AS uniq_ratio
                 FROM documents))
         GROUP BY decile ORDER BY decile""",

    "stream_dedup_incremental" ->
      s"""WITH ${shinglesSql()},
         ${dupCandSql(pairCond =
           "a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0")}
         SELECT new_id, base_id, jaccard FROM (
           SELECT a_id AS new_id, b_id AS base_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.8 ORDER BY new_id, base_id""",

    "dedup_incremental" ->
      s"""WITH ${shinglesSql()},
         ${dupCandSql(pairCond =
           "a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0")}
         SELECT new_id, base_id, jaccard FROM (
           SELECT a_id AS new_id, b_id AS base_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.8 ORDER BY new_id, base_id""",

    "corpus_curate" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id),
           kept AS (SELECT lang, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
                 len(string_split(text, ' ')), 4) AS uniq_ratio
             FROM documents
             WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> c))
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             round(CAST(sum(n_tokens) AS DOUBLE) / count(*), 4) AS mean_tokens
         FROM kept WHERE n_tokens >= 30 AND uniq_ratio >= 0.32
         GROUP BY lang ORDER BY lang""",

    "resample_interpolate" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) tts,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value, event_id
           FROM events),
           daily AS (SELECT user_id, d, value AS day_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, d
                 ORDER BY tts DESC, event_id DESC) rn FROM ev) WHERE rn = 1),
           grid AS (SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
             FROM (SELECT user_id, min(d) d0, max(d) d1
                   FROM ev GROUP BY user_id)),
           j AS (SELECT g.user_id, g.d,
               last_value(dd.day_value IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pv,
               last_value(CASE WHEN dd.day_value IS NOT NULL THEN g.d END
                   IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) pd,
               first_value(dd.day_value IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nv,
               first_value(CASE WHEN dd.day_value IS NOT NULL THEN g.d END
                   IGNORE NULLS) OVER (
                 PARTITION BY g.user_id ORDER BY g.d
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) nd
             FROM grid g LEFT JOIN daily dd
               ON g.user_id = dd.user_id AND g.d = dd.d)
         SELECT user_id, strftime(d, '%Y-%m-%d') AS day_str,
             round(CASE WHEN pv IS NULL THEN nv
                        WHEN nv IS NULL THEN pv
                        WHEN pd = nd THEN pv
                        ELSE pv + (nv - pv) *
                          (CAST(datediff('day', pd, d) AS DOUBLE) /
                           CAST(datediff('day', pd, nd) AS DOUBLE)) END, 6)
               AS interp_value
         FROM j ORDER BY user_id, day_str""",

    "resample_ffill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) tts,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, value, event_id
           FROM events),
           daily AS (SELECT user_id, d, value AS day_value FROM (
             SELECT *, row_number() OVER (PARTITION BY user_id, d
                 ORDER BY tts DESC, event_id DESC) rn FROM ev) WHERE rn = 1),
           counts AS (SELECT user_id, d, CAST(count(*) AS BIGINT) n
             FROM ev GROUP BY user_id, d),
           grid AS (SELECT user_id,
               CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                 CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
             FROM (SELECT user_id, min(d) d0, max(d) d1
                   FROM ev GROUP BY user_id))
         SELECT g.user_id, strftime(g.d, '%Y-%m-%d') AS day_str,
             last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
             coalesce(c.n, 0) AS n_events
         FROM grid g
         LEFT JOIN daily d ON g.user_id = d.user_id AND g.d = d.d
         LEFT JOIN counts c ON g.user_id = c.user_id AND g.d = c.d
         ORDER BY g.user_id, day_str""",

    "join_bloom_pruned" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,4))
                  AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE c_acctbal > 9000
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "split_train" ->
      """WITH s AS (SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
                  ELSE 'test' END AS split
           FROM documents)
         SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM s GROUP BY lang, split ORDER BY lang, split""",

    "scd2_build" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, status FROM o
           WHERE prev IS NULL OR prev <> status)
         SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(CAST(lead(ts) OVER w AS TIMESTAMP),
                      '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             lead(ts) OVER w IS NULL AS is_current
         FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, valid_from, status""",

    "scd2_snapshot" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, status FROM o
           WHERE prev IS NULL OR prev <> status),
         h AS (SELECT user_id, status, ts,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_ts
           FROM c)
         SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from
         FROM h
         WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
           AND (end_ts IS NULL OR
                CAST(end_ts AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00')
         ORDER BY user_id""",

    "profile_table" ->
      """WITH a AS (SELECT CAST(count(*) AS BIGINT) n_rows,
             CAST(count(event_id) AS BIGINT) e_nn,
             CAST(count(DISTINCT event_id) AS BIGINT) e_nd,
             CAST(min(event_id) AS VARCHAR) e_mn, CAST(max(event_id) AS VARCHAR) e_mx,
             CAST(count(user_id) AS BIGINT) u_nn,
             CAST(count(DISTINCT user_id) AS BIGINT) u_nd,
             CAST(min(user_id) AS VARCHAR) u_mn, CAST(max(user_id) AS VARCHAR) u_mx,
             CAST(count(event_type) AS BIGINT) t_nn,
             CAST(count(DISTINCT event_type) AS BIGINT) t_nd,
             min(event_type) t_mn, max(event_type) t_mx,
             CAST(count(props) AS BIGINT) p_nn,
             CAST(count(DISTINCT props) AS BIGINT) p_nd,
             min(props) p_mn, max(props) p_mx
           FROM events)
         SELECT col_name, n_rows, n_notnull, n_distinct, min_val, max_val FROM (
           SELECT 'event_id' col_name, n_rows, e_nn n_notnull, e_nd n_distinct,
               e_mn min_val, e_mx max_val FROM a
           UNION ALL
           SELECT 'user_id', n_rows, u_nn, u_nd, u_mn, u_mx FROM a
           UNION ALL
           SELECT 'event_type', n_rows, t_nn, t_nd, t_mn, t_mx FROM a
           UNION ALL
           SELECT 'props', n_rows, p_nn, p_nd, p_mn, p_mx FROM a)
         ORDER BY col_name""",

    "search_bm25" ->
      """WITH q(query_id, term_idx, term) AS (VALUES
             (1,1,'spark'),(1,2,'join'),(2,1,'hash'),(2,2,'merge'),
             (2,3,'batch'),(3,1,'vector'),(3,2,'scan')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1,2),
         dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
         dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs, sum(len) AS total_len FROM dl),
         term AS (SELECT qq.query_id, qq.term_idx, f.doc_id,
             ((22e0 * f.tf * t.total_len) /
              (10 * f.tf * t.total_len + 3 * t.total_len + 9 * d.len * t.n_docs)) *
             ((2 * t.n_docs - 2 * v.df + 1) / (2 * v.df + 1)) AS s
           FROM tf f JOIN q qq ON f.tok = qq.term
           JOIN dl d ON f.doc_id = d.doc_id
           JOIN dfv v ON f.tok = v.tok CROSS JOIN tot t),
         sc AS (SELECT query_id, doc_id,
             coalesce(max(CASE WHEN term_idx=1 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=2 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=3 THEN s END), 0e0) AS score
           FROM term GROUP BY 1,2),
         r AS (SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rnk
           FROM sc)
         SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(rnk AS BIGINT) AS rank, doc_id, round(score, 6) AS score
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    "eval_cohen_kappa" -> kappaOracle,
    "stream_kappa" -> kappaOracle,

    "graph_label_propagation" ->
      s"""WITH RECURSIVE ${dupPairsSql},
         adj AS MATERIALIZED (SELECT x, y FROM (
             SELECT CAST(a_id AS BIGINT) x, CAST(b_id AS BIGINT) y FROM p
             UNION ALL
             SELECT CAST(b_id AS BIGINT), CAST(a_id AS BIGINT) FROM p)
           GROUP BY 1, 2),
         lp(r, node, lab) AS (
           SELECT 0 AS r, x AS node, x AS lab FROM (SELECT DISTINCT x FROM adj)
           UNION ALL
           SELECT r, node, lab FROM (
             WITH prev AS (SELECT * FROM lp),
               nc AS (SELECT node, lab, count(*) AS c FROM (
                        SELECT a.x AS node, l.lab AS lab
                        FROM adj a JOIN prev l ON a.y = l.node
                        UNION ALL SELECT node, lab FROM prev)
                      GROUP BY 1, 2),
               pick AS (SELECT node, lab,
                   row_number() OVER (PARTITION BY node
                     ORDER BY c DESC, lab) AS rn
                 FROM nc)
             SELECT (SELECT max(r) FROM prev) + 1 AS r, node, lab FROM pick
             WHERE rn = 1 AND (SELECT max(r) FROM prev) < 4)),
         fin AS (SELECT node, lab FROM lp WHERE r = 4)
         SELECT node AS doc_id, lab AS community,
                count(*) OVER (PARTITION BY lab) AS community_size
         FROM fin ORDER BY community, doc_id""",

    "eval_rbo" ->
      s"""WITH q(query_id, term_idx, term) AS (VALUES
             (1,1,'spark'),(1,2,'join'),(2,1,'hash'),(2,2,'merge'),
             (2,3,'batch'),(3,1,'vector'),(3,2,'scan')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1,2),
         dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
         dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs, sum(len) AS total_len FROM dl),
         base AS (SELECT qq.query_id, qq.term_idx, f.doc_id,
             ((22e0 * f.tf * t.total_len) /
              (10 * f.tf * t.total_len + 3 * t.total_len + 9 * d.len * t.n_docs)) *
             ((2 * t.n_docs - 2 * v.df + 1) / (2 * v.df + 1)) AS s_bm,
             CAST(f.tf * (t.n_docs + 1) AS DOUBLE) /
               CAST(d.len * (v.df + 1) AS DOUBLE) AS s_ti
           FROM tf f JOIN q qq ON f.tok = qq.term
           JOIN dl d ON f.doc_id = d.doc_id
           JOIN dfv v ON f.tok = v.tok CROSS JOIN tot t),
         bm AS (SELECT query_id, doc_id, rnk AS r_bm25 FROM (
           SELECT query_id, doc_id, row_number() OVER (
               PARTITION BY query_id ORDER BY s DESC, doc_id) AS rnk
           FROM (SELECT query_id, doc_id,
               coalesce(max(CASE WHEN term_idx=1 THEN s_bm END), 0e0)
               + coalesce(max(CASE WHEN term_idx=2 THEN s_bm END), 0e0)
               + coalesce(max(CASE WHEN term_idx=3 THEN s_bm END), 0e0) AS s
             FROM base GROUP BY 1,2)) WHERE rnk <= 10),
         ti AS (SELECT query_id, doc_id, rnk AS r_tfidf FROM (
           SELECT query_id, doc_id, row_number() OVER (
               PARTITION BY query_id ORDER BY s DESC, doc_id) AS rnk
           FROM (SELECT query_id, doc_id,
               coalesce(max(CASE WHEN term_idx=1 THEN s_ti END), 0e0)
               + coalesce(max(CASE WHEN term_idx=2 THEN s_ti END), 0e0)
               + coalesce(max(CASE WHEN term_idx=3 THEN s_ti END), 0e0) AS s
             FROM base GROUP BY 1,2)) WHERE rnk <= 10),
         w(d, w) AS (VALUES ${rboWeightsSql}),
         ov AS (SELECT bm.query_id, bm.doc_id,
               greatest(bm.r_bm25, ti.r_tfidf) AS dmin
             FROM bm JOIN ti ON bm.query_id = ti.query_id
               AND bm.doc_id = ti.doc_id),
         contrib AS (SELECT o.query_id,
               sum(w.w) AS rbo_num,
               sum(CASE WHEN w.d = 10 THEN 1 ELSE 0 END) AS a10
             FROM ov o JOIN w ON w.d >= o.dmin
             GROUP BY 1)
         SELECT CAST(q.query_id AS BIGINT) AS query_id,
             CAST(coalesce(c.a10, 0) AS BIGINT) AS overlap10,
             CAST(coalesce(c.rbo_num, 0) AS BIGINT) AS rbo_num,
             round(CAST(coalesce(c.rbo_num, 0) AS DOUBLE) /
               ${graft.Queries.RboDen}e0, 9) AS rbo
         FROM (SELECT DISTINCT query_id FROM q) q
         LEFT JOIN contrib c ON q.query_id = c.query_id
         ORDER BY query_id""",

    "search_hybrid_rrf" ->
      """WITH q(query_id, term_idx, term) AS (VALUES
             (1,1,'spark'),(1,2,'join'),(2,1,'hash'),(2,2,'merge'),
             (2,3,'batch'),(3,1,'vector'),(3,2,'scan')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1,2),
         dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
         dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs, sum(len) AS total_len FROM dl),
         base AS (SELECT qq.query_id, qq.term_idx, f.doc_id,
             ((22e0 * f.tf * t.total_len) /
              (10 * f.tf * t.total_len + 3 * t.total_len + 9 * d.len * t.n_docs)) *
             ((2 * t.n_docs - 2 * v.df + 1) / (2 * v.df + 1)) AS s_bm,
             CAST(f.tf * (t.n_docs + 1) AS DOUBLE) /
               CAST(d.len * (v.df + 1) AS DOUBLE) AS s_ti
           FROM tf f JOIN q qq ON f.tok = qq.term
           JOIN dl d ON f.doc_id = d.doc_id
           JOIN dfv v ON f.tok = v.tok CROSS JOIN tot t),
         bm AS (SELECT query_id, doc_id, rnk AS r_bm25 FROM (
           SELECT query_id, doc_id, row_number() OVER (
               PARTITION BY query_id ORDER BY s DESC, doc_id) AS rnk
           FROM (SELECT query_id, doc_id,
               coalesce(max(CASE WHEN term_idx=1 THEN s_bm END), 0e0)
               + coalesce(max(CASE WHEN term_idx=2 THEN s_bm END), 0e0)
               + coalesce(max(CASE WHEN term_idx=3 THEN s_bm END), 0e0) AS s
             FROM base GROUP BY 1,2)) WHERE rnk <= 10),
         ti AS (SELECT query_id, doc_id, rnk AS r_tfidf FROM (
           SELECT query_id, doc_id, row_number() OVER (
               PARTITION BY query_id ORDER BY s DESC, doc_id) AS rnk
           FROM (SELECT query_id, doc_id,
               coalesce(max(CASE WHEN term_idx=1 THEN s_ti END), 0e0)
               + coalesce(max(CASE WHEN term_idx=2 THEN s_ti END), 0e0)
               + coalesce(max(CASE WHEN term_idx=3 THEN s_ti END), 0e0) AS s
             FROM base GROUP BY 1,2)) WHERE rnk <= 10),
         fused AS (SELECT coalesce(bm.query_id, ti.query_id) AS query_id,
             coalesce(bm.doc_id, ti.doc_id) AS doc_id,
             coalesce(142813628717760 // (60 + bm.r_bm25), 0)
               + coalesce(142813628717760 // (60 + ti.r_tfidf), 0) AS rrf_num
           FROM bm FULL OUTER JOIN ti
             ON bm.query_id = ti.query_id AND bm.doc_id = ti.doc_id),
         rr AS (SELECT query_id, doc_id, rrf_num,
             row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_num DESC, doc_id) AS rnk
           FROM fused)
         SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(rnk AS BIGINT) AS rank, doc_id,
             CAST(rrf_num AS BIGINT) AS rrf_num,
             round(CAST(rrf_num AS DOUBLE) / 142813628717760e0, 9) AS rrf
         FROM rr WHERE rnk <= 5 ORDER BY query_id, rank""",

    "agg_winsorized_mean" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT event_type, cents, count(*) AS m
           FROM v GROUP BY 1, 2),
         cum AS (SELECT event_type, cents, m,
             sum(m) OVER (PARTITION BY event_type ORDER BY cents) AS cm
           FROM grid),
         nn AS (SELECT event_type, sum(m) AS n, sum(m) // 10 AS k
           FROM grid GROUP BY 1),
         b AS (SELECT cum.event_type,
             min(CASE WHEN cm >= k + 1 THEN cents END) AS lo,
             min(CASE WHEN cm >= n - k THEN cents END) AS hi
           FROM cum JOIN nn USING (event_type) GROUP BY 1)
         SELECT g.event_type, CAST(nn.n AS BIGINT) AS n,
             CAST(nn.k AS BIGINT) AS k, CAST(b.lo AS BIGINT) AS lo,
             CAST(b.hi AS BIGINT) AS hi,
             CAST(sum(g.m * greatest(b.lo, least(b.hi, g.cents)))
               AS BIGINT) AS wsum,
             round(CAST(sum(g.m * greatest(b.lo, least(b.hi, g.cents)))
                 AS DOUBLE) / CAST(nn.n AS DOUBLE), 6) AS wmean
         FROM grid g JOIN nn USING (event_type)
         JOIN b ON g.event_type = b.event_type
         GROUP BY g.event_type, nn.n, nn.k, b.lo, b.hi ORDER BY 1""",

    // the streaming maintained value-grid MV derives through the same
    // winsorizeFromGrid as the batch query -- shared oracle
    // the streaming maintained Pettitt MV derives the identical statistic
    // on read, so it shares dq_pettitt's oracle verbatim
    "stream_pettitt" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS x FROM events GROUP BY 1, 2),
         ranked AS (SELECT event_type, day, x,
             rank() OVER (PARTITION BY event_type ORDER BY x) AS rmin,
             count(*) OVER (PARTITION BY event_type, x) AS ties,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
         u AS (SELECT event_type, day, n,
             sum(2 * (rmin - 1) + ties + 1 - n - 1)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ut
           FROM ranked),
         k AS (SELECT event_type, day, n, ut,
             max(abs(ut)) OVER (PARTITION BY event_type) AS kk
           FROM u)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             CAST(max(kk) AS BIGINT) AS k,
             strftime(min(day), '%Y-%m-%d') AS cp_day,
             round(least(1e0, 2e0 * exp(-6e0 *
               CAST(max(kk) * max(kk) AS DOUBLE) /
               CAST(max(n) * max(n) * (max(n) + 1) AS DOUBLE))), 6)
               AS p_approx
         FROM k WHERE abs(ut) = kk
         GROUP BY event_type ORDER BY event_type""",

    "stream_winsorized" ->
      """WITH v AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         grid AS (SELECT event_type, cents, count(*) AS m
           FROM v GROUP BY 1, 2),
         cum AS (SELECT event_type, cents, m,
             sum(m) OVER (PARTITION BY event_type ORDER BY cents) AS cm
           FROM grid),
         nn AS (SELECT event_type, sum(m) AS n, sum(m) // 10 AS k
           FROM grid GROUP BY 1),
         b AS (SELECT cum.event_type,
             min(CASE WHEN cm >= k + 1 THEN cents END) AS lo,
             min(CASE WHEN cm >= n - k THEN cents END) AS hi
           FROM cum JOIN nn USING (event_type) GROUP BY 1)
         SELECT g.event_type, CAST(nn.n AS BIGINT) AS n,
             CAST(nn.k AS BIGINT) AS k, CAST(b.lo AS BIGINT) AS lo,
             CAST(b.hi AS BIGINT) AS hi,
             CAST(sum(g.m * greatest(b.lo, least(b.hi, g.cents)))
               AS BIGINT) AS wsum,
             round(CAST(sum(g.m * greatest(b.lo, least(b.hi, g.cents)))
                 AS DOUBLE) / CAST(nn.n AS DOUBLE), 6) AS wmean
         FROM grid g JOIN nn USING (event_type)
         JOIN b ON g.event_type = b.event_type
         GROUP BY g.event_type, nn.n, nn.k, b.lo, b.hi ORDER BY 1""",

    "dq_runs_test" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS x FROM events GROUP BY 1, 2),
         s0 AS (SELECT event_type, day, x,
             lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
           FROM daily),
         signs AS (SELECT event_type, day,
             CASE WHEN x > xp THEN 1 ELSE -1 END AS s
           FROM s0 WHERE xp IS NOT NULL AND x != xp),
         r0 AS (SELECT event_type, s,
             lag(s) OVER (PARTITION BY event_type ORDER BY day) AS sp
           FROM signs),
         runs AS (SELECT event_type, count(*) AS n,
             sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS n_pos,
             sum(CASE WHEN sp IS NOT NULL AND s != sp THEN 1 ELSE 0 END) + 1
               AS r
           FROM r0 GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(n_pos AS BIGINT) AS n_pos,
             CAST(n - n_pos AS BIGINT) AS n_neg, CAST(r AS BIGINT) AS r,
             round((CAST(r AS DOUBLE) -
               (1e0 + 2e0 * CAST(n_pos * (n - n_pos) AS DOUBLE) /
                 CAST(n AS DOUBLE))) /
               sqrt(2e0 * CAST(n_pos * (n - n_pos) AS DOUBLE) *
                 CAST(2 * n_pos * (n - n_pos) - n AS DOUBLE) /
                 (CAST(n * n AS DOUBLE) * CAST(n - 1 AS DOUBLE))), 6) AS z
         FROM runs ORDER BY event_type""",

    "dq_pettitt" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS x FROM events GROUP BY 1, 2),
         ranked AS (SELECT event_type, day, x,
             rank() OVER (PARTITION BY event_type ORDER BY x) AS rmin,
             count(*) OVER (PARTITION BY event_type, x) AS ties,
             count(*) OVER (PARTITION BY event_type) AS n
           FROM daily),
         u AS (SELECT event_type, day, n,
             sum(2 * (rmin - 1) + ties + 1 - n - 1)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ut
           FROM ranked),
         k AS (SELECT event_type, day, n, ut,
             max(abs(ut)) OVER (PARTITION BY event_type) AS kk
           FROM u)
         SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             CAST(max(kk) AS BIGINT) AS k,
             strftime(min(day), '%Y-%m-%d') AS cp_day,
             round(least(1e0, 2e0 * exp(-6e0 *
               CAST(max(kk) * max(kk) AS DOUBLE) /
               CAST(max(n) * max(n) * (max(n) + 1) AS DOUBLE))), 6)
               AS p_approx
         FROM k WHERE abs(ut) = kk
         GROUP BY event_type ORDER BY event_type""",

    "dq_ljungbox" ->
      """WITH daily AS (SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               AS BIGINT) AS d, count(*) AS x
           FROM events GROUP BY event_type, CAST(ts AS DATE)),
         st AS (SELECT event_type, count(*) AS n, sum(x) AS s
           FROM daily GROUP BY 1),
         dev AS (SELECT daily.event_type, daily.d, st.n,
             CAST(st.n * daily.x - st.s AS BIGINT) AS v
           FROM daily JOIN st USING (event_type)),
         a0 AS (SELECT event_type, max(n) AS n, sum(v * v) AS a0
           FROM dev GROUP BY 1),
         lagged AS (SELECT event_type, d + k.k AS d, k.k, v AS vlag
           FROM dev, (SELECT unnest(range(1, 8)) AS k) k),
         ak AS (SELECT dev.event_type, lagged.k, sum(dev.v * lagged.vlag) AS ak
           FROM dev JOIN lagged
             ON dev.event_type = lagged.event_type AND dev.d = lagged.d
           GROUP BY 1, 2),
         piv AS (SELECT ak.event_type, a0.n, a0.a0,
             coalesce(max(CASE WHEN k=1 THEN ak END), 0) AS k1,
             coalesce(max(CASE WHEN k=2 THEN ak END), 0) AS k2,
             coalesce(max(CASE WHEN k=3 THEN ak END), 0) AS k3,
             coalesce(max(CASE WHEN k=4 THEN ak END), 0) AS k4,
             coalesce(max(CASE WHEN k=5 THEN ak END), 0) AS k5,
             coalesce(max(CASE WHEN k=6 THEN ak END), 0) AS k6,
             coalesce(max(CASE WHEN k=7 THEN ak END), 0) AS k7
           FROM ak JOIN a0 USING (event_type)
           GROUP BY 1, 2, 3)
         SELECT event_type, CAST(n AS BIGINT) AS n, CAST(a0 AS BIGINT) AS a0,
             round(CAST(k1 AS DOUBLE) / CAST(a0 AS DOUBLE), 6) AS rho1,
             round(
               (CAST(k1 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k1 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-1 AS DOUBLE)
             + (CAST(k2 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k2 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-2 AS DOUBLE)
             + (CAST(k3 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k3 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-3 AS DOUBLE)
             + (CAST(k4 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k4 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-4 AS DOUBLE)
             + (CAST(k5 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k5 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-5 AS DOUBLE)
             + (CAST(k6 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k6 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-6 AS DOUBLE)
             + (CAST(k7 AS DOUBLE)/CAST(a0 AS DOUBLE))*(CAST(k7 AS DOUBLE)/CAST(a0 AS DOUBLE))*CAST(n*(n+2) AS DOUBLE)/CAST(n-7 AS DOUBLE)
             , 6) AS q_lb
         FROM piv ORDER BY event_type""",

    "chunk_documents" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         s AS (SELECT doc_id, toks,
               unnest(range(0, CAST(greatest(len(toks), 1) AS BIGINT), 24))
                 AS start_tok
               FROM d)
         SELECT doc_id, CAST(start_tok // 24 AS BIGINT) AS chunk_idx,
             CAST(start_tok AS BIGINT) AS start_tok,
             CAST(least(32, len(toks) - start_tok) AS BIGINT) AS n_tok,
             array_to_string(toks[start_tok + 1 : start_tok + 32], ' ')
               AS chunk_text
         FROM s ORDER BY doc_id, chunk_idx""",

    "dq_skew" ->
      """WITH k1 AS (SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS cnt
             FROM events GROUP BY 1),
         p1 AS (SELECT 'user_id' AS col_name, sum(cnt) AS n_rows,
             count(*) AS n_keys,
             max(lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || k) AS mx,
             sum(cnt*cnt) AS sum_sq FROM k1),
         k2 AS (SELECT event_type AS k, count(*) AS cnt
             FROM events GROUP BY 1),
         p2 AS (SELECT 'event_type', sum(cnt), count(*),
             max(lpad(CAST(cnt AS VARCHAR), 12, '0') || '|' || k),
             sum(cnt*cnt) FROM k2),
         u AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2)
         SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
             CAST(n_keys AS BIGINT) AS n_keys,
             CAST(substring(mx, 1, 12) AS BIGINT) AS max_cnt,
             substring(mx, 14) AS hot_key,
             CAST((1000000 * CAST(substring(mx, 1, 12) AS BIGINT)) // n_rows
               AS BIGINT) AS max_share_ppm,
             CAST((1000000 * (n_rows*n_rows - sum_sq)) // (n_rows*n_rows)
               AS BIGINT) AS gini_ppm
         FROM u ORDER BY col_name""",

    // incremental SCD2 merge must be BIT-EQUAL to the full rebuild: the
    // oracle is scd2_build's SQL verbatim — that equality IS the contract.
    "merge_scd2_incremental" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, status FROM o
           WHERE prev IS NULL OR prev <> status)
         SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(CAST(lead(ts) OVER w AS TIMESTAMP),
                      '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             lead(ts) OVER w IS NULL AS is_current
         FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, valid_from, status""",

    "dq_mad" ->
      """WITH c AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL),
         med AS (SELECT event_type, quantile_cont(cents, 0.5) AS med
           FROM c GROUP BY 1),
         dev AS (SELECT c.event_type, abs(c.cents - m.med) AS d
           FROM c JOIN med m USING (event_type)),
         mad AS (SELECT event_type, quantile_cont(d, 0.5) AS mad
           FROM dev GROUP BY 1)
         SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN d.d > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
               AS BIGINT) AS n_outliers,
             m.mad AS mad
         FROM dev d JOIN mad m USING (event_type)
         GROUP BY 1, m.mad ORDER BY 1""",

    "scan_manifest_pruned" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM events
         WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-09 00:00:00'
           AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-18 00:00:00'
         GROUP BY event_type ORDER BY event_type""",

    // the streaming SCD2 maintainer must converge to the batch rebuild:
    // scd2_build's oracle verbatim — that equality IS the contract.
    "stream_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, status FROM o
           WHERE prev IS NULL OR prev <> status)
         SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(CAST(lead(ts) OVER w AS TIMESTAMP),
                      '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
             lead(ts) OVER w IS NULL AS is_current
         FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, valid_from, status""",

    "sink_backfill" ->
      """WITH e AS (SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
                 BETWEEN '2024-01-10' AND '2024-01-12'
               THEN value * 2 ELSE value END AS value
           FROM events)
         SELECT day, CAST(count(*) AS BIGINT) AS n_events,
             CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,4))
               AS DOUBLE) AS sum_value
         FROM e GROUP BY day ORDER BY day""",

    "attribution_touch" ->
      """WITH p AS (SELECT user_id, event_id AS p_id,
             CAST(ts AS TIMESTAMP) AS p_ts
           FROM events WHERE event_type = 'purchase'),
         tch AS (SELECT user_id, event_id AS t_id,
             CAST(ts AS TIMESTAMP) AS t_ts, event_type AS channel
           FROM events WHERE event_type IN ('view', 'click', 'signup')),
         j AS (SELECT p.p_id, tch.t_id, tch.t_ts, tch.channel
           FROM p JOIN tch ON p.user_id = tch.user_id
             AND tch.t_ts < p.p_ts
             AND tch.t_ts >= p.p_ts - INTERVAL 7 DAY),
         o AS (SELECT channel,
             row_number() OVER (PARTITION BY p_id
               ORDER BY t_ts, t_id) AS rn_f,
             row_number() OVER (PARTITION BY p_id
               ORDER BY t_ts DESC, t_id DESC) AS rn_l,
             count(*) OVER (PARTITION BY p_id) AS k
           FROM j)
         SELECT channel,
             CAST(sum(CASE WHEN rn_f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first,
             CAST(sum(CASE WHEN rn_l = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_last,
             CAST(sum(CAST(floor(1000000 / k) AS BIGINT)) AS BIGINT)
               AS linear_micro
         FROM o GROUP BY channel ORDER BY channel""",

    "window_gaps_islands" ->
      """WITH days AS (SELECT DISTINCT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
         isl AS (SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS INTEGER) AS grp
           FROM days)
         SELECT user_id, strftime(MIN(d), '%Y-%m-%d') AS streak_start,
             strftime(MAX(d), '%Y-%m-%d') AS streak_end,
             CAST(count(*) AS BIGINT) AS streak_days
         FROM isl GROUP BY user_id, grp HAVING count(*) >= 3
         ORDER BY user_id, streak_start""",

    "dq_freshness" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(count(*) AS BIGINT) AS n_rows,
             MAX(CAST(ts AS TIMESTAMP)) AS last_ts
           FROM events GROUP BY 1),
         bounds AS (SELECT MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0,
             MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d1,
             CAST(count(*) AS BIGINT) AS total FROM events),
         spine AS (SELECT
             CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d,
             CAST(d1 - d0 + 1 AS BIGINT) AS n_days, total FROM bounds)
         SELECT strftime(s.d, '%Y-%m-%d') AS d, COALESCE(n_rows, 0) AS n_rows,
             strftime(last_ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts,
             CASE WHEN n_rows IS NULL THEN 'missing'
                  WHEN 2 * n_rows * s.n_days < s.total THEN 'low'
                  ELSE 'ok' END AS status
         FROM spine s LEFT JOIN daily USING (d) ORDER BY d""",

    "funnel_time_to_convert" ->
      """WITH s AS (SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
           FROM events WHERE event_type = 'signup' GROUP BY 1),
         p AS (SELECT e.user_id,
             MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase,
             MIN(s.signup_ts) AS signup_ts
           FROM events e JOIN s USING (user_id)
           WHERE e.event_type = 'purchase'
             AND CAST(e.ts AS TIMESTAMP) > s.signup_ts GROUP BY 1),
         lat AS (SELECT CAST(signup_ts AS DATE) AS cohort_day,
             epoch_us(first_purchase) - epoch_us(signup_ts) AS us FROM p),
         coh AS (SELECT CAST(signup_ts AS DATE) AS cohort_day,
             CAST(count(*) AS BIGINT) AS n_signups FROM s GROUP BY 1)
         SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day, n_signups,
             CAST(count(us) AS BIGINT) AS n_converted,
             CAST(COALESCE(sum(CASE WHEN us < 86400000000 THEN 1 END), 0)
               AS BIGINT) AS lt_1d,
             CAST(COALESCE(sum(CASE WHEN us >= 86400000000
               AND us < 259200000000 THEN 1 END), 0) AS BIGINT) AS d1_3,
             CAST(COALESCE(sum(CASE WHEN us >= 259200000000 THEN 1 END), 0)
               AS BIGINT) AS ge_3d,
             CAST(MIN(us) AS BIGINT) AS min_us,
             CAST(MAX(us) AS BIGINT) AS max_us
         FROM coh c LEFT JOIN lat USING (cohort_day)
         GROUP BY 1, 2 ORDER BY 1""",

    // the streaming leaderboard must converge to the batch aggregate over
    // the whole feed at any batching — mergeable-partial algebra.
    "stream_topk" ->
      """WITH agg AS (SELECT event_type, user_id,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY total_cents DESC, user_id) AS rk FROM agg)
         SELECT event_type, CAST(rk AS BIGINT) AS rk, user_id, total_cents,
             n_events
         FROM rk WHERE rk <= 3 ORDER BY event_type, rk""",

    // the oracle may use the global window the Spark side must not: DuckDB
    // is single-node, the engine ranks via the two-pass distributed scan.
    "window_allocation" ->
      """WITH c AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
         sh AS (SELECT event_type, user_id, n,
             CAST((999983 * n) // total AS BIGINT) AS fl,
             (999983 * n) % total AS rem FROM c CROSS JOIN t),
         rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, event_type,
               user_id) AS rr,
             CAST(999983 - sum(fl) OVER () AS BIGINT) AS leftover FROM sh)
         SELECT event_type, user_id, n,
             CAST(fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc
         FROM rk ORDER BY event_type, user_id""",

    // n_files = 1 is part of the CONTRACT (hash repartition on the week
    // key → one file per hive partition), not an accident of layout.
    "sink_manifest" ->
      """WITH e AS (SELECT CAST(FLOOR((CAST(CAST(ts AS TIMESTAMP) AS DATE)
               - DATE '2024-01-01') / 7) AS BIGINT) AS wk,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
         SELECT wk, CAST(1 AS BIGINT) AS n_files,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(MIN(us) AS BIGINT) AS min_us,
             CAST(MAX(us) AS BIGINT) AS max_us
         FROM e GROUP BY wk ORDER BY wk""",

    "scan_partition_pruned" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, CAST(count(*) AS BIGINT) AS n
         FROM events
         WHERE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')
           BETWEEN '2024-01-05' AND '2024-01-07'
         GROUP BY 1, 2 ORDER BY 1, 2""",

    // the oracle's single-node NTILE windows are exactly what the engine
    // computes distributed via the two-pass scan (standard tie-splitting).
    "customer_rfm" ->
      """WITH rfm AS (
           SELECT o_custkey AS custkey,
             CAST((SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
               - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS monetary
           FROM orders GROUP BY 1)
         SELECT custkey, recency_days, frequency, monetary,
           CAST(ntile(5) OVER (ORDER BY recency_days, custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(5) OVER (ORDER BY frequency DESC, custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(5) OVER (ORDER BY monetary DESC, custkey) AS BIGINT)
             AS m_score
         FROM rfm ORDER BY custkey""",

    "dq_referential" ->
      """SELECT 'customer.c_nationkey->nation' AS edge,
             CAST(count(*) AS BIGINT) AS n_child,
             CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_orphans
         FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
         UNION ALL
         SELECT 'lineitem.l_orderkey->orders', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
         FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
         UNION ALL
         SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         UNION ALL
         SELECT 'supplier.s_nationkey->nation', CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
         FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
         ORDER BY edge""",

    // DuckDB's // and Spark's div both truncate integral division toward
    // zero (verified on negative deltas) — the ppm rates hash-match.
    "window_period_over_period" ->
      """WITH w AS (
           SELECT event_type,
             CAST(FLOOR((CAST(CAST(ts AS TIMESTAMP) AS DATE)
               - DATE '2024-01-01') / 7) AS BIGINT) AS wk,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
         SELECT event_type, wk, n,
           lag(n) OVER tw AS prev_n,
           n - lag(n) OVER tw AS delta,
           CASE WHEN lag(n) OVER tw IS NULL THEN NULL
                ELSE (1000000 * (n - lag(n) OVER tw)) // lag(n) OVER tw
           END AS change_ppm
         FROM w WINDOW tw AS (PARTITION BY event_type ORDER BY wk)
         ORDER BY event_type, wk""",

    "scd2_point_in_time" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type AS status,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts,
               event_id) AS prev
           FROM events),
         c AS (SELECT user_id, ts, event_id, status FROM o
           WHERE prev IS NULL OR prev <> status),
         h AS (SELECT user_id, status,
             strftime(CAST(ts AS TIMESTAMP),
               '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
             strftime(CAST(lead(ts) OVER w AS TIMESTAMP),
               '%Y-%m-%d %H:%M:%S.%f') AS valid_to
           FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT user_id, status, valid_from FROM h
         WHERE valid_from <= '2024-01-16 00:00:00'
           AND (valid_to IS NULL OR valid_to > '2024-01-16 00:00:00')
         ORDER BY user_id""",

    "funnel_paths" ->
      """WITH o AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn
           FROM events),
         p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
               AS path
           FROM o WHERE rn <= 3 GROUP BY 1)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p
         GROUP BY 1 ORDER BY n_users DESC, path""",

    "vocab_bpe_merges" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS w
             FROM documents),
         wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM w
             WHERE length(w) >= 2 GROUP BY w),
         p AS (SELECT unnest(list_transform(range(1, length(w)),
               i -> substr(w, i, 2))) AS pair, wc
             FROM wc)
         SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM p
         GROUP BY pair ORDER BY n DESC, pair LIMIT 20""",

    "dq_cusum" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, day,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS sx,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS cx,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS k
           FROM d),
         u AS (SELECT event_type, day, n, n * cx - k * sx AS cusum FROM c),
         r AS (SELECT event_type, day, n, abs(cusum) AS a,
             row_number() OVER (PARTITION BY event_type
               ORDER BY abs(cusum) DESC, day) AS rn
           FROM u)
         SELECT event_type, n AS n_days, a AS max_dev,
             strftime(day, '%Y-%m-%d') AS cusum_day
         FROM r WHERE rn = 1 ORDER BY event_type""",

    "sample_reservoir" ->
      """SELECT event_id, event_type FROM (
           SELECT event_id, event_type
           FROM events
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 100)
         ORDER BY event_id""",

    // the streaming reservoir folds per-batch top-k into k-row state;
    // top-k by a total order is mergeable, so any batching converges to
    // the batch draw — same oracle as sample_reservoir, verbatim
    "stream_sample" ->
      """SELECT event_id, event_type FROM (
           SELECT event_id, event_type
           FROM events
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 100)
         ORDER BY event_id""",

    "sample_negatives" ->
      """WITH r AS (SELECT doc_id, row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
             FROM documents),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         a AS (SELECT doc_id, rk, unnest([1, 2, 3]) AS i FROM r)
         SELECT a.doc_id, CAST(a.i AS BIGINT) AS i, b.doc_id AS neg_id
         FROM a CROSS JOIN n JOIN r b ON b.rk = ((a.rk + a.i - 1) % n.n) + 1
         ORDER BY a.doc_id, i""",

    "session_concurrency" ->
      """WITH flagged AS (
           SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL THEN 1
                    WHEN epoch_us(CAST(ts AS TIMESTAMP)) -
                         epoch_us(lag(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000 THEN 1
                    ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
         sess_rows AS (
           SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
           FROM flagged),
         s AS (SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
               strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
           FROM sess_rows GROUP BY user_id, session_idx),
         d AS (SELECT session_start AS ts, CAST(1 AS BIGINT) AS d, -1 AS o FROM s
               UNION ALL
               SELECT session_end AS ts, CAST(-1 AS BIGINT) AS d, 1 AS o FROM s),
         c AS (SELECT ts, sum(d) OVER (ORDER BY ts, o) AS cum FROM d),
         m AS (SELECT max(cum) AS mx FROM c)
         SELECT CAST(max(mx) AS BIGINT) AS max_concurrent, min(ts) AS at_ts
         FROM c CROSS JOIN m WHERE cum = mx""",

    "feature_hash_buckets" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             FROM documents)
         SELECT substr(md5(token), 1, 2) AS bucket,
             CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT token) AS BIGINT) AS n_distinct_tokens
         FROM tok WHERE length(token) > 0
         GROUP BY 1 ORDER BY bucket""",

    "sample_balanced" ->
      """WITH c AS (SELECT label, CAST(count(*) AS BIGINT) AS n
             FROM embeddings GROUP BY 1),
         m AS (SELECT min(n) AS mn FROM c),
         r AS (SELECT label, vec_id, row_number() OVER (PARTITION BY label
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
             FROM embeddings)
         SELECT label, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(vec_id) AS BIGINT) AS sum_ids
         FROM r CROSS JOIN m WHERE rn <= mn
         GROUP BY label ORDER BY label""",

    // the native as-of plan node must produce exactly the composed form's
    // result — same oracle as join_asof, verbatim
    "join_asof_native" ->
      """SELECT event_id, o_orderkey, o_totalprice FROM (
           SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
           FROM events e JOIN orders o
             ON o.o_custkey = e.user_id AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         WHERE rn = 1 ORDER BY event_id""",

    "scan_jdbc_partitioned" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS sum_cents
         FROM events
         WHERE event_type = 'purchase'
           AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15 00:00:00'
         GROUP BY 1 ORDER BY day""",

    "window_hopping" ->
      """WITH e AS (SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
             FROM events),
         h AS (SELECT event_type, t,
             (t // 43200000000) * 43200000000 AS h0 FROM e),
         x AS (SELECT event_type, h0 AS ws FROM h
               UNION ALL
               SELECT event_type, h0 - 43200000000 AS ws FROM h)
         SELECT event_type,
             strftime(make_timestamp(ws),
               '%Y-%m-%d %H:%M:%S.%f') AS w_start,
             strftime(make_timestamp(ws + 86400000000),
               '%Y-%m-%d %H:%M:%S.%f') AS w_end,
             CAST(count(*) AS BIGINT) AS n
         FROM x GROUP BY 1, 2, 3 ORDER BY event_type, w_start""",

    "dq_benford" ->
      """WITH c AS (SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100
               AS BIGINT) AS cents FROM events),
         d AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
             CAST(count(*) AS BIGINT) AS n
           FROM c
           WHERE substr(CAST(cents AS VARCHAR), 1, 1) BETWEEN '1' AND '9'
           GROUP BY 1),
         t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d),
         e AS (SELECT * FROM (VALUES
             ('1', 301029), ('2', 176091), ('3', 124938), ('4', 96910),
             ('5', 79181), ('6', 66946), ('7', 57991), ('8', 51152),
             ('9', 45757)) AS v(digit, exp_ppm))
         SELECT d.digit, n, (1000000 * n) // tot AS obs_ppm,
             CAST(exp_ppm AS BIGINT) AS exp_ppm,
             (1000000 * n) // tot - exp_ppm AS delta_ppm
         FROM d JOIN e USING (digit) CROSS JOIN t ORDER BY digit""",

    // the Spark side blocks on deletion-neighborhood keys (lossless at
    // radius 1) then verifies; the oracle is the definitional quadratic —
    // fine at sf0.01, which is exactly why the engine side must not be
    // SymDelete candidate generation (round 8 — the ENGINE's own
    // deletion-neighborhood design, now mirrored in the oracle so the
    // sf0.1 gate doesn't pay n² levenshtein): two strings within edit
    // distance 1 share a key between their {self} ∪ single-deletion
    // sets (substitution at i ⟹ equal delete-at-i forms; insertion/
    // deletion ⟹ the shorter string IS a deletion form of the longer;
    // equality shares self) — lossless, then the exact levenshtein
    // verify runs only over candidates
    "join_fuzzy_edit" ->
      """WITH keys AS (SELECT c_custkey, c_name,
             unnest(list_prepend(c_name,
               list_transform(range(1, length(c_name) + 1),
                 i -> substr(c_name, 1, CAST(i - 1 AS INT)) ||
                      substr(c_name, CAST(i + 1 AS INT))))) AS k
           FROM customer),
         cand AS (SELECT DISTINCT a.c_custkey a_id, a.c_name a_name,
             b.c_custkey b_id, b.c_name b_name
           FROM keys a JOIN keys b ON a.k = b.k
             AND a.c_custkey < b.c_custkey)
         SELECT a_id, b_id,
             CAST(levenshtein(a_name, b_name) AS BIGINT) AS dist
         FROM cand
         WHERE levenshtein(a_name, b_name) <= 1
         ORDER BY a_id, b_id""",

    // definitional exact shingle-set Jaccard (same oracle as
    // dedup_minhash_lsh — the exact prefix-filter tier and the
    // probabilistic LSH tier must produce the identical pair set); the
    // Spark side must reproduce it through the lossless prefix filter
    "dedup_prefix_filter" ->
      s"""WITH ${shinglesSql()},
         ${dupCandSql()}
         SELECT a_id, b_id, jaccard FROM (
           SELECT a_id, b_id,
               round(CAST(len(list_intersect(a_sh, b_sh)) AS DOUBLE) /
                     (len(a_sh) + len(b_sh) - len(list_intersect(a_sh, b_sh))), 4) jaccard
           FROM dp_cand)
         WHERE jaccard >= 0.8 ORDER BY a_id, b_id""",

    // HUGEINT sums are exact like the engine's DECIMAL(38,0); the final
    // closed forms are single double expressions over exact inputs
    "agg_ols" ->
      """WITH d AS (SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
           FROM lineitem),
         m AS (SELECT l_returnflag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM d GROUP BY 1)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             round(CAST(n * sxy - sx * sy AS DOUBLE) /
                   CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_cents_per_unit,
             round((CAST(sy AS DOUBLE) -
                    CAST(n * sxy - sx * sy AS DOUBLE) /
                    CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                   CAST(n AS DOUBLE), 6) AS intercept_cents,
             round(CAST(n * sxy - sx * sy AS DOUBLE) *
                   CAST(n * sxy - sx * sy AS DOUBLE) /
                   (CAST(n * sxx - sx * sx AS DOUBLE) *
                    CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
         FROM m ORDER BY l_returnflag""",

    // DuckDB dayofweek is 0-based Sunday; Spark's is 1-based Sunday
    // Cramér's V effect size: the chi-square contingency in HUGEINT —
    // per-cell ((obs·n − r·c)²·1e6) // (r·c·n) truncating terms (exceeds
    // BIGINT past ~60k rows), summed order-free, then v2 = chi2/(n·(k−1))
    "dq_cramers_v" ->
      """WITH cells AS (SELECT event_type,
             CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS HUGEINT) AS obs
           FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, sum(obs) AS r FROM cells GROUP BY 1),
         c AS (SELECT dow, sum(obs) AS c FROM cells GROUP BY 1),
         tt AS (SELECT sum(obs) AS n, count(*) AS ncells FROM cells),
         dims AS (SELECT (SELECT count(*) FROM r) AS n_rows,
             (SELECT count(*) FROM c) AS n_cols),
         chi AS (SELECT sum(
             (x.obs * (SELECT n FROM tt) - r.r * c.c)
               * (x.obs * (SELECT n FROM tt) - r.r * c.c)
               * 1000000 // (r.r * c.c * (SELECT n FROM tt))) AS chi2_ppm
           FROM cells x JOIN r USING (event_type) JOIN c USING (dow))
         SELECT CAST((SELECT n FROM tt) AS BIGINT) AS n,
             CAST(n_rows AS BIGINT) AS n_rows,
             CAST(n_cols AS BIGINT) AS n_cols,
             CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
             CAST((SELECT chi2_ppm FROM chi) AS BIGINT) AS chi2_ppm,
             CAST((SELECT chi2_ppm FROM chi) //
               ((SELECT n FROM tt) * (least(n_rows, n_cols) - 1))
               AS BIGINT) AS v2_ppm
         FROM dims""",

    "dq_chisq" ->
      """WITH cells AS (SELECT event_type,
             CAST(dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS obs
           FROM events GROUP BY 1, 2),
         r AS (SELECT event_type, sum(obs) AS r FROM cells GROUP BY 1),
         c AS (SELECT dow, sum(obs) AS c FROM cells GROUP BY 1),
         t AS (SELECT sum(obs) AS n FROM cells)
         SELECT event_type, dow, obs,
             round(CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
               AS expected,
             round((CAST(obs AS DOUBLE) -
                    CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) *
                   (CAST(obs AS DOUBLE) -
                    CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) /
                   (CAST(r.r * c.c AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
               AS chi2_term
         FROM cells JOIN r USING (event_type) JOIN c USING (dow)
         CROSS JOIN t ORDER BY event_type, dow""",

    "basket_rules" ->
      """WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
         u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
               FROM b),
         i AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_item
               FROM b GROUP BY 1),
         p AS (SELECT a.event_type AS antecedent,
               c.event_type AS consequent, CAST(count(*) AS BIGINT) AS n_xy
           FROM b a JOIN b c ON a.user_id = c.user_id
             AND a.event_type <> c.event_type
           GROUP BY 1, 2)
         SELECT antecedent, consequent, n_xy,
             (1000000 * n_xy) // n_users AS support_ppm,
             (1000000 * n_xy) // ix.n_item AS confidence_ppm,
             (1000000 * n_xy * n_users) // (ix.n_item * iy.n_item)
               AS lift_ppm
         FROM p
         JOIN i ix ON ix.event_type = antecedent
         JOIN i iy ON iy.event_type = consequent
         CROSS JOIN u ORDER BY antecedent, consequent""",

    // rank() over the base table == running count over value-level counts
    "window_percentile_rank" ->
      """WITH v AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT) AS cents, CAST(count(*) AS BIGINT) AS cnt
           FROM orders GROUP BY 1),
         r AS (SELECT cents, cnt,
             sum(cnt) OVER (ORDER BY cents) AS cum,
             sum(cnt) OVER () AS n
           FROM v)
         SELECT cents, cnt, CAST(cum - cnt + 1 AS BIGINT) AS rk,
             CAST((1000000 * (cum - cnt)) // (n - 1) AS BIGINT) AS pct_ppm
         FROM r ORDER BY cents""",

    // the XML fixture is a re-encoding of the nation parquet rows; the
    // oracle aggregates the originals, so parse fidelity is the test
    "scan_xml" ->
      """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
             min(n_name) AS first_name,
             CAST(max(n_nationkey) AS BIGINT) AS max_key
         FROM nation GROUP BY 1 ORDER BY n_regionkey""",

    "scan_variant" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(k) AS BIGINT) AS sum_k,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(max(k) AS BIGINT) AS max_k
         FROM (SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
         WHERE k IS NOT NULL GROUP BY 1 ORDER BY event_type""",

    "agg_entropy" ->
      """WITH cells AS (SELECT
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         d AS (SELECT day, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s
           FROM cells GROUP BY 1)
         SELECT day, n, k,
             round(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 6)
               AS entropy_nats,
             round((ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE)) /
                   ln(CAST(k AS DOUBLE)), 6) AS entropy_ratio
         FROM d WHERE k > 1 ORDER BY day""",

    "window_lag_features" ->
      """WITH daily AS (SELECT user_id,
             datediff('day', DATE '2024-01-01',
               CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_idx,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS spend_cents
           FROM events GROUP BY 1, 2)
         SELECT user_id, CAST(day_idx AS BIGINT) AS day_idx, spend_cents,
             CASE WHEN lag(day_idx) OVER w = day_idx - 1
                  THEN lag(spend_cents) OVER w ELSE CAST(0 AS BIGINT)
             END AS lag1_cents,
             CAST(sum(spend_cents) OVER (PARTITION BY user_id ORDER BY day_idx
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS trail7_cents,
             CAST(count(*) OVER (PARTITION BY user_id ORDER BY day_idx
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS trail7_days
         FROM daily
         WINDOW w AS (PARTITION BY user_id ORDER BY day_idx)
         ORDER BY user_id, day_idx""",

    "dq_outlier_iqr" ->
      """WITH c AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         q AS (SELECT event_type,
             quantile_cont(cents, 0.25) AS q1,
             quantile_cont(cents, 0.75) AS q3
           FROM c GROUP BY 1),
         f AS (SELECT event_type, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi
           FROM q)
         SELECT c.event_type, CAST(count(*) AS BIGINT) AS n,
             round(f.q1, 4) AS q1, round(f.q3, 4) AS q3,
             round(f.lo, 4) AS lo_fence, round(f.hi, 4) AS hi_fence,
             CAST(count(*) FILTER (WHERE cents < lo) AS BIGINT) AS n_below,
             CAST(count(*) FILTER (WHERE cents > hi) AS BIGINT) AS n_above
         FROM c JOIN f USING (event_type)
         GROUP BY c.event_type, f.q1, f.q3, f.lo, f.hi
         ORDER BY c.event_type""",

    "agg_gini_spend" ->
      """WITH s AS (SELECT o_custkey,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
               AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         j AS (SELECT s.o_custkey, s.cents, c.c_mktsegment
           FROM s JOIN customer c ON c.c_custkey = s.o_custkey),
         r AS (SELECT c_mktsegment, cents,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY cents, o_custkey) AS BIGINT) AS rk
           FROM j)
         SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             round(2.0 * CAST(sum(rk * cents) AS DOUBLE) /
                   (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)) -
                   CAST(count(*) + 1 AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS gini
         FROM r GROUP BY 1 ORDER BY c_mktsegment""",

    // mergeable sufficient statistics: any batching folds to the same
    // exact sums — the streaming MV shares the batch OLS oracle verbatim
    "stream_ols" ->
      """WITH d AS (SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
           FROM lineitem),
         m AS (SELECT l_returnflag, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM d GROUP BY 1)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
             round(CAST(n * sxy - sx * sy AS DOUBLE) /
                   CAST(n * sxx - sx * sx AS DOUBLE), 6)
               AS slope_cents_per_unit,
             round((CAST(sy AS DOUBLE) -
                    CAST(n * sxy - sx * sy AS DOUBLE) /
                    CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
                   CAST(n AS DOUBLE), 6) AS intercept_cents,
             round(CAST(n * sxy - sx * sy AS DOUBLE) *
                   CAST(n * sxy - sx * sy AS DOUBLE) /
                   (CAST(n * sxx - sx * sx AS DOUBLE) *
                    CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
         FROM m ORDER BY l_returnflag""",

    "dq_ab_welch" ->
      """WITH d AS (SELECT event_type,
             CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) <= '7'
                  THEN 1 ELSE 0 END AS cohort,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
           FROM events),
         m AS (SELECT event_type, cohort, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS s1, sum(x * x) AS s2
           FROM d GROUP BY 1, 2),
         a AS (SELECT event_type, n AS na, s1 AS s1a, s2 AS s2a
               FROM m WHERE cohort = 1),
         b AS (SELECT event_type, n AS nb, s1 AS s1b, s2 AS s2b
               FROM m WHERE cohort = 0),
         j AS (SELECT a.event_type, na, nb,
             CAST(s1a AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
             CAST(s1b AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
             (CAST(s2a AS DOUBLE) - CAST(s1a AS DOUBLE) * CAST(s1a AS DOUBLE)
                / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)
                / CAST(na AS DOUBLE) AS sa,
             (CAST(s2b AS DOUBLE) - CAST(s1b AS DOUBLE) * CAST(s1b AS DOUBLE)
                / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1)
                / CAST(nb AS DOUBLE) AS sb
           FROM a JOIN b USING (event_type))
         SELECT event_type, na, nb,
             round(ma - mb, 4) AS mean_diff_cents,
             round((ma - mb) / sqrt(sa + sb), 6) AS t_stat,
             round((sa + sb) * (sa + sb) /
                   (sa * sa / (CAST(na AS DOUBLE) - 1) +
                    sb * sb / (CAST(nb AS DOUBLE) - 1)), 4) AS welch_df
         FROM j ORDER BY event_type""",

    "window_bucketed" ->
      """SELECT user_id, event_id,
             CAST(row_number() OVER w AS BIGINT) AS seq,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS run_cents
         FROM events
         WINDOW w AS (PARTITION BY user_id
                      ORDER BY CAST(ts AS TIMESTAMP), event_id)
         ORDER BY user_id, seq""",

    "pii_pseudonymize" ->
      """WITH ev AS (SELECT
             md5('graft-vault-v1:' || CAST(user_id AS VARCHAR)) AS p,
             event_type FROM events),
         u AS (SELECT DISTINCT
             md5('graft-vault-v1:' || CAST(user_id AS VARCHAR)) AS p
           FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT ev.p) AS BIGINT) AS n_users_pseudo
         FROM ev JOIN u ON ev.p = u.p
         GROUP BY 1 ORDER BY event_type""",

    "text_lm_bigram" ->
      """WITH bg AS (SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(string_split(text,' '))-1, 0)+1),
               i -> {a: string_split(text,' ')[i], b: string_split(text,' ')[i+1]})) AS p
           FROM documents),
         d AS (SELECT doc_id, p.a AS a, p.b AS b FROM bg
               WHERE p.b IS NOT NULL),
         cab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
                 FROM d GROUP BY 1, 2),
         ca AS (SELECT a, CAST(count(*) AS BIGINT) AS c_a FROM d GROUP BY 1)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(CAST(sum(c_ab) AS DOUBLE) / CAST(sum(c_a) AS DOUBLE), 9)
               AS coherence
         FROM d JOIN cab USING (a, b) JOIN ca USING (a)
         GROUP BY doc_id ORDER BY doc_id""",

    "vocab_zipf_fit" ->
      """WITH v AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM (
             SELECT unnest(string_split(text, ' ')) AS token FROM documents)
           WHERE len(token) > 0 GROUP BY token),
         r AS (SELECT freq, CAST(row_number() OVER (
               ORDER BY freq DESC, token) AS BIGINT) AS rk FROM v),
         d AS (SELECT ln(CAST(rk AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y, freq FROM r),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(freq) AS BIGINT) AS n_tokens,
             sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
             sum(x * x) AS sxx, sum(y * y) AS syy
           FROM d)
         SELECT n AS vocab_size, n_tokens,
             round((CAST(n AS DOUBLE) * sxy - sx * sy) /
                   (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_exponent,
             round((CAST(n AS DOUBLE) * sxy - sx * sy) *
                   (CAST(n AS DOUBLE) * sxy - sx * sy) /
                   ((CAST(n AS DOUBLE) * sxx - sx * sx) *
                    (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r2
         FROM m""",

    // the sketch's sample is a pure function of the data (k smallest by
    // (md5, value)), so the oracle replays the identical sample and the
    // "approximate" estimates hash-match exactly
    "agg_quantile_sketch" ->
      """WITH c AS (SELECT event_type,
             md5(CAST(event_id AS VARCHAR)) AS h,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         r AS (SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY h, cents) AS rn
           FROM c),
         s AS (SELECT event_type,
             round(quantile_cont(cents, 0.5), 4) AS p50_est,
             round(quantile_cont(cents, 0.9), 4) AS p90_est
           FROM r WHERE rn <= 256 GROUP BY 1),
         e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(quantile_cont(cents, 0.5), 4) AS p50_exact,
             round(quantile_cont(cents, 0.9), 4) AS p90_exact
           FROM c GROUP BY 1)
         SELECT event_type, n, p50_est, p90_est, p50_exact, p90_exact
         FROM e JOIN s USING (event_type) ORDER BY event_type""",

    // the streaming twin folds the same mergeable sample through
    // versioned state — identical sample, identical estimates
    "stream_quantile_sketch" ->
      """WITH c AS (SELECT event_type,
             md5(CAST(event_id AS VARCHAR)) AS h,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         r AS (SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type
               ORDER BY h, cents) AS rn
           FROM c),
         s AS (SELECT event_type,
             round(quantile_cont(cents, 0.5), 4) AS p50_est,
             round(quantile_cont(cents, 0.9), 4) AS p90_est
           FROM r WHERE rn <= 256 GROUP BY 1),
         e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM c GROUP BY 1)
         SELECT event_type, n, p50_est, p90_est
         FROM e JOIN s USING (event_type) ORDER BY event_type""",

    // additive cell counts fold batching-invariantly — the streaming MV
    // shares the batch entropy oracle verbatim
    "stream_entropy" ->
      """WITH cells AS (SELECT
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         d AS (SELECT day, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS k,
             sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS s
           FROM cells GROUP BY 1)
         SELECT day, n, k,
             round(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 6)
               AS entropy_nats,
             round((ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE)) /
                   ln(CAST(k AS DOUBLE)), 6) AS entropy_ratio
         FROM d WHERE k > 1 ORDER BY day""",

    // ── Wave O (round 5) ────────────────────────────────────────────────

    "tokenize_bpe_apply" ->
      """WITH RECURSIVE
         w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         lw AS (SELECT w FROM w WHERE regexp_matches(w, '^[a-z]{2,}$')),
         wc0 AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM w
             WHERE length(w) >= 2 GROUP BY w),
         p AS (SELECT unnest(list_transform(range(1, length(w)),
               i -> substr(w, CAST(i AS INT), 2))) AS pair, wc
             FROM wc0),
         m AS MATERIALIZED (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM p GROUP BY pair),
         mr AS MATERIALIZED (SELECT pair,
               row_number() OVER (ORDER BY n DESC, pair) AS rnk
             FROM m ORDER BY n DESC, pair LIMIT 20),
         topw AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM lw
             GROUP BY w ORDER BY wc DESC, w LIMIT 50),
         r AS (
           SELECT w, wc,
               '(' || array_to_string(list_transform(range(1, length(w) + 1),
                 i -> substr(w, CAST(i AS INT), 1)), ')(') || ')' AS s,
               0 AS step
             FROM topw
           UNION ALL
           SELECT r.w, r.wc,
               replace(r.s,
                 '(' || substr(m.pair, 1, 1) || ')(' || substr(m.pair, 2, 1) || ')',
                 '(' || m.pair || ')'),
               r.step + 1
             FROM r JOIN mr m ON m.rnk = r.step + 1)
         SELECT w, wc,
             substr(replace(s, ')(', '|'), 2,
               length(replace(s, ')(', '|')) - 2) AS tokens,
             CAST(length(s) - length(replace(s, '(', '')) AS BIGINT) AS n_tokens
         FROM r WHERE step = 20 ORDER BY wc DESC, w""",

    "window_rolling_regression" ->
      """WITH e AS (SELECT user_id, event_id, ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
             CAST(row_number() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS x
           FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         s AS (SELECT user_id, x,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(x) OVER w AS BIGINT) AS sx,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
             CAST(sum(x * x) OVER w AS BIGINT) AS sxx
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
         SELECT user_id, x AS step,
             CAST(n * sxy - sx * sy AS DOUBLE) /
               CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_step
         FROM s WHERE n = 10 ORDER BY user_id, x""",

    "cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS m,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM orders),
         f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey),
         sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_customers
           FROM f GROUP BY cohort),
         ba AS (SELECT f.cohort, o.m - f.cohort AS age,
             CAST(sum(o.cents) AS BIGINT) AS rev,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM o JOIN f USING (o_custkey) GROUP BY f.cohort, age),
         c AS (SELECT cohort, age, n_orders,
             CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age)
               AS BIGINT) AS cum_cents
           FROM ba)
         SELECT printf('%04d-%02d', (c.cohort - 1) // 12,
               ((c.cohort - 1) % 12) + 1) AS cohort_month,
             c.age, sz.n_customers, c.n_orders,
             CAST(cum_cents AS DOUBLE) / 100.0 AS cum_rev,
             CAST(cum_cents AS DOUBLE) /
               (CAST(sz.n_customers AS DOUBLE) * 100.0) AS ltv
         FROM c JOIN sz USING (cohort)
         ORDER BY cohort_month, age""",

    "funnel_strict_order" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         SELECT step, stage, n_users FROM (
           SELECT 1 AS step, 'view' AS stage,
               CAST(count(*) AS BIGINT) AS n_users FROM v
           UNION ALL
           SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
           UNION ALL
           SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
         ORDER BY step""",

    "dq_psi" ->
      """WITH d AS (SELECT n_chars AS v, doc_id % 2 = 0 AS in_a
             FROM documents),
         st AS (SELECT min(v) AS mn, max(v) AS mx FROM d),
         pb AS (SELECT ((v - mn) * 10) // (mx - mn + 1) AS bin,
               CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
               CAST(sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
             FROM d CROSS JOIN st GROUP BY bin),
         tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a,
                     CAST(sum(cnt_b) AS BIGINT) AS n_b FROM pb)
         SELECT bin, cnt_a, cnt_b,
             round(((2.0 * CAST(cnt_a AS DOUBLE) + 1.0) /
                      (2.0 * CAST(n_a AS DOUBLE) + 10.0) -
                    (2.0 * CAST(cnt_b AS DOUBLE) + 1.0) /
                      (2.0 * CAST(n_b AS DOUBLE) + 10.0)) *
                   ln(((2.0 * CAST(cnt_a AS DOUBLE) + 1.0) /
                        (2.0 * CAST(n_a AS DOUBLE) + 10.0)) /
                      ((2.0 * CAST(cnt_b AS DOUBLE) + 1.0) /
                        (2.0 * CAST(n_b AS DOUBLE) + 10.0))), 9) AS psi_term
         FROM pb CROSS JOIN tot ORDER BY bin""",

    "sample_epochs" ->
      """WITH d AS (SELECT doc_id, source,
             CASE WHEN source IN ('src0', 'src1') THEN 2
                  WHEN source = 'src2' THEN 0 ELSE 1 END
             + CASE WHEN source IN ('src0', 'src1', 'src2')
                    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                    THEN 1 ELSE 0 END AS n_copies
           FROM documents),
         e AS (SELECT doc_id, source,
             unnest(range(1, n_copies + 1)) AS epoch
           FROM d WHERE n_copies > 0)
         SELECT source, CAST(count(*) AS BIGINT) AS n_emitted,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(sum(doc_id * epoch) AS BIGINT) AS checksum
         FROM e GROUP BY source ORDER BY source""",

    "dq_ks" ->
      """WITH d AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
           FROM events),
         ptv AS (SELECT cents, event_type, CAST(count(*) AS BIGINT) AS cnt
                 FROM d GROUP BY 1, 2),
         pv AS (SELECT cents, CAST(sum(cnt) AS BIGINT) AS cnt_all
                FROM ptv GROUP BY 1),
         ty AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
                FROM d GROUP BY 1),
         tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_all FROM ty),
         grid AS (SELECT pv.cents, ty.event_type,
                      COALESCE(ptv.cnt, 0) AS cnt, pv.cnt_all
                  FROM pv CROSS JOIN ty
                  LEFT JOIN ptv ON ptv.cents = pv.cents
                               AND ptv.event_type = ty.event_type),
         cum AS (SELECT event_type, cents,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY cents) AS c_t,
             sum(cnt_all) OVER (PARTITION BY event_type
                                ORDER BY cents) AS c_all
           FROM grid),
         j AS (SELECT c.event_type, ty.n_t, (tot.n_all - ty.n_t) AS n_r,
             abs(c.c_t * (tot.n_all - ty.n_t)
                 - (c.c_all - c.c_t) * ty.n_t) AS dnum
           FROM cum c JOIN ty USING (event_type) CROSS JOIN tot)
         SELECT event_type, n_t AS n_type, n_r AS n_rest,
             round(CAST(max(dnum) AS DOUBLE) /
               (CAST(n_t AS DOUBLE) * CAST(n_r AS DOUBLE)), 6) AS ks_stat
         FROM j GROUP BY 1, 2, 3 ORDER BY 1""",

    "split_kfold" ->
      """WITH d AS (SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40' THEN 0
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80' THEN 1
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 2
                  ELSE 3 END AS fold
           FROM documents)
         SELECT CAST(fold AS BIGINT) AS fold, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM d GROUP BY 1, 2 ORDER BY 1, 2""",

    "scan_time_travel" ->
      """WITH v1 AS (SELECT CAST(1 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) n_users
           FROM events
           WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15 00:00:00'
           GROUP BY 2),
         v2 AS (SELECT CAST(2 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) n_users
           FROM events GROUP BY 2)
         SELECT * FROM v1 UNION ALL SELECT * FROM v2
         ORDER BY "version", event_type""",

    "merge_cow" ->
      """WITH v2 AS (SELECT CAST(2 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events GROUP BY 2),
         v3 AS (SELECT CAST(3 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events
           WHERE NOT (event_type = 'error' AND
             CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00')
           GROUP BY 2)
         SELECT * FROM v2 UNION ALL SELECT * FROM v3
         ORDER BY "version", event_type""",

    "snapshot_expire" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) n_events
         FROM events
         WHERE NOT (event_type = 'error' AND
           CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "stream_snapshot_commit" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) n_events
         FROM events GROUP BY 1 ORDER BY 1""",

    "scan_merge_on_read" ->
      """WITH v2 AS (SELECT CAST(2 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events GROUP BY 2),
         v4 AS (SELECT CAST(4 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events
           WHERE NOT (event_type = 'error' AND
             CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00')
           GROUP BY 2)
         SELECT * FROM v2 UNION ALL SELECT * FROM v4
         ORDER BY "version", event_type""",

    "scan_changes" ->
      """SELECT 'delete' AS change_type, event_type,
             CAST(count(*) AS BIGINT) n
         FROM events
         WHERE event_type = 'error' AND
           CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00'
         GROUP BY 2 ORDER BY 1, 2""",

    "dq_bootstrap_ci" ->
      """WITH d AS (SELECT event_type,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 12))::UBIGINT AS BIGINT) h,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) x
           FROM events),
         e AS (SELECT d.*, b FROM d
               CROSS JOIN (SELECT unnest(range(0, 100)) b)),
         wt AS (SELECT event_type, b, x,
             CASE WHEN u < 6171992 THEN 0
                  WHEN u < 12343985 THEN 1
                  WHEN u < 15429982 THEN 2
                  ELSE 3 END AS w
           FROM (SELECT *,
               (((h + b * 2654435761) % 2147483647) * 48271
                 % 2147483647) % 16777216 AS u FROM e)),
         r AS (SELECT event_type, b, CAST(sum(w) AS BIGINT) n,
                   sum(w * x) s
               FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
         m AS (SELECT event_type,
                   CAST(s AS DOUBLE) / CAST(n AS DOUBLE) m FROM r),
         agg AS (SELECT event_type, CAST(count(*) AS BIGINT) n_reps,
                     list_sort(list(m)) ms
                 FROM m GROUP BY 1)
         SELECT event_type, n_reps,
             round(ms[CAST(ceil(n_reps * 0.025) AS INT)], 4) AS ci_lo_cents,
             round(ms[CAST(ceil(n_reps * 0.975) AS INT)], 4) AS ci_hi_cents
         FROM agg ORDER BY 1""",

    "graph_common_neighbors" ->
      s"""WITH ${dupPairsSql},
         adj AS (SELECT a_id AS node, b_id AS nbr FROM p
                 UNION ALL SELECT b_id, a_id FROM p),
         deg AS (SELECT node, CAST(count(*) AS BIGINT) deg
                 FROM adj GROUP BY 1),
         w AS (SELECT a.node a_id, b.node b_id, CAST(count(*) AS BIGINT) n_common
               FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
               GROUP BY 1, 2)
         SELECT w.a_id, w.b_id, w.n_common,
             round(CAST(w.n_common AS DOUBLE) /
               CAST(da.deg + db.deg - w.n_common AS DOUBLE), 4) AS nbr_jaccard
         FROM w JOIN deg da ON da.node = w.a_id
                JOIN deg db ON db.node = w.b_id
         ORDER BY w.a_id, w.b_id""",

    "recommend_item_knn" ->
      """WITH li AS (SELECT DISTINCT l_orderkey ok, l_partkey pk FROM lineitem),
         n AS (SELECT pk, CAST(count(*) AS BIGINT) ni FROM li GROUP BY 1),
         co AS (SELECT a.pk a, b.pk b, CAST(count(*) AS BIGINT) nco
                FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
                GROUP BY 1, 2 HAVING count(*) >= 2),
         s AS (SELECT co.a, co.b, co.nco,
                 round(CAST(co.nco AS DOUBLE) /
                   sqrt(CAST(na.ni * nb.ni AS DOUBLE)), 6) cos_sim
               FROM co JOIN n na ON na.pk = co.a JOIN n nb ON nb.pk = co.b),
         r AS (SELECT a, b, nco, cos_sim,
                 row_number() OVER (PARTITION BY a
                   ORDER BY cos_sim DESC, b) rn
               FROM s)
         SELECT a AS part_id, b AS rec_part_id, nco AS n_co, cos_sim,
             CAST(rn AS BIGINT) AS rn
         FROM r WHERE rn <= 5 ORDER BY part_id, rn""",

    "merge_snapshot" ->
      """WITH tgt AS (SELECT event_id, event_type, CAST(ts AS TIMESTAMP) ts,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents
           FROM events),
         v2 AS (SELECT CAST(2 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events,
             CAST(sum(cents) AS BIGINT) sum_cents
           FROM tgt GROUP BY 2),
         merged AS (
           SELECT event_id, event_type,
               CASE WHEN event_type = 'view' AND
                 ts >= TIMESTAMP '2024-01-22 00:00:00'
                 THEN cents * 2 ELSE cents END AS cents
           FROM tgt
           UNION ALL
           SELECT event_id + 100000000, 'backfill', cents
           FROM tgt
           WHERE event_type = 'error' AND
             ts >= TIMESTAMP '2024-01-22 00:00:00'),
         v3 AS (SELECT CAST(3 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events,
             CAST(sum(cents) AS BIGINT) sum_cents
           FROM merged GROUP BY 2)
         SELECT * FROM v2 UNION ALL SELECT * FROM v3
         ORDER BY "version", event_type""",

    "sink_optimize" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) n_events,
             CAST(count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE))
               AS BIGINT) n_days
         FROM events GROUP BY 1 ORDER BY 1""",

    "scan_bloom_skip" ->
      """SELECT event_id, event_type,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
         FROM events
         WHERE event_id IN
           (SELECT min(event_id) FROM events GROUP BY event_type)
         ORDER BY event_id""",

    // the bloom lookup through the O(delta)-refreshed v3 index must
    // answer exactly like a direct scan of the post-COW-delete table —
    // probe keys re-derived from v3 content (the delete can move a
    // type's min event_id)
    "index_incremental" ->
      """WITH v3 AS (SELECT event_id, event_type,
             CAST(ts AS TIMESTAMP) AS tsx
           FROM events
           WHERE NOT (event_type = 'error' AND
             CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00'))
         SELECT event_id, event_type,
             CAST(epoch_us(tsx) AS BIGINT) AS us
         FROM v3
         WHERE event_id IN
           (SELECT min(event_id) FROM v3 GROUP BY event_type)
         ORDER BY event_id""",

    "scan_schema_evolution" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) n_events,
             CAST(sum(CASE WHEN CAST(ts AS TIMESTAMP) >=
               TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END)
               AS BIGINT) n_tagged
         FROM events GROUP BY 1 ORDER BY 1""",

    "feature_scale" ->
      """WITH d AS (SELECT event_type,
             CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents
           FROM events),
         s AS (SELECT event_type, min(cents) mn, max(cents) mx
           FROM d GROUP BY 1 HAVING max(cents) > min(cents)),
         x AS (SELECT d.event_type,
             ((cents - mn) * 1000000) // (mx - mn) AS ppm,
             least(((cents - mn) * 10) // (mx - mn), 9) AS b
           FROM d JOIN s USING (event_type))
         SELECT event_type, CAST(b AS BIGINT) bucket,
             CAST(count(*) AS BIGINT) n, CAST(sum(ppm) AS BIGINT) sum_ppm
         FROM x GROUP BY 1, 2 ORDER BY 1, 2""",

    "sketch_kmv" ->
      """WITH d AS (SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT
               AS BIGINT) h
           FROM events),
         surv AS (SELECT event_type g, h FROM (
             SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) rn
             FROM d) WHERE rn <= 64),
         pg AS (SELECT g, CAST(count(*) AS BIGINT) n_kmv, max(h) hk
           FROM surv GROUP BY 1),
         ex AS (SELECT event_type g, CAST(count(*) AS BIGINT) exact_distinct
           FROM d GROUP BY 1),
         au AS (SELECT DISTINCT h FROM surv ORDER BY h LIMIT 64),
         am AS (SELECT 'ALL' g, CAST(count(*) AS BIGINT) n_kmv, max(h) hk
           FROM au),
         ax AS (SELECT 'ALL' g, CAST(count(DISTINCT h) AS BIGINT) exact_distinct
           FROM d),
         u AS (SELECT pg.g, n_kmv, hk, exact_distinct
               FROM pg JOIN ex USING (g)
               UNION ALL
               SELECT am.g, am.n_kmv, am.hk, ax.exact_distinct FROM am, ax)
         SELECT g AS event_type, n_kmv,
             CAST(CASE WHEN n_kmv < 64 THEN exact_distinct
               ELSE (63 * 281474976710656) // hk END AS BIGINT) est_distinct,
             exact_distinct
         FROM u ORDER BY 1""",

    "sketch_kmv_setops" ->
      """WITH d AS (SELECT DISTINCT event_type g,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT
               AS BIGINT) h
           FROM events),
         surv AS (SELECT g, h FROM (
             SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) rn
             FROM d) WHERE rn <= 64),
         eg AS (SELECT s.g,
             CAST(CASE WHEN s.n < 64 THEN e.nd
               ELSE (63 * 281474976710656) // s.hk END AS BIGINT) est
           FROM (SELECT g, count(*) n, max(h) hk FROM surv GROUP BY 1) s
           JOIN (SELECT g, count(*) nd FROM d GROUP BY 1) e USING (g)),
         types AS (SELECT DISTINCT g FROM d),
         pairs AS (SELECT x.g a, y.g b FROM types x JOIN types y
           ON x.g < y.g),
         pu AS (SELECT DISTINCT p.a, p.b, s.h FROM pairs p
           JOIN surv s ON s.g = p.a OR s.g = p.b),
         pur AS (SELECT a, b, h, row_number()
             OVER (PARTITION BY a, b ORDER BY h) rn FROM pu),
         ud AS (SELECT DISTINCT p.a, p.b, d.h FROM pairs p
           JOIN d ON d.g = p.a OR d.g = p.b),
         eu AS (SELECT u.a, u.b,
             CAST(CASE WHEN u.nu < 64 THEN x.ndu
               ELSE (63 * 281474976710656) // u.hku END AS BIGINT) est_union
           FROM (SELECT a, b, count(*) nu, max(h) hku FROM pur
                 WHERE rn <= 64 GROUP BY 1, 2) u
           JOIN (SELECT a, b, count(*) ndu FROM ud GROUP BY 1, 2) x
             USING (a, b)),
         exi AS (SELECT x.g a, y.g b, CAST(count(*) AS BIGINT) exact_intersect
           FROM d x JOIN d y ON x.h = y.h AND x.g < y.g GROUP BY 1, 2)
         SELECT p.a AS type_a, p.b AS type_b,
             ea.est AS est_a, eb.est AS est_b, eu.est_union,
             greatest(0, ea.est + eb.est - eu.est_union) AS est_intersect,
             CAST(coalesce(exi.exact_intersect, 0) AS BIGINT)
               AS exact_intersect
         FROM pairs p
         JOIN eg ea ON ea.g = p.a
         JOIN eg eb ON eb.g = p.b
         JOIN eu ON eu.a = p.a AND eu.b = p.b
         LEFT JOIN exi ON exi.a = p.a AND exi.b = p.b
         ORDER BY type_a, type_b""",

    "stream_kmv" ->
      """WITH d0 AS (SELECT DISTINCT event_type g,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))::UBIGINT
               AS BIGINT) h
           FROM events),
         d AS (SELECT g, h FROM d0
           UNION SELECT 'ALL', h FROM d0),
         surv AS (SELECT g, h FROM (
             SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) rn
             FROM d) WHERE rn <= 64),
         pg AS (SELECT g, CAST(count(*) AS BIGINT) n_kmv, max(h) hk
           FROM surv GROUP BY 1)
         SELECT g AS event_type, n_kmv,
             CAST(CASE WHEN n_kmv < 64 THEN n_kmv
               ELSE (63 * 281474976710656) // hk END AS BIGINT) est_distinct
         FROM pg ORDER BY 1""",

    "snapshot_rollback" ->
      """WITH v3 AS (SELECT CAST(3 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events
           WHERE NOT (event_type = 'error' AND
             CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22 00:00:00')
           GROUP BY 2),
         v4 AS (SELECT CAST(4 AS BIGINT) AS "version", event_type,
             CAST(count(*) AS BIGINT) n_events
           FROM events GROUP BY 2)
         SELECT * FROM v3 UNION ALL SELECT * FROM v4
         ORDER BY "version", event_type""",

    "vocab_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
             FROM documents),
         tot AS (SELECT count(*) AS total FROM tok)
         SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok
         GROUP BY token
         HAVING count(*) * 200 > (SELECT total FROM tot)
         ORDER BY n DESC, token""",

    "agg_autocorr" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         p AS (SELECT event_type, x,
             lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xp
           FROM d),
         m AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
             CAST(sum(x) AS BIGINT) sx, CAST(sum(xp) AS BIGINT) sy,
             CAST(sum(x * xp) AS BIGINT) sxy,
             CAST(sum(x * x) AS BIGINT) sxx,
             CAST(sum(xp * xp) AS BIGINT) syy
           FROM p WHERE xp IS NOT NULL GROUP BY event_type)
         SELECT event_type, n AS n_pairs,
             round(CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                    sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS acf_lag1
         FROM m ORDER BY event_type""",

    "forecast_seasonal_naive" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS actual
           FROM events GROUP BY 1, 2),
         mx AS (SELECT max(day) AS mx FROM d)
         SELECT t.event_type, strftime(t.day, '%Y-%m-%d') AS day,
             t.actual, h.actual AS forecast,
             abs(t.actual - h.actual) AS abs_err
         FROM d t LEFT JOIN d h ON h.event_type = t.event_type
             AND h.day = t.day - 7
         WHERE t.day > (SELECT mx FROM mx) - 7
         ORDER BY t.event_type, day""",

    "snapshot_history" ->
      """WITH v1 AS (SELECT * FROM events
             WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
               AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'),
         v2 AS (SELECT * FROM events
             WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
               AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-02-01'),
         v3 AS (SELECT * FROM v2
             WHERE NOT (event_type = 'error' AND
               CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-22'))
         SELECT CAST(1 AS BIGINT) AS "version",
             CAST(2 AS BIGINT) AS n_files,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(epoch_us(min(CAST(ts AS TIMESTAMP))) AS BIGINT) AS min_us,
             CAST(epoch_us(max(CAST(ts AS TIMESTAMP))) AS BIGINT) AS max_us
           FROM v1
         UNION ALL SELECT 2, 4, count(*),
             epoch_us(min(CAST(ts AS TIMESTAMP))),
             epoch_us(max(CAST(ts AS TIMESTAMP))) FROM v2
         UNION ALL SELECT 3, 4, count(*),
             epoch_us(min(CAST(ts AS TIMESTAMP))),
             epoch_us(max(CAST(ts AS TIMESTAMP))) FROM v3
         ORDER BY "version"""",

    "stream_funnel" ->
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
         SELECT step, stage, n_users FROM (
           SELECT 1 AS step, 'view' AS stage,
               CAST(count(*) AS BIGINT) AS n_users FROM v
           UNION ALL
           SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
           UNION ALL
           SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
         ORDER BY step""",

    "window_drawdown" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         r AS (SELECT event_type, day,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
             CAST(max(cents) OVER (PARTITION BY event_type ORDER BY day)
               - cents AS BIGINT) AS drawdown
           FROM d),
         rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY drawdown DESC, day) AS rn FROM r)
         SELECT event_type, n_days, drawdown AS max_drawdown,
             strftime(day, '%Y-%m-%d') AS drawdown_day
         FROM rk WHERE rn = 1 ORDER BY event_type""",

    "embed_centroids" ->
      """WITH e AS (SELECT CAST(label AS BIGINT) AS label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
           FROM embeddings)
         SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(micro) AS BIGINT) AS sum_micro,
             round(CAST(sum(micro) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS mean_micro
         FROM e GROUP BY label, dim ORDER BY label, dim""",

    "embed_silhouette" ->
      """WITH p AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
           FROM embeddings),
         c AS (SELECT label AS clabel, dim,
             CAST(floor(CAST(sum(micro) AS DOUBLE) /
               CAST(count(*) AS DOUBLE)) AS BIGINT) AS c
           FROM p GROUP BY 1, 2),
         d AS (SELECT p.vec_id, p.label, c.clabel,
             CAST(sum((p.micro - c.c) * (p.micro - c.c)) AS BIGINT) AS d2
           FROM p JOIN c ON p.dim = c.dim GROUP BY 1, 2, 3),
         a AS (SELECT vec_id, label, d2 AS a2 FROM d WHERE label = clabel),
         bm AS (SELECT vec_id, min(d2) AS b2 FROM d
           WHERE label != clabel GROUP BY 1),
         b AS (SELECT d.vec_id, bm.b2, min(d.clabel) AS nearest_other
           FROM d JOIN bm ON d.vec_id = bm.vec_id AND d.d2 = bm.b2
           WHERE d.label != d.clabel GROUP BY d.vec_id, bm.b2)
         SELECT a.vec_id, a.label, b.nearest_other, a.a2, b.b2,
             round(CASE WHEN greatest(a.a2, b.b2) = 0 THEN 0e0
               ELSE CAST(b.b2 - a.a2 AS DOUBLE) /
                 CAST(greatest(a.a2, b.b2) AS DOUBLE) END, 6) AS sil
         FROM a JOIN b ON a.vec_id = b.vec_id ORDER BY a.vec_id""",

    "stream_components" ->
      s"""WITH RECURSIVE ${dupPairsSql},
           e AS MATERIALIZED (SELECT a_id u, b_id v FROM p UNION ALL SELECT b_id u, a_id v FROM p),
           reach(id, r) AS (
             SELECT u, u FROM e
             UNION
             SELECT e2.u, reach.r FROM e e2 JOIN reach ON reach.id = e2.v),
           comp AS (SELECT id, min(r) c FROM reach GROUP BY id)
         SELECT CAST(id AS BIGINT) AS doc_id, CAST(c AS BIGINT) AS component,
             CAST(count(*) OVER (PARTITION BY c) AS BIGINT) AS n_members
         FROM comp ORDER BY doc_id""",

    "sample_neyman" ->
      """WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS HUGEINT) sx,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) *
                      CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS HUGEINT) sxx
           FROM events WHERE value IS NOT NULL GROUP BY 1),
         w AS (SELECT event_type, n,
             CAST(floor(sqrt(CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT) w
           FROM s),
         t AS (SELECT CAST(sum(w) AS BIGINT) tw FROM w),
         sh AS (SELECT event_type, n, w,
             CAST((200 * w) // tw AS BIGINT) fl,
             (200 * w) % tw AS rem FROM w CROSS JOIN t),
         rk AS (SELECT *, row_number() OVER (ORDER BY rem DESC, event_type)
               AS rr,
             CAST(200 - sum(fl) OVER () AS BIGINT) AS leftover FROM sh)
         SELECT event_type, n, w,
             CAST(fl + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS quota
         FROM rk ORDER BY event_type""",

    "stream_bm25" ->
      """WITH q(query_id, term_idx, term) AS (VALUES
             (1,1,'spark'),(1,2,'join'),(2,1,'hash'),(2,2,'merge'),
             (2,3,'batch'),(3,1,'vector'),(3,2,'scan')),
         tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         tf AS (SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY 1,2),
         dl AS (SELECT doc_id, count(*) AS len FROM tok GROUP BY 1),
         dfv AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         tot AS (SELECT count(*) AS n_docs, sum(len) AS total_len FROM dl),
         term AS (SELECT qq.query_id, qq.term_idx, f.doc_id,
             ((22e0 * f.tf * t.total_len) /
              (10 * f.tf * t.total_len + 3 * t.total_len + 9 * d.len * t.n_docs)) *
             ((2 * t.n_docs - 2 * v.df + 1) / (2 * v.df + 1)) AS s
           FROM tf f JOIN q qq ON f.tok = qq.term
           JOIN dl d ON f.doc_id = d.doc_id
           JOIN dfv v ON f.tok = v.tok CROSS JOIN tot t),
         sc AS (SELECT query_id, doc_id,
             coalesce(max(CASE WHEN term_idx=1 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=2 THEN s END), 0e0)
             + coalesce(max(CASE WHEN term_idx=3 THEN s END), 0e0) AS score
           FROM term GROUP BY 1,2),
         r AS (SELECT query_id, doc_id, score,
             row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, doc_id) AS rnk
           FROM sc)
         SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(rnk AS BIGINT) AS rank, doc_id, round(score, 6) AS score
         FROM r WHERE rnk <= 5 ORDER BY query_id, rank""",

    "tpch_q1" ->
      """WITH a AS (SELECT l_returnflag, l_linestatus,
             CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS sum_qty,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS sum_base_price,
             CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc_price,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l_discount AS DECIMAL(12,2))) *
                      (1 + CAST(l_tax AS DECIMAL(12,2))))
               AS DOUBLE) AS sum_charge,
             CAST(CAST(sum(CAST(l_discount AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS sum_disc,
             CAST(count(*) AS BIGINT) AS count_order
           FROM lineitem
           WHERE CAST(l_shipdate AS TIMESTAMP) <= TIMESTAMP '1998-09-02'
           GROUP BY l_returnflag, l_linestatus)
         SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price,
             sum_disc_price, sum_charge, count_order,
             sum_qty / count_order AS avg_qty,
             sum_base_price / count_order AS avg_price,
             sum_disc / count_order AS avg_disc
         FROM a ORDER BY l_returnflag, l_linestatus""",

    "tpch_q6" ->
      """SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      CAST(l_discount AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem
         WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
           AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
           AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN
               CAST('0.03' AS DECIMAL(12,2)) AND CAST('0.05' AS DECIMAL(12,2))
           AND CAST(l_quantity AS DECIMAL(12,2)) < 24""",

    "tpch_q13" ->
      """WITH per AS (SELECT o_custkey, count(*) AS c_count
           FROM orders WHERE o_orderpriority <> '1-URGENT'
           GROUP BY o_custkey)
         SELECT CAST(coalesce(p.c_count, 0) AS BIGINT) AS c_count,
             CAST(count(*) AS BIGINT) AS custdist
         FROM customer c LEFT JOIN per p ON c.c_custkey = p.o_custkey
         GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",

    "tpch_q14" ->
      """WITH a AS (SELECT
             CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2)))
                 ELSE 0 END) AS DECIMAL(18,4)) AS DOUBLE) AS promo_revenue,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE CAST(l.l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-03-01'
             AND CAST(l.l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-04-01')
         SELECT promo_revenue, total_revenue,
             100.0 * promo_revenue / total_revenue AS promo_pct
         FROM a""",

    "tpch_q15" ->
      """WITH r AS (SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                 (1 - CAST(l_discount AS DECIMAL(12,2)))) AS rev
           FROM lineitem
           WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
             AND CAST(l_shipdate AS TIMESTAMP) < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s.s_suppkey, s.s_name,
             CAST(CAST(r.rev AS DECIMAL(18,4)) AS DOUBLE) AS total_revenue
         FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
         WHERE r.rev = (SELECT max(rev) FROM r)
         ORDER BY s.s_suppkey""",

    "tpch_q17" ->
      """WITH pj AS (SELECT l.l_partkey,
             CAST(l.l_quantity AS DECIMAL(12,2)) AS qty,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS price
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE p.p_brand = 'Brand#23'),
         per AS (SELECT l_partkey AS pk, sum(qty) AS sq, count(*) AS n
           FROM pj GROUP BY 1)
         SELECT CAST(CAST(sum(pj.price) AS DECIMAL(18,4)) AS DOUBLE)
               AS small_qty_revenue,
             CAST(count(*) AS BIGINT) AS n_lines
         FROM pj JOIN per ON pj.l_partkey = per.pk
         WHERE pj.qty * 5 * per.n < per.sq""",

    "tpch_q19" ->
      """SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_lines
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
                AND p.p_size BETWEEN 1 AND 5)
            OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
                AND p.p_size BETWEEN 1 AND 10)
            OR (p.p_brand = 'Brand#15' AND l.l_quantity BETWEEN 20 AND 30
                AND p.p_size BETWEEN 1 AND 15)""",

    "tpch_q21" ->
      """WITH per AS (SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R'
               THEN l_suppkey END) AS n_ret
           FROM lineitem GROUP BY l_orderkey),
         fault AS (SELECT l.l_suppkey,
             count(DISTINCT l.l_orderkey) AS numwait
           FROM lineitem l JOIN per ON l.l_orderkey = per.l_orderkey
           WHERE l.l_returnflag = 'R' AND per.n_supp > 1 AND per.n_ret = 1
           GROUP BY l.l_suppkey)
         SELECT s.s_name, CAST(f.numwait AS BIGINT) AS numwait
         FROM fault f JOIN supplier s ON f.l_suppkey = s.s_suppkey
         ORDER BY numwait DESC, s.s_name LIMIT 20""",

    "tpch_q22" ->
      """WITH pos AS (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s,
             count(*) AS n
           FROM customer WHERE CAST(c_acctbal AS DECIMAL(12,2)) > 0),
         big AS (SELECT DISTINCT o_custkey FROM orders
           WHERE CAST(o_totalprice AS DECIMAL(12,2)) > 420000)
         SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
             CAST(CAST(sum(CAST(c.c_acctbal AS DECIMAL(12,2)))
               AS DECIMAL(18,4)) AS DOUBLE) AS totacctbal
         FROM customer c, pos
         WHERE c.c_nationkey IN (1, 3, 5, 7)
           AND CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n > pos.s
           AND c.c_custkey NOT IN (SELECT o_custkey FROM big)
         GROUP BY c.c_nationkey ORDER BY c.c_nationkey""",

    "tpch_q3" ->
      """SELECT l.l_orderkey,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o.o_orderpriority
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         WHERE c.c_mktsegment = 'BUILDING'
           AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-06-15'
           AND CAST(l.l_shipdate AS TIMESTAMP) > TIMESTAMP '1998-06-15'
         GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
         ORDER BY revenue DESC, l.l_orderkey LIMIT 10""",

    "tpch_q5" ->
      """SELECT n.n_name,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
             AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
           AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1997-01-01'
         GROUP BY n.n_name
         ORDER BY revenue DESC, n.n_name""",

    "tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(CAST(l.l_shipdate AS TIMESTAMP)) AS BIGINT) AS l_year,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         WHERE CAST(l.l_shipdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
           AND CAST(l.l_shipdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
           AND ((sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
             OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18'))
         GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "tpch_q8" ->
      """SELECT CAST(year(CAST(o.o_orderdate AS TIMESTAMP)) AS BIGINT)
               AS o_year,
             coalesce(CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))) END)
               AS DECIMAL(18,4)) AS DOUBLE), 0e0) AS nation_volume,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS total_volume,
             round(coalesce(CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                 THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))) END)
               AS DECIMAL(18,4)) AS DOUBLE), 0e0) /
               CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE), 6) AS mkt_share
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         JOIN region r ON cn.n_regionkey = r.r_regionkey
           AND r.r_name = 'AMERICA'
         WHERE CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
           AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY 1""",

    "tpch_q10" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                      (1 - CAST(l.l_discount AS DECIMAL(12,2))))
               AS DECIMAL(18,4)) AS DOUBLE) AS revenue,
             CAST(count(*) AS BIGINT) AS n_items
         FROM customer c
         JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         WHERE l.l_returnflag = 'R'
           AND CAST(o.o_orderdate AS TIMESTAMP) >= TIMESTAMP '1996-01-01'
           AND CAST(o.o_orderdate AS TIMESTAMP) < TIMESTAMP '1996-04-01'
         GROUP BY c.c_custkey, c.c_name, n.n_name
         ORDER BY revenue DESC, c.c_custkey LIMIT 20""",

    "tpch_q18" ->
      """WITH big AS (SELECT l_orderkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 170)
         SELECT c.c_custkey, c.c_name, b.l_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
             CAST(CAST(CAST(o.o_totalprice AS DECIMAL(12,2))
               AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
             CAST(CAST(b.total_qty AS DECIMAL(18,4)) AS DOUBLE) AS total_qty
         FROM big b
         JOIN orders o ON b.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, b.l_orderkey LIMIT 20""",

    "stream_drawdown" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
               AS BIGINT) AS cents
           FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
         r AS (SELECT event_type, day,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
             CAST(max(cents) OVER (PARTITION BY event_type ORDER BY day)
               - cents AS BIGINT) AS drawdown
           FROM d),
         rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
               ORDER BY drawdown DESC, day) AS rn FROM r)
         SELECT event_type, n_days, drawdown AS max_drawdown,
             strftime(day, '%Y-%m-%d') AS drawdown_day
         FROM rk WHERE rn = 1 ORDER BY event_type""",

    "dedup_span_apply" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
             FROM documents),
         pos AS (SELECT doc_id, i, array_to_string(t[i:i+4], ' ') AS gram
             FROM toks CROSS JOIN LATERAL
               (SELECT unnest(range(1, len(t) - 3)) AS i) s
             WHERE len(t) >= 5),
         own AS (SELECT gram, min(doc_id) AS owner FROM pos GROUP BY gram
             HAVING count(DISTINCT doc_id) > 1),
         cover AS (SELECT DISTINCT p.doc_id, i2.p
             FROM pos p JOIN own o USING (gram)
             CROSS JOIN LATERAL
               (SELECT unnest(range(p.i, p.i + 5)) AS p) i2
             WHERE p.doc_id > o.owner),
         tp AS (SELECT doc_id, CAST(generate_subscripts(t, 1) AS BIGINT) AS p,
               unnest(t) AS tok
             FROM toks),
         kept AS (SELECT tp.doc_id, tp.p, tp.tok FROM tp
             LEFT JOIN cover c ON tp.doc_id = c.doc_id AND tp.p = c.p
             WHERE c.p IS NULL),
         agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(tok, ' ' ORDER BY p) AS clean_text
             FROM kept GROUP BY doc_id)
         SELECT t.doc_id,
             CAST(len(t.t) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
             coalesce(a.clean_text, '') AS clean_text
         FROM toks t LEFT JOIN agg a USING (doc_id)
         ORDER BY t.doc_id""",

    "scan_ignore_corrupt" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
         FROM events
         WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-01'
           AND CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-02-01'
         GROUP BY event_type ORDER BY event_type""",

    "resample_decompose" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         w AS (SELECT event_type, day, x,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
             CAST(count(*) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS n_win
           FROM d),
         t AS (SELECT event_type, day, x, s7,
             CAST(7 * x - s7 AS BIGINT) AS d7x,
             CAST((day - DATE '2024-01-01') % 7 AS BIGINT) AS dow
           FROM w WHERE n_win = 7),
         s AS (SELECT event_type, dow, CAST(sum(d7x) AS BIGINT) AS sd,
             CAST(count(*) AS BIGINT) AS nd
           FROM t GROUP BY 1, 2)
         SELECT t.event_type, strftime(t.day, '%Y-%m-%d') AS day, t.x,
             round(CAST(t.s7 AS DOUBLE) / 7.0, 6) AS trend,
             round(CAST(s.sd AS DOUBLE) / (7.0 * CAST(s.nd AS DOUBLE)), 6)
               AS seasonal,
             round(CAST(t.x AS DOUBLE) - CAST(t.s7 AS DOUBLE) / 7.0 -
                   CAST(s.sd AS DOUBLE) / (7.0 * CAST(s.nd AS DOUBLE)), 6)
               AS residual
         FROM t JOIN s ON t.event_type = s.event_type AND t.dow = s.dow
         ORDER BY t.event_type, day""",

    // step-for-step replay of sim/Ivf.latticeKnnStruct: micro-lattice
    // verts (the embed_gram discipline), a recursive CTE running the
    // seeded Lloyd (id%16 partition means -> 2 assign/means passes;
    // truncating HUGEINT // == Spark DIV, empty cells keep their previous
    // centroid via the LEFT JOIN coalesce), then primary-cell indexing,
    // 4-cell multi-probe, candidate join on the cell id and exact
    // integer-d2 top-10 per query. verts MUST be MATERIALIZED (an
    // inlined CTE referenced from the recursive arm re-runs per pass).
    "ann_ivf_struct" ->
      """WITH RECURSIVE verts AS MATERIALIZED (
           SELECT vec_id AS id,
               CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x
           FROM embeddings),
         cent(it, cell, dim, c) AS (
           SELECT 0 AS it, CAST(id % 16 AS INTEGER) AS cell, dim,
               CAST(CAST(sum(x) AS HUGEINT) // count(*) AS BIGINT) AS c
           FROM verts GROUP BY 2, 3
           UNION ALL
           SELECT it, cell, dim, c FROM (
             WITH prev AS (SELECT * FROM cent),
               t0 AS (SELECT max(it) AS it FROM prev),
               dd AS (SELECT v.id, p.cell, sum((v.x - p.c) * (v.x - p.c)) AS d2
                 FROM verts v JOIN prev p ON p.dim = v.dim
                 GROUP BY v.id, p.cell),
               asg AS (SELECT id, cell FROM (
                   SELECT id, cell,
                     row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
                   FROM dd) WHERE rn = 1),
               mn AS (SELECT a.cell, v.dim,
                   CAST(CAST(sum(v.x) AS HUGEINT) // count(*) AS BIGINT) AS m
                 FROM asg a JOIN verts v ON v.id = a.id
                 GROUP BY a.cell, v.dim),
               nxt AS (SELECT p.cell, p.dim, coalesce(mn.m, p.c) AS c
                 FROM prev p LEFT JOIN mn
                   ON mn.cell = p.cell AND mn.dim = p.dim)
             SELECT (SELECT it FROM t0) + 1 AS it, cell, dim, c FROM nxt
             WHERE (SELECT it FROM t0) < 2)),
         fin AS (SELECT cell, dim, c FROM cent WHERE it = 2),
         fd2 AS (SELECT v.id, c.cell, sum((v.x - c.c) * (v.x - c.c)) AS d2
           FROM verts v JOIN fin c ON c.dim = v.dim GROUP BY v.id, c.cell),
         rk AS (SELECT id, cell,
             row_number() OVER (PARTITION BY id ORDER BY d2, cell) AS rn
           FROM fd2),
         idx AS (SELECT id, cell FROM rk WHERE rn = 1),
         prb AS (SELECT id, cell FROM rk WHERE rn <= 4 AND id < 8),
         pd2 AS (SELECT p.id AS q_id, i.id AS neighbor_id,
             sum((a.x - b.x) * (a.x - b.x)) AS d2
           FROM prb p JOIN idx i ON i.cell = p.cell AND i.id != p.id
             JOIN verts a ON a.id = p.id
             JOIN verts b ON b.id = i.id AND b.dim = a.dim
           GROUP BY p.id, i.id)
         SELECT q_id, neighbor_id, CAST(d2 AS BIGINT) AS d2,
             CAST(rn AS BIGINT) AS rn
         FROM (SELECT q_id, neighbor_id, d2,
             row_number() OVER (PARTITION BY q_id ORDER BY d2, neighbor_id) AS rn
           FROM pd2)
         WHERE rn <= 10 ORDER BY q_id, rn""",

    // step-for-step replay of sim/Pq.latticePqStruct (round 10, VERDICT
    // r9 "next" #2 — the N7k recipe applied to PQ): verts carry
    // (sub, dim-within-sub) so ONE recursion trains all 8 per-subspace
    // codebooks at once (seed = id%8 partition means, 2 Lloyd passes,
    // truncating HUGEINT // == Spark DIV, empty cells keep their previous
    // centroid via the LEFT JOIN coalesce). cd2 doubles as code
    // assignment (rn=1) and query LUT (id<8) — exactly the twin's reuse
    // of one d² kernel; ADC = sum of the 8 matched LUT entries per
    // (query, code word). Validated against an independent python replay
    // at sf0.001 AND sf0.01 before first gate run.
    "ann_pq_struct" ->
      """WITH RECURSIVE verts AS MATERIALIZED (
           SELECT vec_id AS id,
               CAST((generate_subscripts(embedding, 1) - 1) // 8 AS INTEGER) AS sub,
               CAST((generate_subscripts(embedding, 1) - 1) % 8 AS BIGINT) AS dim,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x
           FROM embeddings),
         cent(it, sub, cell, dim, c) AS (
           SELECT 0 AS it, sub, CAST(id % 8 AS INTEGER) AS cell, dim,
               CAST(CAST(sum(x) AS HUGEINT) // count(*) AS BIGINT) AS c
           FROM verts GROUP BY 2, 3, 4
           UNION ALL
           SELECT it, sub, cell, dim, c FROM (
             WITH prev AS (SELECT * FROM cent),
               t0 AS (SELECT max(it) AS it FROM prev),
               dd AS (SELECT v.id, v.sub, p.cell,
                   sum((v.x - p.c) * (v.x - p.c)) AS d2
                 FROM verts v JOIN prev p ON p.sub = v.sub AND p.dim = v.dim
                 GROUP BY v.id, v.sub, p.cell),
               asg AS (SELECT id, sub, cell FROM (
                   SELECT id, sub, cell,
                     row_number() OVER (PARTITION BY id, sub ORDER BY d2, cell) AS rn
                   FROM dd) WHERE rn = 1),
               mn AS (SELECT a.sub, a.cell, v.dim,
                   CAST(CAST(sum(v.x) AS HUGEINT) // count(*) AS BIGINT) AS mv
                 FROM asg a JOIN verts v ON v.id = a.id AND v.sub = a.sub
                 GROUP BY a.sub, a.cell, v.dim),
               nxt AS (SELECT p.sub, p.cell, p.dim, coalesce(mn.mv, p.c) AS c
                 FROM prev p LEFT JOIN mn ON mn.sub = p.sub AND mn.cell = p.cell
                   AND mn.dim = p.dim)
             SELECT (SELECT it FROM t0) + 1 AS it, sub, cell, dim, c FROM nxt
             WHERE (SELECT it FROM t0) < 2)),
         fin AS MATERIALIZED (SELECT sub, cell, dim, c FROM cent WHERE it = 2),
         cd2 AS MATERIALIZED (SELECT v.id, v.sub, f.cell,
             sum((v.x - f.c) * (v.x - f.c)) AS d2
           FROM verts v JOIN fin f ON f.sub = v.sub AND f.dim = v.dim
           GROUP BY v.id, v.sub, f.cell),
         codes AS (SELECT id, sub, cell FROM (
             SELECT id, sub, cell,
               row_number() OVER (PARTITION BY id, sub ORDER BY d2, cell) AS rn
             FROM cd2) WHERE rn = 1),
         lut AS (SELECT id AS q_id, sub, cell, d2 FROM cd2 WHERE id < 8),
         adc AS (SELECT l.q_id, c.id AS neighbor_id, sum(l.d2) AS adc
           FROM codes c JOIN lut l ON l.sub = c.sub AND l.cell = c.cell
             AND c.id != l.q_id
           GROUP BY l.q_id, c.id)
         SELECT q_id, neighbor_id, CAST(adc AS BIGINT) AS adc,
             CAST(rn AS BIGINT) AS rn
         FROM (SELECT q_id, neighbor_id, adc,
             row_number() OVER (PARTITION BY q_id ORDER BY adc, neighbor_id) AS rn
           FROM adc)
         WHERE rn <= 10 ORDER BY q_id, rn""",

    "embed_gram" ->
      """WITH e AS (SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
           FROM embeddings)
         SELECT a.i, b.i AS j,
             CAST(sum(a.micro * b.micro) AS BIGINT) AS sum_m2
         FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
         GROUP BY a.i, b.i ORDER BY a.i, b.i""",

    // exact-integer fixed-point PCA (round-8 promotion — VERDICT r7 #2):
    // micro² moments → n²-normalized covariance (truncating division) →
    // two pcaPowerSql power runs with Hotelling deflation between, all in
    // HUGEINT; doubles derive from the integers by one IEEE cast+divide
    "embed_pca" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
           FROM embeddings),
         nn AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM e),
         sums AS (SELECT i, CAST(sum(micro) AS HUGEINT) AS s
           FROM e GROUP BY i),
         m2 AS (SELECT a.i, b.i AS j,
             CAST(sum(a.micro * b.micro) AS HUGEINT) AS v
           FROM e a JOIN e b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
         cfull AS MATERIALIZED (SELECT m2.i, m2.j,
             ((SELECT n FROM nn) * m2.v - sa.s * sb.s)
               // ((SELECT n FROM nn) * (SELECT n FROM nn)) AS cv
           FROM m2 JOIN sums sa ON sa.i = m2.i
             JOIN sums sb ON sb.i = m2.j),
         dims AS (SELECT i FROM sums),
         tr AS MATERIALIZED (SELECT CAST(sum(cv) AS HUGEINT) AS trace
           FROM cfull WHERE i = j),
         ${pcaPowerSql("cfull", "pr1", 200)},
         v1 AS MATERIALIZED (SELECT i, v FROM pr1 WHERE it = 200),
         sg1 AS (SELECT CASE WHEN
             (SELECT v FROM v1 ORDER BY abs(v) DESC, i LIMIT 1) < 0
             THEN -1 ELSE 1 END AS s),
         w1 AS (SELECT c.i, CAST(sum(c.cv * p.v) AS HUGEINT) AS w
           FROM cfull c JOIN v1 p ON p.i = c.j GROUP BY c.i),
         l1 AS MATERIALIZED (SELECT CAST(sum(v1.v * w1.w) AS HUGEINT)
             // (SELECT CAST(sum(v * v) AS HUGEINT) FROM v1) AS lam
           FROM v1 JOIN w1 ON w1.i = v1.i),
         dfull AS MATERIALIZED (SELECT c.i, c.j,
             c.cv - ((SELECT lam FROM l1) * a.v * b.v)
               // CAST(1000000 AS HUGEINT) // CAST(1000000 AS HUGEINT)
               AS cv
           FROM cfull c JOIN v1 a ON a.i = c.i JOIN v1 b ON b.i = c.j),
         ${pcaPowerSql("dfull", "pr2", 200)},
         v2 AS MATERIALIZED (SELECT i, v FROM pr2 WHERE it = 200),
         sg2 AS (SELECT CASE WHEN
             (SELECT v FROM v2 ORDER BY abs(v) DESC, i LIMIT 1) < 0
             THEN -1 ELSE 1 END AS s),
         w2 AS (SELECT c.i, CAST(sum(c.cv * p.v) AS HUGEINT) AS w
           FROM dfull c JOIN v2 p ON p.i = c.j GROUP BY c.i),
         l2 AS (SELECT CAST(sum(v2.v * w2.w) AS HUGEINT)
             // (SELECT CAST(sum(v * v) AS HUGEINT) FROM v2) AS lam
           FROM v2 JOIN w2 ON w2.i = v2.i),
         ev AS (SELECT
             ((SELECT lam FROM l1) * 1000000) // (SELECT trace FROM tr)
               AS e1,
             ((SELECT lam FROM l2) * 1000000) // (SELECT trace FROM tr)
               AS e2)
         SELECT d.i AS dim,
           CAST(CAST(a.v * (SELECT s FROM sg1) AS BIGINT) AS DOUBLE) / 1e6
             AS loading_pc1,
           CAST(CAST(b.v * (SELECT s FROM sg2) AS BIGINT) AS DOUBLE) / 1e6
             AS loading_pc2,
           CAST(CAST((SELECT e1 FROM ev) AS BIGINT) AS DOUBLE) / 1e6
             AS evr_pc1,
           CAST(CAST((SELECT e2 FROM ev) AS BIGINT) AS DOUBLE) / 1e6
             AS evr_pc2,
           CAST(a.v * (SELECT s FROM sg1) AS BIGINT) AS pp6_pc1,
           CAST(b.v * (SELECT s FROM sg2) AS BIGINT) AS pp6_pc2,
           CAST((SELECT e1 FROM ev) AS BIGINT) AS evr_ppm_pc1,
           CAST((SELECT e2 FROM ev) AS BIGINT) AS evr_ppm_pc2
         FROM dims d JOIN v1 a ON a.i = d.i JOIN v2 b ON b.i = d.i
         ORDER BY d.i""",

    "graph_assortativity" ->
      s"""WITH ${dupPairsSql},
         st AS (SELECT a_id, b_id FROM p
           UNION ALL SELECT b_id, a_id FROM p),
         dg AS (SELECT a_id AS node, CAST(count(*) AS BIGINT) AS deg
           FROM st GROUP BY 1),
         xy AS (SELECT da.deg AS x, db.deg AS y FROM st
           JOIN dg da ON st.a_id = da.node
           JOIN dg db ON st.b_id = db.node),
         m AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(x) AS BIGINT) sx,
             CAST(sum(y) AS BIGINT) sy, CAST(sum(x * y) AS BIGINT) sxy,
             CAST(sum(x * x) AS BIGINT) sxx, CAST(sum(y * y) AS BIGINT) syy
           FROM xy)
         SELECT n AS n_stubs,
             round(CAST(n * sxy - sx * sy AS DOUBLE) /
                   (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                    sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
               AS assortativity
         FROM m""",

    "stream_gram" ->
      """WITH e AS (SELECT vec_id,
             CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
               AS BIGINT) AS micro
           FROM embeddings)
         SELECT a.i, b.i AS j,
             CAST(sum(a.micro * b.micro) AS BIGINT) AS sum_m2
         FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
         GROUP BY a.i, b.i ORDER BY a.i, b.i""",

    "vocab_rake" ->
      """WITH tok AS (SELECT doc_id,
             CAST(generate_subscripts(t, 1) AS BIGINT) AS p, unnest(t) AS tok
           FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
         stop AS (SELECT tok FROM tok GROUP BY tok
           ORDER BY count(*) DESC, tok LIMIT 5),
         ns AS (SELECT doc_id, p, tok FROM tok
           WHERE tok NOT IN (SELECT tok FROM stop)),
         g AS (SELECT doc_id, p, tok,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
           FROM ns),
         ph AS (SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY p) AS phrase,
             CAST(count(*) AS BIGINT) AS len
           FROM g GROUP BY 1, 2),
         mem AS (SELECT g.doc_id, g.grp, g.tok, ph.len
           FROM g JOIN ph USING (doc_id, grp)),
         ws AS (SELECT tok,
             CAST((sum(len) * 1000000) // count(*) AS BIGINT) AS wscore
           FROM mem GROUP BY tok),
         ps AS (SELECT m.doc_id, m.grp, CAST(sum(w.wscore) AS BIGINT) AS score
           FROM mem m JOIN ws w USING (tok) GROUP BY 1, 2),
         pp AS (SELECT ph.phrase, CAST(count(*) AS BIGINT) AS n_occ,
             CAST(max(ps.score) AS BIGINT) AS score
           FROM ph JOIN ps USING (doc_id, grp) GROUP BY ph.phrase)
         SELECT phrase, n_occ, score FROM pp
         ORDER BY score DESC, phrase LIMIT 20""",

    // the streaming maintained Holt MV derives through the same
    // holtBacktest as the batch query — shared oracle
    "stream_holt" ->
      """WITH RECURSIVE d AS (SELECT event_type, CAST(ts AS DATE) AS day,
             count(*) AS actual FROM events GROUP BY 1, 2),
         train AS MATERIALIZED (SELECT event_type, day, actual,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
           FROM d WHERE day <= DATE '2024-01-23'),
         n AS (SELECT event_type, max(i) AS ni FROM train GROUP BY 1),
         b0 AS MATERIALIZED (SELECT a.event_type,
             CAST(b.actual AS DOUBLE) - CAST(a.actual AS DOUBLE) AS b
           FROM train a JOIN train b
             ON a.event_type = b.event_type AND a.i = 1 AND b.i = 2),
         h(event_type, i, l, b) AS (
           SELECT tr.event_type, 1, CAST(tr.actual AS DOUBLE), b0.b
           FROM train tr JOIN b0 ON b0.event_type = tr.event_type
           WHERE tr.i = 1
           UNION ALL
           SELECT h.event_type, h.i + 1,
             0.5*CAST(tr.actual AS DOUBLE) + 0.5*(h.l + h.b),
             0.3*((0.5*CAST(tr.actual AS DOUBLE) + 0.5*(h.l + h.b)) - h.l)
               + 0.7*h.b
           FROM h JOIN train tr
             ON tr.event_type = h.event_type AND tr.i = h.i + 1),
         fit AS (SELECT h.event_type, h.l, h.b FROM h
           JOIN n ON n.event_type = h.event_type AND h.i = n.ni)
         SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day,
             CAST(d.actual AS BIGINT) AS actual,
             round(f.l + CAST(datediff('day', DATE '2024-01-23', d.day)
               AS DOUBLE) * f.b, 6) AS yhat,
             round(abs(CAST(d.actual AS DOUBLE) -
               (f.l + CAST(datediff('day', DATE '2024-01-23', d.day)
                 AS DOUBLE) * f.b)), 6) AS abs_err
         FROM d JOIN fit f ON f.event_type = d.event_type
         WHERE d.day > DATE '2024-01-23'
         ORDER BY d.event_type, d.day"""
  )
}

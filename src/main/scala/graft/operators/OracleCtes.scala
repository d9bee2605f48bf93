package graft.operators

/** Shared DuckDB-oracle CTE fragments.
  *
  * The round-4 driver CORRECTNESS artifact came back empty, and
  * profiling the oracle sweep (tools/oracle_times.py) showed why that
  * was plausible: 183 CPU-minutes at sf0.01, ~94% of it in twins that
  * (a) built the near-dup pair table as an O(n²) nested-loop
  * `list_intersect` Jaccard over full shingle lists, and (b)
  * referenced that CTE from iterative rounds — DuckDB inlines CTEs
  * (re-evaluating them per reference) unless MATERIALIZED, so e.g.
  * g_kcore's four peeling rounds re-ran the quadratic pair build
  * combinatorially many times (measured: 5963 CPU-s / 226 s wall for
  * that one oracle).
  *
  * [[ngramOverlap]] computes the SAME pair table as an explode + hash
  * join on individual shingles: only pairs sharing ≥ 1 shingle are
  * touched, the intersection size arrives from a count aggregate, and
  * every member is MATERIALIZED (evaluated exactly once). Bit parity:
  * jaccard = isz/(na+nb−isz) over exact integer counts is the same
  * two-operand IEEE division as len(list_intersect)/len(list_distinct
  * (list_concat)), hence identical doubles and identical rounding —
  * verified hex-exact on sf0.01 (the d_ngram_jaccard twin: 8.1 s →
  * 0.04 s, identical 25 rows).
  *
  * Emitted CTEs (prefix `ng_` to stay clear of consumer names):
  *   - `ng_grams(doc_id, g)`: distinct 3-token shingles per document
  *     (same tokenization and concat as the Spark side: whitespace
  *     split of trim(text), toks[i] ' ' toks[i+1] ' ' toks[i+2],
  *     docs with < 3 tokens absent);
  *   - `ng_sz(doc_id, n)`: distinct-shingle count per document;
  *   - `ng_pair(pa, pb, isz, na, nb)`: pa < pb, isz ≥ 1 shared
  *     shingles, plus both docs' shingle counts.
  * A pair with ZERO shared shingles has jaccard/containment exactly 0
  * and is deliberately absent — every consumer thresholds above 0.
  * The fragment is legal inside a `WITH RECURSIVE` list (only the
  * genuinely recursive member must stay un-MATERIALIZED).
  */
private[graft] object OracleCtes {

  /** See object doc. Splice as `WITH $ngramOverlap, ...` or
    * `WITH RECURSIVE $ngramOverlap, ...`. */
  val ngramOverlap: String =
    """ng_grams AS MATERIALIZED (
      |  SELECT DISTINCT doc_id, g FROM (
      |    SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g FROM (
      |      SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks)-2, 0))) AS i
      |      FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r]+') AS toks FROM documents)
      |      WHERE len(toks) >= 3
      |    )
      |  )
      |), ng_sz AS MATERIALIZED (
      |  SELECT doc_id, count(*) AS n FROM ng_grams GROUP BY doc_id
      |), ng_pair AS MATERIALIZED (
      |  SELECT g.pa, g.pb, g.isz, sa.n AS na, sb.n AS nb
      |  FROM (SELECT a.doc_id AS pa, b.doc_id AS pb, count(*) AS isz
      |        FROM ng_grams a JOIN ng_grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |        GROUP BY 1, 2) g
      |  JOIN ng_sz sa ON sa.doc_id = g.pa JOIN ng_sz sb ON sb.doc_id = g.pb
      |)""".stripMargin

  /** Exact rounded Jaccard over `ng_pair` columns — bit-identical to
    * the list_intersect/list_concat form (see object doc). */
  val ngramJaccardExpr: String =
    ExactRound.rSql("CAST(isz AS DOUBLE) / (na + nb - isz)", 6)

  /** The j ≥ 0.5 near-dup pair list as CTE `pairs(pa, pb)` — the form
    * every graph / clustering twin consumes. */
  val ngramPairs05: String =
    s"""pairs AS MATERIALIZED (
       |  SELECT pa, pb FROM ng_pair WHERE $ngramJaccardExpr >= 0.5
       |)""".stripMargin

  /** CTEs replaying [[Similarity.effectiveThreshold]]'s noise-floor
    * threshold auto-lift bit-exactly (same stride sample, same
    * integer/rounded arithmetic, same ladder and budget literals from
    * [[graft.GraftConf]]) — ends with `nf_efft(t)`, the effective
    * cosine threshold a similarity-graph twin must build its edge set
    * at: `WHERE cosine >= (SELECT t FROM nf_efft)`. Prefix `nf_` to
    * stay clear of consumer names.
    *
    * Also defines (r10) the exact-vs-banded machinery the selection
    * now depends on: `ep_gate(banded)` — true past the
    * [[graft.GraftConf.maxBrutePairs]] exact envelope, `ep_r(r)` —
    * [[EmbedBands.bandPlaneCount]], and `ep_lt(t, r, l)` — the
    * [[EmbedBands.lTable]] literal. On the banded side a rung must
    * also be BANDABLE (a row in ep_lt at this r); the fallback is the
    * ladder top when exact, the top bandable rung when banded. */
  def effTCtes(requested: Double): String = {
    val cos = ExactRound.rSql("list_inner_product(a.v, b.v) / (a.nrm * b.nrm)", 6)
    val strides = Seq(1, 7, 61, 127).map { k =>
      s"SELECT $cos AS cos FROM nf_e a JOIN nf_e b ON b.vec_id = a.vec_id + $k"
    }.mkString(" UNION ALL ")
    val ladder = graft.GraftConf.cosineLadder.mkString(", ")
    val top = graft.GraftConf.cosineLadder.max
    s"""nf_e AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_inner_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings
       |), nf_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nf_e
       |), ep_gate AS (
       |  SELECT n * (n - 1) // 2 > ${graft.GraftConf.maxBrutePairs} AS banded FROM nf_n
       |), ep_lt AS (SELECT t, r, l FROM ${EmbedBands.lTableSql}
       |), ep_r AS (
       |  SELECT coalesce(min(CASE WHEN (CAST(1 AS BIGINT) << r) * ${graft.GraftConf.bandBucketRows} >= n
       |                   THEN r END), ${EmbedBands.MaxPlanes}) AS r
       |  FROM (SELECT unnest([${(EmbedBands.MinPlanes to EmbedBands.MaxPlanes).mkString(", ")}]) AS r), nf_n
       |), nf_pairs AS MATERIALIZED ($strides
       |), nf_th AS (SELECT unnest([$ladder]) AS threshold
       |), nf_agg AS (
       |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN cos >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
       |  FROM nf_pairs, nf_th GROUP BY threshold
       |), nf_wedges AS (
       |  SELECT threshold,
       |    CAST(round(n * est_degree * est_degree / 2) AS BIGINT) AS est_wedges
       |  FROM (
       |    SELECT threshold,
       |      ${ExactRound.rSql("(n - 1) * n_ge / n_pairs", 6)} AS est_degree, n
       |    FROM nf_agg, nf_n)
       |), nf_efft AS (
       |  SELECT coalesce(
       |    min(CASE WHEN w.threshold >= $requested
       |             AND w.est_wedges <= ${graft.GraftConf.wedgeTarget}
       |             AND ((NOT (SELECT banded FROM ep_gate)) OR lt.l IS NOT NULL)
       |        THEN w.threshold END),
       |    CASE WHEN NOT (SELECT banded FROM ep_gate) THEN $top
       |         ELSE (SELECT max(t) FROM ep_lt WHERE r = (SELECT r FROM ep_r)) END) AS t
       |  FROM nf_wedges w
       |  LEFT JOIN ep_lt lt ON lt.t = w.threshold AND lt.r = (SELECT r FROM ep_r)
       |)""".stripMargin
  }

  /** The embedding near-dup pair list as CTE `pairs(pa, pb, cosine)`
    * — the ONE cross-engine construction every embedding-graph twin
    * consumes, replaying [[Dedup.embedPairBlocks]]'s r10 gate
    * verbatim: below the [[graft.GraftConf.maxBrutePairs]] envelope
    * the pairs are the EXACT brute-force set at the
    * [[Similarity.effectiveThreshold]]-lifted threshold (the cell /
    * block-brute Spark paths are exact, so brute SQL is their twin);
    * past it they are the SimHash-banded, exactly-verified set
    * ([[EmbedBands.bandedPairsSql]]) with per-pair recall ≥
    * [[graft.GraftConf.bandRecallTarget]]. Splices [[effTCtes]];
    * both branches are gated on `ep_gate` so only the live one
    * computes. */
  def embedPairsCtes(requested: Double): String = {
    val cos = ExactRound.rSql("list_inner_product(a.v, b.v) / (a.nrm * b.nrm)", 6)
    s"""${effTCtes(requested)}, ep_exact AS MATERIALIZED (
       |  SELECT pa, pb, cosine FROM (
       |    SELECT a.vec_id AS pa, b.vec_id AS pb, $cos AS cosine
       |    FROM nf_e a JOIN nf_e b ON a.vec_id < b.vec_id
       |    WHERE NOT (SELECT banded FROM ep_gate)
       |  ) WHERE cosine >= (SELECT t FROM nf_efft)
       |), ${EmbedBands.bandedPairsSql}, pairs AS MATERIALIZED (
       |  SELECT pa, pb, cosine FROM ep_exact
       |  UNION ALL
       |  SELECT pa, pb, cosine FROM ep_band
       |)""".stripMargin
  }
}

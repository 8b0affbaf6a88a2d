"""Round-6 superset additions — quality-of-result proof for the ML
plane (VERDICT r5 asks), not new breadth.

``word2vec_stability`` is the M1 counterpart of ``ann_recall``: a
checked bound on the QUALITY of the flagship's learned output, where
``word2vec_neighbors`` checks only the listing's structure.  The
training signal is PLANTED: themed baskets built deterministically
from the orders table (theme = o_orderkey mod 10; items drawn from
the theme's 50-product block by xxhash64), so the ground truth is
known by construction — on the raw TPC-H-ish baskets there is no
co-occurrence signal to recover (measured: seed-overlap 0/5 on every
probe), and a bound there would be vacuous.  Reference anchor: the
eyeball similar-products validation in model_train.py:14-49 — this is
that check with planted ground truth and asserted thresholds.

Thresholds (calibrated this round at sf0.01, maxIter=5, dims=16):
  * theme recovery: 5/5 same-theme neighbors per probe per seed
    (bound: ≥4, indicator) — the embedding learns the planted blocks;
  * cross-seed stability: total top-5 overlap 10/25 across 5 probes
    vs ~0.25 expected under noise (bound: ≥3, indicator).
Both are SQL-replayable as per-probe indicator constants, so the
entry earns a full rows+schema+hash oracle verdict, like
``word2vec_neighbors``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table

# planted-structure parameters — shared by query and oracle
_N_THEMES = 10
_PER_THEME = 50
_BASKET_LEN = 8
_N_TRAIN_ORDERS = 3000
_PROBES = [25, 125, 225, 325, 425]  # one per even theme (theme = pid // 50)
_K = 5


def planted_theme_baskets(orders):
    """Deterministic themed baskets from the orders table: every order
    belongs to theme (o_orderkey mod 10) and draws its items from that
    theme's 50-product block via xxhash64 — pure row-local expressions,
    no shuffle, fully replayable anywhere."""
    return (
        orders.select(
            F.col("o_orderkey").alias("order_id"),
            (F.col("o_orderkey") % _N_THEMES).alias("theme"),
        ).select(
            "order_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(_BASKET_LEN)),
                lambda j: (
                    F.col("theme") * _PER_THEME
                    + F.pmod(F.xxhash64(F.col("order_id"), j), F.lit(_PER_THEME))
                ).cast("long"),
            ).alias("basket"),
        )
    )


def q_word2vec_stability(spark, sf_dir):
    """Embedding-quality audit (M1/M3): two Word2Vec fits with
    different seeds on identical planted-theme baskets; per probe the
    output asserts (as SQL-replayable indicators)
      * ``same_theme_ok`` — ≥4 of 5 nearest neighbors share the
        probe's planted theme, under BOTH seeds (quality), and
      * ``stability_ok`` — the two seeds' top-5 sets overlap in ≥3
        positions summed across all probes (stability; a global
        indicator repeated per row).
    ``n_train_baskets`` ties the oracle to the actual orders table.

    Scale notes: training baskets are row-local expressions over a
    bounded order sample; each fit is MLlib Word2Vec (distributed by
    construction); neighbor scoring is the broadcast-probe top-k path
    shared with the flagship.  Intersections/counts run over ≤50-row
    outputs."""
    from prod2vec_spark.ml.prod2vec import (
        Prod2VecParams,
        embedding_table,
        fit_prod2vec,
        top_k_similar,
    )

    # deterministic training subset: a bare limit() is partition-order
    # dependent (scan layout picks the rows); md5-ordered top-k makes
    # the subset — and therefore the fits and the calibrated indicator
    # thresholds — reproducible, per the repo's seeded-sample policy
    # (same shape as ivf_topk's centroid sample)
    orders = (
        read_table(spark, sf_dir, "orders")
        .orderBy(
            F.md5(F.concat_ws("|", F.lit("w2vstab"), F.col("o_orderkey"))),
            F.col("o_orderkey"),
        )
        .limit(_N_TRAIN_ORDERS)
    )
    baskets = planted_theme_baskets(orders)
    n_train = baskets.count()

    def neighbors(seed):
        model = fit_prod2vec(
            baskets,
            Prod2VecParams(
                vector_size=16, max_iter=5, num_partitions=4, seed=seed
            ),
        )
        return top_k_similar(embedding_table(model), _PROBES, k=_K).select(
            "query_id", "neighbor_id"
        )

    tka, tkb = neighbors(42), neighbors(43)

    def per_probe(tk):
        return tk.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("neighbor_id") / _PER_THEME).cast("long")
                    == (F.col("query_id") / _PER_THEME).cast("long")
                ).cast("long")
            ).alias("n_same_theme"),
        )

    agg_a = per_probe(tka).withColumnRenamed("n", "n_a").withColumnRenamed(
        "n_same_theme", "same_a"
    )
    agg_b = per_probe(tkb).withColumnRenamed("n", "n_b").withColumnRenamed(
        "n_same_theme", "same_b"
    )
    # cross-seed overlap: equi-join on (query_id, neighbor_id), summed
    # to one scalar attached via broadcast (1-row) crossJoin
    total_overlap = (
        tka.join(tkb, ["query_id", "neighbor_id"])
        .agg(F.count(F.lit(1)).alias("total_overlap"))
    )
    return (
        agg_a.join(agg_b, "query_id")
        .crossJoin(F.broadcast(total_overlap))
        .select(
            "query_id",
            (F.col("query_id") / _PER_THEME).cast("long").alias("theme"),
            (F.col("n_a") + F.col("n_b")).alias("n_neighbor_rows"),
            ((F.col("same_a") >= 4) & (F.col("same_b") >= 4))
            .cast("long")
            .alias("same_theme_ok"),
            (F.col("total_overlap") >= 3).cast("long").alias("stability_ok"),
            F.lit(n_train).cast("long").alias("n_train_baskets"),
        )
    )


_SQL_WORD2VEC_STABILITY = f"""
WITH probes(query_id) AS (VALUES {", ".join(f"({p})" for p in _PROBES)})
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(query_id // {_PER_THEME} AS BIGINT) AS theme,
       CAST({2 * _K} AS BIGINT) AS n_neighbor_rows,
       CAST(1 AS BIGINT) AS same_theme_ok,
       CAST(1 AS BIGINT) AS stability_ok,
       (SELECT CAST(least(count(*), {_N_TRAIN_ORDERS}) AS BIGINT) FROM orders)
         AS n_train_baskets
FROM probes
"""

def amplify_documents(docs, factor: int = 10, exact_replicas: int = 2):
    """Scale-stress corpus synthesis (VERDICT r5 ask #6): blow the
    documents table up ``factor``x with a row-local explode — no new
    fixtures, no shuffle.

    Replica semantics per source doc (replica r in [0, factor)):
      * r < ``exact_replicas``: text kept VERBATIM — an exact-dup
        group the digest pass must collapse;
      * r >= ``exact_replicas``: a per-replica salt token appended —
        a near-dup (high-Jaccard) variant the LSH+CC pass must
        cluster, but exact dedup must NOT collapse.

    New doc_id = doc_id * factor + r, so the source doc is recoverable
    as doc_id div factor and ids stay unique.  The result is a corpus
    whose near-dup cluster structure is known by construction:
    (factor - exact_replicas + 1) surviving variants per distinct
    source text, all mutually near-identical."""
    r = F.col("replica")
    return (
        docs.select(
            "doc_id",
            "text",
            "lang",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("replica"),
        )
        .select(
            (F.col("doc_id") * factor + r).cast("long").alias("doc_id"),
            F.when(r < exact_replicas, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" variant"), r.cast("string")))
            .alias("text"),
            "lang",
        )
    )


def curation_stress(spark, sf_dir, factor: int = 10, max_group: int = 64):
    """End-to-end exact-dedup → MinHash/LSH → connected-components run
    over the ``factor``x amplified corpus; returns a 1-row stats frame
    (every count a full-pipeline side effect, so a noop write of this
    frame times the whole dataflow).

    This is the 100 TB curation shape exercised at a candidate graph
    ~factor² denser than the base fixture: exact groups of
    2x the base multiplicity, LSH bands whose near-clique components
    have (factor-1) members, and a CC pass whose round bound must hold
    regardless (near-cliques converge in ~2 rounds independent of
    corpus size — that's the scale claim, asserted in
    tests/test_scale_stress.py and timed per-round in bench.py as
    ``__curation10x__``)."""
    from prod2vec_spark.operators.dedup import (
        exact_dup_groups,
        lsh_candidate_pairs,
        lsh_oversize_groups,
        minhash_bands,
    )
    from prod2vec_spark.operators.graph import connected_components_with_rounds

    docs = amplify_documents(read_table(spark, sf_dir, "documents"), factor=factor)
    n_input = docs.count()

    keep = exact_dup_groups(docs).select(F.col("keep_doc_id").alias("doc_id"))
    survivors = docs.join(keep, "doc_id", "left_semi")
    n_exact = survivors.count()

    # Round-16 (guide §1.2 step 1): the band table feeds BOTH the
    # candidate-pair leg and the oversize audit — without a break the
    # shingle+minhash signature pass re-runs per consumer over the
    # amplified corpus.  localCheckpoint (lazy — the audit count below
    # materializes it) is the in-query analogue of the DAG's persisted
    # bands parquet; results unchanged.
    bands = minhash_bands(survivors, shingle_k=3).localCheckpoint(eager=False)
    pairs = lsh_candidate_pairs(bands, max_group=max_group)
    n_dropped_groups = lsh_oversize_groups(bands, max_group).count()

    labels, rounds = connected_components_with_rounds(
        pairs, src="doc_a", dst="doc_b"
    )
    clusters = labels.agg(
        F.countDistinct("comp").alias("n_clusters"),
        F.count(F.lit(1)).alias("n_clustered_docs"),
    ).first()

    return spark.createDataFrame(
        [
            (
                n_input,
                n_exact,
                n_dropped_groups,
                clusters["n_clusters"],
                clusters["n_clustered_docs"],
                rounds,
            )
        ],
        "n_input long, n_exact long, n_dropped_groups long, "
        "n_clusters long, n_clustered_docs long, cc_rounds long",
    )


def q_curation_stress_audit(spark, sf_dir):
    """The COMPOSED 10x curation pipeline under a full oracle verdict:
    where each stage (dedup_exact, minhash_bands, lsh_candidates,
    dedup_clusters) is individually oracled, this entry certifies their
    10x-amplified composition end-to-end — DuckDB replays the
    amplification, the digest collapse, the MinHash/LSH banding with
    the oversize cap, and the connected components (recursive CTE),
    and every count must hash-match.  ``cc_rounds_ok`` turns the
    algorithmic round bound into a SQL-replayable indicator."""
    stats = curation_stress(spark, sf_dir, factor=10)
    return stats.select(
        "n_input",
        "n_exact",
        "n_dropped_groups",
        "n_clusters",
        "n_clustered_docs",
        (F.col("cc_rounds") <= 4).cast("long").alias("cc_rounds_ok"),
    )


def _sql_curation_stress_audit() -> str:
    """DuckDB replay of the amplified pipeline, reusing the exact
    shingle/minhash/banding formulations the per-stage oracles use
    (queries_ext._SQL_MINHASH) with the shingle source swapped to the
    exact-dedup survivors of the amplified corpus."""
    from prod2vec_spark.queries_ext import _SQL_MINHASH, _TOKS, LSH_MAX_GROUP

    shingles_from_sdocs = f"""
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM sdocs))
"""
    return f"""
WITH RECURSIVE amp AS (
  SELECT doc_id * 10 + r AS doc_id,
         CASE WHEN r < 2 THEN text
              ELSE text || ' variant' || r END AS text
  FROM documents, UNNEST(generate_series(0, 9)) AS t(r)),
keep AS (
  SELECT min(doc_id) AS doc_id
  FROM (SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
        FROM amp)
  GROUP BY h),
sdocs AS (SELECT a.doc_id, a.text FROM amp a JOIN keep k ON a.doc_id = k.doc_id),
{shingles_from_sdocs},
{_SQL_MINHASH},
grp AS (
  SELECT band_id, band_sig, count(*) AS n FROM bands GROUP BY 1, 2),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN grp g ON a.band_id = g.band_id AND a.band_sig = g.band_sig
            AND g.n BETWEEN 2 AND {LSH_MAX_GROUP}
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
r(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM e)
  UNION
  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
comp AS (SELECT a AS node, min(b) AS comp FROM r GROUP BY a)
SELECT (SELECT count(*) FROM amp)   AS n_input,
       (SELECT count(*) FROM sdocs) AS n_exact,
       (SELECT count(*) FROM grp WHERE n > {LSH_MAX_GROUP})
         AS n_dropped_groups,
       (SELECT CAST(count(DISTINCT comp) AS BIGINT) FROM comp) AS n_clusters,
       (SELECT count(*) FROM comp) AS n_clustered_docs,
       CAST(1 AS BIGINT) AS cc_rounds_ok
"""


HH_TOP = 20
HH_BOUND_MULT = 4.0  # bound: est ≤ cnt + 4N/width (ε·N at ε = 4/width)


def q_heavy_hitters(spark, sf_dir):
    """Count-min-sketch heavy hitters over document tokens: exact
    top-20 term counts (the oracle-checkable truth) + the CMS estimate
    from the md5-derived sketch TABLE + a checked error-bound
    indicator (est ≥ cnt always; est ≤ cnt + 4N/width).  Because the
    sketch hashing is engine-portable, the ESTIMATES hash-match the
    DuckDB replay — the sketch itself is under oracle, not just its
    bound (unlike HLL/t-digest, which are engine-specific and only
    bound-checked).

    Scale shape: two scans of the exploded terms (exact top-k funnel +
    sketch build whose agg output is bounded by depth×width); N comes
    from summing one sketch row-set, not a third scan; probes
    broadcast."""
    from prod2vec_spark.operators import text as TX
    from prod2vec_spark.operators.sketches import (
        CMS_WIDTH,
        cms_estimate,
        cms_sketch,
    )

    docs = read_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(TX.tokens(F.col("text"))).alias("term"))
    top = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(HH_TOP)
    )
    sketch = cms_sketch(terms)
    est = cms_estimate(sketch, top.select("term"))
    # N = total items = the sum of any single depth's counters
    total = sketch.where(F.col("depth") == 0).agg(
        F.sum("cnt").alias("n_total")
    )
    return (
        top.join(est, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "term",
            "cnt",
            "cms_est",
            (
                (F.col("cms_est") >= F.col("cnt"))
                & (
                    F.col("cms_est")
                    <= F.col("cnt") + HH_BOUND_MULT * F.col("n_total") / CMS_WIDTH
                )
            )
            .cast("long")
            .alias("cms_ok"),
        )
    )


def _sql_heavy_hitters() -> str:
    from prod2vec_spark.operators.sketches import CMS_DEPTH, CMS_WIDTH
    from prod2vec_spark.queries_ext import _TOKS

    ds = ",".join(f"({d})" for d in range(CMS_DEPTH))
    return f"""
WITH t AS (
  SELECT unnest({_TOKS}) AS term FROM documents),
top AS (
  SELECT term, count(*) AS cnt FROM t
  GROUP BY term ORDER BY cnt DESC, term LIMIT {HH_TOP}),
cells AS (
  SELECT d, ('0x' || substr(md5(d || '|' || term), 1, 8))::BIGINT
             % {CMS_WIDTH} AS bucket
  FROM t CROSS JOIN (VALUES {ds}) v(d)),
sk AS (SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM sk WHERE d = 0),
probe AS (
  SELECT term, d,
         ('0x' || substr(md5(d || '|' || term), 1, 8))::BIGINT
           % {CMS_WIDTH} AS bucket
  FROM top CROSS JOIN (VALUES {ds}) v(d)),
est AS (
  SELECT p.term, min(sk.cnt) AS cms_est
  FROM probe p JOIN sk ON p.d = sk.d AND p.bucket = sk.bucket
  GROUP BY p.term)
SELECT top.term, top.cnt, est.cms_est,
       CAST(est.cms_est >= top.cnt
            AND est.cms_est <= top.cnt + {HH_BOUND_MULT} * n.n_total / {CMS_WIDTH}
            AS BIGINT) AS cms_ok
FROM top JOIN est ON top.term = est.term CROSS JOIN n
"""


# per-language keep rates for the training-mix sampler — the "data
# recipe" knob of an LLM pipeline (upsample/downsample per source)
MIX_RATES = {"en": 0.5, "zh": 1.0, "es": 0.8, "de": 0.25, "fr": 1.0}
MIX_DEFAULT_RATE = 0.1  # languages outside the recipe
MIX_SEED = 42


def q_corpus_mix_sample(spark, sf_dir):
    """Deterministic per-language corpus mixing (LLM training-data
    recipe): each document is kept iff its md5-derived uniform
    (functions/hashing.hash_unit over seed|doc_id) falls under its
    language's target rate — a row-local map-side filter, no shuffle,
    no global sort, exactly replayable by the oracle DOC-FOR-DOC (the
    output is the sampled id set itself, not just counts).  Per-lang
    realized rates ride along for the recipe report.

    Scale notes: the rate lookup is a tiny literal map (the recipe is
    bounded by the language set, a few dozen entries at worst); the
    aggregate after the filter is the standard bounded groupBy.  The
    same hash-unit keeps the sample STABLE under corpus growth: a doc's
    keep/drop never changes as neighbors arrive — the property that
    makes incremental recomputation and cross-run diffing possible at
    100 TB."""
    from prod2vec_spark.functions.hashing import hash_unit

    docs = read_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in MIX_RATES.items()
        ],
        F.lit(MIX_DEFAULT_RATE),
    )
    u = hash_unit(F.concat_ws("|", F.lit(str(MIX_SEED)), F.col("doc_id")))
    kept = docs.where(u < rate).select("doc_id", "lang")
    per_lang = kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return kept.join(per_lang, "lang").select("doc_id", "lang", "n_kept")


def _sql_corpus_mix_sample() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in MIX_RATES.items()
    )
    return f"""
WITH kept AS (
  SELECT doc_id, lang
  FROM documents
  WHERE ('0x' || substr(md5('{MIX_SEED}' || '|' || doc_id), 1, 8))::BIGINT
          / 4294967296.0
        < CASE lang {cases} ELSE {MIX_DEFAULT_RATE} END),
n AS (SELECT lang, count(*) AS n_kept FROM kept GROUP BY lang)
SELECT kept.doc_id, kept.lang, n.n_kept
FROM kept JOIN n ON kept.lang = n.lang
"""


def q_bloom_blocklist(spark, sf_dir):
    """Bloom-filter blocklist membership (the contamination-screen
    shape when the blocklist is too big to broadcast exactly): build
    the bit table over blocked part names, probe EVERY part name, and
    emit the audit row — members found (no-false-negative contract),
    measured false positives among non-members, and the theoretical
    FP-rate bound as a checked indicator.  md5 bit positions make the
    verdicts oracle-replayable bit-for-bit, so the MEASURED fp count
    hash-matches, not just the bound."""
    from prod2vec_spark.operators.sketches import (
        BLOOM_K,
        BLOOM_M,
        bloom_bits,
        bloom_maybe_contains,
    )

    part = read_table(spark, sf_dir, "part")
    # blocklist identity = part KEY (p_name has only ~64 distinct
    # values in the fixture — keys give a unique, ~10%-selective set)
    members = part.where(F.col("p_size") > 45).select(
        F.col("p_partkey").cast("string").alias("term")
    ).distinct()
    probes = part.select(
        F.col("p_partkey").cast("string").alias("term")
    ).distinct()
    verdicts = bloom_maybe_contains(bloom_bits(members), probes)
    joined = verdicts.join(
        members.withColumn("is_member", F.lit(1)), "term", "left"
    ).select("term", "maybe", F.coalesce("is_member", F.lit(0)).alias("is_member"))
    # expected FP probability p = (1 - e^{-k·n/m})^k; assert measured
    # count within 2x expectation (+5 absolute slack for small counts)
    return joined.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum("is_member").alias("n_members"),
        F.sum("maybe").alias("n_maybe"),
        F.sum(((F.col("maybe") == 1) & (F.col("is_member") == 0)).cast("long")).alias(
            "n_false_pos"
        ),
        (
            F.sum(((F.col("is_member") == 1) & (F.col("maybe") == 0)).cast("long"))
            == 0
        )
        .cast("long")
        .alias("no_false_neg"),
    ).select(
        "n_probes",
        "n_members",
        "n_maybe",
        "n_false_pos",
        "no_false_neg",
        (
            F.col("n_false_pos")
            <= 2.0
            * F.pow(
                1.0 - F.exp(-(float(BLOOM_K) * F.col("n_members")) / BLOOM_M),
                float(BLOOM_K),
            )
            * (F.col("n_probes") - F.col("n_members"))
            + 5.0
        )
        .cast("long")
        .alias("fp_bound_ok"),
    )


def _sql_bloom_blocklist() -> str:
    from prod2vec_spark.operators.sketches import BLOOM_K, BLOOM_M

    js = ",".join(f"({j})" for j in range(BLOOM_K))
    return f"""
WITH members AS (
  SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS term
  FROM part WHERE p_size > 45),
bits AS (
  SELECT DISTINCT ('0x' || substr(md5(j || '|' || term), 1, 8))::BIGINT
                    % {BLOOM_M} AS bit
  FROM members CROSS JOIN (VALUES {js}) v(j)),
probes AS (SELECT DISTINCT CAST(p_partkey AS VARCHAR) AS term FROM part),
cells AS (
  SELECT term, ('0x' || substr(md5(j || '|' || term), 1, 8))::BIGINT
                 % {BLOOM_M} AS bit
  FROM probes CROSS JOIN (VALUES {js}) v(j)),
verdict AS (
  SELECT c.term,
         min(CASE WHEN b.bit IS NULL THEN 0 ELSE 1 END) AS maybe
  FROM cells c LEFT JOIN bits b ON c.bit = b.bit
  GROUP BY c.term),
joined AS (
  SELECT v.term, v.maybe,
         CASE WHEN m.term IS NULL THEN 0 ELSE 1 END AS is_member
  FROM verdict v LEFT JOIN members m ON v.term = m.term),
agg AS (
  SELECT count(*) AS n_probes,
         CAST(sum(is_member) AS BIGINT) AS n_members,
         CAST(sum(maybe) AS BIGINT) AS n_maybe,
         CAST(sum(CASE WHEN maybe = 1 AND is_member = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_false_pos,
         CAST(sum(CASE WHEN is_member = 1 AND maybe = 0 THEN 1 ELSE 0 END) = 0
              AS BIGINT) AS no_false_neg
  FROM joined)
SELECT n_probes, n_members, n_maybe, n_false_pos, no_false_neg,
       CAST(n_false_pos
            <= 2.0 * pow(1.0 - exp(-({BLOOM_K}.0 * n_members) / {BLOOM_M}),
                         {BLOOM_K}.0)
                   * (n_probes - n_members)
               + 5.0
            AS BIGINT) AS fp_bound_ok
FROM agg
"""


R6_QUERIES = {
    "word2vec_stability": q_word2vec_stability,
    "curation_stress_audit": q_curation_stress_audit,
    "heavy_hitters": q_heavy_hitters,
    "corpus_mix_sample": q_corpus_mix_sample,
    "bloom_blocklist": q_bloom_blocklist,
}

R6_ORACLES = {
    "word2vec_stability": _SQL_WORD2VEC_STABILITY,
    "curation_stress_audit": _sql_curation_stress_audit(),
    "heavy_hitters": _sql_heavy_hitters(),
    "corpus_mix_sample": _sql_corpus_mix_sample(),
    "bloom_blocklist": _sql_bloom_blocklist(),
}

"""Round-6 depth tranche: eight more LLM-training-data operator
families, each with a full DuckDB oracle.  All eight were rotated
into the 50-entry driver catalog this round (queries.py waves 2-3),
with family siblings retiring to the pytest superset gate.

* ``doc_repetition``      — Gopher-style intra-document repetition
  features (dup-token / top-bigram / dup-trigram fractions) + gate.
* ``decontaminate``       — benchmark n-gram decontamination (GPT-3
  appendix-C shape): training docs sharing word 5-grams with a
  held-out split are flagged.
* ``weighted_sample``     — Efraimidis–Spirakis A-ES weighted sample
  without replacement (md5-derived draws, TakeOrdered plan).
* ``semdedup_audit``      — SemDeDup (Abbas et al. 2023): cluster-
  then-near-dup semantic dedup over embeddings, per-cluster audit.
* ``pii_scrub``           — email/phone redaction with portable
  regexes; scrubbed byte stream certified via per-doc md5.
* ``doc_chunks``          — fixed-window training-sequence chunking
  with per-chunk rolling fingerprints.
* ``quantile_sketch``     — mergeable bottom-k uniform-sample sketch
  with a checked DKW quantile bound.
* ``verbatim_span_pairs`` — winnowing (MOSS) exact-substring dedup
  candidates with guaranteed long-span detection.

Catalog conventions (queries.py header) apply: every aggregate/derived
column aliased identically in Spark and SQL; booleans surfaced as
BIGINT 0/1; md5 as the portable hash; floats rounded at 4-5 digits.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from prod2vec_spark.operators import repetition as RP
from prod2vec_spark.operators import text as TX
from prod2vec_spark.sources.io import read_table


# ---------------------------------------------------- doc repetition
def q_doc_repetition(spark, sf_dir):
    """Per-document repetition profile: the three Gopher repetition
    signals plus the boolean gate (as 0/1).  One row-local scan —
    token and gram arrays staged as columns per the HOF-CSE rule
    (operators/repetition.py)."""
    docs = read_table(spark, sf_dir, "documents")
    staged = (
        docs.withColumn("_toks", TX.tokens(F.col("text")))
        .withColumn("_g2", RP.word_ngrams(F.col("_toks"), 2))
        .withColumn("_g3", RP.word_ngrams(F.col("_toks"), 3))
    )
    out = staged.select(
        "doc_id",
        RP.dup_token_fraction(F.col("_toks")).alias("dup_token_frac"),
        RP.top_gram_fraction(F.col("_g2")).alias("top_bigram_frac"),
        RP.dup_gram_fraction(F.col("_g3")).alias("dup_trigram_frac"),
        F.size(F.col("_g2")).alias("n_bigrams"),
    )
    return out.withColumn(
        "repetition_ok",
        RP.repetition_gate(
            F.col("top_bigram_frac"),
            F.col("dup_trigram_frac"),
            F.col("n_bigrams"),
        ).cast("long"),
    ).drop("n_bigrams")


def _sql_doc_repetition() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    tb_max, dt_max = RP.TOP_BIGRAM_MAX, RP.DUP_TRIGRAM_MAX
    min_bg = RP.MIN_GATE_BIGRAMS
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, toks,
  list_transform(generate_series(1, len(toks) - 1),
                 i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS g2,
  list_transform(generate_series(1, len(toks) - 2),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')) AS g3
 FROM t),
c AS (SELECT doc_id, toks, g2, g3,
  list_transform(list_distinct(g2), x -> len(list_filter(g2, y -> y = x))) AS c2,
  list_transform(list_distinct(g3), x -> len(list_filter(g3, y -> y = x))) AS c3
 FROM g),
f AS (SELECT doc_id,
  CASE WHEN len(toks) > 0
       THEN round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE), 4)
       ELSE 0.0 END AS dup_token_frac,
  CASE WHEN len(g2) > 0
       THEN round(CAST(list_max(c2) AS DOUBLE) / CAST(len(g2) AS DOUBLE), 4)
       ELSE 0.0 END AS top_bigram_frac,
  CASE WHEN len(g3) > 0
       THEN round(CAST(list_sum(list_transform(c3, c -> CASE WHEN c >= 2 THEN c ELSE 0 END)) AS DOUBLE)
                  / CAST(len(g3) AS DOUBLE), 4)
       ELSE 0.0 END AS dup_trigram_frac
       ,CAST(len(g2) AS INT) AS n_bigrams
 FROM c)
SELECT doc_id, dup_token_frac, top_bigram_frac, dup_trigram_frac,
       CAST((n_bigrams < {min_bg} OR top_bigram_frac <= {tb_max})
            AND dup_trigram_frac <= {dt_max}
            AS BIGINT) AS repetition_ok
FROM f
"""


# ----------------------------------------------------- decontaminate
_DECON_N = 5
_DECON_BENCH_FRAC = 0.1
_DECON_MIN_FRAC = 0.2


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination report: each training document's
    distinct word 5-grams joined (broadcast) against the held-out
    split's gram set; collision count/fraction + the contaminated
    verdict as 0/1.  The held-out split is the md5-uniform
    hash_unit('bench'|doc_id) < 0.1 — deterministic, oracle-replayed.
    Corpus streams once; only the small benchmark gram set is
    broadcast (operators/decontam.py)."""
    from prod2vec_spark.operators.decontam import contamination_report

    docs = read_table(spark, sf_dir, "documents")
    rep = contamination_report(
        docs,
        n=_DECON_N,
        bench_frac=_DECON_BENCH_FRAC,
        contaminated_min_frac=_DECON_MIN_FRAC,
    )
    return rep.withColumn("contaminated", F.col("contaminated").cast("long"))


def _sql_decontaminate() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    span = _DECON_N - 1
    return f"""
WITH d AS (SELECT doc_id, text,
  ('0x' || substr(md5('bench|' || doc_id), 1, 8))::BIGINT / 4294967296.0
    < {_DECON_BENCH_FRAC} AS is_bench
 FROM documents),
t AS (SELECT doc_id, is_bench, {_TOKS} AS toks FROM d),
g AS (SELECT doc_id, is_bench,
  list_distinct(list_transform(generate_series(1, len(toks) - {span}),
    i -> array_to_string(list_slice(toks, i, i + {span}), ' '))) AS grams
 FROM t),
bg AS (SELECT DISTINCT gram
       FROM (SELECT unnest(grams) AS gram FROM g WHERE is_bench)),
tg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE NOT is_bench),
r AS (SELECT tg.doc_id,
        count(*) AS n_grams,
        CAST(sum(CASE WHEN bg.gram IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit
      FROM tg LEFT JOIN bg ON tg.gram = bg.gram
      GROUP BY tg.doc_id)
SELECT doc_id, n_grams, n_hit,
       round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4) AS hit_frac,
       CAST(round(CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE), 4)
            >= {_DECON_MIN_FRAC} AS BIGINT) AS contaminated
FROM r
"""


# --------------------------------------------------- weighted sample
_WS_K = 25


def q_weighted_sample(spark, sf_dir):
    """A-ES weighted sample: the 25 documents winning the
    ln(u)/n_chars race (u = md5-uniform of 'ws'|doc_id) — longer
    documents proportionally likelier, fully deterministic.  Plans as
    TakeOrderedAndProject; the rank window runs on the 25-row
    result."""
    from prod2vec_spark.operators.relational import weighted_sample_aes

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    top = weighted_sample_aes(docs, "n_chars", _WS_K, ["doc_id"], seed="ws")
    w = Window.orderBy(F.desc("_aes_key"), F.asc("doc_id"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "doc_id", "n_chars"
    )


def _sql_weighted_sample() -> str:
    return f"""
WITH k AS (SELECT doc_id, n_chars,
  ln(('0x' || substr(md5('ws|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
    / CAST(n_chars AS DOUBLE) AS aes_key
 FROM documents WHERE n_chars > 0)
SELECT CAST(row_number() OVER (ORDER BY aes_key DESC, doc_id) AS INT) AS rank,
       doc_id, n_chars
FROM k
ORDER BY aes_key DESC, doc_id
LIMIT {_WS_K}
"""


# --------------------------------------------------- semdedup audit
_SEM_CLUSTERS = 8
_SEM_THRESHOLD = 0.4


def q_semdedup_audit(spark, sf_dir):
    """SemDeDup per-cluster audit: cluster embeddings into 8
    deterministic cells, drop within-cluster cosine near-duplicates
    (keep the min-id representative), report per-cluster totals plus
    a kept-id checksum so the hash match certifies WHICH rows
    survived, not just how many (operators/simsearch.semdedup)."""
    from prod2vec_spark.operators import simsearch as SS

    emb = read_table(spark, sf_dir, "embeddings")
    flags = SS.semdedup(
        emb,
        dims=64,
        n_clusters=_SEM_CLUSTERS,
        threshold=_SEM_THRESHOLD,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )
    return flags.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("kept").cast("long")).alias("n_kept"),
        F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
        F.sum(F.when(F.col("kept"), F.col("id")).otherwise(F.lit(0))).alias(
            "kept_id_sum"
        ),
    )


def _sql_semdedup_audit() -> str:
    from prod2vec_spark.queries_ext import _DOT, _L2, _UNIT

    dot_ec = _DOT.format(a="e.embedding", b="c.cvec")
    dot_ab = _DOT.format(a="a.nvec", b="b.nvec")
    return f"""
WITH cent AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS cvec
              FROM embeddings
              WHERE {_L2.format(a='embedding')} > 0
              ORDER BY md5('sem|' || vec_id), vec_id LIMIT {_SEM_CLUSTERS}),
cid AS (SELECT row_number() OVER (ORDER BY md5('sem|' || vec_id), vec_id) - 1 AS cid,
               cvec
        FROM cent),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ({dot_ec}) DESC, c.cid) AS rk
    FROM embeddings e CROSS JOIN cid c)
  WHERE rk = 1),
u AS (SELECT vec_id, cid, {_UNIT.format(a='embedding')} AS nvec FROM assign),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM u a JOIN u b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round({dot_ab}, 5) >= {_SEM_THRESHOLD})
SELECT s.cid,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN d.vec_id IS NULL THEN s.vec_id ELSE 0 END) AS BIGINT)
         AS kept_id_sum
FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
GROUP BY s.cid
"""


# --------------------------------------------------------- pii scrub
def q_pii_scrub(spark, sf_dir):
    """PII redaction report: the synthetic corpus carries no PII, so
    the query PLANTS deterministic emails (doc_id % 7 = 0) and phone
    numbers (doc_id % 11 = 0) first, then scrubs — exercising the real
    operator over the real table with a known ground truth.  Output:
    per-doc match counts + md5 of the scrubbed text, so the oracle
    hash-certifies the exact redacted byte stream (operators/pii.py)."""
    from prod2vec_spark.operators.pii import redaction_report

    docs = read_table(spark, sf_dir, "documents")
    planted = F.col("text")
    planted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            planted,
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(planted)
    planted = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(planted, F.lit(" call 555-867-5309")),
    ).otherwise(planted)
    staged = docs.withColumn("_pt", planted)
    rep = redaction_report(F.col("_pt"))
    return staged.select(
        "doc_id",
        rep["n_emails"].alias("n_emails"),
        rep["n_phones"].alias("n_phones"),
        rep["scrub_md5"].alias("scrub_md5"),
    )


def _sql_pii_scrub() -> str:
    from prod2vec_spark.operators.pii import (
        EMAIL_PATTERN,
        EMAIL_TOKEN,
        PHONE_PATTERN,
        PHONE_TOKEN,
    )

    return f"""
WITH p AS (SELECT doc_id,
  CASE WHEN doc_id % 11 = 0
       THEN (CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || doc_id || '@example.com'
                  ELSE text END) || ' call 555-867-5309'
       ELSE (CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || doc_id || '@example.com'
                  ELSE text END) END AS pt
 FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(pt, '{EMAIL_PATTERN}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(
         regexp_replace(pt, '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'),
         '{PHONE_PATTERN}')) AS INT) AS n_phones,
  md5(regexp_replace(regexp_replace(pt, '{EMAIL_PATTERN}', '{EMAIL_TOKEN}', 'g'),
                     '{PHONE_PATTERN}', '{PHONE_TOKEN}', 'g')) AS scrub_md5
FROM p
"""


# -------------------------------------------------------- doc chunks
_CHUNK_LEN = 32
_CHUNK_STRIDE = 24
_CHUNK_MIN = 8


def q_doc_chunks(spark, sf_dir):
    """Training-sequence chunking: 32-token windows at stride 24
    (8-token overlap), sub-8-token tails dropped; per-chunk rolling
    fingerprint certifies chunk CONTENT through the hash match
    (operators/chunking.py)."""
    from prod2vec_spark.operators.chunking import doc_chunks

    docs = read_table(spark, sf_dir, "documents")
    return doc_chunks(
        docs, seq_len=_CHUNK_LEN, stride=_CHUNK_STRIDE, min_len=_CHUNK_MIN
    )


def _sql_doc_chunks() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, toks,
        unnest(generate_series(1, len(toks), {_CHUNK_STRIDE})) AS st
      FROM t),
c AS (SELECT doc_id,
        CAST((st - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_idx,
        list_slice(toks, st, st + {_CHUNK_LEN - 1}) AS ctoks
      FROM s)
SELECT doc_id, chunk_idx,
       CAST(len(ctoks) AS INT) AS n_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(ctoks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647)),
         (a, b) -> (a * 131 + b) % 2147483647) AS chunk_fp
FROM c
WHERE len(ctoks) >= {_CHUNK_MIN}
"""


# ----------------------------------------------------- quantile sketch
_BK_K = 256
_BK_PS = [0.25, 0.5, 0.75, 0.9]
# DKW: sup|F_k − F| ≤ sqrt(ln(2/δ)/(2k)) w.p. ≥ 1−δ; δ=0.01, k=256
# → 0.1018, plus 1/k interpolation slack.
_BK_BOUND = 0.1018 + 1.0 / _BK_K


def q_quantile_sketch(spark, sf_dir):
    """Bottom-k sketch quantile audit (E-A14): a 256-row md5-order
    uniform sample of orders (TakeOrdered — k rows move, never a full
    sort), linear-interpolation quantile estimates from the sample,
    and the CHECKED DKW bound: the exact CDF of each estimate must sit
    within sqrt(ln(2/δ)/(2k)) + 1/k of its target p.  Deterministic
    end-to-end, so the oracle hash-matches the estimates themselves,
    not just the bound verdicts (operators/sketches.py
    bottomk_sketch/bottomk_quantiles)."""
    from prod2vec_spark.operators.sketches import (
        bottomk_quantiles,
        bottomk_sketch,
    )

    orders = read_table(spark, sf_dir, "orders")
    sk = bottomk_sketch(orders, "o_totalprice", ["o_orderkey"], k=_BK_K)
    est = bottomk_quantiles(sk, _BK_PS)
    # one corpus pass computes the exact CDF at all 4 estimates: the
    # 4-row estimate table broadcasts into the scan
    cdf = (
        orders.crossJoin(F.broadcast(est))
        .groupBy("p", "est_q")
        .agg(
            F.round(
                F.sum((F.col("o_totalprice") <= F.col("est_q")).cast("long"))
                / F.count(F.lit(1)),
                4,
            ).alias("cdf_at_est")
        )
    )
    return cdf.select(
        "p",
        "est_q",
        "cdf_at_est",
        F.round(F.abs(F.col("cdf_at_est") - F.col("p")), 4).alias("abs_err"),
        (F.abs(F.col("cdf_at_est") - F.col("p")) <= F.lit(_BK_BOUND))
        .cast("long")
        .alias("within_dkw_bound"),
    )


def _sql_quantile_sketch() -> str:
    return f"""
WITH sk AS (SELECT o_totalprice AS v FROM orders
            ORDER BY md5('bk|' || o_orderkey), o_totalprice LIMIT {_BK_K}),
est AS (SELECT 0.25 AS p, round(quantile_cont(v, 0.25), 2) AS est_q FROM sk
        UNION ALL
        SELECT 0.5, round(quantile_cont(v, 0.5), 2) FROM sk
        UNION ALL
        SELECT 0.75, round(quantile_cont(v, 0.75), 2) FROM sk
        UNION ALL
        SELECT 0.9, round(quantile_cont(v, 0.9), 2) FROM sk),
cdf AS (SELECT p, est_q,
          round(CAST(sum(CASE WHEN o_totalprice <= est_q THEN 1 ELSE 0 END)
                     AS DOUBLE) / count(*), 4) AS cdf_at_est
        FROM orders CROSS JOIN est
        GROUP BY p, est_q)
SELECT p, est_q, cdf_at_est,
       round(abs(cdf_at_est - p), 4) AS abs_err,
       CAST(abs(cdf_at_est - p) <= {_BK_BOUND} AS BIGINT) AS within_dkw_bound
FROM cdf
"""


# ------------------------------------------------- verbatim span pairs
_WN_K = 8
_WN_W = 8
_WN_MAX_GROUP = 64


def q_verbatim_span_pairs(spark, sf_dir):
    """Winnowing exact-substring dedup candidates: doc pairs sharing
    selected k-gram fingerprints, guaranteed to include every pair
    with a verbatim common span ≥ w+k−1 = 15 tokens — the long-quote
    dedup case whole-document MinHash can't see.  Same banded scale
    shape as LSH (explode sparse fingerprints, group, in-array pair
    expand, hot-group cap at 64) (operators/dedup.py
    winnow_fingerprints/winnow_candidate_pairs)."""
    from prod2vec_spark.operators.dedup import winnow_candidate_pairs

    docs = read_table(spark, sf_dir, "documents")
    return winnow_candidate_pairs(
        docs, k=_WN_K, w=_WN_W, max_group=_WN_MAX_GROUP
    )


def _sql_verbatim_span_pairs() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    k, w, mg = _WN_K, _WN_W, _WN_MAX_GROUP
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
  CASE WHEN len(toks) >= {k} THEN
    list_transform(generate_series(1, len(toks) - {k - 1}),
      i -> ('0x' || substr(md5(array_to_string(list_slice(toks, i, i + {k - 1}), ' ')), 1, 8))::BIGINT)
  ELSE CAST([] AS BIGINT[]) END AS gh
 FROM t),
f AS (SELECT doc_id, list_distinct(
        CASE WHEN len(gh) >= {w} THEN
          list_transform(generate_series(1, len(gh) - {w - 1}),
                         i -> list_min(list_slice(gh, i, i + {w - 1})))
        ELSE gh END) AS fps
      FROM g),
e AS (SELECT doc_id, unnest(fps) AS fp FROM f),
sz AS (SELECT fp, count(*) AS n FROM e GROUP BY fp),
e2 AS (SELECT e.doc_id, e.fp FROM e JOIN sz USING (fp)
       WHERE n BETWEEN 2 AND {mg})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS n_shared_fps
FROM e2 a JOIN e2 b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


# ------------------------------------------------------ pack audit
_PACK_BUDGET = 512
_PACK_SHARDS = 4


def q_pack_audit(spark, sf_dir):
    """Sequence-packing audit: documents packed greedily into
    512-token bins per (lang, shard) — per-bin doc count, token sum,
    and fill ratio, plus the bin's min doc_id as the identity
    checksum so the hash match certifies WHICH docs landed where
    (operators/chunking.pack_sequences)."""
    from prod2vec_spark.operators.chunking import pack_sequences

    docs = read_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    )
    return packed.groupBy("part", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(
            F.sum("n_tokens") / F.lit(float(_PACK_BUDGET)), 4
        ).alias("fill_ratio"),
        F.min("doc_id").alias("min_doc_id"),
    )


def _sql_pack_audit() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    b, ns = _PACK_BUDGET, _PACK_SHARDS
    return f"""
WITH t AS (SELECT doc_id, lang AS part,
             ('0x' || substr(md5('shard|' || doc_id), 1, 8))::BIGINT % {ns}
               AS shard,
             len({_TOKS}) AS n_tokens,
             md5('pack|' || doc_id) AS ord_key
           FROM documents),
p AS (SELECT doc_id, part, shard, n_tokens,
        CAST(floor(CAST(sum(n_tokens) OVER (PARTITION BY part, shard
                                            ORDER BY ord_key, doc_id
                                            ROWS UNBOUNDED PRECEDING)
                        - n_tokens AS DOUBLE) / {b}) AS INT) AS bin
      FROM t)
SELECT part, shard, bin,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       round(CAST(sum(n_tokens) AS DOUBLE) / {b}.0, 4) AS fill_ratio,
       min(doc_id) AS min_doc_id
FROM p
GROUP BY part, shard, bin
"""




# ----------------------------------------------------- source profile
def q_source_profile(spark, sf_dir):
    """Per-source corpus dashboard (the C4/RefinedWeb per-domain view
    that drives source-level keep/drop decisions): doc and token
    counts, mean quality score, and the verbatim-duplicate share
    (1 − distinct digests / docs).  Mean quality goes through the
    integer-staging trick (score is already rounded to 4 decimals, so
    ×10⁴ is exact) — partition-order float drift can't surface.  One
    scan + one bounded groupBy on the low-cardinality source key."""
    docs = read_table(spark, sf_dir, "documents")
    from prod2vec_spark.operators.dedup import text_digest

    staged = docs.select(
        "source",
        F.size(TX.tokens(F.col("text"))).alias("_nt"),
        (TX.quality_score(F.col("text")) * 10000).cast("long").alias("_q4"),
        text_digest(F.col("text")).alias("_h"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(F.sum("_q4") / (F.lit(10000.0) * F.count(F.lit(1))), 4).alias(
            "mean_quality"
        ),
        F.countDistinct("_h").alias("n_distinct_docs"),
        F.round(
            F.lit(1.0) - F.countDistinct("_h") / F.count(F.lit(1)), 4
        ).alias("dup_frac"),
    )


def _sql_source_profile() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    # quality_score formula inlined from _sql_text_profile's convention
    q = r"""round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
         + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / length(text), 4))
         + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4)"""
    return rf"""
WITH t AS (SELECT source, text, {_TOKS} AS toks FROM documents),
s AS (SELECT source,
        CAST(len(toks) AS INT) AS nt,
        CAST({q} * 10000 AS BIGINT) AS q4,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
      FROM t)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       round(CAST(sum(q4) AS DOUBLE) / (10000.0 * count(*)), 4) AS mean_quality,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_docs,
       round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 4) AS dup_frac
FROM s
GROUP BY source
"""


R6B_QUERIES = {
    "doc_repetition": q_doc_repetition,
    "decontaminate": q_decontaminate,
    "weighted_sample": q_weighted_sample,
    "semdedup_audit": q_semdedup_audit,
    "pii_scrub": q_pii_scrub,
    "doc_chunks": q_doc_chunks,
    "quantile_sketch": q_quantile_sketch,
    "verbatim_span_pairs": q_verbatim_span_pairs,
    "pack_audit": q_pack_audit,
    "source_profile": q_source_profile,
}

R6B_ORACLES = {
    "doc_repetition": _sql_doc_repetition(),
    "decontaminate": _sql_decontaminate(),
    "weighted_sample": _sql_weighted_sample(),
    "semdedup_audit": _sql_semdedup_audit(),
    "pii_scrub": _sql_pii_scrub(),
    "doc_chunks": _sql_doc_chunks(),
    "quantile_sketch": _sql_quantile_sketch(),
    "verbatim_span_pairs": _sql_verbatim_span_pairs(),
    "pack_audit": _sql_pack_audit(),
    "source_profile": _sql_source_profile(),
}

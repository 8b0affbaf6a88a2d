"""Round-7 tranche: four more LLM-training-data operator families,
each with a full DuckDB oracle (ENGINE scope; reference anchor:
utils/prep_utils.py stops at basket assembly — no corpus-hygiene or
retrieval plane).

* ``segment_dedup_stats`` — CCNet-style cross-document segment (line)
  dedup: boilerplate spans repeated in >= min_docs documents removed,
  per-doc survival report (operators/linedup.py).
* ``lm_perplexity``       — bigram LM with Stupid Backoff trained on a
  deterministic split, per-doc mean NLL + perplexity — the KenLM-style
  quality signal (operators/lm.py).
* ``bm25_topk``           — BM25 retrieval over an inverted index:
  broadcast query-term probe, per-query top-k (operators/bm25.py).
* ``canonical_pick``      — quality-aware near-dup survivor selection:
  keep each LSH/CC cluster's best-quality member, not its min id
  (operators/graph.py canonical_by_quality).

Catalog conventions (queries.py header) apply: every aggregate/derived
column aliased identically in Spark and SQL; booleans surfaced as
BIGINT 0/1; md5 as the portable hash; floats rounded at 4 digits;
ranks CAST AS INT; count sums CAST AS BIGINT.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table

# --------------------------------------------- segment (line) dedup
SEG_WIDTH = 10
SEG_MIN_DOCS = 2


def q_segment_dedup(spark, sf_dir):
    """Per-document segment-dedup survival report: total windows,
    boilerplate windows dropped, md5 of the reassembled text.  Two
    hash-shuffles (segment count, reassembly) + a broadcast anti join
    — the CCNet line-dedup shape (operators/linedup.py)."""
    from prod2vec_spark.operators.linedup import segment_dedup

    docs = read_table(spark, sf_dir, "documents")
    out = segment_dedup(docs, width=SEG_WIDTH, min_docs=SEG_MIN_DOCS)
    return out.select(
        "doc_id", "n_segs", "n_dropped", F.md5("kept_text").alias("kept_md5")
    )


def _sql_segment_dedup() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    w, m = SEG_WIDTH, SEG_MIN_DOCS
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        array_to_string(list_slice(toks, CAST(i AS INT) * {w} + 1,
                                         CAST(i AS INT) * {w} + {w}), ' ') AS seg
      FROM t, unnest(range(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT))) AS u(i)
      WHERE len(toks) > 0),
b AS (SELECT md5(seg) AS seg_h FROM s
      GROUP BY 1 HAVING count(DISTINCT doc_id) >= {m}),
kept AS (SELECT s.doc_id, s.pos, s.seg
         FROM s LEFT JOIN b ON md5(s.seg) = b.seg_h WHERE b.seg_h IS NULL),
r AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY pos) AS kept_text
      FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id,
          COALESCE(CAST(ceil(len(toks) / {w}.0) AS BIGINT), 0) AS n_segs
        FROM t)
SELECT tot.doc_id, n_segs,
       n_segs - COALESCE(n_kept, 0) AS n_dropped,
       md5(COALESCE(kept_text, '')) AS kept_md5
FROM tot LEFT JOIN r ON tot.doc_id = r.doc_id
"""


# ------------------------------------------------- LM perplexity
LM_TRAIN_FRAC = 0.8
LM_ALPHA = 0.4


def q_lm_perplexity(spark, sf_dir):
    """Per-document bigram-LM score (Stupid Backoff, add-one-smoothed
    backoff leg): is_train 0/1, pair counts, backoff count, mean NLL,
    perplexity.  Counting = two train-side hash-aggs; scoring = one
    shuffle join on the pair key + broadcast unigram/scalar probes
    (operators/lm.py scale notes)."""
    from prod2vec_spark.operators.lm import lm_perplexity

    docs = read_table(spark, sf_dir, "documents")
    return lm_perplexity(
        docs, train_frac=LM_TRAIN_FRAC, alpha=LM_ALPHA, seed="lm"
    )


def _sql_lm_perplexity() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH sp AS (SELECT doc_id, text,
    (('0x' || substr(md5('lm|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
      < {LM_TRAIN_FRAC} AS is_train
  FROM documents),
t AS (SELECT doc_id, is_train, {_TOKS} AS toks FROM sp),
p AS (SELECT doc_id, is_train,
        toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM p WHERE is_train GROUP BY 1, 2),
c1 AS (SELECT w, count(*) AS c1
       FROM (SELECT unnest(toks) AS w FROM t WHERE is_train) GROUP BY 1),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t_tokens,
               count(*) AS v_vocab FROM c1),
sc AS (SELECT p.doc_id, p.is_train,
    CASE WHEN c2.c2 IS NOT NULL THEN CAST(c2.c2 AS DOUBLE) / ca.c1
         ELSE {LM_ALPHA} * (COALESCE(cb.c1, 0) + 1)
              / (tot.t_tokens + tot.v_vocab) END AS prob,
    CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS backoff
  FROM p
  LEFT JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
  LEFT JOIN c1 ca ON p.w1 = ca.w
  LEFT JOIN c1 cb ON p.w2 = cb.w
  CROSS JOIN tot)
SELECT doc_id, max(CAST(is_train AS BIGINT)) AS is_train,
       count(*) AS n_pairs,
       CAST(sum(backoff) AS BIGINT) AS n_backoff,
       round(avg(-ln(prob)), 4) AS avg_nll,
       round(exp(avg(-ln(prob))), 4) AS ppl
FROM sc GROUP BY doc_id
"""


# --------------------------------------------------- BM25 retrieval
BM25_K = 10
BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q_spark", ["spark", "table"]),
    ("q_scan", ["scan", "filter", "slow"]),
    ("q_stream", ["stream", "window", "batch"]),
]


def q_bm25_topk(spark, sf_dir):
    """Top-10 documents per keyword query under BM25 — inverted-index
    probe: broadcast query terms prune the postings, df/dl/(N, avgdl)
    derive from one text scan, per-query top-k window over rounded
    scores (operators/bm25.py scale notes)."""
    from prod2vec_spark.operators.bm25 import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=BM25_K)


def _sql_bm25_topk() -> str:
    from prod2vec_spark.operators.bm25 import B, K1
    from prod2vec_spark.queries_ext import _TOKS

    values = ", ".join(
        f"('{qid}', '{t}')" for qid, terms in BM25_QUERIES for t in sorted(set(terms))
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
post AS (SELECT doc_id, w AS term, count(*) AS tf
         FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM post GROUP BY 1),
st AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
q(query_id, term) AS (VALUES {values}),
hits AS (SELECT q.query_id, post.doc_id, post.term, post.tf
         FROM post JOIN q ON post.term = q.term),
dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
sc AS (SELECT query_id, h.doc_id,
    round(sum(
      ln(1 + (st.n_docs - dft.df + 0.5) / (dft.df + 0.5))
      * h.tf * ({K1} + 1)
      / (h.tf + {K1} * (1 - {B} + {B} * dl.dl / st.avgdl))), 4) AS score
  FROM hits h
  JOIN dft ON h.term = dft.term
  JOIN dl ON h.doc_id = dl.doc_id
  CROSS JOIN st
  GROUP BY 1, 2),
r AS (SELECT query_id, doc_id, score,
        CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM sc)
SELECT query_id, rank, doc_id, score FROM r WHERE rank <= {BM25_K}
"""


# -------------------------------------- quality-canonical survivor
def q_canonical_pick(spark, sf_dir):
    """Near-dup survivor selection by QUALITY: LSH candidate pairs →
    CC clusters → per-cluster best-quality member (ties → lowest
    doc_id).  One max_by hash-agg over the clustered fraction — no
    window, no sort (operators/graph.py canonical_by_quality)."""
    from prod2vec_spark.operators import dedup as DD
    from prod2vec_spark.operators import graph as GR
    from prod2vec_spark.operators import text as TX
    from prod2vec_spark.queries_ext import LSH_MAX_GROUP

    docs = read_table(spark, sf_dir, "documents")
    pairs = DD.lsh_candidate_pairs(
        DD.minhash_bands(docs), max_group=LSH_MAX_GROUP
    )
    clusters = GR.dedup_clusters(pairs)
    scored = docs.select(
        "doc_id", TX.quality_score(F.col("text")).alias("q")
    )
    return GR.canonical_by_quality(clusters, scored, q_col="q")


def _sql_canonical_pick() -> str:
    from prod2vec_spark.queries_ext import (
        _SQL_MINHASH,
        _SQL_SHINGLES3,
        _TOKS,
        LSH_MAX_GROUP,
    )

    return f"""
WITH RECURSIVE {_SQL_SHINGLES3},
{_SQL_MINHASH},
eligible AS (
  SELECT band_id, band_sig FROM bands
  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
r(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM e)
  UNION
  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a),
clusters AS (SELECT a AS doc_id, min(b) AS cluster_id FROM r GROUP BY a),
quality AS (
  SELECT doc_id,
    round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
      + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
      + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS q
  FROM (SELECT doc_id, text, {_TOKS} AS toks FROM documents)),
m AS (SELECT c.cluster_id, c.doc_id, q.q,
        row_number() OVER (PARTITION BY c.cluster_id
                           ORDER BY q.q DESC, c.doc_id) AS rn,
        count(*) OVER (PARTITION BY c.cluster_id) AS n_members
      FROM clusters c JOIN quality q ON c.doc_id = q.doc_id)
SELECT cluster_id, n_members, doc_id AS keep_doc_id, q AS keep_q
FROM m WHERE rn = 1
"""


R7_QUERIES = {
    "segment_dedup_stats": q_segment_dedup,
    "lm_perplexity": q_lm_perplexity,
    "bm25_topk": q_bm25_topk,
    "canonical_pick": q_canonical_pick,
}

R7_ORACLES = {
    "segment_dedup_stats": _sql_segment_dedup(),
    "lm_perplexity": _sql_lm_perplexity(),
    "bm25_topk": _sql_bm25_topk(),
    "canonical_pick": _sql_canonical_pick(),
}


# ---------------------------------------------- hard-negative mining
def q_hard_negatives(spark, sf_dir):
    """Contrastive hard negatives: per query vector (vec_id < 20) the
    top-5 most-similar embeddings with a DIFFERENT label — broadcast
    queries, one corpus pass, per-query rank window
    (operators/simsearch.hard_negative_topk)."""
    from prod2vec_spark.operators.simsearch import hard_negative_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return hard_negative_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


def _sql_hard_negatives() -> str:
    from prod2vec_spark.queries_ext import _NSIM, _UNIT

    return f"""
WITH n AS (SELECT vec_id, label, {_UNIT.format(a='embedding')} AS nvec
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label, nvec AS qn
      FROM n WHERE vec_id < 20),
p AS (SELECT query_id, query_label, vec_id, label, {_NSIM} AS sim
      FROM n CROSS JOIN q
      WHERE vec_id != query_id AND label != query_label)
SELECT query_id, query_label, vec_id AS neighbor_id,
       label AS neighbor_label, round(sim, 5) AS cosine_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, query_label, vec_id, label, sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rank
      FROM p)
WHERE rank <= 5
"""


R7_QUERIES["hard_negatives"] = q_hard_negatives
R7_ORACLES["hard_negatives"] = _sql_hard_negatives()


# ------------------------------------------------ text normalization
def q_text_normalize(spark, sf_dir):
    """Canonical normalization audit: per-doc normalized-text digest +
    whether normalization changed the bytes (0/1) + length delta —
    the pre-dedup cleanup stage as an oracle-checked surface
    (operators/text.normalize_text).  One row-local scan."""
    from prod2vec_spark.operators.text import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        (norm != F.col("text")).cast("long").alias("changed"),
        (F.length("text") - F.length(norm)).alias("len_delta"),
    )


def _sql_text_normalize() -> str:
    return r"""
WITH n AS (
  SELECT doc_id, text,
    lower(trim(regexp_replace(
      regexp_replace(text, '[\x00-\x1F\x7F]', ' ', 'g'),
      '\s+', ' ', 'g'))) AS norm
  FROM documents)
SELECT doc_id, md5(norm) AS norm_md5,
       CAST(norm != text AS BIGINT) AS changed,
       length(text) - length(norm) AS len_delta
FROM n
"""


R7_QUERIES["text_normalize"] = q_text_normalize
R7_ORACLES["text_normalize"] = _sql_text_normalize()


# ----------------------------------------------- trigram perplexity
def q_trigram_perplexity(spark, sf_dir):
    """Per-document trigram Stupid-Backoff score: the order-3 upgrade
    of lm_perplexity (trigram → bigram → smoothed-unigram backoff
    chain, backoff-level counts surfaced).  Both high-order count
    tables probe via honest shuffle joins (operators/lm.py
    trigram_perplexity scale notes)."""
    from prod2vec_spark.operators.lm import trigram_perplexity

    docs = read_table(spark, sf_dir, "documents")
    return trigram_perplexity(
        docs, train_frac=LM_TRAIN_FRAC, alpha=LM_ALPHA, seed="lm"
    )


def _sql_trigram_perplexity() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    a = LM_ALPHA
    return f"""
WITH sp AS (SELECT doc_id, text,
    (('0x' || substr(md5('lm|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
      < {LM_TRAIN_FRAC} AS is_train
  FROM documents),
t AS (SELECT doc_id, is_train, {_TOKS} AS toks FROM sp),
tr AS (SELECT doc_id, is_train,
        toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2,
        toks[CAST(i AS INT) + 2] AS w3
      FROM t, unnest(range(1, len(toks) - 1)) AS u(i)),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tr WHERE is_train
       GROUP BY 1, 2, 3),
p2 AS (SELECT doc_id, is_train,
        toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM p2 WHERE is_train GROUP BY 1, 2),
c1 AS (SELECT w, count(*) AS c1
       FROM (SELECT unnest(toks) AS w FROM t WHERE is_train) GROUP BY 1),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t_tokens,
               count(*) AS v_vocab FROM c1),
sc AS (SELECT tr.doc_id, tr.is_train,
    CASE WHEN c3.c3 IS NOT NULL
           THEN CAST(c3.c3 AS DOUBLE) / cx.c2
         WHEN cb.c2 IS NOT NULL
           THEN {a} * cb.c2 / cu.c1
         ELSE {a * a} * (COALESCE(cf.c1, 0) + 1)
              / (tot.t_tokens + tot.v_vocab) END AS prob,
    CASE WHEN c3.c3 IS NULL THEN 1 ELSE 0 END AS bo1,
    CASE WHEN c3.c3 IS NULL AND cb.c2 IS NULL THEN 1 ELSE 0 END AS bo2
  FROM tr
  LEFT JOIN c3 ON tr.w1 = c3.w1 AND tr.w2 = c3.w2 AND tr.w3 = c3.w3
  LEFT JOIN c2 cx ON tr.w1 = cx.w1 AND tr.w2 = cx.w2
  LEFT JOIN c2 cb ON tr.w2 = cb.w1 AND tr.w3 = cb.w2
  LEFT JOIN c1 cu ON tr.w2 = cu.w
  LEFT JOIN c1 cf ON tr.w3 = cf.w
  CROSS JOIN tot)
SELECT doc_id, max(CAST(is_train AS BIGINT)) AS is_train,
       count(*) AS n_triples,
       CAST(sum(bo1) AS BIGINT) AS n_bo1,
       CAST(sum(bo2) AS BIGINT) AS n_bo2,
       round(avg(-ln(prob)), 4) AS avg_nll,
       round(exp(avg(-ln(prob))), 4) AS ppl
FROM sc GROUP BY doc_id
"""


R7_QUERIES["trigram_perplexity"] = q_trigram_perplexity
R7_ORACLES["trigram_perplexity"] = _sql_trigram_perplexity()


# ------------------------------------------ per-language perplexity
def q_lm_by_lang(spark, sf_dir):
    """CCNet-shape per-language LM scoring: one bigram model per
    language estimated in a single grouped computation (lang joins
    every count key), per-doc scores against the doc's own language
    model (operators/lm.py lm_perplexity_by_lang)."""
    from prod2vec_spark.operators.lm import lm_perplexity_by_lang

    docs = read_table(spark, sf_dir, "documents")
    return lm_perplexity_by_lang(
        docs, train_frac=LM_TRAIN_FRAC, alpha=LM_ALPHA, seed="lm"
    )


def _sql_lm_by_lang() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH sp AS (SELECT doc_id, lang, text,
    (('0x' || substr(md5('lm|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
      < {LM_TRAIN_FRAC} AS is_train
  FROM documents),
t AS (SELECT doc_id, lang, is_train, {_TOKS} AS toks FROM sp),
p AS (SELECT doc_id, lang, is_train,
        toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
      FROM t, unnest(range(1, len(toks))) AS u(i)),
c2 AS (SELECT lang, w1, w2, count(*) AS c2 FROM p WHERE is_train
       GROUP BY 1, 2, 3),
c1 AS (SELECT lang, w, count(*) AS c1
       FROM (SELECT lang, unnest(toks) AS w FROM t WHERE is_train)
       GROUP BY 1, 2),
tot AS (SELECT lang, CAST(sum(c1) AS BIGINT) AS t_tokens,
               count(*) AS v_vocab FROM c1 GROUP BY 1),
sc AS (SELECT p.doc_id, p.lang, p.is_train,
    CASE WHEN c2.c2 IS NOT NULL THEN CAST(c2.c2 AS DOUBLE) / ca.c1
         ELSE {LM_ALPHA} * (COALESCE(cb.c1, 0) + 1)
              / (tot.t_tokens + tot.v_vocab) END AS prob,
    CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS backoff
  FROM p
  LEFT JOIN c2 ON p.lang = c2.lang AND p.w1 = c2.w1 AND p.w2 = c2.w2
  LEFT JOIN c1 ca ON p.lang = ca.lang AND p.w1 = ca.w
  LEFT JOIN c1 cb ON p.lang = cb.lang AND p.w2 = cb.w
  JOIN tot ON p.lang = tot.lang)
SELECT doc_id, lang, max(CAST(is_train AS BIGINT)) AS is_train,
       count(*) AS n_pairs,
       CAST(sum(backoff) AS BIGINT) AS n_backoff,
       round(avg(-ln(prob)), 4) AS avg_nll,
       round(exp(avg(-ln(prob))), 4) AS ppl
FROM sc GROUP BY doc_id, lang
"""


R7_QUERIES["lm_by_lang"] = q_lm_by_lang
R7_ORACLES["lm_by_lang"] = _sql_lm_by_lang()


# ------------------------------------------------ curriculum buckets
def q_curriculum_buckets(spark, sf_dir):
    """Curriculum-ordering assignment: each doc's LM perplexity mapped
    to a difficulty quartile (0 = most fluent … 3 = hardest) — the
    easy-to-hard data-ordering signal curriculum training consumes.
    Thresholds are ONE 3-value percentile aggregate broadcast back
    (the quality_filter shape — never a corpus-wide sort/window)."""
    from prod2vec_spark.operators.lm import lm_perplexity

    docs = read_table(spark, sf_dir, "documents")
    rep = lm_perplexity(
        docs, train_frac=LM_TRAIN_FRAC, alpha=LM_ALPHA, seed="lm"
    ).select("doc_id", "ppl")
    thr = rep.agg(
        F.percentile(
            "ppl", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("t")
    )
    return (
        rep.crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "ppl",
            F.when(F.col("ppl") <= F.col("t")[0], F.lit(0))
            .when(F.col("ppl") <= F.col("t")[1], F.lit(1))
            .when(F.col("ppl") <= F.col("t")[2], F.lit(2))
            .otherwise(F.lit(3))
            .cast("long")
            .alias("bucket"),
        )
    )


def _sql_curriculum_buckets() -> str:
    return f"""
WITH rep AS (
  SELECT doc_id, ppl FROM ({_sql_lm_perplexity()})
),
thr AS (SELECT quantile_cont(ppl, [0.25, 0.5, 0.75]) AS t FROM rep)
SELECT doc_id, ppl,
  CAST(CASE WHEN ppl <= t[1] THEN 0
            WHEN ppl <= t[2] THEN 1
            WHEN ppl <= t[3] THEN 2
            ELSE 3 END AS BIGINT) AS bucket
FROM rep, thr
"""


R7_QUERIES["curriculum_buckets"] = q_curriculum_buckets
R7_ORACLES["curriculum_buckets"] = _sql_curriculum_buckets()


# --------------------------------------------- corpus snapshot diff
def q_snapshot_diff(spark, sf_dir):
    """Corpus-version diff against a deterministically-derived "next
    crawl" of the same table (docs with id%13==0 dropped, id%7==0
    text-modified, 10 fresh ids appended): per-doc added / removed /
    changed / unchanged status — the incremental-ingestion surface
    (operators/dedup.snapshot_diff; hashes join, documents don't)."""
    from prod2vec_spark.operators.dedup import snapshot_diff

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    survived = docs.where(F.col("doc_id") % 13 != 0)
    v2 = survived.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.col("text"),
        )
    )
    return snapshot_diff(docs, v2)


def _sql_snapshot_diff() -> str:
    # NULL text digests as '' (matches snapshot_diff's coalesce-to-
    # sentinel); presence is judged by id-join nullness, not digest
    dig = r"md5(regexp_replace(lower(trim(coalesce(text, ''))), '\s+', ' ', 'g'))"
    return f"""
WITH o AS (SELECT doc_id, {dig} AS ho FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 10),
n AS (SELECT doc_id, {dig} AS hn FROM v2)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.ho IS NULL THEN 'added'
            WHEN n.hn IS NULL THEN 'removed'
            WHEN o.ho != n.hn THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
"""


R7_QUERIES["snapshot_diff"] = q_snapshot_diff
R7_ORACLES["snapshot_diff"] = _sql_snapshot_diff()


# ------------------------------------------ query-likelihood ranker
QL_MU = 300.0


def q_ql_topk(spark, sf_dir):
    """Dirichlet-smoothed query-likelihood top-10 per keyword query —
    the language-modeling ranker next to BM25, same one-scan probe
    shape (operators/bm25.ql_topk)."""
    from prod2vec_spark.operators.bm25 import ql_topk

    docs = read_table(spark, sf_dir, "documents")
    return ql_topk(docs, BM25_QUERIES, k=BM25_K, mu=QL_MU)


def _sql_ql_topk() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    mu = QL_MU
    values = ", ".join(
        f"('{qid}', '{t}')"
        for qid, terms in BM25_QUERIES
        for t in sorted(set(terms))
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dl AS (SELECT doc_id, CAST(len(toks) AS INT) AS dl FROM t WHERE len(toks) > 0),
tot AS (SELECT CAST(sum(dl) AS BIGINT) AS c_tokens FROM dl),
q(query_id, term) AS (VALUES {values}),
ex AS (SELECT doc_id, unnest(toks) AS term FROM t),
hits AS (SELECT q.query_id, ex.term, ex.doc_id, count(*) AS tf
         FROM ex JOIN q ON ex.term = q.term GROUP BY 1, 2, 3),
cf AS (SELECT term, count(*) AS cf FROM ex
       WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1),
cand AS (SELECT DISTINCT query_id, doc_id FROM hits),
f AS (SELECT c.query_id, c.doc_id, q.term
      FROM cand c JOIN q ON c.query_id = q.query_id),
sc AS (SELECT f.query_id, f.doc_id,
    round(sum(ln(
      (COALESCE(h.tf, 0) + {mu} * CAST(COALESCE(cf.cf, 0) AS DOUBLE) / tot.c_tokens)
      / (dl.dl + {mu}))), 4) AS score
  FROM f
  LEFT JOIN hits h ON f.query_id = h.query_id AND f.term = h.term
                  AND f.doc_id = h.doc_id
  LEFT JOIN cf ON f.term = cf.term
  JOIN dl ON f.doc_id = dl.doc_id
  CROSS JOIN tot
  GROUP BY 1, 2),
r AS (SELECT query_id, doc_id, score,
        CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM sc)
SELECT query_id, rank, doc_id, score FROM r WHERE rank <= {BM25_K}
"""


R7_QUERIES["ql_topk"] = q_ql_topk
R7_ORACLES["ql_topk"] = _sql_ql_topk()

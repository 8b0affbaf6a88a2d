"""Round-7 wave-B/C tranche: eleven more LLM-training-data operator
families (ENGINE scope; reference anchor: utils/prep_utils.py's
driver-side np.random.choice validation split is the nearest ancestor
of the hash split).

* ``stratified_split``    — deterministic md5-hash train/val/test
  partition with a per-(lang, split) audit (operators/splits.py).
* ``temperature_mix``     — exponentiated-sampling source recipe
  p_i ∝ n_i^alpha computed from corpus stats (operators/mixing.py).
* ``mix_materialized``    — the recipe APPLIED: stochastic-rounding
  resample audit, realized vs target mass (operators/mixing.py).
* ``neardup_editdist``    — Levenshtein confirmation of LSH candidate
  pairs, banded early-abandon + prefix cap (operators/dedup.py).
* ``lsh_incremental``     — delta near-dup candidates against a prior
  snapshot's persisted band table (operators/dedup.py).
* ``quality_by_source``   — per-source percentile quality gate, the
  fairness variant (pipeline_llm.py quality_scope).
* ``quality_ppl_spearman``— exact-rank Spearman agreement between the
  quality heuristic and LM NLL (functions/stats.py).
* ``rm3_expansion``       — RM3 pseudo-relevance feedback, the
  retrieval triad's feedback leg (operators/bm25.py).
* ``epoch_shuffle_audit`` — deterministic epoch permutation + order
  checksum for the shard writer (operators/shards.py).
* ``pii_cc_audit``        — Luhn-checksum card detection over corpus
  ∪ planted fixtures (operators/pii.py).
* ``script_profile``      — Unicode script-mix composition with
  engine-portable literal ranges (operators/text.py).
* ``compression_profile`` — zlib entropy proxy (rows-only: codec
  boundary, no SQL twin; functions/compress.py).

Catalog conventions (queries.py header) apply: every aggregate/derived
column aliased identically in Spark and SQL; booleans surfaced as
BIGINT 0/1; md5 as the portable hash; floats rounded (4-6 digits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators import dedup as DD
from prod2vec_spark.operators.mixing import temperature_mix
from prod2vec_spark.operators.splits import DEFAULT_FRACTIONS, assign_split
from prod2vec_spark.queries_ext import (
    _SQL_MINHASH,
    _SQL_SHINGLES3,
    _TOKS,
    LSH_MAX_GROUP,
)
from prod2vec_spark.sources.io import read_table

# ------------------------------------------------- stratified split
SPLIT_SEED = 42


def q_stratified_split(spark, sf_dir):
    """Per-(lang, split) audit of the deterministic hash partition:
    doc/token counts + each split's share of its language.  The
    assignment itself is row-local (no shuffle); the audit is one
    bounded groupBy + a per-lang total join over the tiny aggregate
    (operators/splits.py)."""
    docs = read_table(spark, sf_dir, "documents")
    from prod2vec_spark.operators import text as TX

    s = assign_split(docs, key_col="doc_id", seed=SPLIT_SEED).select(
        "lang", "split", F.size(TX.tokens(F.col("text"))).cast("long").alias("_nt")
    )
    g = s.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("n_tokens"),
    )
    per_lang = g.groupBy("lang").agg(F.sum("n_docs").alias("_lang_docs"))
    return (
        g.join(F.broadcast(per_lang), "lang")
        .select(
            "lang",
            "split",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("n_docs").cast("double") / F.col("_lang_docs").cast("double"), 4
            ).alias("frac_of_lang"),
        )
    )


def _sql_stratified_split() -> str:
    # thresholds MUST be the identical Python-accumulated floats the
    # Spark expression uses (0.9 + 0.05 != 0.95 exactly in binary)
    cases = []
    cum = 0.0
    for name, frac in DEFAULT_FRACTIONS[:-1]:
        cum += frac
        cases.append(f"WHEN u < {cum!r} THEN '{name}'")
    case_sql = " ".join(cases)
    last = DEFAULT_FRACTIONS[-1][0]
    return f"""
WITH r AS (
  SELECT lang,
         ('0x' || substr(md5('{SPLIT_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u,
         len({_TOKS}) AS nt
  FROM documents),
s AS (SELECT lang, CASE {case_sql} ELSE '{last}' END AS split, nt FROM r),
g AS (SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM s GROUP BY 1, 2)
SELECT lang, split, n_docs, n_tokens,
       round(CAST(n_docs AS DOUBLE)
             / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 4)
         AS frac_of_lang
FROM g
"""


# ------------------------------------------------- temperature mix
MIX_ALPHA = 0.7
MIX_BUDGET = 1_000_000


def q_temperature_mix(spark, sf_dir):
    """Exponentiated-sampling source recipe (p ∝ tokens^0.7): one
    scan, one bounded per-source aggregate, a 1-row total broadcast
    back (operators/mixing.py)."""
    # spread=False: one whitespace split + a per-source partial agg is
    # cheaper than the floor repartition's full-text shuffle write
    # (VERDICT r16 ask #1 — scaling ratio 0.60 under the blanket floor)
    docs = read_table(spark, sf_dir, "documents", spread=False)
    return temperature_mix(docs, alpha=MIX_ALPHA, budget_tokens=MIX_BUDGET)


def _sql_temperature_mix() -> str:
    p = f"pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA!r})"
    return f"""
WITH t AS (SELECT source, len({_TOKS}) AS nt FROM documents),
g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM t GROUP BY 1),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
               sum({p}) AS tot_pow
        FROM g)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS p_raw,
       round({p} / tot_pow, 6) AS p_temp,
       CAST(floor({float(MIX_BUDGET)!r} * ({p} / tot_pow)) AS BIGINT)
         AS target_tokens,
       round(({p} / tot_pow) / (CAST(n_tokens AS DOUBLE) / tot_tokens), 4)
         AS boost
FROM g CROSS JOIN tot
"""


# --------------------------------------------- edit-dist confirm
ED_PREFIX = 256
ED_MAX_DIST = 51  # floor(0.2 * 256): beyond this no pair can clear 0.8
ED_SIM = 0.8


def q_neardup_editdist(spark, sf_dir):
    """Levenshtein confirmation of the LSH candidate pairs: banded
    early-abandon (threshold arg → -1 sentinel) over 256-char
    prefixes, per-pair edit similarity + confirmed gate
    (operators/dedup.py editdist_confirm)."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = DD.lsh_candidate_pairs(DD.minhash_bands(docs), max_group=LSH_MAX_GROUP)
    return DD.editdist_confirm(
        pairs, docs, prefix_len=ED_PREFIX, max_dist=ED_MAX_DIST, sim_threshold=ED_SIM
    )


def _sql_neardup_editdist() -> str:
    return f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH},
eligible AS (
  SELECT band_id, band_sig FROM bands
  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig
   AND a.doc_id < b.doc_id),
p AS (SELECT doc_id, substr(text, 1, {ED_PREFIX}) AS pref FROM documents),
j AS (SELECT c.doc_a, c.doc_b,
             pa.pref AS pa, pb.pref AS pb,
             length(pa.pref) AS len_a, length(pb.pref) AS len_b
      FROM cand c
      JOIN p pa ON pa.doc_id = c.doc_a
      JOIN p pb ON pb.doc_id = c.doc_b),
d AS (SELECT doc_a, doc_b, len_a, len_b,
             CASE WHEN levenshtein(pa, pb) > {ED_MAX_DIST} THEN -1
                  ELSE levenshtein(pa, pb) END AS dist
      FROM j),
sc AS (SELECT doc_a, doc_b, len_a, len_b, dist,
              round(1.0 - CAST(dist AS DOUBLE)
                    / CAST(greatest(len_a, len_b, 1) AS DOUBLE), 4) AS sim
       FROM d)
SELECT doc_a, doc_b,
       CAST(len_a AS BIGINT) AS len_a,
       CAST(len_b AS BIGINT) AS len_b,
       CAST(dist AS BIGINT) AS dist,
       CASE WHEN dist >= 0 THEN sim ELSE -1.0 END AS edit_sim,
       CAST(CASE WHEN dist >= 0 AND sim >= {ED_SIM!r} THEN 1 ELSE 0 END AS BIGINT)
         AS confirmed
FROM sc
"""


R7B_QUERIES = {
    "stratified_split": q_stratified_split,
    "temperature_mix": q_temperature_mix,
    "neardup_editdist": q_neardup_editdist,
}
R7B_ORACLES = {
    "stratified_split": _sql_stratified_split(),
    "temperature_mix": _sql_temperature_mix(),
    "neardup_editdist": _sql_neardup_editdist(),
}


# --------------------------------------------- incremental LSH
INC_SEED = 7
INC_FRAC = 0.8  # md5-uniform "prior snapshot" fraction


def q_lsh_incremental(spark, sf_dir):
    """Delta near-dup candidates for an incremental ingest: the corpus
    splits deterministically into a 'prior snapshot' (80%, whose band
    table is the only thing read back) and 'new' docs; only pairs
    involving >= 1 new doc are emitted (operators/dedup.py
    incremental_lsh_candidates).  both_new flags pairs internal to the
    ingest batch — derived row-locally from the same md5 formula, so
    the oracle replays it."""
    from prod2vec_spark.functions.hashing import hash_unit

    docs = read_table(spark, sf_dir, "documents")
    u = hash_unit(F.concat_ws("|", F.lit(str(INC_SEED)), F.col("doc_id")))
    old = docs.where(u < INC_FRAC)
    new = docs.where(~(u < INC_FRAC))
    pairs = DD.incremental_lsh_candidates(
        DD.minhash_bands(old), new, max_group=LSH_MAX_GROUP
    )
    ua = hash_unit(F.concat_ws("|", F.lit(str(INC_SEED)), F.col("doc_a")))
    ub = hash_unit(F.concat_ws("|", F.lit(str(INC_SEED)), F.col("doc_b")))
    return pairs.select(
        "doc_a",
        "doc_b",
        ((ua >= INC_FRAC) & (ub >= INC_FRAC)).cast("long").alias("both_new"),
    )


def _sql_lsh_incremental() -> str:
    unit = (
        "('0x' || substr(md5('" + str(INC_SEED) + "|' || CAST({id} AS VARCHAR)), 1, 8))::BIGINT"
        " / 4294967296.0"
    )
    return f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH},
flag AS (SELECT doc_id,
                CASE WHEN {unit.format(id='doc_id')} < {INC_FRAC!r} THEN 0 ELSE 1 END
                  AS is_new
         FROM documents),
b AS (SELECT bands.doc_id, band_id, band_sig, is_new
      FROM bands JOIN flag ON bands.doc_id = flag.doc_id),
eligible AS (
  SELECT band_id, band_sig FROM b
  GROUP BY 1, 2
  HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP} AND max(is_new) = 1),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         a.is_new AS na, b2.is_new AS nb
  FROM b a
  JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
  JOIN b b2 ON a.band_id = b2.band_id AND a.band_sig = b2.band_sig
          AND a.doc_id < b2.doc_id
  WHERE a.is_new = 1 OR b2.is_new = 1)
SELECT doc_a, doc_b,
       CAST(CASE WHEN na = 1 AND nb = 1 THEN 1 ELSE 0 END AS BIGINT) AS both_new
FROM pairs
"""


R7B_QUERIES["lsh_incremental"] = q_lsh_incremental
R7B_ORACLES["lsh_incremental"] = _sql_lsh_incremental()


# ------------------------------------- per-source quality gate
PSQ_PCT = 0.25


def q_quality_by_source(spark, sf_dir):
    """Per-source percentile quality gate (the fairness variant of
    quality_filter: every source trimmed by the same fraction, no
    source wiped out by a corpus-global threshold).  Thresholds are a
    bounded per-source aggregate broadcast back; the report is one
    grouped pass: pre/kept counts, keep fraction, the threshold."""
    from prod2vec_spark.operators import text as TX

    docs = read_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", TX.quality_score(F.col("text")).alias("q")
    )
    thr = scored.groupBy("source").agg(
        F.percentile("q", F.lit(PSQ_PCT)).alias("q_thr")
    )
    return (
        scored.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pre"),
            F.sum((F.col("q") >= F.col("q_thr")).cast("long")).alias("n_kept"),
            F.round(
                F.sum((F.col("q") >= F.col("q_thr")).cast("long"))
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("keep_frac"),
            F.round(F.first("q_thr"), 4).alias("q_thr"),
        )
    )


def _sql_quality_by_source() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source,
    round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
           + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
           + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS q
  FROM (SELECT doc_id, source, text, {_TOKS} AS toks FROM documents)),
thr AS (SELECT source, quantile_cont(q, {PSQ_PCT}) AS q_thr FROM t GROUP BY 1)
SELECT t.source,
       CAST(count(*) AS BIGINT) AS n_pre,
       CAST(sum(CASE WHEN q >= q_thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(sum(CASE WHEN q >= q_thr THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS keep_frac,
       round(any_value(q_thr), 4) AS q_thr
FROM t JOIN thr ON t.source = thr.source
GROUP BY 1
"""


R7B_QUERIES["quality_by_source"] = q_quality_by_source
R7B_ORACLES["quality_by_source"] = _sql_quality_by_source()


# ------------------------------------- materialized mix audit
MAT_SEED = 42


def q_mix_materialized(spark, sf_dir):
    """The recipe APPLIED: per-source realized doc/token mass of the
    deterministic stochastic-rounding resample vs the recipe target.
    Row-local copy assignment (broadcast recipe scalar per source);
    the audit is one grouped pass (operators/mixing.py
    materialize_mix)."""
    from prod2vec_spark.operators import text as TX
    from prod2vec_spark.operators.mixing import materialize_mix, temperature_mix

    docs = read_table(spark, sf_dir, "documents")
    mat = materialize_mix(
        docs, alpha=MIX_ALPHA, budget_tokens=MIX_BUDGET, seed=MAT_SEED
    ).withColumn("_nt", F.size(TX.tokens(F.col("text"))).cast("long"))
    targets = temperature_mix(docs, alpha=MIX_ALPHA, budget_tokens=MIX_BUDGET).select(
        "source", "target_tokens"
    )
    g = mat.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_copies").cast("long").alias("realized_docs"),
        F.sum(F.col("n_copies") * F.col("_nt")).cast("long").alias("realized_tokens"),
    )
    return g.join(F.broadcast(targets), "source").select(
        "source",
        "n_docs",
        "realized_docs",
        "realized_tokens",
        "target_tokens",
        F.round(
            F.col("realized_tokens").cast("double")
            / F.col("target_tokens").cast("double")
            - F.lit(1.0),
            4,
        ).alias("rel_err"),
    )


def _sql_mix_materialized() -> str:
    p = f"pow(CAST(n_tokens AS DOUBLE), {MIX_ALPHA!r})"
    unit = (
        "('0x' || substr(md5('" + str(MAT_SEED) + "|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        " / 4294967296.0"
    )
    return f"""
WITH t AS (SELECT doc_id, source, len({_TOKS}) AS nt FROM documents),
g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens
      FROM t GROUP BY 1),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot_tokens,
               sum({p}) AS tot_pow
        FROM g),
recipe AS (
  SELECT source,
         CAST(floor({float(MIX_BUDGET)!r} * ({p} / tot_pow)) AS BIGINT)
           AS target_tokens,
         round(CAST(floor({float(MIX_BUDGET)!r} * ({p} / tot_pow)) AS DOUBLE)
               / CAST(n_tokens AS DOUBLE), 4) AS scale
  FROM g CROSS JOIN tot),
m AS (
  SELECT t.source, t.nt,
         CAST(floor(scale) AS BIGINT)
           + CASE WHEN {unit} < scale - floor(scale) THEN 1 ELSE 0 END
           AS n_copies,
         target_tokens
  FROM t JOIN recipe ON t.source = recipe.source)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_copies) AS BIGINT) AS realized_docs,
       CAST(sum(n_copies * nt) AS BIGINT) AS realized_tokens,
       any_value(target_tokens) AS target_tokens,
       round(CAST(sum(n_copies * nt) AS DOUBLE)
             / CAST(any_value(target_tokens) AS DOUBLE) - 1.0, 4) AS rel_err
FROM m GROUP BY 1
"""


R7B_QUERIES["mix_materialized"] = q_mix_materialized
R7B_ORACLES["mix_materialized"] = _sql_mix_materialized()


# ------------------------------- quality vs perplexity agreement
QPC_FRAC = 0.5  # md5-uniform audit sample — see scale note below
QPC_SEED = "qc"


def q_quality_ppl_spearman(spark, sf_dir):
    """Cross-plane agreement audit: Spearman rank correlation between
    the heuristic quality score and the bigram-LM mean NLL, per
    language (negative = the cheap heuristic and the LM fluency signal
    agree: higher quality <=> lower NLL).  Rank correlation keeps the
    arithmetic EXACT — integer rank differences; Pearson's co-moment
    sums would drift between engines.  Ties in the rounded scores
    break by doc_id, so the rank assignment is deterministic and
    engine-portable.

    Scale note: the audit runs on a seeded md5-uniform sample —
    correlation estimates converge at thousands of rows, so the
    fraction is tuned DOWN as the corpus grows (a fixed-size audit
    regardless of scale); the per-lang window then sorts a bounded
    sample, never the corpus, and sum(d^2) <= n^3 stays far inside
    int64 for any sane audit size (cap ~1e6 rows/lang)."""
    from prod2vec_spark.functions.hashing import hash_unit
    from prod2vec_spark.operators import text as TX
    from prod2vec_spark.operators.lm import lm_perplexity
    from prod2vec_spark.queries_r7 import LM_ALPHA, LM_TRAIN_FRAC

    docs = read_table(spark, sf_dir, "documents")
    u = hash_unit(F.concat_ws("|", F.lit(QPC_SEED), F.col("doc_id")))
    sample = docs.where(u < QPC_FRAC)
    nll = lm_perplexity(
        sample, train_frac=LM_TRAIN_FRAC, alpha=LM_ALPHA, seed="lm"
    ).select("doc_id", "avg_nll")
    q = sample.select(
        "doc_id", "lang", TX.quality_score(F.col("text")).alias("q")
    )
    j = q.join(nll, "doc_id")
    from prod2vec_spark.functions.stats import spearman_by_group

    return spearman_by_group(
        j, group_col="lang", x_col="q", y_col="avg_nll", id_col="doc_id"
    ).withColumnRenamed("group", "lang")


def _sql_quality_ppl_spearman() -> str:
    from prod2vec_spark.queries_r7 import _sql_lm_perplexity

    # the shared LM oracle reads `documents`; retarget it at the
    # sampled CTE (outer-CTE references are legal in a subquery)
    lm_on_sample = _sql_lm_perplexity().replace("FROM documents", "FROM documents_s")
    return f"""
WITH samp AS (
  SELECT doc_id, lang, text FROM documents
  WHERE ('0x' || substr(md5('{QPC_SEED}|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        / 4294967296.0 < {QPC_FRAC!r}),
documents_s AS (SELECT * FROM samp),
qs AS (
  SELECT doc_id, lang,
    round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
           + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
           + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS q
  FROM (SELECT doc_id, lang, text, {_TOKS} AS toks FROM samp)),
nll AS (SELECT doc_id, avg_nll FROM ({lm_on_sample})),
j AS (SELECT qs.doc_id, qs.lang, qs.q, nll.avg_nll
      FROM qs JOIN nll ON qs.doc_id = nll.doc_id),
r AS (SELECT lang,
        row_number() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rq,
        row_number() OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS rn
      FROM j),
g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum((rq - rn) * (rq - rn)) AS BIGINT) AS sum_d2
      FROM r GROUP BY 1)
SELECT lang, n, sum_d2,
       round(1.0 - 6.0 * CAST(sum_d2 AS DOUBLE)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)), 4)
         AS spearman
FROM g WHERE n >= 2
"""


R7B_QUERIES["quality_ppl_spearman"] = q_quality_ppl_spearman
R7B_ORACLES["quality_ppl_spearman"] = _sql_quality_ppl_spearman()


# --------------------------------------------- RM3 expansion
RM3_M = 10
RM3_LAM = 0.5


def q_rm3_expansion(spark, sf_dir):
    """RM3 pseudo-relevance feedback: top-10 expansion terms per
    query, interpolated from the query's own Dirichlet-QL top-k
    results (operators/bm25.py rm3_terms) — the feedback leg of the
    retrieval triad (BM25 / QL / RM3)."""
    from prod2vec_spark.operators.bm25 import rm3_terms
    from prod2vec_spark.queries_r7 import BM25_K, BM25_QUERIES, QL_MU

    docs = read_table(spark, sf_dir, "documents")
    return rm3_terms(
        docs, BM25_QUERIES, k=BM25_K, m=RM3_M, lam=RM3_LAM, mu=QL_MU
    )


def _sql_rm3_expansion() -> str:
    from prod2vec_spark.queries_r7 import BM25_QUERIES, _sql_ql_topk

    orig_values = ", ".join(
        f"('{qid}', '{t}', {1.0 / len(set(terms))!r})"
        for qid, terms in BM25_QUERIES
        for t in sorted(set(terms))
    )
    ql = _sql_ql_topk()
    return f"""
WITH topk AS (SELECT query_id, doc_id, score FROM ({ql})),
smax AS (SELECT query_id, max(score) AS smax FROM topk GROUP BY 1),
wts AS (SELECT t.query_id, t.doc_id, exp(t.score - s.smax) AS wexp
        FROM topk t JOIN smax s ON t.query_id = s.query_id),
wz AS (SELECT query_id, sum(wexp) AS wz FROM wts GROUP BY 1),
wd AS (SELECT w.query_id, w.doc_id, w.wexp / z.wz AS wd
       FROM wts w JOIN wz z ON w.query_id = z.query_id),
cids AS (SELECT DISTINCT doc_id FROM topk),
ct AS (SELECT d.doc_id, regexp_split_to_array(trim(d.text), '\\s+') AS toks
       FROM documents d JOIN cids ON d.doc_id = cids.doc_id),
cdl AS (SELECT doc_id, len(toks) AS dl FROM ct WHERE len(toks) > 0),
ctf AS (SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS term FROM ct) GROUP BY 1, 2),
pwd AS (SELECT ctf.doc_id, term, CAST(tf AS DOUBLE) / cdl.dl AS p_wd
        FROM ctf JOIN cdl ON ctf.doc_id = cdl.doc_id),
rm1 AS (SELECT wd.query_id, pwd.term, sum(wd.wd * pwd.p_wd) AS p_rm1
        FROM wd JOIN pwd ON wd.doc_id = pwd.doc_id GROUP BY 1, 2),
orig(query_id, term, p_q) AS (VALUES {orig_values}),
rm3 AS (
  SELECT COALESCE(rm1.query_id, orig.query_id) AS query_id,
         COALESCE(rm1.term, orig.term) AS term,
         round({1.0 - RM3_LAM!r} * COALESCE(orig.p_q, 0.0)
               + {RM3_LAM!r} * COALESCE(rm1.p_rm1, 0.0), 4) AS weight
  FROM rm1 FULL OUTER JOIN orig
    ON rm1.query_id = orig.query_id AND rm1.term = orig.term),
r AS (SELECT query_id, term, weight,
        CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY weight DESC, term) AS INT) AS rank
      FROM rm3)
SELECT query_id, rank, term, weight FROM r WHERE rank <= {RM3_M}
"""


R7B_QUERIES["rm3_expansion"] = q_rm3_expansion
R7B_ORACLES["rm3_expansion"] = _sql_rm3_expansion()


# --------------------------------------------- epoch shuffle audit
EPOCH = 3
N_SHARDS = 8


def q_epoch_shuffle_audit(spark, sf_dir):
    """Per-shard audit of the deterministic epoch shuffle: shard
    sizes + the order-sensitive checksum of each shard's permutation
    (operators/shards.py).  The rank window partitions by shard —
    exactly the per-shard sort the shard writer executes physically."""
    from prod2vec_spark.operators.shards import (
        epoch_assignments,
        epoch_order_checksum,
    )

    docs = read_table(spark, sf_dir, "documents", spread=False).select("doc_id")
    return epoch_order_checksum(epoch_assignments(docs, EPOCH, N_SHARDS))


def _sql_epoch_shuffle_audit() -> str:
    h = (
        f"('0x' || substr(md5('epoch{EPOCH}|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
    )
    return f"""
WITH a AS (
  SELECT doc_id, CAST({h} % {N_SHARDS} AS INT) AS shard, {h} AS pos
  FROM documents),
r AS (SELECT shard, doc_id,
        row_number() OVER (PARTITION BY shard ORDER BY pos, doc_id) AS rk
      FROM a)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(rk AS HUGEINT) * (doc_id % 1000003)) % 2147483647 AS BIGINT)
         AS order_ck
FROM r GROUP BY 1
"""


R7B_QUERIES["epoch_shuffle_audit"] = q_epoch_shuffle_audit
R7B_ORACLES["epoch_shuffle_audit"] = _sql_epoch_shuffle_audit()


# --------------------------------------------- Luhn CC audit
# planted candidates (negative ids — disjoint from the corpus): the
# fixture corpus contains no card-shaped digit runs, so the audit
# unions a deterministic planted set into BOTH engines — the Luhn
# fold is exercised by the oracle, not just by pytest.
CC_PLANTED: list[tuple[int, str]] = [
    (-1, "pay 4111 1111 1111 1111 now"),       # valid (Visa test)
    (-2, "order 4111111111111112 today"),      # fails the checksum
    (-3, "cards 5500-0000-0000-0004 and 4111 1111 1111 1111"),  # 2 valid
    (-4, "timestamp 12345678901234567890123"),  # 19-digit prefix, invalid
    (-5, "short 4111 1111 1111"),              # 12 digits: no candidate
]


def q_pii_cc_audit(spark, sf_dir):
    """Checksum-verified credit-card audit over corpus ∪ planted rows:
    per doc with >= 1 candidate, the candidate count and how many pass
    Luhn (operators/pii.py cc_report — candidate regex + a bounded
    pure-Column fold per candidate, row-local)."""
    from prod2vec_spark.operators.pii import cc_report

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = spark.createDataFrame(CC_PLANTED, "doc_id long, text string")
    r = cc_report(F.col("text"))
    return (
        docs.unionByName(planted)
        .select(
            "doc_id",
            r["n_cc_candidates"].cast("long").alias("n_cc_candidates"),
            r["n_cc_valid"].cast("long").alias("n_cc_valid"),
        )
        .where(F.col("n_cc_candidates") > 0)
    )


def _sql_pii_cc_audit() -> str:
    from prod2vec_spark.operators.pii import CC_PATTERN

    planted_values = ", ".join(
        f"({i}, '{t}')" for i, t in CC_PLANTED
    )
    digit = "CAST(substr(ds, len(ds) - i + 1, 1) AS INT)"
    term = (
        f"CASE WHEN (i - 1) % 2 = 0 THEN {digit} "
        f"ELSE CASE WHEN {digit} * 2 > 9 THEN {digit} * 2 - 9 "
        f"ELSE {digit} * 2 END END"
    )
    return f"""
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES {planted_values}) AS p(doc_id, text)),
c AS (SELECT doc_id, unnest(regexp_extract_all(text, '{CC_PATTERN}')) AS cand
      FROM u),
d AS (SELECT doc_id, regexp_replace(cand, '[ -]', '', 'g') AS ds FROM c),
v AS (SELECT doc_id, len(ds) AS n,
        list_reduce(list_prepend(0,
          list_transform(generate_series(1, len(ds)), i -> {term})),
          (a, b) -> a + b) AS total
      FROM d),
g AS (SELECT doc_id,
        CAST(count(*) AS BIGINT) AS n_cc_candidates,
        CAST(sum(CASE WHEN n BETWEEN 13 AND 19 AND total % 10 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_cc_valid
      FROM v GROUP BY 1)
SELECT doc_id, n_cc_candidates, n_cc_valid FROM g
"""


R7B_QUERIES["pii_cc_audit"] = q_pii_cc_audit
R7B_ORACLES["pii_cc_audit"] = _sql_pii_cc_audit()


# --------------------------------------------- compression profile
COMP_LOW = 0.35  # below this, text is suspiciously repetitive


def q_compression_profile(spark, sf_dir):
    """Per-document zlib compression ratio + low-entropy flag — the
    codec-backed quality signal (functions/compress.py).  FULLY
    ORACLED since round 15 via the golden-column protocol (the
    media_format_audit precedent, adapted for input-derived values:
    tools/gen_compress_golden_fixture.py persists (md5(text) →
    raw/compressed byte lengths) for every testdata sf; Spark keeps
    running zlib LIVE through the Arrow-batched UDF, the DuckDB twin
    joins the goldens and replays the ratio arithmetic + threshold —
    codec drift fails the hash compare, and the honesty pytest re-runs
    zlib over the actual testdata texts against the fixture)."""
    from prod2vec_spark.functions.compress import compression_ratio

    docs = read_table(spark, sf_dir, "documents")
    r = F.round(compression_ratio(F.col("text")), 4)
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        r.alias("comp_ratio"),
        (r < F.lit(COMP_LOW)).cast("long").alias("low_entropy"),
    )


def _compress_golden_fixture() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "compress_goldens.parquet",
    )


def _sql_compression_profile() -> str:
    path = _compress_golden_fixture()
    return f"""
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       round(CASE WHEN g.raw_len = 0 THEN 1.0
                  ELSE g.comp_len / CAST(g.raw_len AS DOUBLE) END, 4)
         AS comp_ratio,
       CAST(round(CASE WHEN g.raw_len = 0 THEN 1.0
                       ELSE g.comp_len / CAST(g.raw_len AS DOUBLE) END, 4)
            < {COMP_LOW} AS BIGINT) AS low_entropy
FROM documents d
LEFT JOIN read_parquet('{path}') g ON g.text_md5 = md5(d.text)
"""


R7B_QUERIES["compression_profile"] = q_compression_profile
R7B_ORACLES["compression_profile"] = _sql_compression_profile()


# --------------------------------------------- script-mix profile
def q_script_profile(spark, sf_dir):
    """Per-document script mix: per-script character counts (literal
    Unicode-range classes — the identical pattern string compiles
    under Java regex and RE2), dominant script with a fixed precedence
    tiebreak, and a mixed-script flag (>= 2 scripts above 10% of
    scripted chars — the encoding-garbage / homoglyph signal).
    Row-local single scan (operators/text.py script_counts)."""
    from prod2vec_spark.operators.text import SCRIPT_RANGES, script_counts

    docs = read_table(spark, sf_dir, "documents")
    cs = script_counts(F.col("text"))
    names = list(SCRIPT_RANGES)
    total = None
    for n in names:
        total = cs[n] if total is None else total + cs[n]
    staged = docs.select(
        "doc_id",
        total.cast("long").alias("n_scripted"),
        *[cs[n].cast("long").alias(f"n_{n}") for n in names],
    )
    # precedence-aware argmax: walk in declaration order, keep the
    # FIRST script whose count equals the row max (ties break by the
    # SCRIPT_RANGES declaration order — the oracle CASE walks the
    # same order)
    row_max = F.greatest(*[F.col(f"n_{n}") for n in names])
    dom_expr = F.lit("none")
    for n in reversed(names):
        dom_expr = F.when(
            (F.col(f"n_{n}") == row_max) & (row_max > 0), F.lit(n)
        ).otherwise(dom_expr)
    n_major = None
    for n in names:
        maj = (
            (F.col(f"n_{n}").cast("double")
             / F.greatest(F.col("n_scripted"), F.lit(1)).cast("double"))
            > 0.10
        ).cast("int")
        n_major = maj if n_major is None else n_major + maj
    return staged.select(
        "doc_id",
        "n_scripted",
        *[f"n_{n}" for n in names],
        dom_expr.alias("dominant"),
        (n_major >= 2).cast("long").alias("mixed_script"),
    )


def _sql_script_profile() -> str:
    from prod2vec_spark.operators.text import SCRIPT_RANGES

    names = list(SCRIPT_RANGES)
    cnt = {
        n: f"len(regexp_extract_all(text, '[{r}]'))" for n, r in SCRIPT_RANGES.items()
    }
    total = " + ".join(cnt.values())
    # precedence-aware argmax: CASE walks declaration order
    row_max = f"greatest({', '.join('n_' + n for n in names)})"
    dom = "CASE " + " ".join(
        f"WHEN n_{n} = {row_max} AND {row_max} > 0 THEN '{n}'" for n in names
    ) + " ELSE 'none' END"
    majors = " + ".join(
        f"CASE WHEN CAST(n_{n} AS DOUBLE) / greatest(n_scripted, 1) > 0.10 "
        f"THEN 1 ELSE 0 END"
        for n in names
    )
    cols = ", ".join(f"CAST({cnt[n]} AS BIGINT) AS n_{n}" for n in names)
    return f"""
WITH s AS (
  SELECT doc_id, CAST({total} AS BIGINT) AS n_scripted, {cols}
  FROM documents)
SELECT doc_id, n_scripted, {', '.join('n_' + n for n in names)},
       {dom} AS dominant,
       CAST(CASE WHEN ({majors}) >= 2 THEN 1 ELSE 0 END AS BIGINT)
         AS mixed_script
FROM s
"""


R7B_QUERIES["script_profile"] = q_script_profile
R7B_ORACLES["script_profile"] = _sql_script_profile()

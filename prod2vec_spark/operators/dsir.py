"""DSIR-style data selection via hashed-n-gram importance resampling
(ENGINE scope — the reference has no data-selection surface; this is
the published importance-resampling recipe for LLM pretraining-corpus
selection: Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023).

Recipe, re-expressed Spark-first:

1. **Features** — each document is a bag of hashed n-grams: unigrams
   and word bigrams hashed into ``n_buckets`` buckets (row-local
   Column expressions: split / sequence / transform / md5 — zero
   shuffles, zero UDFs).
2. **Fit** — bucket-count multinomials for a *target* corpus (what we
   want more of) and the *raw* corpus, Laplace-smoothed.  One
   explode + groupBy per corpus, ≤ ``n_buckets`` distinct keys, so
   map-side partial aggregation collapses the shuffle to at most
   ``n_buckets`` rows per task — O(buckets), not O(corpus), crosses
   the wire at any scale.
3. **Score** — per-doc importance log-weight
   ``log w(d) = Σ_f n_f(d) · (log p_target[f] − log p_raw[f])``
   via explode → broadcast join against the tiny (≤ n_buckets rows)
   log-ratio table → one groupBy(doc) sum: exactly one shuffle keyed
   by doc id.
4. **Resample** — Gumbel-top-k over the log-weights with the engine's
   deterministic md5-derived uniforms (functions/hashing.hash_unit),
   so the "random" sample is reproducible across runs, partitionings,
   and engines — the DuckDB oracle replays the identical draw.

100 TB shape: the only per-corpus-row shuffle is the groupBy(doc_id)
score sum (unavoidable: the score is a per-doc aggregate); everything
else is row-local or bounded by n_buckets.  The ratio table is
broadcast (8192 buckets ≈ 128 KB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import hash_unit, hex_prefix_long

DEFAULT_BUCKETS = 8192
_SALT = "dsir|"  # feature-hash salt (keeps buckets disjoint from other md5 uses)


def _bucket(expr: Column, n_buckets: int) -> Column:
    """Feature-hash an n-gram string to [0, n_buckets).  60-bit md5
    prefix mod B — identical formula in the DuckDB oracle:
    ``('0x' || substr(md5('dsir|' || g), 1, 15))::BIGINT % B``."""
    return hex_prefix_long(F.concat(F.lit(_SALT), expr)) % F.lit(n_buckets)


def ngram_buckets(toks: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """array<long> of hashed unigram + word-bigram buckets (with
    multiplicity — DSIR counts occurrences, not distinct grams).

    ``toks`` MUST be a materialized array column (HOF lambdas have no
    CSE — an inline split() would re-tokenize per element)."""
    n = F.size(toks)
    uni = F.transform(toks, lambda t: _bucket(t, n_buckets))
    bi = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(1), F.lit(0))),
        lambda i: _bucket(
            F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
            n_buckets,
        ),
    )
    return F.concat(uni, bi)


def fit_bucket_counts(
    docs: DataFrame, text_col: str = "text", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Hashed-n-gram bucket counts for a corpus: (bucket, cnt), only
    buckets that occur.  ≤ n_buckets output rows regardless of corpus
    size; partial aggregation does the heavy lifting map-side.

    The token array is materialized as a concrete column BEFORE the
    n-gram HOFs — interpreted HOF lambdas have no CSE, so an inline
    split() would re-tokenize the full text once per element_at
    (measured 13.6s → 2.8s for dsir_select at sf0.1)."""
    from prod2vec_spark.functions.arrays import bind

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # the bucket array rides the bind barrier: the explode's inferred
    # size>0 filter otherwise re-inlines the tokenize+n-gram chain
    # into a scan-level Filter (functions/arrays.bind)
    return (
        bind(
            docs.select(toks.alias("_toks")),
            "_ba",
            ngram_buckets(F.col("_toks"), n_buckets),
        )
        .select(F.explode(F.col("_ba")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def fit_bucket_counts_pair(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Target AND raw bucket counts in ONE corpus pass, for the common
    case where the target is a predicate over the raw corpus (DSIR's
    deployment shape: raw = crawl, target = its high-quality slice).
    Returns (target_counts, raw_counts) sharing a single exploded
    aggregation: the conditional sum replaces a second full scan."""
    from prod2vec_spark.functions.arrays import bind

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # bind barrier on the bucket array (see fit_bucket_counts)
    both = (
        bind(
            docs.select(target_cond.alias("_is_t"), toks.alias("_toks")),
            "_ba",
            ngram_buckets(F.col("_toks"), n_buckets),
        )
        .select("_is_t", F.explode(F.col("_ba")).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).cast("long").alias("t_cnt"),
            F.count(F.lit(1)).cast("long").alias("r_cnt"),
        )
    )
    target = both.where(F.col("t_cnt") > 0).select(
        "bucket", F.col("t_cnt").alias("cnt")
    )
    raw = both.select("bucket", F.col("r_cnt").alias("cnt"))
    return target, raw


def bucket_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Laplace-smoothed per-bucket importance log-ratio
    ``ln((t+1)/(T+B)) − ln((r+1)/(R+B))`` as (bucket, logratio),
    plus — under the reserved bucket id −1 — the *default* ratio for
    buckets unseen in BOTH corpora (t = r = 0), so scoring needs no
    driver-side collect: one left join + coalesce on the −1 row's
    value.  Full outer join of two ≤ n_buckets tables: tiny."""
    t_tot = target_counts.agg(F.sum("cnt").cast("long").alias("t_total"))
    r_tot = raw_counts.agg(F.sum("cnt").cast("long").alias("r_total"))
    joined = (
        target_counts.withColumnRenamed("cnt", "t_cnt")
        .join(raw_counts.withColumnRenamed("cnt", "r_cnt"), "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("t_cnt"), F.lit(0)).alias("t_cnt"),
            F.coalesce(F.col("r_cnt"), F.lit(0)).alias("r_cnt"),
        )
    )
    # the unseen-everywhere default: t_cnt = r_cnt = 0
    default_row = t_tot.crossJoin(r_tot).select(
        F.lit(-1).cast("long").alias("bucket"),
        F.lit(0).cast("long").alias("t_cnt"),
        F.lit(0).cast("long").alias("r_cnt"),
    )
    b = F.lit(float(n_buckets))
    return (
        joined.unionByName(default_row)
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + F.lit(1.0)) / (F.col("t_total") + b))
                - F.log((F.col("r_cnt") + F.lit(1.0)) / (F.col("r_total") + b))
            ).alias("logratio"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document importance log-weight: (id_col, score).

    explode(doc n-grams) → broadcast left join the ratio table →
    groupBy(id) sum, with misses falling back to the reserved −1
    default row's value.  ONE shuffle (the per-doc sum)."""
    default = ratio.where(F.col("bucket") == -1).select(
        F.col("logratio").alias("_default_lr")
    )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # materialize the token array before the HOFs (no CSE in
    # interpreted lambdas — see fit_bucket_counts)
    from prod2vec_spark.functions.arrays import bind

    exploded = bind(
        docs.select(F.col(id_col), toks.alias("_toks")),
        "_ba",
        ngram_buckets(F.col("_toks"), n_buckets),
    ).select(id_col, F.explode(F.col("_ba")).alias("bucket"))
    return (
        exploded.join(F.broadcast(ratio.where(F.col("bucket") >= 0)), "bucket", "left")
        .crossJoin(F.broadcast(default))
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("logratio"), F.col("_default_lr"))).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_grams"),
        )
    )


def gumbel_key(score: Column, id_col: Column, seed: int) -> Column:
    """Gumbel-top-k perturbation: ``score + (−ln(−ln u))`` with the
    deterministic md5 uniform u (clamped away from 0 so −ln(−ln u) is
    finite in both engines)."""
    u = F.greatest(
        hash_unit(F.concat(F.lit(f"dsirg{seed}|"), id_col.cast("string"))),
        F.lit(1e-12),
    )
    return score - F.log(-F.log(u))


def dsir_resample(
    scored: DataFrame, k: int, seed: int = 7, id_col: str = "doc_id"
) -> DataFrame:
    """Gumbel-top-k sample-without-replacement ∝ exp(score): the top k
    rows by perturbed key.  TakeOrderedAndProject shape — no global
    sort materialization, each partition keeps its local top-k."""
    key = gumbel_key(F.col("score"), F.col(id_col), seed)
    return (
        scored.withColumn("gkey", key)
        .orderBy(F.col("gkey").desc(), F.col(id_col))
        .limit(k)
    )

"""Behavioral tests for the round-7 wave-C family: DSIR hashed-n-gram
importance resampling (operators/dsir.py).  Oracle parity is covered
by test_oracle_parity.py; these assert the SEMANTICS — the resample
actually shifts mass toward the target distribution, the draw is
deterministic, and the unseen-bucket default path (disjoint corpora)
is finite and consistent."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prod2vec_spark.operators import dsir as DS
from prod2vec_spark.sources.io import read_table
from tests.conftest import SF_SMOKE

B = 4096


def _scored(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    tgt = DS.fit_bucket_counts(docs.where(F.col("lang") == "en"), n_buckets=B)
    raw = DS.fit_bucket_counts(docs, n_buckets=B)
    ratio = DS.bucket_logratio(tgt, raw, n_buckets=B)
    return docs, DS.dsir_scores(docs, ratio, n_buckets=B)


def test_dsir_resample_enriches_target_language(spark):
    """The point of DSIR: sampling ∝ exp(importance weight) must raise
    the target language's share above its base rate."""
    docs, sc = _scored(spark)
    n = docs.count()
    base = docs.where(F.col("lang") == "en").count() / n
    k = max(10, n // 5)
    sel = DS.dsir_resample(sc, k=k, seed=7)
    got = (
        sel.join(docs.select("doc_id", "lang"), "doc_id")
        .where(F.col("lang") == "en")
        .count()
        / k
    )
    assert got > base, f"selected en share {got} not above base rate {base}"


def test_dsir_scores_rank_en_above_non_en_on_average(spark):
    docs, sc = _scored(spark)
    rows = sc.join(docs.select("doc_id", "lang"), "doc_id").select(
        "lang", (F.col("score") / F.col("n_grams")).alias("s")
    )
    means = {
        r["lang"]: r["m"]
        for r in rows.groupBy("lang").agg(F.avg("s").alias("m")).collect()
    }
    assert means["en"] == max(means.values())


def test_dsir_resample_is_deterministic_and_exactly_k(spark):
    _, sc = _scored(spark)
    a = sorted(r["doc_id"] for r in DS.dsir_resample(sc, k=25, seed=7).collect())
    b = sorted(r["doc_id"] for r in DS.dsir_resample(sc, k=25, seed=7).collect())
    c = sorted(r["doc_id"] for r in DS.dsir_resample(sc, k=25, seed=8).collect())
    assert a == b and len(a) == 25
    assert a != c, "different seed should draw a different sample"


def test_dsir_unseen_bucket_default_is_finite_and_used(spark):
    """Disjoint corpora: score docs whose buckets appear in NEITHER
    fitted table — every gram takes the reserved −1 default ratio,
    which must be finite and equal to ln((R+B)/(T+B))·n_grams."""
    tgt = spark.createDataFrame([("alpha beta gamma",)], ["text"])
    raw = spark.createDataFrame([("delta epsilon",)], ["text"])
    probe = spark.createDataFrame([(1, "zeta eta theta")], ["doc_id", "text"])
    tc = DS.fit_bucket_counts(tgt, n_buckets=B)
    rc = DS.fit_bucket_counts(raw, n_buckets=B)
    ratio = DS.bucket_logratio(tc, rc, n_buckets=B)
    out = DS.dsir_scores(probe, ratio, n_buckets=B).collect()
    assert len(out) == 1
    r = out[0]
    t_total = 5  # 3 unigrams + 2 bigrams
    r_total = 3  # 2 unigrams + 1 bigram
    expect = r["n_grams"] * (math.log(1.0 / (t_total + B)) - math.log(1.0 / (r_total + B)))
    assert math.isfinite(r["score"])
    assert abs(r["score"] - expect) < 1e-9


def test_dsir_ngram_count_formula(spark):
    """n_grams = 2·|toks| − 1 (unigrams + bigrams) for a doc with ≥1
    token — the feature stream carries multiplicity, not distinct."""
    probe = spark.createDataFrame([(1, "a b b a")], ["doc_id", "text"])
    tc = DS.fit_bucket_counts(probe, n_buckets=B)
    ratio = DS.bucket_logratio(tc, tc, n_buckets=B)
    out = DS.dsir_scores(probe, ratio, n_buckets=B).collect()[0]
    assert out["n_grams"] == 7
    # identical target/raw corpora: every seen bucket's ratio is 0
    assert abs(out["score"]) < 1e-12

"""Corpus-drift audit (operators/drift.py): JS bounds, identity,
directionality of the per-token log-ratio, and smoothing finiteness."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from prod2vec_spark.operators.drift import (
    distribution_drift,
    token_counts,
    token_drift,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_identical_corpora_score_zero(spark):
    docs = _docs(spark, ["alpha beta gamma", "beta gamma delta", "alpha"])
    row = distribution_drift(docs, docs).collect()[0]
    assert row["js_divergence"] == 0.0
    assert row["n_tokens_old"] == row["n_tokens_new"] == 7
    assert row["vocab_old"] == row["vocab_new"] == row["vocab_shared"] == 4


def test_disjoint_corpora_approach_ln2(spark):
    a = _docs(spark, ["aa bb cc dd ee ff gg hh"] * 8)
    b = _docs(spark, ["qq rr ss tt uu vv ww xx"] * 8)
    row = distribution_drift(a, b).collect()[0]
    assert row["vocab_shared"] == 0
    # add-one smoothing over the 16-token union keeps this fixture at
    # ~0.368 (hand-computed) — below ln 2 strictly, far above any
    # same-language drift
    assert 0.3 < row["js_divergence"] < math.log(2)


def test_token_drift_directionality_and_smoothing(spark):
    old = _docs(spark, ["cat cat cat dog"])
    new = _docs(spark, ["dog dog dog bird"])
    rows = {r["token"]: r for r in token_drift(old, new, top_k=10).collect()}
    assert set(rows) == {"cat", "dog", "bird"}
    assert rows["cat"]["log10_ratio"] < 0   # declined
    assert rows["dog"]["log10_ratio"] > 0   # grew
    assert rows["bird"]["n_old"] == 0       # absent-from-old stays finite
    assert math.isfinite(rows["bird"]["log10_ratio"])
    assert rows["bird"]["log10_ratio"] > 0


def test_token_drift_topk_is_deterministic(spark):
    docs = _docs(spark, ["t%d" % (i % 7) for i in range(50)])
    a = [r["token"] for r in token_drift(docs, docs, top_k=3).collect()]
    b = [r["token"] for r in token_drift(docs, docs, top_k=3).collect()]
    assert sorted(a) == sorted(b) and len(a) == 3


def test_token_counts_shape(spark):
    docs = _docs(spark, ["x y x", "y"])
    got = {r["token"]: r["n"] for r in token_counts(docs).collect()}
    assert got == {"x": 2, "y": 2}


def test_drift_by_lang_independence(spark):
    """The grouped-computation contract (the lm_by_lang rule): adding
    lang-B docs never moves lang-A's drift numbers, and each
    language's row equals the single-corpus operator run on that
    language alone."""
    from prod2vec_spark.operators.drift import distribution_drift_by_lang

    def mk(rows):
        return spark.createDataFrame(
            [(i, t, lg) for i, (t, lg) in enumerate(rows)],
            "doc_id long, text string, lang string",
        )

    a_old = [("alpha beta beta", "en")] * 3
    a_new = [("alpha alpha beta", "en")] * 3
    b_old = [("uno dos", "es")] * 2
    b_new = [("dos tres tres", "es")] * 2

    solo = {
        r["lang"]: r
        for r in distribution_drift_by_lang(mk(a_old), mk(a_new)).collect()
    }
    both = {
        r["lang"]: r
        for r in distribution_drift_by_lang(
            mk(a_old + b_old), mk(a_new + b_new)
        ).collect()
    }
    assert set(both) == {"en", "es"}
    for col in ["n_tokens_old", "n_tokens_new", "vocab_old", "vocab_new",
                "vocab_shared", "js_divergence"]:
        assert both["en"][col] == solo["en"][col], col
    # per-lang equals the ungrouped operator on that language alone
    from prod2vec_spark.operators.drift import distribution_drift

    es_solo = distribution_drift(
        mk(b_old).drop("lang"), mk(b_new).drop("lang")
    ).collect()[0]
    assert both["es"]["js_divergence"] == es_solo["js_divergence"]
    assert both["es"]["vocab_shared"] == es_solo["vocab_shared"]

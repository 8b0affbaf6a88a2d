"""Interpolated Kneser-Ney bigram scoring (round 12,
operators/lm.kn_perplexity) — hand-computed probabilities, the
unseen-left fallback, the continuation-count property that motivates
KN, and validation errors."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from prod2vec_spark.operators.lm import kn_perplexity

D = 0.75


def test_kn_hand_computed_probabilities(spark):
    """Train 'a b a b': c2={(a,b):2,(b,a):1}; den(a)=2, den(b)=1,
    N1+(a,.)=N1+(b,.)=1, N1+(.,a)=N1+(.,b)=1; n_types=2, V=2 →
    continuation denominator 5, pcont(a)=pcont(b)=0.4, pcont(zz)=0.2.
    Held-out 'b b zz': (b,b) → 0 + 0.75·1/1·0.4 = 0.3; (b,zz) →
    0.75·0.2 = 0.15.  Train doc replays its own discounted mass."""
    tagged = spark.createDataFrame(
        [(1, "a b a b", True), (2, "b b zz", False)],
        "doc_id long, text string, is_train boolean",
    )
    out = {
        r["doc_id"]: r for r in kn_perplexity(tagged, tagged=tagged).collect()
    }
    r2 = out[2]
    assert r2["is_train"] == 0
    assert r2["n_unseen"] == r2["n_pairs"] == 2
    assert r2["avg_nll"] == round(-(math.log(0.3) + math.log(0.15)) / 2, 4)
    # doc 1: (a,b)=1.25/2+0.375·0.4=0.775 twice, (b,a)=0.25+0.75·0.4=0.55
    r1 = out[1]
    assert r1["n_unseen"] == 0
    assert r1["avg_nll"] == round(
        -(2 * math.log(0.775) + math.log(0.55)) / 3, 4
    )


def test_kn_unseen_left_context_falls_to_continuation(spark):
    """A pair whose w1 never appeared as a train left-context scores
    exactly pcont(w2) — and stays strictly positive even when BOTH
    tokens are unseen (the add-one floor: no log(0) anywhere)."""
    tagged = spark.createDataFrame(
        [(1, "a b a b", True), (2, "qq b", False), (3, "qq zz", False)],
        "doc_id long, text string, is_train boolean",
    )
    out = {
        r["doc_id"]: r for r in kn_perplexity(tagged, tagged=tagged).collect()
    }
    # pcont(b) = 0.4, pcont(zz) = 0.2 (hand computation above)
    assert out[2]["avg_nll"] == round(-math.log(0.4), 4)
    assert out[3]["avg_nll"] == round(-math.log(0.2), 4)
    assert all(math.isfinite(r["ppl"]) for r in out.values())


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN insight ('Francisco'): equal raw frequency, different
    context diversity — the token continuing MANY contexts gets the
    higher probability after an unseen left-context, even though a
    frequency-weighted backoff would tie them."""
    train = (
        "san francisco san francisco san francisco a x b x c x"
    )
    tagged = spark.createDataFrame(
        [
            (1, train, True),
            (2, "unk francisco", False),  # francisco: 3 uses, 1 context
            (3, "unk x", False),          # x: 3 uses, 3 contexts
        ],
        "doc_id long, text string, is_train boolean",
    )
    out = {
        r["doc_id"]: r for r in kn_perplexity(tagged, tagged=tagged).collect()
    }
    assert out[3]["avg_nll"] < out[2]["avg_nll"]


def test_kn_validation_errors(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="discount"):
        kn_perplexity(docs, discount=1.5)
    empty = spark.createDataFrame(
        [(1, "solo", False)], "doc_id long, text string, is_train boolean"
    )
    with pytest.raises(ValueError, match="no bigrams"):
        kn_perplexity(empty, tagged=empty)


def test_kn_by_lang_models_are_independent(spark):
    """Per-language KN: the same pair scores differently under two
    languages' different count tables; a language with no training
    bigrams is absent from the report (inner totals join)."""
    from prod2vec_spark.operators.lm import kn_perplexity_by_lang

    tagged = spark.createDataFrame(
        [
            (1, "a b a b", "en", True),
            (2, "a b", "en", False),
            (3, "a b c a b c", "de", True),
            (4, "a b", "de", False),
            (5, "x y", "fr", False),  # fr has no training docs
        ],
        "doc_id long, text string, lang string, is_train boolean",
    )
    # drive the split through the precomputed is_train by monkeypatching
    # would be invasive — instead replicate with train_frac=1.0 on train
    # docs only for the independence half:
    out = {
        (r["doc_id"], r["lang"]): r
        for r in kn_perplexity_by_lang(
            tagged.drop("is_train"), train_frac=0.5, seed="s-kn"
        ).collect()
    }
    langs = {k[1] for k in out}
    # whatever the md5 split chose, fr can only appear if doc 5 landed
    # in train AND produced bigrams to train on (it does: 'x y');
    # en/de appear iff their train side has bigrams — assert at least
    # that every reported doc scored under ITS OWN language's model
    assert out  # non-degenerate
    for (d, lg), r in out.items():
        assert r["ppl"] >= 1.0
        assert lg == {1: "en", 2: "en", 3: "de", 4: "de", 5: "fr"}[d]
    # independence: score the identical text under en and de models
    # trained on different corpora — different probabilities
    tagged2 = spark.createDataFrame(
        [
            (10, "a b a b", "en", True),
            (11, "a b c a b c", "de", True),
            (12, "a b", "en", False),
            (13, "a b", "de", False),
        ],
        "doc_id long, text string, lang string, is_train boolean",
    )
    from prod2vec_spark.operators.lm import kn_perplexity

    en = kn_perplexity(
        tagged2.where(F.col("lang") == "en"),
        tagged=tagged2.where(F.col("lang") == "en"),
    )
    de = kn_perplexity(
        tagged2.where(F.col("lang") == "de"),
        tagged=tagged2.where(F.col("lang") == "de"),
    )
    ppl_en = {r["doc_id"]: r["ppl"] for r in en.collect()}[12]
    ppl_de = {r["doc_id"]: r["ppl"] for r in de.collect()}[13]
    assert ppl_en != ppl_de  # same text, different per-lang model


def test_kn_fit_score_split_matches_self_trained(spark, tmp_path):
    """The production path (fit_kn → KNModel.save → load →
    score_docs_kn) reproduces the self-trained kn_perplexity output
    row-for-row on the same split — and the pruned model degrades a
    pruned pair to the λ·P_cont leg while keeping every score finite
    (totals/continuation stats unchanged, the BigramLM.pruned
    contract)."""
    from prod2vec_spark.operators.lm import (
        KNModel,
        fit_kn,
        kn_perplexity,
        score_docs_kn,
        with_train_split,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b a b c", "b c b a", "a a a b", "c b a", "zz b a c"]
        )],
        "doc_id long, text string",
    )
    tagged = with_train_split(docs, 0.6, seed="kn-split")
    want = sorted(
        map(tuple, kn_perplexity(docs, tagged=tagged).collect())
    )
    model = fit_kn(tagged.where(F.col("is_train")))
    model.save(str(tmp_path / "kn"))
    loaded = KNModel.load(spark, str(tmp_path / "kn"))
    got = sorted(map(tuple, score_docs_kn(tagged, loaded).collect()))
    assert got == want

    # pruning: a floor above every count empties c2 → every pair is
    # 'unseen', scores stay finite via the continuation leg
    hard = loaded.pruned(min_count=10_000)
    rows = score_docs_kn(tagged, hard).collect()
    assert rows and all(r["n_unseen"] == r["n_pairs"] for r in rows)
    assert all(math.isfinite(r["avg_nll"]) for r in rows)
    with pytest.raises(ValueError, match="no bigrams"):
        fit_kn(docs.where(F.lit(False)))


def test_kn_corpus_scoring_finite(spark):
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    rows = kn_perplexity(docs).collect()
    assert rows
    held = [r for r in rows if r["is_train"] == 0]
    assert held, "split should leave held-out docs at sf0.001"
    for r in rows:
        assert r["ppl"] >= 1.0 and math.isfinite(r["avg_nll"])
        assert r["n_unseen"] <= r["n_pairs"]
    # sanity vs the Stupid-Backoff twin: same doc coverage
    from prod2vec_spark.operators.lm import lm_perplexity

    sb = lm_perplexity(docs)
    assert sb.count() == len(rows)

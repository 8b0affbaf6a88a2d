"""Unigram-LM (SentencePiece-style) tokenizer — round-12 stretch
(VERDICT r11 ask #7): the second production tokenizer family next to
BPE, plugged into the SAME count_fn budget seam.  Mirrors
tests/test_bpe_budget.py: Python-reference parity token-for-token,
decode roundtrip, and the doc_chunks budget column."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators.bpe import decode_tokens
from prod2vec_spark.operators.unigram import (
    encode_word_unigram,
    train_unigram,
    train_unigram_from_counts,
    unigram_counter,
    unigram_tokens,
)

_DOCS = [
    (1, "the cat and the hat"),
    (2, "thread the needle and then another thread"),
    (3, "band and hand stand on sand"),
    (4, "the then than that this"),
    (5, "standing handing landing banding"),
]

_WC = [
    ("the", 50), ("and", 30), ("hand", 12), ("stand", 10), ("band", 9),
    ("sand", 8), ("then", 7), ("than", 5), ("that", 5), ("cat", 4),
    ("hat", 4), ("thread", 4), ("needle", 2), ("another", 2), ("on", 2),
    ("this", 2), ("standing", 1), ("handing", 1), ("landing", 1),
    ("banding", 1),
]


def _model():
    return train_unigram_from_counts(_WC, vocab_size=40, em_rounds=3)


def test_trainer_is_deterministic_and_learns_multichar_pieces():
    m1, m2 = _model(), _model()
    assert m1 == m2
    pieces = {p for p, _ in m1}
    assert len(m1) <= 40 + 0  # singles may push past vocab_size only
    # every character of the training corpus is covered (plus END)
    chars = {c for w, _ in _WC for c in w} | {"▁"}
    assert chars <= pieces
    # EM actually promotes frequent multi-char pieces — 'the'/'and'
    # dominate the corpus; at least one of their spans must survive
    assert any(len(p) > 2 for p in pieces)
    # log-probs normalize (sum of exp <= 1 within fp tolerance)
    import math

    assert abs(sum(math.exp(lp) for _, lp in m1) - 1.0) < 1e-9


def test_encode_word_parity_and_decode_roundtrip():
    model = _model()
    for w, _ in _WC:
        toks = encode_word_unigram(w, model)
        assert toks, w
        # decode = concatenate, strip END (bpe.decode_tokens contract)
        assert decode_tokens(toks) == w
        # segmentation concatenates to word+END exactly
        assert "".join(toks) == w + "▁"
    # unknown characters fall back to single-char pieces, never crash
    toks = encode_word_unigram("zzzqqq", model)
    assert decode_tokens(toks) == "zzzqqq"


def test_unigram_tokens_column_matches_python_twin(spark):
    """The Arrow-batched Column path agrees token-for-token with the
    Python reference across whole documents (multi-word, multi-space,
    leading/trailing whitespace)."""
    model = _model()
    docs = spark.createDataFrame(
        [(d, t) for d, t in _DOCS] + [(6, "  the   cat  ")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", unigram_tokens(F.col("text"), model).alias("toks")
        ).collect()
    }
    for d, t in _DOCS + [(6, "  the   cat  ")]:
        expect = []
        for w in t.split():
            expect.extend(encode_word_unigram(w, model))
        assert got[d] == expect, (d, got[d], expect)


def test_doc_chunks_budget_column_matches_unigram_encoder(spark):
    """The count_fn seam: doc_chunks' n_budget_tokens under
    unigram_counter equals the Python encoder's count over exactly
    that chunk's tokens — the test_bpe_budget mirror."""
    from prod2vec_spark.operators.chunking import doc_chunks

    model = _model()
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    out = doc_chunks(
        docs, seq_len=4, stride=3, min_len=2, count_fn=unigram_counter(model)
    ).collect()
    assert out, "no chunks produced"
    texts = dict(_DOCS)
    for r in out:
        toks = texts[r["doc_id"]].split()
        ctoks = toks[r["chunk_idx"] * 3 : r["chunk_idx"] * 3 + 4]
        assert r["n_tokens"] == len(ctoks)
        assert r["n_budget_tokens"] == sum(
            len(encode_word_unigram(w, model)) for w in ctoks
        ), (r["doc_id"], r["chunk_idx"])
    # non-vacuous: the unigram counts differ from whitespace words
    assert any(
        sum(len(encode_word_unigram(w, model)) for w in t.split())
        != len(t.split())
        for _, t in _DOCS
    )


def test_encode_decode_roundtrip_fuzz():
    """300 seeded-random words — mixed scripts, digits, punctuation,
    multi-byte code points, sentinel bytes (stripped defensively) —
    every one roundtrips through Viterbi encode + concatenate-decode
    under a model trained on an unrelated corpus."""
    import hashlib

    from prod2vec_spark.operators.bpe import decode_tokens

    model = _model()
    alphabet = "abcdehnst0189.!-▁中文ß€ "
    for i in range(300):
        d = hashlib.md5(f"w|{i}".encode()).digest()
        n = 1 + d[0] % 12
        w = "".join(alphabet[d[1 + j % 14] % len(alphabet)] for j in range(n))
        w = w.replace("\x01", "").replace("\x02", "")
        toks = encode_word_unigram(w, model)
        assert "".join(toks) == w + "▁", (w, toks)
        assert decode_tokens(toks) == w


def test_train_unigram_corpus_path_matches_counts_path(spark):
    """train_unigram (scan + hash-agg + driver EM) equals
    train_unigram_from_counts on the same word frequencies."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    from collections import Counter

    wc = Counter()
    for _, t in _DOCS:
        wc.update(t.split())
    got = train_unigram(docs, vocab_size=30, em_rounds=2)
    want = train_unigram_from_counts(
        sorted(wc.items(), key=lambda kv: (-kv[1], kv[0])),
        vocab_size=30,
        em_rounds=2,
    )
    assert got == want

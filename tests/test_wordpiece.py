"""WordPiece tokenizer (round 13, operators/wordpiece.py): the
likelihood-scored trainer, BERT greedy longest-match encoding with
##-continuations and the whole-word [UNK] contract, Column/Python
parity, the count_fn seam, and decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from prod2vec_spark.operators.wordpiece import (
    UNK,
    decode_wordpiece,
    encode_word_wordpiece,
    train_wordpiece,
    train_wordpiece_from_counts,
    wordpiece_counter,
    wordpiece_tokens,
)


def test_trainer_is_deterministic_and_learns_pieces():
    wc = [("hugging", 10), ("hugs", 5), ("hug", 12), ("pug", 4)]
    v1 = train_wordpiece_from_counts(wc, n_merges=6)
    v2 = train_wordpiece_from_counts(wc, n_merges=6)
    assert v1 == v2
    assert UNK in v1
    # multichar pieces learned; continuations carry ##
    assert any(len(p) > 1 and not p.startswith("##") for p in v1)
    assert any(p.startswith("##") and len(p) > 3 for p in v1)


def test_likelihood_score_differs_from_raw_count_bpe():
    """The WordPiece property: the FIRST merge maximizes
    count(ab)/(count(a)count(b)), not raw count(ab).  Corpus: 'ab'
    x 20 (frequent pair of very frequent symbols) vs 'xy' x 8 (rarer
    pair of symbols that occur NOWHERE else) → raw-count BPE merges
    (a,##b); WordPiece merges (x,##y) because 8/(8·8) > 20/(20·20)."""
    from prod2vec_spark.operators.bpe import train_bpe_from_counts

    wc = [("ab", 20), ("xy", 8)]
    wp = train_wordpiece_from_counts(wc, n_merges=1)
    assert "xy" in wp and "ab" not in wp
    assert train_bpe_from_counts(wc, n_merges=1)[0] == ("a", "b")


def test_greedy_longest_match_and_unk_contract():
    vocab = {"un", "##aff", "##able", "##ab", "a", "##f", "##l", "##e", UNK}
    # longest-first: 'unaffable' -> un ##aff ##able (not ##ab + ...)
    assert encode_word_wordpiece("unaffable", vocab) == [
        "un", "##aff", "##able",
    ]
    # a stuck position UNKs the WHOLE word, not a partial prefix
    assert encode_word_wordpiece("unz", vocab) == [UNK]
    # greedy prefers the longest match at each step but falls to
    # shorter ones: 'aff' -> a ##f ##f ('##aff' can't start a word)
    assert encode_word_wordpiece("aff", vocab) == ["a", "##f", "##f"]
    # first-piece bare/continuation distinction: 'ff' has no bare 'f'
    # so the whole word UNKs even though '##f' exists
    assert encode_word_wordpiece("ff", vocab) == [UNK]
    assert encode_word_wordpiece("", vocab) == []


def test_column_path_parity_with_python_twin(spark):
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").limit(80)
    vocab = train_wordpiece(docs, n_merges=30, max_vocab_words=500)
    got = {
        r["doc_id"]: r["toks"]
        for r in docs.select(
            "doc_id", wordpiece_tokens(F.col("text"), vocab).alias("toks")
        ).collect()
    }
    vset = set(vocab)
    import re

    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in re.split(r"\s+", (r["text"] or "").strip()):
            want.extend(encode_word_wordpiece(w, vset))
        assert got[r["doc_id"]] == want, r["doc_id"]
    # every non-UNK doc decodes back to its (whitespace-normalized)
    # text; UNK-bearing docs are lossy by design
    for r in docs.select("doc_id", "text").collect():
        toks = got[r["doc_id"]]
        if UNK not in toks and toks:
            norm = " ".join((r["text"] or "").split())
            assert decode_wordpiece(toks) == norm


def test_count_fn_seam_feeds_chunk_budgets(spark):
    from prod2vec_spark.operators.chunking import doc_chunks
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents").limit(40)
    vocab = train_wordpiece(docs, n_merges=20, max_vocab_words=300)
    out = doc_chunks(
        docs, seq_len=24, stride=16, min_len=6,
        count_fn=wordpiece_counter(vocab),
    )
    rows = out.collect()
    assert rows
    assert all(r["n_budget_tokens"] >= r["n_tokens"] > 0 for r in rows)

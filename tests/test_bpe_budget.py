"""BPE-consistent token accounting (round 9): the budget-bearing
operators (pack_sequences / temperature_mix / doc_chunks) accept a
``count_fn`` tokenizer, so budgets mean MODEL tokens — verified
token-for-token against the Python reference encoder
(operators/bpe.encode_word)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from prod2vec_spark.operators.bpe import bpe_counter, encode_word

MERGES = [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("the", "▁")]

_DOCS = [
    (1, "the cat and the hat", "en"),
    (2, "thread the needle and then another thread", "en"),
    (3, "band and hand stand on sand", "en"),
    (4, "der hund und der andere hund", "de"),
    (5, "the the the the the the the the", "de"),
    (6, "th an d", "de"),
]


def _bpe_count(text: str) -> int:
    return sum(len(encode_word(w, MERGES)) for w in text.split())


def _frame(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string, lang string")


def test_pack_sequences_bpe_budget_matches_python_encoder(spark):
    """Pack bins computed under the BPE counter agree bin-for-bin and
    token-for-token with a pure-Python replay using encode_word."""
    from prod2vec_spark.operators.chunking import pack_sequences

    budget = 12
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin"])
        for r in pack_sequences(
            _frame(spark), budget=budget, n_shards=1,
            count_fn=bpe_counter(MERGES),
        ).collect()
    }
    # python replay: md5 pack order within each (lang, shard=0) stream
    expect = {}
    for lang in ("en", "de"):
        stream = [
            (hashlib.md5(f"pack|{d}".encode()).hexdigest(), d, _bpe_count(t))
            for d, t, lg in _DOCS
            if lg == lang
        ]
        cum = 0
        for _, d, n in sorted(stream):
            expect[d] = (n, cum // budget)
            cum += n
    assert got == expect
    # and the counts genuinely differ from whitespace words (the test
    # would be vacuous if the merge table never fired)
    assert any(
        _bpe_count(t) != len(t.split()) for _, t, _ in _DOCS
    )


def test_temperature_mix_bpe_token_sums(spark):
    """The mixer's n_tokens under the BPE counter equals the Python
    encoder's per-source sums (so p_temp/target_tokens are computed
    over model tokens)."""
    from prod2vec_spark.operators.mixing import temperature_mix

    mix = {
        r["source"]: r["n_tokens"]
        for r in temperature_mix(
            _frame(spark).withColumnRenamed("lang", "source"),
            alpha=0.5,
            count_fn=bpe_counter(MERGES),
        ).collect()
    }
    expect = {}
    for _, t, lg in _DOCS:
        expect[lg] = expect.get(lg, 0) + _bpe_count(t)
    assert mix == expect


def test_doc_chunks_budget_column_matches_encoder(spark):
    """Each chunk's n_budget_tokens equals the Python encoder's count
    over exactly that chunk's tokens; whitespace slicing columns are
    unchanged."""
    from prod2vec_spark.operators.chunking import doc_chunks

    out = doc_chunks(
        _frame(spark), seq_len=4, stride=3, min_len=2,
        count_fn=bpe_counter(MERGES),
    ).collect()
    assert out, "no chunks produced"
    texts = {d: t for d, t, _ in _DOCS}
    for r in out:
        toks = texts[r["doc_id"]].split()
        start = r["chunk_idx"] * 3
        ctoks = toks[start : start + 4]
        assert r["n_tokens"] == len(ctoks)
        assert r["n_budget_tokens"] == sum(
            len(encode_word(w, MERGES)) for w in ctoks
        ), (r["doc_id"], r["chunk_idx"])


def test_doc_chunks_without_count_fn_schema_unchanged(spark):
    """Backward compatibility: no count_fn -> no n_budget_tokens
    column (the oracled doc_chunks catalog entry keeps its schema)."""
    from prod2vec_spark.operators.chunking import doc_chunks

    cols = doc_chunks(_frame(spark)).columns
    assert cols == ["doc_id", "chunk_idx", "n_tokens", "chunk_fp"]


def test_materialize_mix_bpe_scale_matches_python(spark):
    """materialize_mix(count_fn=bpe) computes per-source scales in
    BPE tokens: n_copies replayed exactly in Python from the encoder
    counts (floor(s) + md5-draw < frac(s))."""
    from prod2vec_spark.operators.mixing import materialize_mix

    budget, alpha, seed = 200, 0.5, 42
    got = {
        r["doc_id"]: r["n_copies"]
        for r in materialize_mix(
            _frame(spark).withColumnRenamed("lang", "source"),
            alpha=alpha,
            budget_tokens=budget,
            seed=seed,
            count_fn=bpe_counter(MERGES),
        ).collect()
    }
    # python replay
    n_tok = {}
    for _, t, lg in _DOCS:
        n_tok[lg] = n_tok.get(lg, 0) + _bpe_count(t)
    tot_pow = sum(v**alpha for v in n_tok.values())
    expect = {}
    for d, t, lg in _DOCS:
        p_temp = round(n_tok[lg] ** alpha / tot_pow, 6)
        target = math.floor(budget * p_temp)
        s = round(target / n_tok[lg], 4)
        u = int(hashlib.md5(f"{seed}|{d}".encode()).hexdigest()[:8], 16) / 2**32
        expect[d] = math.floor(s) + (1 if u < s - math.floor(s) else 0)
    assert got == expect


def test_bpe_tokens_sequence_matches_python_encoder(spark):
    """bpe_tokens (Column array encoder) == encode_word word-by-word,
    flattened — the token SEQUENCE, not just its count — including a
    merged end-of-word token and a line-terminator code point."""
    from pyspark.sql import functions as F

    from prod2vec_spark.operators.bpe import bpe_tokens

    texts = [
        "hello world",
        "low lower lowest",
        "halo",                       # the r8 boundary-anchoring case
        "a b split",             # line terminator inside a word
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {
        r["i"]: r["seq"]
        for r in df.select(
            "i", bpe_tokens(F.col("text"), MERGES).alias("seq")
        ).collect()
    }
    import re

    for i, t in enumerate(texts):
        # replay with the ENGINE's word semantics: tokens() splits on
        # Java \s, which (unlike Python str.split) does NOT split on
        #   — the line separator stays INSIDE its word and is
        # encoded as a symbol (the (?s) contract)
        words = [w for w in re.split(r"[ \t\n\x0b\f\r]+", t.strip()) if w]
        want = [tok for w in words for tok in encode_word(w, MERGES)]
        assert got[i] == want, (t, got[i], want)


def test_bpe_decode_roundtrip():
    """decode(encode(w)) == w for any sentinel-free word, under any
    merge table — BPE merges only concatenate, so decode is lossless."""
    from prod2vec_spark.operators.bpe import decode_tokens

    words = ["hello", "halo", "a", "漢字かな", "x y", "émigré"]
    for w in words:
        assert decode_tokens(encode_word(w, MERGES)) == w
        assert decode_tokens(encode_word(w, [])) == w


def test_bpe_decode_roundtrip_property():
    """Property form of the roundtrip: for arbitrary sentinel-free
    words and arbitrary merge tables drawn from the word's own
    substrings, decode(encode(w)) == w."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from prod2vec_spark.operators.bpe import decode_tokens

    word = st.text(
        alphabet=st.characters(blacklist_characters="\x01\x02",
                               blacklist_categories=("Cs",)),
        min_size=1, max_size=12,
    )

    @settings(max_examples=200, deadline=None)
    @given(word, st.data())
    def check(w, data):
        chars = list(w) + ["▁"]
        n = data.draw(st.integers(min_value=0, max_value=4))
        merges = []
        for _ in range(n):
            a = data.draw(st.sampled_from(chars))
            b = data.draw(st.sampled_from(chars))
            merges.append((a, b))
        assert decode_tokens(encode_word(w, merges)) == w

    check()


def test_token_id_sequences_unk_and_roundtrip(spark):
    """Vocab built on corpus N maps corpus N+1: known tokens get
    their frequency-ranked ids, novel tokens get UNK=0; and the id
    sequence decodes back to the original text through the vocab
    inverse (ids ≠ 0)."""
    from pyspark.sql import functions as F

    from prod2vec_spark.operators.bpe import (
        bpe_tokens,
        decode_tokens,
        token_id_sequences,
        token_vocab,
    )

    train = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "the band and the sand")],
        "doc_id long, text string",
    )
    vocab = token_vocab(train, MERGES)
    vrows = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert min(vrows.values()) == 1  # id 0 reserved for UNK

    new = spark.createDataFrame(
        [(10, "the cat"), (11, "zzz unseen")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           token_id_sequences(new, MERGES, vocab).collect()}
    # known doc: zero UNK, ids replay the Python encoder through vocab
    toks10 = [t for w in "the cat".split() for t in encode_word(w, MERGES)]
    assert out[10]["n_unk"] == 0
    assert out[10]["ids"] == [vrows[t] for t in toks10]
    # novel doc: the unseen word's symbols missing from vocab map to 0
    assert out[11]["n_unk"] > 0 and 0 in out[11]["ids"]
    # roundtrip via the vocab inverse (UNK-free doc)
    inv = {v: k for k, v in vrows.items()}
    words, cur = [], []
    for tid in out[10]["ids"]:
        cur.append(inv[tid])
        if inv[tid].endswith("▁"):
            words.append(decode_tokens(cur)); cur = []
    assert " ".join(words) == "the cat"


def test_pack_token_ids_materializes_training_examples(spark):
    """pack_token_ids bins agree with pack_sequences under the BPE
    counter, and every bin's input_ids is EXACTLY the concatenation
    of its docs' Python-encoder id sequences in md5 pack order."""
    from prod2vec_spark.operators.bpe import token_vocab
    from prod2vec_spark.operators.chunking import pack_token_ids

    docs = _frame(spark)
    vocab = token_vocab(docs, MERGES)
    vrows = {r["token"]: r["token_id"] for r in vocab.collect()}
    budget = 12
    out = pack_token_ids(docs, MERGES, vocab, budget=budget, n_shards=1).collect()

    # python replay of the pack order + payload
    import hashlib

    by_bin = {}
    for lang in ("en", "de"):
        stream = sorted(
            (hashlib.md5(f"pack|{d}".encode()).hexdigest(), d, t)
            for d, t, lg in _DOCS
            if lg == lang
        )
        cum = 0
        for _, d, t in stream:
            ids = [vrows[tok] for w in t.split() for tok in encode_word(w, MERGES)]
            b = (lang, 0, cum // budget)
            by_bin.setdefault(b, ([], []))
            by_bin[b][0].append(d)
            by_bin[b][1].extend(ids)
            cum += len(ids)
    got = {(r["part"], r["shard"], r["bin"]): (r["doc_ids"], r["input_ids"])
           for r in out}
    assert {k: (v[0], v[1]) for k, v in by_bin.items()} == {
        k: (list(v[0]), list(v[1])) for k, v in got.items()
    }
    # payloads bounded by budget + one straddling doc's length
    for r in out:
        assert r["n_ids"] == len(r["input_ids"])


def test_pack_token_ids_doc_lens_and_eod(spark):
    """doc_lens carries each packed doc's id-count in pack order
    (sum == n_ids without a separator); with eod_id set, the
    separator follows every doc, is counted in n_ids and the bin
    budget, and never appears in doc_lens."""
    from prod2vec_spark.operators.bpe import token_vocab
    from prod2vec_spark.operators.chunking import pack_token_ids

    docs = _frame(spark)
    vocab = token_vocab(docs, MERGES)

    plain = pack_token_ids(docs, MERGES, vocab, budget=12, n_shards=1).collect()
    for r in plain:
        assert sum(r["doc_lens"]) == r["n_ids"]
        assert len(r["doc_lens"]) == len(r["doc_ids"])

    EOD = 0  # UNK slot doubles as EOD in this fixture
    eod = pack_token_ids(
        docs, MERGES, vocab, budget=12, n_shards=1, eod_id=EOD
    ).collect()
    for r in eod:
        n_docs = len(r["doc_ids"])
        assert sum(r["doc_lens"]) + n_docs == r["n_ids"]
        # separator closes every doc, at exactly the boundary offsets
        off = 0
        for ln in r["doc_lens"]:
            off += ln
            assert r["input_ids"][off] == EOD
            off += 1

"""Round-9 regression pins for the round-8 fixes (BPE boundary
anchoring, snapshot_diff NULL text, split_assignment degenerate
fractions) and the two leftover ADVICE defects fixed this round
(ahash64 short-clip guard, segment_dedup empty-doc report row) —
plus the round-9 ADVICE items (sentinel stripping, (?s) dot-all).

Each test pins the exact failure scenario named in VERDICT/ADVICE so
a future refactor cannot silently reintroduce it.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- BPE
def _symbol_list_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent symbol-LIST merge application (the
    train_bpe_from_counts semantics) — the ground truth the sentinel
    string encoding must reproduce."""
    from prod2vec_spark.operators.bpe import END

    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_merge_never_fires_across_symbol_tail():
    """The r7 divergence: under merges [(a,l),(l,o)] the word 'halo'
    must become ['h','al','o','▁'] by symbol-list semantics — the
    merge (l,o) must NOT fire on the tail of the multi-char symbol
    'al' to yield ['h','alo',...]."""
    from prod2vec_spark.operators.bpe import encode_word

    merges = [("a", "l"), ("l", "o")]
    assert encode_word("halo", merges) == _symbol_list_encode("halo", merges)
    assert encode_word("halo", merges) == ["h", "al", "o", "▁"]
    # a handful of adversarial words where string-level replace and
    # symbol-level merge diverge without boundary anchoring
    for w in ["lol", "allo", "lalo", "ololo", "hall"]:
        assert encode_word(w, merges) == _symbol_list_encode(w, merges), w


def test_bpe_column_encoder_pins_boundary_case(spark):
    from prod2vec_spark.operators.bpe import bpe_token_count, encode_word

    merges = [("a", "l"), ("l", "o"), ("al", "o")]
    words = ["halo", "lol", "allo", "lalo", "alo", "l"]
    df = spark.createDataFrame([(w,) for w in words], ["text"])
    got = {
        r["text"]: r["n"]
        for r in df.select(
            "text", bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    }
    for w in words:
        assert got[w] == len(_symbol_list_encode(w, merges)), w
        assert encode_word(w, merges) == _symbol_list_encode(w, merges), w


def test_bpe_sentinel_bytes_in_input_are_stripped(spark):
    """ADVICE r9 (medium): a literal \\x01/\\x02 in un-normalized
    input must not inflate counts or forge boundaries — the encoder
    strips them (Column and Python twins identically)."""
    from prod2vec_spark.operators.bpe import (
        bpe_token_count,
        encode_word,
        train_bpe_from_counts,
    )

    merges = [("h", "i")]
    dirty = "h\x02i\x01"
    assert encode_word(dirty, merges) == encode_word("hi", merges) == ["hi", "▁"]
    df = spark.createDataFrame([(dirty,), ("hi",)], ["text"])
    ns = [
        r["n"]
        for r in df.select(
            bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    ]
    assert ns == [2, 2]
    # trainer twin strips too: dirty corpus learns the same merge
    assert train_bpe_from_counts([("h\x01i", 5)], 1) == [("h", "i")]


def test_bpe_column_encoder_handles_line_terminators(spark):
    """ADVICE r9 (low): Java '.' excludes \\u2028/\\u2029/\\u0085;
    with (?s) every code point is wrapped, so the Column count equals
    the Python encoder's on words containing line terminators."""
    from prod2vec_spark.operators.bpe import bpe_token_count, encode_word

    for ch in ["\u2028", "\u2029", "\u0085"]:
        w = f"a{ch}b"
        expect = len(encode_word(w, []))
        assert expect == 4  # a, <ch>, b, ▁
        df = spark.createDataFrame([(w,)], ["text"])
        got = df.select(
            bpe_token_count(F.col("text"), []).alias("n")
        ).collect()[0]["n"]
        assert got == expect, hex(ord(ch))


# --------------------------------------------------- snapshot_diff
def test_snapshot_diff_null_text_matrix(spark):
    """r8 fix pin: NULL-text docs are classified by presence flags,
    never misread as 'added' via a NULL digest."""
    from prod2vec_spark.operators.dedup import snapshot_diff

    schema = "doc_id long, text string"
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, None)], schema
    )
    new = spark.createDataFrame(
        [(1, None), (2, "now-text"), (3, None), (5, None)], schema
    )
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {
        1: "unchanged",  # NULL -> NULL, present both sides
        2: "changed",    # NULL -> text
        3: "changed",    # text -> NULL
        4: "removed",    # NULL-text doc removed
        5: "added",      # NULL-text doc added
    }


def test_snapshot_diff_null_equals_empty_string(spark):
    """Documented coalesce-to-sentinel: NULL and '' share a digest."""
    from prod2vec_spark.operators.dedup import snapshot_diff

    schema = "doc_id long, text string"
    old = spark.createDataFrame([(1, None)], schema)
    new = spark.createDataFrame([(1, "")], schema)
    assert snapshot_diff(old, new).collect()[0]["status"] == "unchanged"


# ------------------------------------------------ split_assignment
def test_split_assignment_single_fraction_label(spark):
    """r8 fix pin: one fraction == the whole corpus gets that label
    (previously None.otherwise AttributeError)."""
    from prod2vec_spark.operators.splits import split_assignment

    df = spark.createDataFrame([("a",), ("b",)], ["k"])
    got = df.select(
        split_assignment(F.col("k"), 7, (("all", 1.0),)).alias("s")
    ).collect()
    assert [r["s"] for r in got] == ["all", "all"]


def test_split_assignment_empty_fractions_raise():
    from prod2vec_spark.operators.splits import split_assignment

    with pytest.raises(ValueError, match="non-empty"):
        split_assignment(F.lit("x"), 7, ())


# ------------------------------------------------------- ahash64
def test_ahash64_accepts_65_to_72_sample_clips():
    """ADVICE leftover: the docstring promises a hash for any clip of
    >= 65 samples; the old guard (n < 73) rejected 65-72."""
    from prod2vec_spark.operators.phash import ahash64

    rng = np.random.default_rng(9)
    for n in range(65, 74):
        h = ahash64(rng.normal(size=n))
        assert h is not None, n
        assert -(1 << 63) <= h < (1 << 63), n
    assert ahash64(rng.normal(size=64)) is None
    assert ahash64(np.array([])) is None


def test_ahash64_gain_invariance_on_short_clip():
    from prod2vec_spark.operators.phash import ahash64

    rng = np.random.default_rng(10)
    s = rng.normal(size=65)
    assert ahash64(s * 3.0) == ahash64(s)


# -------------------------------------------------- segment_dedup
def test_segment_dedup_reports_null_text_doc(spark):
    """ADVICE leftover: NULL-text docs must appear in the survival
    report (n_segs=0, n_dropped=0, kept_text='') — drop policy stays
    with the caller, the report never silently loses rows."""
    from prod2vec_spark.operators.linedup import segment_dedup

    docs = spark.createDataFrame(
        [(1, "shared line here extra"), (2, "shared line here more"),
         (3, None)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_segs"], r["n_dropped"], r["kept_text"])
        for r in segment_dedup(docs, width=3, min_docs=2).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[3] == (0, 0, "")
    # the non-empty docs still behave: the shared 3-token window drops
    assert out[1][0] == 2 and out[1][1] == 1
    assert out[2][0] == 2 and out[2][1] == 1

"""Round-15 sentence segmentation (operators/text.sentences /
sentence_profile) — the primitive sentence-level dedup and SFT-style
example prep build on."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators.text import sentence_profile, sentences


def test_sentences_golden_cases(spark):
    rows = [
        (1, "One. Two! Three? tail without end"),
        (2, "No terminator at all"),
        (3, "Ellipsis... counts as one!  Spaced.   "),
        (4, None),
        (5, ""),
        (6, "Single."),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in docs.select(
            "doc_id", sentences(F.col("text")).alias("s")
        ).collect()
    }
    assert got[1] == ["One.", "Two!", "Three?"]
    assert got[2] == []
    assert got[3] == ["Ellipsis...", "counts as one!", "Spaced."]
    assert got[4] == [] and got[5] == []
    assert got[6] == ["Single."]


def test_sentence_profile_stats(spark):
    rows = [
        (1, "One. Two! Three? tail"),
        (2, "no end"),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in sentence_profile(docs).collect()}
    r = got[1]
    # trimmed sentences: 'One.'(4) 'Two!'(4) 'Three?'(6) -> avg 4.6667
    assert r["n_sentences"] == 3
    assert r["avg_sentence_chars"] == round((4 + 4 + 6) / 3, 4)
    assert r["max_sentence_chars"] == 6
    assert r["tail_chars"] == len(" tail")
    assert got[2]["n_sentences"] == 0
    assert got[2]["avg_sentence_chars"] == 0.0
    assert got[2]["tail_chars"] == len("no end")
    assert got[3]["n_sentences"] == 0 and got[3]["tail_chars"] == 0


def test_sentence_profile_leading_terminator(spark):
    """ADVICE r15: text that BEGINS with terminator chars must not
    count the unmatched leading run as tail — tail_chars is the
    characters after the LAST terminator, full stop."""
    rows = [
        (1, ". Hello."),          # leading '.', fully terminated
        (2, "?!Only leading"),    # leading run then unterminated text
        (3, "...a. b"),           # leading ellipsis, tail ' b'
        (4, "x.\ny"),             # newline in the tail region
        (5, "a.\nb. c"),          # newline BEFORE the last terminator
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in sentence_profile(docs).collect()}
    assert got[1]["tail_chars"] == 0
    assert got[1]["n_sentences"] == 1  # ' Hello.' -> 'Hello.'
    assert got[2]["tail_chars"] == len("Only leading")
    assert got[2]["n_sentences"] == 0
    assert got[3]["tail_chars"] == len(" b")
    assert got[4]["tail_chars"] == len("\ny")
    assert got[5]["tail_chars"] == len(" c")

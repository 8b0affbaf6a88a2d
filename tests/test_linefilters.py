"""Property tests for the round-9b curation wave: C4-style line
filtering (operators/linefilters.py), leakage-safe group splitting
(operators/splits.group_split), and corpus n-gram hotspot mining
(operators/repetition.corpus_ngram_hotspots).  The sf0.01 oracle
parity for all three lives in test_oracle_parity.py; these pin the
rule semantics the synthetic corpus can't exercise (newline mode,
terminal punctuation, braces, NULL text/groups, cluster leakage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators.linefilters import line_filter
from prod2vec_spark.operators.splits import DEFAULT_FRACTIONS, group_split


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------- line_filter rules
def test_newline_mode_c4_rules(spark):
    """The canonical C4 rule set over a real newline document: keep
    lines ending in terminal punctuation with >= 3 words, no
    blocklisted phrase, no code brace."""
    text = "\n".join(
        [
            "This sentence is long enough and ends well.",   # kept
            "Too short.",                                    # short (2 words)
            "No terminal punctuation on this line",          # no punct
            "Enable javascript to view this page.",          # blocklisted
            "function f() { return 1; }",                    # brace + no punct
            "  ",                                            # blank → not a line
            'He said "quoted endings count."',               # kept (quote)
        ]
    )
    out = line_filter(
        _docs(spark, [(1, text)]),
        mode="newline",
        min_words=3,
        require_terminal_punct=True,
        drop_brace_lines=True,
    ).collect()[0]
    assert out.n_lines == 6  # blank line never counts
    assert out.n_short == 1
    assert out.n_blocked == 1
    assert out.n_nopunct == 2  # the bare line + the brace line
    assert out.n_brace == 1
    assert out.n_kept == 2
    assert out.kept_text == (
        "This sentence is long enough and ends well."
        '\nHe said "quoted endings count."'
    )


def test_line_filter_null_and_empty_text_reported(spark):
    """NULL/blank docs are REPORTED (n_lines=0, kept_text=''), never
    dropped or NULL-poisoned — drop policy stays with the caller."""
    rows = [(1, None), (2, ""), (3, "   ")]
    out = {
        r.doc_id: r
        for r in line_filter(_docs(spark, rows), mode="window").collect()
    }
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert (r.n_lines, r.n_kept, r.kept_text) == (0, 0, "")


def test_window_mode_counts_are_consistent(spark):
    """n_kept + violations cover every line (rules counted
    independently, so kept + union-of-violations >= n_lines)."""
    rows = [(i, " ".join(f"w{j}" for j in range(i))) for i in range(1, 30)]
    out = line_filter(
        _docs(spark, rows), mode="window", width=5, min_words=3,
        blocklist=("w7",),
    )
    bad = out.where(
        (F.col("n_kept") + F.col("n_short") + F.col("n_blocked"))
        < F.col("n_lines")
    ).count()
    assert bad == 0
    # a doc of 12 tokens in width-5 windows: lines of 5,5,2 → tail short
    r = out.where(F.col("doc_id") == 12).collect()[0]
    assert r.n_lines == 3 and r.n_short == 1


def test_line_filter_rejects_unknown_mode(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown line mode"):
        line_filter(_docs(spark, [(1, "x")]), mode="sentences")


# ------------------------------------------------------- group_split
def test_group_split_is_leakage_safe_on_clusters(spark):
    """Every member of a group lands in the SAME split — the property
    that makes near-dup clusters safe — and the fallback path gives
    NULL-group rows independent per-row assignments."""
    rows = [(i, f"cluster{i % 7}" if i % 11 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    s = group_split(df, "grp", row_key="doc_id", seed=5)
    leaks = (
        s.where(F.col("grp").isNotNull())
        .groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .count()
    )
    assert leaks == 0
    # NULL-group rows split independently: with 37 rows and a 90/5/5
    # assignment, all landing in one split would mean the fallback
    # collapsed them into a single group
    null_splits = (
        s.where(F.col("grp").isNull()).select("split").distinct().count()
    )
    assert null_splits > 1


def test_group_split_matches_assign_split_on_the_group_key(spark):
    """group_split(group) ≡ assign_split(key=group): the label is the
    same pure function of (seed, key), so cluster- and row-splitting
    share one replayable formula."""
    from prod2vec_spark.operators.splits import split_assignment

    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(100)], "doc_id long, grp string"
    )
    got = group_split(df, "grp", seed=9).select("doc_id", "split")
    want = df.select(
        "doc_id", split_assignment(F.col("grp"), 9, DEFAULT_FRACTIONS).alias("split")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


# --------------------------------------------- corpus n-gram mining
def test_ngram_hotspots_finds_planted_boilerplate(spark):
    """A phrase planted across many docs tops the listing with the
    right occurrence/document counts; ties order by gram text."""
    from prod2vec_spark.operators.repetition import corpus_ngram_hotspots

    boiler = "all rights reserved"
    rows = [(i, f"doc {i} body text {boiler}") for i in range(20)]
    rows += [(100, f"{boiler} {boiler} intra doc stutter")]
    rows += [(200, "unique words only here today")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = corpus_ngram_hotspots(docs, n=3, min_count=2, k=5).collect()
    assert top[0].gram == boiler
    assert top[0].n_occurrences == 22  # 20 docs + 2 in the stutter doc
    assert top[0].n_docs == 21
    # every listed gram respects the floor and the ordering contract
    counts = [r.n_occurrences for r in top]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 2 for c in counts)


def test_adaptive_boilerplate_filter_discovers_and_cuts(spark):
    """The mined top gram is the planted boilerplate and every line
    containing it is cut; docs without it are untouched."""
    from prod2vec_spark.operators.linefilters import adaptive_boilerplate_filter

    boiler = "all rights reserved"
    rows = [(i, f"unique{i} words here {boiler}") for i in range(10)]
    rows += [(99, "completely clean document body text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in adaptive_boilerplate_filter(
            docs, gram_n=3, top_k=1, min_count=2, mode="newline"
        ).collect()
    }
    assert out[0].hot_grams == [boiler]
    for i in range(10):
        assert out[i].n_kept == 0        # the one line contains the gram
    assert out[99].n_kept == 1
    assert out[99].kept_text == "completely clean document body text"


def test_segment_dedup_keep_first_preserves_one_copy(spark):
    """keep_first: the min-id doc containing a repeated window keeps
    it, every other doc cuts it; unique windows never move; drop_all
    on the same corpus removes the shared window everywhere."""
    from prod2vec_spark.operators.linedup import segment_dedup

    shared = " ".join(f"s{j}" for j in range(5))
    rows = [
        (1, f"{shared} " + " ".join(f"a{j}" for j in range(5))),
        (2, f"{shared} " + " ".join(f"b{j}" for j in range(5))),
        (3, " ".join(f"c{j}" for j in range(5))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    kf = {r.doc_id: r for r in segment_dedup(
        docs, width=5, min_docs=2, policy="keep_first").collect()}
    assert kf[1].n_dropped == 0 and kf[1].kept_text.startswith(shared)
    assert kf[2].n_dropped == 1 and shared not in kf[2].kept_text
    assert kf[3].n_dropped == 0

    da = {r.doc_id: r for r in segment_dedup(
        docs, width=5, min_docs=2, policy="drop_all").collect()}
    assert da[1].n_dropped == 1 and da[2].n_dropped == 1

    import pytest

    with pytest.raises(ValueError, match="unknown segment policy"):
        segment_dedup(docs, policy="keep_last")


def test_sketched_hotspots_equal_exact_variant(spark):
    """The CMS-prefiltered listing EQUALS the exact one (over-estimate
    only ⇒ no qualifying gram ever dropped; exact recount discards
    the sketch's false positives) — on the sf0.001 corpus AND a
    planted-boilerplate corpus."""
    from prod2vec_spark.operators.repetition import (
        corpus_ngram_hotspots,
        corpus_ngram_hotspots_sketched,
    )
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents")
    exact = corpus_ngram_hotspots(docs, n=3, min_count=3, k=25).collect()
    sk = corpus_ngram_hotspots_sketched(docs, n=3, min_count=3, k=25).collect()
    assert [tuple(r) for r in sk] == [tuple(r) for r in exact]

    boiler = "all rights reserved"
    rows = [(i, f"unique{i} text {boiler}") for i in range(15)]
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    e2 = corpus_ngram_hotspots(planted, n=3, min_count=2, k=5).collect()
    s2 = corpus_ngram_hotspots_sketched(planted, n=3, min_count=2, k=5).collect()
    assert [tuple(r) for r in s2] == [tuple(r) for r in e2]
    assert s2[0].gram == boiler


def test_sketched_hotspots_plan_shape(spark):
    """The sketched variant's plan carries the broadcast sketch
    probes (depth broadcast-hash joins) — the structural evidence the
    gram-key shuffle is candidate-only."""
    from prod2vec_spark.operators.repetition import corpus_ngram_hotspots_sketched
    from prod2vec_spark.plans.inspect import has_broadcast_join
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    docs = read_table(spark, SF_SMOKE, "documents")
    df = corpus_ngram_hotspots_sketched(docs, n=3, min_count=3, k=10)
    assert has_broadcast_join(df)


def test_strip_html_edges(spark):
    """strip_html drops script/style ELEMENTS (not just their tags),
    cuts comments, spaces block boundaries, unescapes the bounded
    entity set with &amp; last, and degrades malformed markup to
    whitespace; NULL stays NULL."""
    from prod2vec_spark.operators.text import strip_html

    cases = [
        (1, "<p>Hello <b>world</b></p>", "Hello world"),
        (2, "<script>var a = '<p>not text</p>';</script>after", "after"),
        (3, "<style>p { color: red }</style>visible", "visible"),
        (4, "a<!-- comment\nacross lines -->b", "a b"),
        (5, "<p>one</p><p>two</p>", "one two"),
        (6, "Q&amp;A &lt;tag&gt; &amp;lt;literal&gt;", 'Q&A <tag> &lt;literal>'),
        (7, "broken < not a tag > stays", "broken < not a tag > stays"),
        (8, None, None),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, h) for i, h, _ in cases],
                               "i long, html string")
    got = {r.i: r.clean for r in df.select(
        "i", strip_html(F.col("html")).alias("clean")).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_line_filter_plan_is_shuffle_free(spark):
    """Structural lock: the whole line-filter report is ONE projection
    — zero exchanges (the 100 TB claim, held by the plan itself)."""
    from prod2vec_spark.operators.linefilters import line_filter
    from prod2vec_spark.plans.inspect import count_exchanges
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    # spread=False: this locks the OPERATOR's zero-exchange claim —
    # the input-parallelism floor (io.spread_scan) is input-layer and
    # absent at scale
    docs = read_table(spark, SF_SMOKE, "documents", spread=False)
    out = line_filter(docs, mode="window")
    assert count_exchanges(out) == 0

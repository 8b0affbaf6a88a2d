"""Round-7 wave-C tranche: DSIR importance resampling (ENGINE scope —
the published hashed-n-gram data-selection recipe for pretraining
corpora, operators/dsir.py; reference anchor: utils/prep_utils.py's
driver-side sampling is the nearest ancestor of a principled
target-distribution resample).

* ``dsir_scores`` — per-document importance log-weight against an
  English-target / full-raw pair of Laplace-smoothed hashed-n-gram
  multinomials (unigrams + bigrams, 8192 buckets).
* ``dsir_select`` — the Gumbel-top-k resample (k=50, seeded md5
  uniforms) of those weights: deterministic sample-without-replacement
  ∝ exp(score), replayed exactly by the oracle.

Catalog conventions (queries.py header) apply: identical aliases both
sides, floats rounded, md5 as the portable hash, INT-cast ranks.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prod2vec_spark.operators import dsir as DS
from prod2vec_spark.sources.io import read_table

DSIR_BUCKETS = 8192
DSIR_K = 50
DSIR_SEED = 7

# Shared oracle CTE chain: tokenize -> unigram+bigram stream -> bucket
# -> target/raw bucket counts -> smoothed log-ratio -> per-doc score.
# Raw = ALL documents, so every doc bucket hits the ratio table and the
# unseen-bucket default never fires here (operators/dsir.py keeps the
# reserved -1 default row for disjoint-corpus callers).
_SQL_DSIR_SCORE = f"""
toks AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS t
         FROM documents),
grams AS (
  SELECT doc_id, lang, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                               i -> t[i] || ' ' || t[i+1])) AS g
  FROM toks
),
bk AS (SELECT doc_id, lang,
              ('0x' || substr(md5('dsir|' || g), 1, 15))::BIGINT % {DSIR_BUCKETS}
                AS bucket
       FROM grams),
tcnt AS (SELECT bucket, count(*)::BIGINT AS t_cnt FROM bk
         WHERE lang = 'en' GROUP BY 1),
rcnt AS (SELECT bucket, count(*)::BIGINT AS r_cnt FROM bk GROUP BY 1),
tot AS (SELECT (SELECT sum(t_cnt) FROM tcnt) AS t_total,
               (SELECT sum(r_cnt) FROM rcnt) AS r_total),
ratio AS (
  SELECT r.bucket AS bucket,
         ln((coalesce(t_cnt, 0) + 1.0) / (t_total + {DSIR_BUCKETS}.0))
           - ln((r_cnt + 1.0) / (r_total + {DSIR_BUCKETS}.0)) AS logratio
  FROM rcnt r LEFT JOIN tcnt t ON t.bucket = r.bucket CROSS JOIN tot
),
sc AS (
  SELECT doc_id, sum(logratio) AS score, count(*)::BIGINT AS n_grams
  FROM bk JOIN ratio USING (bucket) GROUP BY doc_id
)
"""


def _dsir_scored(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    # fused fit: target (lang='en') and raw counts from ONE corpus pass
    tgt, raw = DS.fit_bucket_counts_pair(
        docs, F.col("lang") == "en", n_buckets=DSIR_BUCKETS
    )
    ratio = DS.bucket_logratio(tgt, raw, n_buckets=DSIR_BUCKETS)
    return docs, DS.dsir_scores(docs, ratio, n_buckets=DSIR_BUCKETS)


def q_dsir_scores(spark, sf_dir):
    """Per-doc DSIR importance log-weights (operators/dsir.py).  At
    sf0.01 the explode feeds three passes (target fit, raw fit, score);
    at 100 TB the two fitted count tables (≤8192 rows each) are
    checkpointed once and only the scoring pass re-reads the corpus."""
    _, sc = _dsir_scored(spark, sf_dir)
    return sc.select("doc_id", "n_grams", F.round("score", 4).alias("score"))


def q_dsir_select(spark, sf_dir):
    """Gumbel-top-k DSIR resample: deterministic k=50 draw ∝ exp(score)
    with md5-derived uniforms; rank certifies the full ordering."""
    docs, sc = _dsir_scored(spark, sf_dir)
    sel = DS.dsir_resample(sc, k=DSIR_K, seed=DSIR_SEED)
    w = F.row_number().over(Window.orderBy(F.col("gkey").desc(), F.col("doc_id")))
    return (
        sel.withColumn("rank", w.cast("int"))
        .join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .select("rank", "doc_id", "lang", F.round("score", 4).alias("score"))
    )


def _sql_dsir_scores() -> str:
    return f"""
WITH {_SQL_DSIR_SCORE}
SELECT doc_id, n_grams, round(score, 4) AS score FROM sc
"""


def _sql_dsir_select() -> str:
    return f"""
WITH {_SQL_DSIR_SCORE},
gk AS (
  SELECT doc_id, score,
         score - ln(-ln(greatest(
           ('0x' || substr(md5('dsirg{DSIR_SEED}|' || doc_id::VARCHAR), 1, 8))::BIGINT
             / 4294967296.0, 1e-12))) AS gkey
  FROM sc
)
SELECT row_number() OVER (ORDER BY gkey DESC, doc_id)::INT AS rank,
       doc_id, d.lang AS lang, round(score, 4) AS score
FROM (SELECT * FROM gk ORDER BY gkey DESC, doc_id LIMIT {DSIR_K}) s
JOIN documents d USING (doc_id)
"""


def _phash_pair_fixture(name: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        f"phash_pairs_{name}.parquet",
    )


def q_phash_neardup(spark, sf_dir):
    """Image perceptual-hash near-dup, fully oracled via the
    fixture-split protocol (round 15, VERDICT r14 ask #5 — the
    image_span_audit / media_format_audit precedent; rows-only until
    then because the decode/hash stage is a Python codec boundary).

    The planted corpus (tests/fixtures/phash_pairs_images.parquet —
    regenerate with tools/gen_phash_pair_fixture.py) carries the SAME
    deterministic 40-family PNGs the round-7c in-query renderer
    produced, plus a golden dhash column pytest-locked against the
    real codec.  Spark RECOMPUTES the dHash from the raw blobs through
    the real stdlib-PNG decode (operators/phash.phash_images, one
    Arrow-batched scan) and runs the banded-Hamming candidate join +
    bit_count verify; the DuckDB twin replays the banding over the
    PERSISTED goldens — codec drift fails the driver-style hash
    compare.  ``same_family`` keeps the entry self-auditing: pytest
    asserts it is 1 on every pair and that all within-family pairs
    surface (pigeonhole recall)."""
    from prod2vec_spark.operators import phash as PH
    from prod2vec_spark.sources.io import spread_scan

    # spread=False: docs is only the semi-join id probe here — the
    # blob table below is what needs the parallelism floor (the PNG
    # decode is the per-row cost, guide §2.5/§4)
    docs = read_table(spark, sf_dir, "documents", spread=False).select(
        "doc_id"
    )
    media = spread_scan(
        spark.read.parquet(_phash_pair_fixture("images"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select("media_id", "blob")
    )
    hashes = PH.phash_images(media)
    pairs = PH.phash_neardup(hashes, max_distance=3)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        ((F.col("id_a") % 40) == (F.col("id_b") % 40)).cast("bigint").alias(
            "same_family"
        ),
    )


def q_audio_neardup(spark, sf_dir):
    """Audio-fingerprint near-dup, fully oracled via the fixture-split
    protocol — the audio twin of q_phash_neardup (same corpus recipe:
    40 planted families of 1040-sample PCM16 clips with one-sample
    glitches, persisted with golden ahash columns pytest-locked
    against the real codec; tests/fixtures/phash_pairs_audio.parquet,
    regenerate with tools/gen_phash_pair_fixture.py).  Spark
    RECOMPUTES the gain-invariant energy-gradient fingerprint from
    the raw WAV blobs (operators/phash.phash_audio) and runs the
    banded-Hamming join; the DuckDB twin replays the banding over the
    persisted goldens."""
    from prod2vec_spark.operators import phash as PH
    from prod2vec_spark.sources.io import spread_scan

    # spread=False on docs / spread_scan on the blobs: the WAV decode
    # is the per-row cost (see q_phash_neardup)
    docs = read_table(spark, sf_dir, "documents", spread=False).select(
        "doc_id"
    )
    media = spread_scan(
        spark.read.parquet(_phash_pair_fixture("audio"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select("media_id", "blob")
    )
    hashes = PH.phash_audio(media)
    pairs = PH.phash_neardup(hashes, hash_col="ahash", max_distance=3)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        ((F.col("id_a") % 40) == (F.col("id_b") % 40)).cast("bigint").alias(
            "same_family"
        ),
    )


def _sql_pair_neardup(name: str, hash_col: str) -> str:
    """DuckDB twin of the banded-Hamming near-dup over the persisted
    golden hashes: the image_span_audit replay (4 disjoint 16-bit
    slices by shift+mask — arithmetic vs logical shift neutralised by
    the mask), DISTINCT slice-equality candidates, XOR bit_count
    verify at distance ≤ 3, the same same_family self-audit column."""
    path = _phash_pair_fixture(name)
    return f"""
WITH t AS (
  SELECT media_id, {hash_col} AS h
  FROM read_parquet('{path}')
  WHERE media_id IN (SELECT doc_id FROM documents)
),
sig AS (
  SELECT media_id, h, band, (h >> (band * 16)) & 65535 AS slice
  FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.media_id AS ia, a.h AS ha, b.media_id AS ib, b.h AS hb
  FROM sig a JOIN sig b ON a.band = b.band AND a.slice = b.slice
   AND a.media_id < b.media_id
)
SELECT ia AS id_a, ib AS id_b,
       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
       CAST(CASE WHEN ia % 40 = ib % 40 THEN 1 ELSE 0 END AS BIGINT)
         AS same_family
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
"""


R7C_QUERIES = {
    "dsir_scores": q_dsir_scores,
    "dsir_select": q_dsir_select,
    "phash_neardup": q_phash_neardup,
    "audio_neardup": q_audio_neardup,
}
R7C_ORACLES = {
    "dsir_scores": _sql_dsir_scores(),
    "dsir_select": _sql_dsir_select(),
    # round-15 upgrade (VERDICT r14 ask #5): fixture-split oracles
    "phash_neardup": _sql_pair_neardup("images", "dhash"),
    "audio_neardup": _sql_pair_neardup("audio", "ahash"),
}

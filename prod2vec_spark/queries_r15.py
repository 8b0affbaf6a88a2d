"""Round-15 superset queries.

* ``webp_crosscodec_neardup`` — perceptual near-dup across CODECS:
  the planted 40-family corpus exists once as PNG (the round-7c
  fixture) and once as LOSSLESS WEBP members of the same families
  (different per-member perturbations, so cross pairs are near-dups,
  never re-encodes).  The Spark side runs the MIXED-modality door
  (operators/phash.media_hashes — magic sniff → the right codec per
  blob, the new VP8L decoder included) and the banded-Hamming verify;
  the DuckDB twin replays the banding over the fixtures' pytest-locked
  golden hashes (the fixture-split protocol).  This is the entry that
  certifies round-15's WebP codec INSIDE the dedup plane, not just at
  the format audit.

Composite ids: PNG row = doc_id·2, WebP row = doc_id·2 + 1 — parity
of the id encodes the codec side, so ``cross_codec`` is replayable in
SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table


def _pair_fixture(name: str) -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        f"phash_pairs_{name}.parquet",
    )


def q_webp_crosscodec_neardup(spark, sf_dir):
    """PNG↔WebP cross-codec near-dup pairs over the planted families:
    one mixed-blob frame → media_hashes (sniff + decode + dHash, one
    Arrow-batched scan) → banded-Hamming candidates → bit_count
    verify.  Output per pair: composite ids, hamming, cross_codec
    (codec sides differ), same_family (planted family agreement —
    the self-audit column, pytest-asserted 1 on every pair)."""
    from prod2vec_spark.operators import phash as PH
    from prod2vec_spark.sources.io import spread_scan

    # spread=False on docs / spread_scan on the mixed-blob frame: the
    # PNG+VP8L decode is the per-row cost (guide §2.5/§4)
    docs = read_table(spark, sf_dir, "documents", spread=False).select(
        "doc_id"
    )
    png = (
        spark.read.parquet(_pair_fixture("images"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select((F.col("media_id") * 2).alias("media_id"), "blob")
    )
    webp = (
        spark.read.parquet(_pair_fixture("webp"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select((F.col("media_id") * 2 + 1).alias("media_id"), "blob")
    )
    hashes = PH.media_hashes(spread_scan(png.unionByName(webp))).select(
        "media_id", "mhash"
    )
    pairs = PH.phash_neardup(hashes, hash_col="mhash", max_distance=3)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        (F.col("id_a") % 2 != F.col("id_b") % 2).cast("bigint").alias(
            "cross_codec"
        ),
        (
            F.floor(F.col("id_a") / 2) % 40 == F.floor(F.col("id_b") / 2) % 40
        ).cast("bigint").alias("same_family"),
    )


def _sql_webp_crosscodec_neardup() -> str:
    png, webp = _pair_fixture("images"), _pair_fixture("webp")
    return f"""
WITH t AS (
  SELECT media_id * 2 AS mid, dhash AS h FROM read_parquet('{png}')
  WHERE media_id IN (SELECT doc_id FROM documents)
  UNION ALL
  SELECT media_id * 2 + 1 AS mid, dhash AS h FROM read_parquet('{webp}')
  WHERE media_id IN (SELECT doc_id FROM documents)
),
sig AS (
  SELECT mid, h, band, (h >> (band * 16)) & 65535 AS slice
  FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.mid AS ia, a.h AS ha, b.mid AS ib, b.h AS hb
  FROM sig a JOIN sig b ON a.band = b.band AND a.slice = b.slice
   AND a.mid < b.mid
)
SELECT ia AS id_a, ib AS id_b,
       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
       CAST(CASE WHEN ia % 2 <> ib % 2 THEN 1 ELSE 0 END AS BIGINT)
         AS cross_codec,
       CAST(CASE WHEN (ia // 2) % 40 = (ib // 2) % 40
                 THEN 1 ELSE 0 END AS BIGINT) AS same_family
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
"""


def q_thumbnail_audit(spark, sf_dir):
    """The round-15 'resize' operator certified end-to-end: recompute
    8×8 grayscale thumbnails from the planted corpus's raw blobs
    through the REAL chain (shared decode door → dHash-geometry
    area-resize → gray8 PNG re-encode, operators/multimodal.
    image_thumbnails) and emit md5(thumb) + source metadata; the
    DuckDB twin reads the pytest-locked goldens
    (tests/fixtures/thumb_goldens.parquet, tools/
    gen_thumb_golden_fixture.py) — drift anywhere in the
    decode/resize/encode chain fails the hash compare."""
    from prod2vec_spark.operators.multimodal import image_thumbnails
    from prod2vec_spark.sources.io import spread_scan

    # spread=False on docs / spread_scan on the blobs: decode+resize+
    # re-encode is the per-row cost (guide §2.5/§4)
    docs = read_table(spark, sf_dir, "documents", spread=False).select(
        "doc_id"
    )
    media = spread_scan(
        spark.read.parquet(_pair_fixture("images"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select("media_id", "blob")
    )
    return image_thumbnails(media, 8, 8).select(
        "media_id",
        F.md5("thumb").alias("thumb_md5"),
        "src_width",
        "src_height",
        "src_format",
    )


def _sql_thumbnail_audit() -> str:
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "thumb_goldens.parquet",
    )
    return f"""
SELECT media_id, thumb_md5, src_width, src_height, src_format
FROM read_parquet('{path}')
WHERE media_id IN (SELECT doc_id FROM documents)
"""


def q_resample_audit(spark, sf_dir):
    """The round-15 audio resample operator certified end-to-end (the
    thumbnail_audit protocol, audio side): recompute 16 kHz resamples
    from the planted corpus's raw WAV blobs through the REAL chain
    (shared sample door → linear grid → half-away int16 → PCM16
    re-encode, operators/multimodal.audio_resample) and emit
    md5(resampled) + source metadata; the DuckDB twin reads the
    pytest-locked goldens (tools/gen_resample_golden_fixture.py)."""
    from prod2vec_spark.operators.multimodal import audio_resample

    docs = read_table(spark, sf_dir, "documents", spread=False).select("doc_id")
    media = (
        spark.read.parquet(_pair_fixture("audio"))
        .join(docs, F.col("media_id") == F.col("doc_id"), "leftsemi")
        .select("media_id", "blob")
    )
    return audio_resample(media, 16000).select(
        "media_id",
        F.md5("resampled").alias("res_md5"),
        "src_rate",
        "src_samples",
    )


def _sql_resample_audit() -> str:
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "resample_goldens.parquet",
    )
    return f"""
SELECT media_id, res_md5, src_rate, src_samples
FROM read_parquet('{path}')
WHERE media_id IN (SELECT doc_id FROM documents)
"""


R15_QUERIES = {
    "webp_crosscodec_neardup": q_webp_crosscodec_neardup,
    "thumbnail_audit": q_thumbnail_audit,
    "resample_audit": q_resample_audit,
}
R15_ORACLES: dict[str, str] = {
    "webp_crosscodec_neardup": _sql_webp_crosscodec_neardup(),
    "thumbnail_audit": _sql_thumbnail_audit(),
    "resample_audit": _sql_resample_audit(),
}


def q_sentence_stats(spark, sf_dir):
    """Per-document sentence segmentation stats over the documents
    table (operators/text.sentence_profile): n_sentences, avg/max
    trimmed sentence length, unterminated tail length — the
    segmentation primitive sentence-level dedup and SFT-style example
    prep build on.  Row-local, zero shuffle; the lookaround-free
    sentence regex compiles identically under Java regex and RE2, so
    the DuckDB twin replays the exact splits."""
    from prod2vec_spark.operators.text import sentence_profile

    docs = read_table(spark, sf_dir, "documents")
    return sentence_profile(docs)


def _sql_sentence_stats() -> str:
    pat = r"[^.!?]+[.!?]+"
    return f"""
WITH s AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         regexp_extract_all(coalesce(text, ''), '{pat}') AS raw
  FROM documents
),
m AS (
  SELECT doc_id, t, raw,
         list_transform(raw, x -> trim(x)) AS sents
  FROM s
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       CASE WHEN len(sents) > 0
            THEN round(list_sum(list_transform(sents, x -> length(x)))
                       / CAST(len(sents) AS DOUBLE), 4)
            ELSE 0.0 END AS avg_sentence_chars,
       CAST(coalesce(list_max(list_transform(sents, x -> length(x))), 0)
            AS BIGINT) AS max_sentence_chars,
       CAST(length(regexp_replace(t, '(?s)^.*[.!?]', ''))
            AS BIGINT) AS tail_chars
FROM m
"""


R15_QUERIES["sentence_stats"] = q_sentence_stats
R15_ORACLES["sentence_stats"] = _sql_sentence_stats()

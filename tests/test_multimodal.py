"""Multimodal plumbing: schema contract, Arrow batch shape, and
deterministic stub features (the decode itself is stubbed — no codecs
in this container — but the Spark-side dataflow is real)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from prod2vec_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    attach_blobs,
    extract_features,
    frame_sample_plan,
)
from prod2vec_spark.sources.io import read_table
from tests.conftest import SF_SMOKE


def test_feature_extraction_contract(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(50)
    media = attach_blobs(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,n_bytes:int,"
        "blob_digest:string,feature:array<float>>"
    )
    by_id = {r["media_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in by_id.items():
        blob = src[mid].encode()
        assert r["n_bytes"] == len(blob)
        assert r["blob_digest"] == hashlib.md5(blob).hexdigest()
        assert len(r["feature"]) == 4
        assert r["feature"][0] == float(len(blob))


def test_metadata_filter_avoids_blob_read(spark):
    """Filters on metadata prune without touching blob bytes: the
    filtered plan's parquet ReadSchema must not include text (the blob
    source column) when only metadata is selected."""
    docs = read_table(spark, SF_SMOKE, "documents")
    media = attach_blobs(docs).filter(F.col("media_type") == "video").select(
        "media_id", "width", "height"
    )
    from prod2vec_spark.plans import read_schema_columns

    assert "text" not in read_schema_columns(media)


def test_frame_sample_plan(spark):
    docs = read_table(spark, SF_SMOKE, "documents").limit(30)
    media = attach_blobs(docs)
    plan = frame_sample_plan(media, every_ms=10_000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 10_000 == 0 for r in rows)
    durations = {r["media_id"]: r["duration_ms"] for r in media.collect()}
    for r in rows:
        assert r["frame_ts_ms"] <= max(durations[r["media_id"]] - 1, 0)
    # every video with nonzero duration contributes frames
    vids = {m for m, d in durations.items() if m % 3 == 2}
    assert vids == {r["media_id"] for r in rows} | {m for m in vids if durations[m] == 0}


def test_extract_features_leaves_session_conf_alone(spark):
    """batch_hint must NOT leak into session conf (round-2 side
    effect); arrow_batch_scope restores the previous value."""
    from prod2vec_spark.operators.multimodal import (
        arrow_batch_scope,
        attach_blobs,
        extract_features,
    )
    from prod2vec_spark.sources.io import read_table
    from tests.conftest import SF_SMOKE

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(key, None)
    media = attach_blobs(read_table(spark, SF_SMOKE, "documents").limit(40))
    out = extract_features(media, batch_hint=7)
    assert out.count() == 40
    assert spark.conf.get(key, None) == before
    with arrow_batch_scope(spark, 16):
        assert spark.conf.get(key) == "16"
        assert extract_features(media).count() == 40
    assert spark.conf.get(key, None) == before

"""Multimodal column plumbing (ENGINE scope): image/audio/video as
opaque ``binary`` columns with a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked) — but everything Spark
cares about is real and tested: the schema contract, the Pandas-UDF
batch shape (iterator of DataFrames), partition sizing, and the
metadata pushdown-friendly layout (metadata columns live OUTSIDE the
blob so filters prune without touching bytes).

Scale notes: blobs ride in parquet binary columns; filters on
media_type/width/duration prune row groups without decoding; the
mapInPandas stage is the one place row-at-a-time Python is justified
(per-blob codecs), batched through Arrow.  spark.sql.files.
maxPartitionBytes governs blob-scan partition sizing.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("blob", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, "
    "blob_digest string, feature array<float>"
)


def attach_blobs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: manufacture deterministic binary blobs +
    metadata from the documents table so the plumbing is exercised
    end-to-end without real media files."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        (F.col("doc_id") % 90000).cast("int").alias("duration_ms"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
    )


def _decode_stub(media_type: str, blob: bytes) -> list[float]:
    """STUB — real deployments plug a codec here (PIL/libav/ffmpeg are
    not in this container).  Deterministic fake: 4 features derived
    from blob length and simple byte stats, so tests have stable
    expectations while the Spark-side contract stays real."""
    n = len(blob)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    head = blob[: min(n, 64)]
    return [
        float(n),
        float(sum(head) % 256),
        float(head[0]),
        float(len(set(head))),
    ]


@contextmanager
def arrow_batch_scope(spark, max_records: int):
    """Scope spark.sql.execution.arrow.maxRecordsPerBatch around an
    ACTION, restoring the previous value on exit.  Arrow input-batch
    sizing is a session conf read at execution time, so a lazy
    operator cannot scope it itself — callers wrap the write/collect:

        with arrow_batch_scope(spark, 256):
            extract_features(media).write.parquet(...)
    """
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    # get(key, None) returns None when the key is not EXPLICITLY set
    # (a bare get would return the SQL default, and restoring that
    # would pin the conf to an explicit value it never had)
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(max_records))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched iterator in, rows
    with a fixed-width feature vector out.  The iterator protocol keeps
    peak memory at one Arrow batch per task regardless of blob sizes.

    ``batch_hint`` caps rows per OUTPUT Arrow batch by slicing inside
    the UDF — no session conf is touched (the round-2 version mutated
    spark.sql.execution.arrow.maxRecordsPerBatch session-wide as a
    side effect; a lazy operator must not).  To also cap the INPUT
    batch size for very large blobs, wrap the action in
    ``arrow_batch_scope`` — that conf only exists session-side."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            step = batch_hint or len(pdf) or 1
            for lo in range(0, len(pdf), step):
                sub = pdf.iloc[lo : lo + step]
                feats = [
                    _decode_stub(mt, b if b is not None else b"")
                    for mt, b in zip(sub["media_type"], sub["blob"])
                ]
                yield pd.DataFrame(
                    {
                        "media_id": sub["media_id"],
                        "media_type": sub["media_type"],
                        "n_bytes": [len(b) if b is not None else 0 for b in sub["blob"]],
                        "blob_digest": [
                            hashlib.md5(b if b is not None else b"").hexdigest()
                            for b in sub["blob"]
                        ],
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode of the actual frame is the stubbed step).
    Pure expression — the frame plan explodes server-side, and only
    the planned (media_id, frame_ts) pairs reach the decode stage."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )

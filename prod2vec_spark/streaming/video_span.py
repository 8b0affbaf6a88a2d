"""Streaming shared-scene (video frame) gate (ENGINE scope, round
13): the frame plane's first-presenter gate, completing the 3×3 span
matrix — every plane (video frames / image tiles / audio windows) now
carries all three legs (batch / incremental / streaming) with the
same state shape, conservatism contract, and sink recipe as
streaming/image_span.py and streaming/audio_span.py.

Every arriving clip decodes ONCE in the Arrow-batched frame pass
(operators/phash.frame_hashes — AVI or animated GIF); each sampled
frame's dHash explodes into the SAME ``bands`` disjoint (band, slice)
signatures as the batch plane.  A per-(band, slice) GroupState records
the first composite frame id (clip·10⁶ + frame_idx) AND ITS FULL
HASH; a FRAME is foreign-claimed iff some signature of its is owned
by a DIFFERENT clip's frame whose stored hash exact-verifies
(bit_count(xor) ≤ max_distance).  A clip DROPS iff at least
``min_shared`` of its sampled frames are foreign-claimed — the
streaming mirror of video_span_pairs' min_shared cut.  The verified
claim and the documented under-drop chain are the image-span gate's
(its module docstring carries the full rationale); batch
``video_span_pairs`` over committed rows remains the ground truth.

Undecodable blobs (and single-frame GIFs — the image plane's case)
present no frames, never touch the state store, and are trivially
kept; the caller unions them back (the auditable-miss contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.phash import (
    _FRAME_ID_BASE,
    _composite_id,
    band_structs,
    frame_hashes,
)

BANDS = 4
MIN_SHARED = 2


def streaming_frame_band_owners(
    media: DataFrame,
    every_ms: int = 1000,
    bands: int = BANDS,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(media_id, fid, fhash, owner, owner_hash) per presented
    frame-band signature: ``owner`` is the composite frame id of the
    first frame to have presented that (band, slice), ``owner_hash``
    its full 64-bit dHash (the verify side).  Stateful —
    applyInPandasWithState, state = (owner fid, owner hash) per
    signature (min fid within a batch: lowest clip id wins)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    fh = frame_hashes(
        media, every_ms=every_ms, id_col=id_col, blob_col=blob_col
    )
    sigs = (
        fh.select(
            F.col(id_col).alias("media_id"),
            _composite_id(id_col, F.col("frame_idx"), _FRAME_ID_BASE).alias(
                "fid"
            ),
            "fhash",
            F.explode(F.array(*band_structs(F.col("fhash"), bands))).alias("bs"),
        )
        .select(
            "media_id",
            "fid",
            "fhash",
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
        )
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout below
            state.remove()
            return
        rows = [
            (int(m), int(t), int(h))
            for pdf in pdfs
            for m, t, h in zip(
                pdf["media_id"].tolist(),
                pdf["fid"].tolist(),
                pdf["fhash"].tolist(),
            )
        ]
        if not rows:
            return
        if state.exists:
            owner, owner_hash = state.get
        else:
            _, owner, owner_hash = min(rows, key=lambda r: r[1])
        state.update((owner, owner_hash))
        yield pd.DataFrame(
            {
                "media_id": [m for m, _, _ in rows],
                "fid": [t for _, t, _ in rows],
                "fhash": [h for _, _, h in rows],
                "owner": [owner] * len(rows),
                "owner_hash": [owner_hash] * len(rows),
            }
        )

    return sigs.groupBy("band", "slice").applyInPandasWithState(
        update,
        outputStructType=(
            "media_id long, fid long, fhash long, owner long, owner_hash long"
        ),
        stateStructType="owner long, owner_hash long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_video_span_gate(
    owners: DataFrame,
    out_dir: str,
    checkpoint: str,
    min_shared: int = MIN_SHARED,
    max_distance: int = 3,
):
    """Sink the ownership stream as per-clip keep/drop decisions: a
    clip DROPS iff at least ``min_shared`` of its sampled frames are
    foreign-claimed (a signature owned by another clip's frame whose
    stored hash exact-verifies within ``max_distance``); foreachBatch
    overwrites ``out_dir/batch_id=N`` so replays are idempotent-by-path
    (the streaming/media.py recipe)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        foreign_frame = (
            (
                F.expr(f"owner div {_FRAME_ID_BASE}").cast("long")
                != F.col("media_id")
            )
            & (
                F.bit_count(F.col("fhash").bitwiseXOR(F.col("owner_hash")))
                <= F.lit(max_distance)
            )
        ).cast("int")
        per_frame = batch_df.groupBy("media_id", "fid").agg(
            F.max(foreign_frame).alias("is_foreign")
        )
        decisions = per_frame.groupBy("media_id").agg(
            (F.sum("is_foreign") < F.lit(min_shared)).cast("int").alias("keep")
        )
        decisions.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        owners.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_video_span_decisions(spark, out_dir: str) -> DataFrame:
    """All committed keep/drop decisions; empty before the first
    commit, not an error."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    if not glob.glob(os.path.join(out_dir, "batch_id=*", "*.parquet")):
        return spark.createDataFrame([], "media_id long, keep int")
    return (
        spark.read.option("basePath", out_dir).parquet(out_dir).drop("batch_id")
    )

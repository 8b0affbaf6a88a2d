"""Streaming partial-audio duplicate gate (ENGINE scope, round 13):
the window plane's first-presenter gate — the audio-span counterpart
of streaming/image_span.py, completing the streaming leg of the span
triad (video frames / image tiles / audio windows) with the same
state shape, conservatism contract, and sink recipe.

Every arriving clip decodes ONCE in the Arrow-batched window pass
(operators/phash.audio_window_hashes — mapInPandas runs unchanged on
a stream); each window's energy-gradient hash explodes into the SAME
``bands`` disjoint (band, slice) signatures as the batch plane.  A
per-(band, slice) GroupState records the first composite window id
(clip·10⁶ + win_idx) AND ITS FULL HASH; a WINDOW is foreign-claimed
iff some signature of its is owned by a DIFFERENT clip's window whose
stored hash exact-verifies (bit_count(xor) ≤ max_distance — the batch
plane's verify step, held in state).  A clip DROPS iff at least
``min_shared`` of its windows are foreign-claimed — the streaming
mirror of audio_span_pairs' min_shared cut.

The claim is VERIFIED for the same reason the tile gate's is
(streaming/image_span.py module docstring): span gates evaluate 4
signatures per WINDOW × many windows per clip, so unverified false
band collisions would accumulate past any fixed min_shared as state
grows.  Carrying the 8-byte owner hash makes every claim exact.

Known under-drop chain (same as the tile gate, documented): a later
clip matching a KEPT clip only through a signature first presented by
a hash-distant third clip can survive; batch ``audio_span_pairs``
over committed rows remains the ground truth, the stream gate the
cheap in-flight triage.

Undecodable blobs present no windows, never touch the state store,
and are trivially kept — the caller unions them back (the
auditable-miss contract; the batch stage keeps them too).

Scale notes: state is two longs per distinct (band, slice) signature;
only 16-byte signatures reach the shuffle; the decode runs once per
arriving blob.  Digital-silence windows are skipped at the hash step
(window_rows_py's constant-window rule), so the silence class never
even presents a signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.phash import (
    _WIN_ID_BASE,
    _composite_id,
    audio_window_hashes,
    band_structs,
)

BANDS = 4
MIN_SHARED = 2


def streaming_audio_band_owners(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    bands: int = BANDS,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(media_id, wid, whash, owner, owner_hash) per presented
    window-band signature: ``owner`` is the composite window id of the
    first window to have presented that (band, slice), ``owner_hash``
    its full 64-bit energy-gradient hash (the verify side).  Stateful —
    applyInPandasWithState, state = (owner wid, owner hash) per
    signature (min wid within a batch, so single-batch ownership is
    deterministic: lowest clip id wins)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    wh = audio_window_hashes(
        media, window_ms=window_ms, hop_ms=hop_ms,
        id_col=id_col, blob_col=blob_col,
    )
    sigs = (
        wh.select(
            F.col(id_col).alias("media_id"),
            _composite_id(id_col, F.col("win_idx"), _WIN_ID_BASE).alias(
                "wid"
            ),
            "whash",
            F.explode(F.array(*band_structs(F.col("whash"), bands))).alias("bs"),
        )
        .select(
            "media_id",
            "wid",
            "whash",
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
                pdf["wid"].tolist(),
                pdf["whash"].tolist(),
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
                "wid": [t for _, t, _ in rows],
                "whash": [h for _, _, h in rows],
                "owner": [owner] * len(rows),
                "owner_hash": [owner_hash] * len(rows),
            }
        )

    return sigs.groupBy("band", "slice").applyInPandasWithState(
        update,
        outputStructType=(
            "media_id long, wid long, whash long, owner long, owner_hash long"
        ),
        stateStructType="owner long, owner_hash long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_audio_span_gate(
    owners: DataFrame,
    out_dir: str,
    checkpoint: str,
    min_shared: int = MIN_SHARED,
    max_distance: int = 3,
):
    """Sink the ownership stream as per-clip keep/drop decisions: a
    clip DROPS iff at least ``min_shared`` of its windows are
    foreign-claimed (a signature owned by another clip's window whose
    stored hash exact-verifies within ``max_distance``).  All of a
    clip's signature rows are emitted in the micro-batch that consumed
    it, so the fold is a plain per-batch aggregate; foreachBatch
    overwrites ``out_dir/batch_id=N`` so replays are idempotent-by-path
    (the streaming/media.py recipe)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        foreign_win = (
            (
                F.expr(f"owner div {_WIN_ID_BASE}").cast("long")
                != F.col("media_id")
            )
            & (
                F.bit_count(F.col("whash").bitwiseXOR(F.col("owner_hash")))
                <= F.lit(max_distance)
            )
        ).cast("int")
        per_win = batch_df.groupBy("media_id", "wid").agg(
            F.max(foreign_win).alias("is_foreign")
        )
        decisions = per_win.groupBy("media_id").agg(
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


def read_audio_span_decisions(spark, out_dir: str) -> DataFrame:
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

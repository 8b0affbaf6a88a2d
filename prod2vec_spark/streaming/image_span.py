"""Streaming partial-image duplicate gate (ENGINE scope, round 12):
the tile plane's first-presenter gate — the image-span counterpart of
the whole-media stream gate (streaming/media.py), sharing its state
shape, conservatism contract, and sink recipe.

Every arriving image decodes ONCE in the Arrow-batched tile pass
(operators/phash.image_tile_hashes — mapInPandas runs unchanged on a
stream); each tile's dHash explodes into the SAME ``bands`` disjoint
(band, slice) signatures as the batch plane.  A per-(band, slice)
GroupState records the first composite tile id (image·10⁶ + tile_idx)
AND ITS FULL HASH; a TILE is foreign-claimed iff some signature of
its is owned by a DIFFERENT image's tile whose stored hash exact-
verifies (bit_count(xor) ≤ max_distance — the batch plane's verify
step, held in state).  An image DROPS iff at least ``min_shared`` of
its tiles are foreign-claimed — the streaming mirror of
image_span_pairs' min_shared cut.

Why the claim is VERIFIED here while the whole-media/text gates stay
unverified-conservative: those gates evaluate ~4 signatures per ROW,
so a false band collision (16-bit slices) is a sub-percent event per
row; the tile gate evaluates 4 signatures per TILE × dozens of tiles
per image, so unverified false claims ACCUMULATE past any fixed
min_shared as the state grows (measured: pure-noise singletons
dropped once state held ~5k signatures).  Carrying the 8-byte owner
hash makes every claim exact.

Known under-drop chain (documented, not hidden): if a later image L
matches a KEPT image E only through a signature whose first presenter
was some third, hash-distant image C, L's claim against C fails the
verify and L can survive.  Batch ``image_span_pairs`` over committed
rows remains the ground truth; the stream gate is the cheap in-flight
triage (the same division every streaming gate here makes).  On
corpora without such chains — the pytest's planted one — the kept set
yields ZERO batch span pairs.

Undecodable blobs present no tiles, never touch the state store, and
are trivially kept — the caller unions them back (the auditable-miss
contract; the batch stage keeps them too).

Scale notes: state is one long per distinct (band, slice) signature;
only 16-byte signatures reach the shuffle; the decode runs once per
arriving blob.  The half-constant hot-bucket class
(operators/phash.image_span_pairs docstring) is state-side here: a
degenerate signature holds ONE owner long regardless of how many
tiles present it — the streaming gate is naturally hot-bucket-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.phash import (
    _TILE_ID_BASE,
    _composite_id,
    band_structs,
    image_tile_hashes,
)

BANDS = 4
MIN_SHARED = 4


def streaming_tile_band_owners(
    media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    bands: int = BANDS,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(media_id, tid, thash, owner, owner_hash) per presented
    tile-band signature: ``owner`` is the composite tile id of the
    first tile to have presented that (band, slice), ``owner_hash``
    its full 64-bit dHash (the verify side).  Stateful —
    applyInPandasWithState, state = (owner tid, owner hash) per
    signature (min tid within a batch, so single-batch ownership is
    deterministic: lowest image id wins)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    th = image_tile_hashes(
        media, tile_px=tile_px, stride=stride, id_col=id_col, blob_col=blob_col
    )
    sigs = (
        th.select(
            F.col(id_col).alias("media_id"),
            _composite_id(id_col, F.col("tile_idx"), _TILE_ID_BASE).alias(
                "tid"
            ),
            "thash",
            F.explode(F.array(*band_structs(F.col("thash"), bands))).alias("bs"),
        )
        .select(
            "media_id",
            "tid",
            "thash",
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
                pdf["tid"].tolist(),
                pdf["thash"].tolist(),
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
                "tid": [t for _, t, _ in rows],
                "thash": [h for _, _, h in rows],
                "owner": [owner] * len(rows),
                "owner_hash": [owner_hash] * len(rows),
            }
        )

    return sigs.groupBy("band", "slice").applyInPandasWithState(
        update,
        outputStructType=(
            "media_id long, tid long, thash long, owner long, owner_hash long"
        ),
        stateStructType="owner long, owner_hash long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_image_span_gate(
    owners: DataFrame,
    out_dir: str,
    checkpoint: str,
    min_shared: int = MIN_SHARED,
    max_distance: int = 3,
):
    """Sink the ownership stream as per-image keep/drop decisions: an
    image DROPS iff at least ``min_shared`` of its tiles are
    foreign-claimed (a signature owned by another image's tile whose
    stored hash exact-verifies within ``max_distance``).  All of an
    image's signature rows are emitted in the micro-batch that
    consumed it, so the fold is a plain per-batch aggregate;
    foreachBatch overwrites ``out_dir/batch_id=N`` so replays are
    idempotent-by-path (the streaming/media.py recipe)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        foreign_tile = (
            (
                F.expr(f"owner div {_TILE_ID_BASE}").cast("long")
                != F.col("media_id")
            )
            & (
                F.bit_count(F.col("thash").bitwiseXOR(F.col("owner_hash")))
                <= F.lit(max_distance)
            )
        ).cast("int")
        per_tile = batch_df.groupBy("media_id", "tid").agg(
            F.max(foreign_tile).alias("is_foreign")
        )
        decisions = per_tile.groupBy("media_id").agg(
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


def read_image_span_decisions(spark, out_dir: str) -> DataFrame:
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

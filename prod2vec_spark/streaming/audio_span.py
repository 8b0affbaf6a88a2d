"""Streaming partial-audio duplicate gate — the window-plane
parameterization of the ONE shared span-gate implementation
(streaming/span_gate.py; consolidated round 15, VERDICT r14 ask #3).
Full semantics, the verified-claim rationale and the documented
under-drop chain live in span_gate's module docstring; batch
``audio_span_pairs`` over committed rows remains ground truth.

Plane specifics: every arriving clip decodes ONCE in the
Arrow-batched window pass (operators/phash.audio_window_hashes);
composite window id = clip·10⁶ + win_idx; a clip DROPS iff ≥
``min_shared`` windows are foreign-claimed.  Digital-silence windows
are skipped at the hash step (window_rows_py's constant-window rule),
so the silence class never even presents a signature; undecodable
blobs present no windows and are trivially kept (the auditable-miss
contract)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from prod2vec_spark.operators.phash import _WIN_ID_BASE, audio_window_hashes
from prod2vec_spark.streaming.span_gate import (
    DEFAULT_BANDS,
    SpanPlane,
    read_span_decisions,
    start_span_gate,
    streaming_band_owners,
)

BANDS = DEFAULT_BANDS
MIN_SHARED = 2

AUDIO_PLANE = SpanPlane(
    name="audio",
    hash_fn=audio_window_hashes,
    idx_col="win_idx",
    unit_col="wid",
    hash_col="whash",
    id_base=_WIN_ID_BASE,
    min_shared=MIN_SHARED,
)


def streaming_audio_band_owners(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    bands: int = BANDS,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(media_id, wid, whash, owner, owner_hash) per presented
    window-band signature — span_gate.streaming_band_owners on the
    window plane."""
    return streaming_band_owners(
        AUDIO_PLANE,
        media,
        bands=bands,
        id_col=id_col,
        blob_col=blob_col,
        window_ms=window_ms,
        hop_ms=hop_ms,
    )


def start_audio_span_gate(
    owners: DataFrame,
    out_dir: str,
    checkpoint: str,
    min_shared: int = MIN_SHARED,
    max_distance: int = 3,
):
    """Per-clip keep/drop sink — span_gate.start_span_gate on the
    window plane."""
    return start_span_gate(
        AUDIO_PLANE,
        owners,
        out_dir,
        checkpoint,
        min_shared=min_shared,
        max_distance=max_distance,
    )


def read_audio_span_decisions(spark, out_dir: str) -> DataFrame:
    """All committed keep/drop decisions; empty before the first
    commit, not an error."""
    return read_span_decisions(spark, out_dir)

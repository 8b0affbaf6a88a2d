"""Perceptual-hash near-dup detection for image, audio AND video
blobs (ENGINE scope — the multimodal × dedup cross-plane: the
reference has no media surface; this is the standard dHash +
banded-Hamming recipe web-scale media pipelines use for
near-duplicate collapse, plus a gain-invariant energy-gradient
fingerprint for audio and a keyframe-mean dHash for video).

Three stages, each with the engine's 100 TB shape:

1. **dHash** (``phash_images``) — Arrow-batched ``mapInPandas``:
   stdlib PNG decode (multimodal.png_pixels) → grayscale → 9×8
   area-average downsample → 64 horizontal-gradient bits.  Row-local,
   no shuffle; the blob never leaves the executor.  Non-PNG /
   undecodable blobs yield a NULL hash (auditable, not dropped
   silently).
2. **Banded candidate generation** (``hamming_candidates``) — the
   64-bit hash splits into ``bands`` disjoint slices; by pigeonhole,
   two hashes within Hamming distance d share at least one intact
   slice whenever d < bands, so 4 bands give RECALL = 1 for d ≤ 3
   (the usual near-dup threshold).  Pure Column pipeline reusing the
   LSH group-expand shape: explode band structs → groupBy (band,
   slice) collect sorted id lists → in-array i<j pair expansion —
   the shuffle carries 2-long keys + id lists, never pixels.
3. **Exact verify** — the hash value rides through the band groups
   next to the id, so every candidate pair row already carries both
   hashes: Hamming = bit_count(XOR) ≤ d is a row-local filter, no
   join back, and the (Python-codec) hash lineage evaluates exactly
   once (round-9 fix: the old join-back shape re-ran it 3×).

Palette-type PNGs (color type 3) hash their palette indices — fine
for near-identical detection (same palette ⇒ same indices) but two
renderings of one image with permuted palettes won't match; bit
depths < 8 are rejected rather than mis-averaged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.multimodal import PNG_SIG, png_pixels

HASH_BITS = 64
_GRID_H, _GRID_W = 8, 9  # 8 rows x 9 cols -> 8x8 horizontal gradients
_N_WINDOWS = 65  # audio energy windows -> 64 gradient bits


def _gray(pixels: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """(height, width) float64 luminance from raw 8-bit pixel bytes
    (channel-mean; alpha participates like any channel — identical
    images keep identical grays, which is all dHash needs)."""
    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    return a.mean(axis=2, dtype=np.float64)


def _area_resize(g: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Deterministic area-average downsample to (th, tw): cell (i, j)
    averages source rows floor(i·h/th)..floor((i+1)·h/th)−1 (≥1 row by
    construction when h ≥ th; smaller images repeat edge cells)."""
    h, w = g.shape
    rb = [(i * h) // th for i in range(th + 1)]
    cb = [(j * w) // tw for j in range(tw + 1)]
    out = np.empty((th, tw), dtype=np.float64)
    for i in range(th):
        r0, r1 = rb[i], max(rb[i + 1], rb[i] + 1)
        for j in range(tw):
            c0, c1 = cb[j], max(cb[j + 1], cb[j] + 1)
            out[i, j] = g[r0:r1, c0:c1].mean()
    return out


def dhash64(g: np.ndarray) -> int:
    """64-bit horizontal-gradient hash of a grayscale matrix: resize to
    8×9, bit (i·8 + j) set iff cell[i, j+1] > cell[i, j].  Returned as
    a SIGNED 64-bit int (Spark LongType bit pattern)."""
    small = _area_resize(g, _GRID_H, _GRID_W)
    bits = small[:, 1:] > small[:, :-1]  # (8, 8)
    v = 0
    for i in range(_GRID_H):
        for j in range(_GRID_W - 1):
            if bits[i, j]:
                v |= 1 << (i * 8 + j)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash_png(blob: bytes) -> int | None:
    """dHash of a PNG blob, or None when the blob is not a decodable
    non-interlaced 8-bit PNG (the auditable-miss contract)."""
    if not isinstance(blob, (bytes, bytearray)) or not bytes(blob).startswith(PNG_SIG):
        return None
    try:
        pixels, hdr = png_pixels(bytes(blob))
    except Exception:
        return None
    if hdr["bit_depth"] != 8:
        return None  # packed sub-byte rows would be mis-averaged
    g = _gray(pixels, hdr["width"], hdr["height"], hdr["channels"])
    return dhash64(g)


def dhash_jpeg(blob: bytes) -> int | None:
    """dHash of a baseline-JPEG blob via its decoded LUMA plane, or
    None when not decodable (the auditable-miss contract).  Pixels come
    from the same decoder the MJPEG video plane already uses, so a
    PNG↔JPEG re-encode of the same image lands in the same banded
    bucket — the image edition of the raw↔MJPEG cross-codec pairing."""
    bb = bytes(blob) if isinstance(blob, (bytes, bytearray)) else b""
    if bb[:2] != b"\xff\xd8":
        return None
    from prod2vec_spark.operators.jpeg import decode_jpeg_gray

    try:
        gray, w, h = decode_jpeg_gray(bb)
    except Exception:
        return None
    g = np.frombuffer(gray, dtype=np.uint8).astype(np.float64).reshape(h, w)
    return dhash64(g)


def dhash_gif(blob: bytes) -> int | None:
    """dHash of a GIF blob via its decoded first frame (round-13), or
    None when not decodable (the auditable-miss contract).  The gray
    fold is the SAME channel-mean ``_gray`` the PNG path uses, so a
    PNG↔GIF re-encode of the same grayscale image hashes
    BIT-IDENTICALLY (gray palettes have r=g=b)."""
    if not (
        isinstance(blob, (bytes, bytearray))
        and bytes(blob)[:6] in (b"GIF87a", b"GIF89a")
    ):
        return None
    g = image_gray(blob)
    if g is None:
        return None
    return dhash64(g)


def dhash_webp(blob: bytes) -> int | None:
    """dHash of a LOSSLESS WebP (VP8L) blob via its decoded RGB plane
    (round-15), or None when not decodable — including lossy VP8
    payloads, the remaining declared boundary (the auditable-miss
    contract).  The gray fold is the SAME channel-mean ``_gray`` the
    PNG/GIF paths use, so a PNG↔WebP-lossless re-encode of the same
    grayscale image hashes BIT-IDENTICALLY."""
    bb = bytes(blob) if isinstance(blob, (bytes, bytearray)) else b""
    if not (bb[:4] == b"RIFF" and bb[8:12] == b"WEBP"):
        return None
    g = image_gray(bb)
    if g is None:
        return None
    return dhash64(g)


def image_gray(blob) -> np.ndarray | None:
    """(height, width) float64 luminance of a decodable PNG, JPEG
    (baseline or progressive), GIF or lossless-WebP blob, None
    otherwise — the shared pixel door for every whole-image and tiled
    hash (one sniff+decode path, so the tile plane can never disagree
    with the whole-image plane about what decodes)."""
    bb = bytes(blob) if isinstance(blob, (bytes, bytearray)) else b""
    if bb.startswith(PNG_SIG):
        try:
            pixels, hdr = png_pixels(bb)
        except Exception:
            return None
        if hdr["bit_depth"] != 8:
            return None
        return _gray(pixels, hdr["width"], hdr["height"], hdr["channels"])
    if bb[:2] == b"\xff\xd8":
        from prod2vec_spark.operators.jpeg import decode_jpeg_gray

        try:
            gray, w, h = decode_jpeg_gray(bb)
        except Exception:
            return None
        return np.frombuffer(gray, dtype=np.uint8).astype(np.float64).reshape(h, w)
    if bb[:6] in (b"GIF87a", b"GIF89a"):
        from prod2vec_spark.operators.gif import gif_pixels

        try:
            rgb, m = gif_pixels(bb)
        except Exception:
            return None
        return _gray(rgb, m["width"], m["height"], m["channels"])
    if bb[:4] == b"RIFF" and bb[8:12] == b"WEBP":
        from prod2vec_spark.operators.webp import webp_pixels

        try:
            rgb, m = webp_pixels(bb)
        except Exception:
            return None
        return _gray(rgb, m["width"], m["height"], m["channels"])
    return None


def ahash64(samples: np.ndarray) -> int | None:
    """64-bit audio fingerprint: temporal energy-gradient hash.  The
    mono signal splits into 65 equal windows; bit i is set iff
    window i+1 has higher mean-square energy than window i.  Gradient
    comparisons are invariant to uniform gain (energy scales by g²
    on both sides) — the property the tests lock.  None when the
    clip is shorter than 65 samples (no meaningful windows)."""
    n = samples.shape[0]
    if n < _N_WINDOWS:  # need >=1 sample per window
        return None
    bounds = [(k * n) // _N_WINDOWS for k in range(_N_WINDOWS + 1)]
    e = np.array(
        [
            float(np.mean(np.square(samples[bounds[k] : bounds[k + 1]])))
            for k in range(_N_WINDOWS)
        ]
    )
    v = 0
    for i in range(64):
        if e[i + 1] > e[i]:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def audio_mono(blob) -> "tuple[np.ndarray, int] | None":
    """Shared audio decode door (the ``image_gray`` analog): channel-
    mean mono float64 signal + sample rate of a WAV blob — PCM
    8/16/32-bit or IMA-ADPCM, both via ``multimodal.wav_samples`` —
    None where the blob isn't decodable audio (the auditable-miss
    contract every fingerprint shares)."""
    from prod2vec_spark.operators.multimodal import wav_samples

    if not isinstance(blob, (bytes, bytearray)) or bytes(blob)[:4] != b"RIFF":
        return None
    try:
        samples, m = wav_samples(bytes(blob))
    except Exception:
        return None
    a = np.asarray(samples, dtype=np.float64)
    nch = m["n_channels"]
    if nch > 1:
        a = a[: (len(a) // nch) * nch].reshape(-1, nch).mean(axis=1)
    rate = int(m.get("framerate") or 0)
    if rate <= 0:
        return None
    return a, rate


def ahash_wav(blob: bytes) -> int | None:
    """Audio fingerprint of a WAV blob (None when not decodable PCM):
    channel-mean mono mix, then the energy-gradient hash."""
    dec = audio_mono(blob)
    if dec is None:
        return None
    return ahash64(dec[0])


_VHASH_FRAMES = 8  # keyframes sampled per clip


def vhash64(frames: list[bytes], width: int, height: int) -> int | None:
    """64-bit video fingerprint: up to ``_VHASH_FRAMES`` evenly-spaced
    keyframes (always including first and last), per-pixel temporal
    mean → dHash of the mean frame.  Inherits dHash's gradient
    invariances (uniform brightness/contrast shifts), and the temporal
    mean makes single-frame edits perturb only a few bits — the same
    near-identical contract as the image plane.  None for empty
    clips."""
    n = len(frames)
    if n == 0:
        return None
    k = min(_VHASH_FRAMES, n)
    idxs = sorted({(i * (n - 1)) // (k - 1) if k > 1 else 0 for i in range(k)})
    stack = np.stack(
        [
            np.frombuffer(frames[i], dtype=np.uint8)
            .reshape(height, width)
            .astype(np.float64)
            for i in idxs
        ]
    )
    return dhash64(stack.mean(axis=0))


def vhash_avi(blob: bytes) -> int | None:
    """Video fingerprint of an uncompressed AVI blob, or None when the
    blob is not decodable (the auditable-miss contract shared with
    dhash_png / ahash_wav)."""
    from prod2vec_spark.operators.multimodal import avi_frames

    b = bytes(blob) if isinstance(blob, (bytes, bytearray)) else None
    if b is None or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    try:
        frames, m = avi_frames(b)
    except Exception:
        return None
    return vhash64(frames, m["width"], m["height"])


def phash_videos(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, vhash) for every row — NULL where the blob isn't a
    decodable uncompressed AVI.  Same Arrow-batched shape as
    ``phash_images``; feed the result to
    ``phash_neardup(hashes, hash_col='vhash')`` — the banded-Hamming
    plane is hash-agnostic, so video near-dup rides the identical
    candidate-join + bit_count-verify machinery at 100 TB."""
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [vhash_avi(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "vhash": pd.array(hashes, dtype="Int64")}
            )

    return src.mapInPandas(run, schema=f"{id_col} long, vhash long")


_FRAME_ID_BASE = 1_000_000  # composite frame id = clip_id * BASE + frame_idx


def _composite_id(id_col: str, idx_col, base: int):
    """id*base + idx as a guarded Column: raises LOUDLY when the owner
    id falls outside [0, 2^63/base).  SQL ``div`` truncates toward
    zero, so a NEGATIVE id's idx>0 composites would decompose to id+1
    (same-clip pairs then slip past the ca != cb filter), and
    |id| >= 2^63/base silently overflows the multiply — both the
    failure modes hash-derived full-range 64-bit ids hit (ADVICE r13).
    Remap such ids to a dense non-negative space first."""
    max_id = (1 << 63) // base  # exclusive
    i = F.col(id_col).cast("long")
    return F.when(
        (i < 0) | (i >= F.lit(max_id)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"composite-id owner out of range [0, {max_id}): got "
                ),
                i.cast("string"),
                F.lit("; remap hash-derived ids to a dense space first"),
            )
        ).cast("long"),
    ).otherwise(i * F.lit(base) + idx_col)


def frame_hashes(
    media: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, frame_ts_ms, frame_idx, fhash): dHash per SAMPLED frame of
    an uncompressed/MJPEG-AVI clip OR (round-13) an ANIMATED GIF (≥2
    frames; per-frame GCE delays drive the timeline — a single-frame
    GIF belongs to the IMAGE plane and emits no rows here).  One
    decode per clip, ts→index arithmetic — the multimodal.decode_frames
    shape with a fingerprint instead of a digest.  Undecodable blobs
    emit no rows (auditable upstream via extract_features)."""
    from prod2vec_spark.operators.multimodal import avi_frames

    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "frame_ts_ms": [], "frame_idx": [], "fhash": []}
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                bb = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
                if bb[:6] in (b"GIF87a", b"GIF89a"):
                    # animated GIF: frames on the GCE-delay timeline
                    from prod2vec_spark.operators.gif import gif_frames

                    try:
                        frames, gm = gif_frames(bb)
                    except Exception:
                        continue
                    if gm["n_frames"] < 2:
                        continue  # static GIF: the image plane's case
                    starts = [0]
                    for d in gm["delays_ms"]:
                        starts.append(starts[-1] + d)
                    duration_ms = starts[-1]
                    seen = set()
                    ts = 0
                    while ts < duration_ms:
                        idx = max(
                            i for i in range(len(frames)) if starts[i] <= ts
                        )
                        if idx not in seen:
                            if idx >= _FRAME_ID_BASE:
                                raise ValueError(
                                    f"clip {mid}: frame {idx} exceeds the "
                                    f"composite frame-id space "
                                    f"(<{_FRAME_ID_BASE})"
                                )
                            seen.add(idx)
                            g = np.frombuffer(
                                frames[idx], dtype=np.uint8
                            ).reshape(gm["height"], gm["width"])
                            out[id_col].append(mid)
                            out["frame_ts_ms"].append(ts)
                            out["frame_idx"].append(idx)
                            out["fhash"].append(
                                dhash64(g.astype(np.float64))
                            )
                        ts += every_ms
                    continue
                if bb[:4] != b"RIFF" or bb[8:12] != b"AVI ":
                    continue
                try:
                    frames, m = avi_frames(bb)
                except Exception:
                    continue
                fps = m["fps"]
                if not frames or not fps:
                    continue
                duration_ms = len(frames) / fps * 1000.0
                seen = set()
                ts = 0
                while ts < duration_ms:
                    idx = min(len(frames) - 1, int(ts * fps / 1000.0))
                    if idx not in seen:  # one hash per distinct frame
                        # composite-id safety (the tile/window-plane
                        # guard): a frame index at or past the base
                        # would bleed into the NEXT clip id's space —
                        # ~11.5 days at 1 fps-sampled.  Fail loud.
                        if idx >= _FRAME_ID_BASE:
                            raise ValueError(
                                f"clip {mid}: frame {idx} exceeds the "
                                f"composite frame-id space "
                                f"(<{_FRAME_ID_BASE}); raise every_ms "
                                f"or split the clip"
                            )
                        seen.add(idx)
                        g = np.frombuffer(frames[idx], dtype=np.uint8).reshape(
                            m["height"], m["width"]
                        )
                        out[id_col].append(mid)
                        out["frame_ts_ms"].append(ts)
                        out["frame_idx"].append(idx)
                        out["fhash"].append(dhash64(g.astype(np.float64)))
                    ts += every_ms
            yield pd.DataFrame(
                {
                    id_col: out[id_col],
                    "frame_ts_ms": out["frame_ts_ms"],
                    "frame_idx": out["frame_idx"],
                    "fhash": pd.array(out["fhash"], dtype="Int64"),
                }
            )

    return src.mapInPandas(
        run,
        schema=f"{id_col} long, frame_ts_ms long, frame_idx int, fhash long",
    )


def _span_rollup(
    pairs: DataFrame, base: int, min_shared: int, out_col: str
) -> DataFrame:
    """Shared media-pair rollup of a composite-id near-dup pair table
    (round 15 — the batch twin of streaming/span_gate.py's
    consolidation; these three identical blocks were the same
    drift class the streaming gates carried): decompose composite ids
    back to media ids, drop same-media pairs, count matched units per
    media pair, apply the min_shared cut.

    `div` is exact 64-bit integer division; floor(double/double) can
    be off-by-one once the composite id exceeds 2^53 (hash-derived
    ids)."""
    a = F.expr(f"id_a div {base}").cast("long")
    b = F.expr(f"id_b div {base}").cast("long")
    return (
        pairs.select(a.alias("ma"), b.alias("mb"))
        .where(F.col("ma") != F.col("mb"))
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias(out_col))
        .where(F.col(out_col) >= min_shared)
    )


def video_span_pairs(
    media: DataFrame,
    every_ms: int = 1000,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Shared-scene detection — the winnowing/verbatim-span analog for
    video: clip pairs sharing ≥ ``min_shared`` near-identical SAMPLED
    frames (a clip embedded in a longer video matches here even when
    the whole-clip keyframe-mean hash diverges).

    Shape: per-frame dHash (one decode per clip) → the SAME fused
    banded-Hamming plane over composite frame ids (clip·10⁶ + idx —
    frames of one clip can never collide with ids of another clip's
    frames) → same-clip pairs dropped → one hash-agg counting matched
    frame pairs per clip pair.  The shuffle carries 16-byte frame
    signatures, never pixels.  Output: (id_a, id_b,
    n_shared_frames ≥ min_shared)."""
    fh = frame_hashes(media, every_ms=every_ms, id_col=id_col, blob_col=blob_col)
    composite = fh.select(
        _composite_id(id_col, F.col("frame_idx"), _FRAME_ID_BASE).alias("fid"),
        "fhash",
    )
    pairs = phash_neardup(
        composite,
        id_col="fid",
        hash_col="fhash",
        max_distance=max_distance,
        bands=bands,
        max_group=max_group,
    )
    return _span_rollup(pairs, _FRAME_ID_BASE, min_shared, "n_shared_frames")


def frame_band_table(
    media: DataFrame,
    every_ms: int = 1000,
    bands: int = 4,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, frame_idx, band, slice, fhash): the PERSISTABLE band table
    of a video corpus's SAMPLED FRAMES — the archive the incremental
    span path probes (tile_band_table / audio_band_table, frame
    edition, round-13: the frame plane gains the triad legs its tile
    and window siblings already had).  One decode per clip; the
    8-byte frame hash rides along so the incremental verify never
    re-decodes the archive."""
    fh = frame_hashes(media, every_ms=every_ms, id_col=id_col, blob_col=blob_col)
    return (
        fh.select(
            id_col,
            "frame_idx",
            "fhash",
            F.explode(F.array(*band_structs(F.col("fhash"), bands))).alias("bs"),
        )
        .select(
            id_col,
            "frame_idx",
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
            "fhash",
        )
    )


def incremental_video_span_pairs(
    old_bands: DataFrame,
    new_media: DataFrame,
    every_ms: int = 1000,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Shared-scene clip pairs INVOLVING at least one new clip, probed
    against a prior snapshot's persisted frame-band table — the
    incremental twin of :func:`video_span_pairs`
    (incremental_image_span_pairs / incremental_audio_span_pairs,
    frame edition).  The archive is never re-decoded: its frame
    hashes ride in the band table.  Guarantee (hash-locked,
    id-disjoint snapshots, no cap):
        video_span_pairs(old ∪ new)
          == video_span_pairs(old) ∪ incremental_video_span_pairs(...)
    Re-ingested ids supersede their stored signatures."""
    from prod2vec_spark.functions.arrays import pair_expand

    nb = frame_band_table(
        new_media, every_ms=every_ms, bands=bands,
        id_col=id_col, blob_col=blob_col,
    )
    new_ids = new_media.select(F.col(id_col)).distinct()
    ob = old_bands.join(F.broadcast(new_ids), id_col, "left_anti")
    fid = _composite_id(id_col, F.col("frame_idx"), _FRAME_ID_BASE).alias(
        "fid"
    )
    allb = ob.select(
        fid, "band", "slice", "fhash", F.lit(0).alias("is_new")
    ).unionByName(
        nb.select(fid, "band", "slice", "fhash", F.lit(1).alias("is_new"))
    )
    grouped = (
        allb.groupBy("band", "slice")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("fid").alias("id"),
                        F.col("fhash").alias("h"),
                        F.col("is_new").alias("is_new"),
                    )
                )
            ).alias("items")
        )
        .filter(
            (F.size("items") > 1)
            & (F.size(F.filter("items", lambda s: s.is_new == 1)) > 0)
        )
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("items") <= max_group)
    fpairs = (
        grouped.select(F.explode(pair_expand(F.col("items"))).alias("p"))
        .where((F.col("p.a.is_new") == 1) | (F.col("p.b.is_new") == 1))
        .select(
            F.col("p.a.id").alias("fa"),
            F.col("p.b.id").alias("fb"),
            F.bit_count(F.col("p.a.h").bitwiseXOR(F.col("p.b.h")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select(F.col("fa").alias("id_a"), F.col("fb").alias("id_b"))
        .distinct()  # a frame pair may band-collide in several bands
    )
    return _span_rollup(fpairs, _FRAME_ID_BASE, min_shared, "n_shared_frames")


_TILE_ID_BASE = 1_000_000  # composite tile id = image_id * BASE + tile_idx
_TILE_COLS_PER_ROW = 1024  # tile_idx = tile_row * 1024 + tile_col


def tile_rows_py(g: "np.ndarray", tile_px: int, stride: int):
    """Pure-Python tile enumeration of one grayscale plane —
    [(tile_row, tile_col, dhash64)] with exactly-constant tiles
    skipped.  The SINGLE source of tile geometry: the distributed
    image_tile_hashes pass, the fixture generator
    (tools/gen_image_tile_fixture.py), and the pytest golden gate all
    call this, so they can never silently disagree."""
    h, w = g.shape
    out = []
    for ti, r0 in enumerate(range(0, h - tile_px + 1, stride)):
        for tj, c0 in enumerate(range(0, w - tile_px + 1, stride)):
            tile = g[r0 : r0 + tile_px, c0 : c0 + tile_px]
            if tile.min() == tile.max():
                continue  # constant tile: uninformative
            out.append((ti, tj, dhash64(tile)))
    return out


def image_tile_hashes(
    media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, tile_row, tile_col, tile_idx, thash): dHash per
    ``tile_px``×``tile_px`` tile of a PNG/JPEG image, tiles anchored
    at every ``stride`` pixels (overlapping when stride < tile_px) —
    the spatial analog of ``frame_hashes``' temporal sampling.  One
    decode per image; EXACTLY-CONSTANT tiles are skipped (a flat tile
    dHashes to 0 regardless of its level, so letterbox bars and blank
    backgrounds of UNRELATED images would otherwise pair).
    Undecodable blobs emit no rows (auditable upstream via
    extract_features, same contract as frame_hashes)."""
    if tile_px < 2:
        raise ValueError(f"tile_px must be >= 2, got {tile_px}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "tile_row": [], "tile_col": [], "thash": []}
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                g = image_gray(b)
                if g is None:
                    continue
                for ti, tj, th in tile_rows_py(g, tile_px, stride):
                    # Composite-id safety: tile_idx = ti*1024 + tj must stay
                    # below _TILE_ID_BASE or tiles silently bleed into the
                    # NEXT image id's space (tall scans / long screenshots).
                    # Fail loud rather than mispair.
                    if tj >= _TILE_COLS_PER_ROW or (
                        ti * _TILE_COLS_PER_ROW + tj >= _TILE_ID_BASE
                    ):
                        raise ValueError(
                            f"image {mid}: tile ({ti},{tj}) exceeds the "
                            f"composite tile-id space (cols<{_TILE_COLS_PER_ROW}, "
                            f"idx<{_TILE_ID_BASE}); raise stride/tile_px or "
                            f"split the image"
                        )
                    out[id_col].append(mid)
                    out["tile_row"].append(ti)
                    out["tile_col"].append(tj)
                    out["thash"].append(th)
            yield pd.DataFrame(
                {
                    id_col: out[id_col],
                    "tile_row": out["tile_row"],
                    "tile_col": out["tile_col"],
                    "thash": pd.array(out["thash"], dtype="Int64"),
                }
            )

    return src.mapInPandas(
        run,
        schema=f"{id_col} long, tile_row int, tile_col int, thash long",
    ).withColumn(
        "tile_idx",
        (
            F.col("tile_row") * F.lit(_TILE_COLS_PER_ROW) + F.col("tile_col")
        ).cast("int"),
    )


def image_span_pairs(
    media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 4,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Partial-image duplicate detection — the ``video_span_pairs``
    analog in space: image pairs sharing ≥ ``min_shared``
    near-identical TILES, catching the cropped / letterboxed /
    padded duplicates whose WHOLE-image dHash diverges (the gap the
    round-11 verdict named: whole-image hashing misses a crop the way
    whole-clip hashing misses an embedded clip).

    Alignment contract: a crop/pad offset that is a multiple of
    ``stride`` re-anchors content tiles exactly (the default 50%
    overlap halves the alignment granularity for one extra decode-free
    4× tile fanout); arbitrary sub-stride offsets are out of scope —
    the same granularity trade ``frame_hashes`` makes in time.

    Shape: per-tile dHash (ONE decode per image) → the SAME fused
    banded-Hamming plane over composite tile ids (image·10⁶ +
    tile_idx) → same-image pairs dropped → one hash-agg counting
    matched tile pairs per image pair.  The shuffle carries 16-byte
    tile signatures, never pixels.  Output: (id_a, id_b,
    n_shared_tiles ≥ min_shared).

    Hot-bucket caveat (measured at 10×, tests/test_scale_stress.py):
    HALF-CONSTANT tiles — e.g. letterbox bar-straddles — zero out the
    gradient band of their constant half, so unrelated images share a
    degenerate (band, slice=0) bucket that grows linearly with the
    corpus.  Set ``max_group`` at scale (the LSH text plane's valve):
    capping that bucket loses no aligned-duplicate pair, because such
    pairs also match on their varying-half bands, which land in
    family-sized buckets (pigeonhole over the remaining bands)."""
    th = image_tile_hashes(
        media, tile_px=tile_px, stride=stride, id_col=id_col, blob_col=blob_col
    )
    return image_span_pairs_from_tiles(
        th,
        max_distance=max_distance,
        bands=bands,
        min_shared=min_shared,
        max_group=max_group,
        id_col=id_col,
    )


def image_span_pairs_from_tiles(
    tile_hashes: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 4,
    max_group: int | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """:func:`image_span_pairs` over a PRECOMPUTED (id, tile_idx,
    thash) table — the banding/verify/rollup half split out (round 16)
    so a fused decode pass (:func:`media_features`) can feed the span
    plane without re-decoding blobs the whole-hash pass already
    decoded."""
    composite = tile_hashes.select(
        _composite_id(id_col, F.col("tile_idx"), _TILE_ID_BASE).alias("tid"),
        "thash",
    )
    pairs = phash_neardup(
        composite,
        id_col="tid",
        hash_col="thash",
        max_distance=max_distance,
        bands=bands,
        max_group=max_group,
    )
    return _span_rollup(pairs, _TILE_ID_BASE, min_shared, "n_shared_tiles")


def tile_band_table(
    media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    bands: int = 4,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, tile_idx, band, slice, thash): the PERSISTABLE band table
    of an image corpus's TILES — the archive the incremental span
    path probes (media_band_table, tile edition).  One decode per
    image; each row is a band signature + the 8-byte tile hash (the
    hash rides along so the incremental verify never re-decodes the
    archive)."""
    th = image_tile_hashes(
        media, tile_px=tile_px, stride=stride, id_col=id_col, blob_col=blob_col
    )
    return (
        th.select(
            id_col,
            "tile_idx",
            "thash",
            F.explode(F.array(*band_structs(F.col("thash"), bands))).alias("bs"),
        )
        .select(
            id_col,
            "tile_idx",
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
            "thash",
        )
    )


def incremental_image_span_pairs(
    old_bands: DataFrame,
    new_media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 4,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Partial-image duplicate pairs INVOLVING at least one new image,
    probed against a prior snapshot's persisted tile-band table — the
    incremental twin of :func:`image_span_pairs`
    (incremental_media_pairs, tile edition).

    At 100 TB the archived corpus is never re-decoded: only its
    (id, tile_idx, band, slice, thash) table is read back, and only
    the new fraction runs the codec pass.  Old×old image pairs are
    already known and NOT re-emitted; tile counts of an existing pair
    can never change when disjoint new images arrive, so (pytest-
    locked, id-disjoint snapshots, no cap):
        image_span_pairs(old ∪ new)
          == image_span_pairs(old) ∪ incremental_image_span_pairs(...)
    Re-ingested ids supersede their stored signatures."""
    from prod2vec_spark.functions.arrays import pair_expand

    nb = tile_band_table(
        new_media, tile_px=tile_px, stride=stride, bands=bands,
        id_col=id_col, blob_col=blob_col,
    )
    new_ids = new_media.select(F.col(id_col)).distinct()
    ob = old_bands.join(F.broadcast(new_ids), id_col, "left_anti")
    tid = _composite_id(id_col, F.col("tile_idx"), _TILE_ID_BASE).alias("tid")
    allb = ob.select(
        tid, "band", "slice", "thash", F.lit(0).alias("is_new")
    ).unionByName(
        nb.select(tid, "band", "slice", "thash", F.lit(1).alias("is_new"))
    )
    grouped = (
        allb.groupBy("band", "slice")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("tid").alias("id"),
                        F.col("thash").alias("h"),
                        F.col("is_new").alias("is_new"),
                    )
                )
            ).alias("items")
        )
        .filter(
            (F.size("items") > 1)
            & (F.size(F.filter("items", lambda s: s.is_new == 1)) > 0)
        )
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("items") <= max_group)
    tpairs = (
        grouped.select(F.explode(pair_expand(F.col("items"))).alias("p"))
        .where((F.col("p.a.is_new") == 1) | (F.col("p.b.is_new") == 1))
        .select(
            F.col("p.a.id").alias("ta"),
            F.col("p.b.id").alias("tb"),
            F.bit_count(F.col("p.a.h").bitwiseXOR(F.col("p.b.h")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select(F.col("ta").alias("id_a"), F.col("tb").alias("id_b"))
        .distinct()  # a tile pair may band-collide in several bands
    )
    return _span_rollup(tpairs, _TILE_ID_BASE, min_shared, "n_shared_tiles")


_WIN_ID_BASE = 1_000_000  # composite window id = clip_id * BASE + win_idx


def window_rows_py(a: "np.ndarray", rate: int, window_ms: int, hop_ms: int):
    """[(win_idx, whash)] for one mono signal: energy-gradient hash
    (``ahash64``) per ``window_ms`` window anchored every ``hop_ms``
    (overlapping when hop < window).  EXACTLY-CONSTANT windows are
    skipped — digital silence / DC gradient-hashes to 0 regardless of
    level, so silent lead-ins of UNRELATED clips would otherwise
    pair (the flat-tile rule, audio edition).  Windows too short for
    the 65-sub-window gradient are skipped too."""
    win = max(1, (rate * window_ms) // 1000)
    hop = max(1, (rate * hop_ms) // 1000)
    out = []
    for wi, s0 in enumerate(range(0, a.shape[0] - win + 1, hop)):
        w = a[s0 : s0 + win]
        if w.min() == w.max():
            continue  # constant window: uninformative
        h = ahash64(w)
        if h is not None:
            out.append((wi, h))
    return out


def audio_window_hashes(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, win_idx, whash): energy-gradient hash per fixed-length
    audio WINDOW — the temporal analog of ``image_tile_hashes``' tile
    grid and ``frame_hashes``' frame sampling, completing the span
    triad (video frames, image tiles, audio windows).  One decode per
    clip (PCM or IMA-ADPCM via the shared ``audio_mono`` door);
    undecodable blobs emit no rows (auditable upstream via
    extract_features, same contract as frame_hashes)."""
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    if hop_ms <= 0:
        raise ValueError(f"hop_ms must be positive, got {hop_ms}")
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "win_idx": [], "whash": []}
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                dec = audio_mono(b)
                if dec is None:
                    continue
                a, rate = dec
                for wi, wh in window_rows_py(a, rate, window_ms, hop_ms):
                    # Composite-id safety (the tile-plane guard): a
                    # window index at or past the base would bleed into
                    # the NEXT clip id's space.  win_idx < 1e6 is ~5.8
                    # days of audio at the default 500 ms hop — fail
                    # loud on anything longer rather than mispair.
                    if wi >= _WIN_ID_BASE:
                        raise ValueError(
                            f"clip {mid}: window {wi} exceeds the "
                            f"composite window-id space (<{_WIN_ID_BASE});"
                            f" raise hop_ms or split the clip"
                        )
                    out[id_col].append(mid)
                    out["win_idx"].append(wi)
                    out["whash"].append(wh)
            yield pd.DataFrame(
                {
                    id_col: out[id_col],
                    "win_idx": out["win_idx"],
                    "whash": pd.array(out["whash"], dtype="Int64"),
                }
            )

    return src.mapInPandas(
        run, schema=f"{id_col} long, win_idx int, whash long"
    )


def audio_span_pairs(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Partial-audio duplicate detection — the ``video_span_pairs`` /
    ``image_span_pairs`` analog for sound: clip pairs sharing ≥
    ``min_shared`` near-identical WINDOWS, catching an embedded
    jingle/sample whose WHOLE-clip energy-gradient hash diverges (the
    gap the round-12 verdict named: whole-clip hashing misses an
    embedded clip the way whole-image hashing misses a crop).

    Alignment contract: an insertion offset that is a multiple of
    ``hop_ms`` re-anchors content windows exactly (the default 50%
    overlap halves the alignment granularity); arbitrary sub-hop
    offsets are out of scope — the same granularity trade the tile
    and frame planes make.  The energy-gradient hash is invariant to
    uniform gain and Hamming-robust to ADPCM quantization, so the
    pairs survive PCM↔ADPCM re-encoding (tests/test_cross_codec.py).

    Shape: per-window hash (ONE decode per clip) → the SAME fused
    banded-Hamming plane over composite window ids (clip·10⁶ +
    win_idx) → same-clip pairs dropped → one hash-agg counting
    matched window pairs per clip pair.  The shuffle carries 16-byte
    window signatures, never samples.  Output: (id_a, id_b,
    n_shared_windows ≥ min_shared)."""
    wh = audio_window_hashes(
        media, window_ms=window_ms, hop_ms=hop_ms,
        id_col=id_col, blob_col=blob_col,
    )
    return audio_span_pairs_from_windows(
        wh,
        max_distance=max_distance,
        bands=bands,
        min_shared=min_shared,
        max_group=max_group,
        id_col=id_col,
    )


def audio_span_pairs_from_windows(
    window_hashes: DataFrame,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    max_group: int | None = None,
    id_col: str = "media_id",
) -> DataFrame:
    """:func:`audio_span_pairs` over a PRECOMPUTED (id, win_idx,
    whash) table — the banding/verify/rollup half split out (round 16,
    the image_span_pairs_from_tiles twin) for the fused decode pass."""
    composite = window_hashes.select(
        _composite_id(id_col, F.col("win_idx"), _WIN_ID_BASE).alias("wid"),
        "whash",
    )
    pairs = phash_neardup(
        composite,
        id_col="wid",
        hash_col="whash",
        max_distance=max_distance,
        bands=bands,
        max_group=max_group,
    )
    return _span_rollup(pairs, _WIN_ID_BASE, min_shared, "n_shared_windows")


def audio_band_table(
    media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    bands: int = 4,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """(id, win_idx, band, slice, whash): the PERSISTABLE band table
    of an audio corpus's WINDOWS — the archive the incremental span
    path probes (tile_band_table, audio edition).  One decode per
    clip; the 8-byte window hash rides along so the incremental
    verify never re-decodes the archive."""
    wh = audio_window_hashes(
        media, window_ms=window_ms, hop_ms=hop_ms,
        id_col=id_col, blob_col=blob_col,
    )
    return (
        wh.select(
            id_col,
            "win_idx",
            "whash",
            F.explode(F.array(*band_structs(F.col("whash"), bands))).alias("bs"),
        )
        .select(
            id_col,
            "win_idx",
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
            "whash",
        )
    )


def incremental_audio_span_pairs(
    old_bands: DataFrame,
    new_media: DataFrame,
    window_ms: int = 1000,
    hop_ms: int = 500,
    max_distance: int = 3,
    bands: int = 4,
    min_shared: int = 2,
    max_group: int | None = None,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Partial-audio duplicate pairs INVOLVING at least one new clip,
    probed against a prior snapshot's persisted window-band table —
    the incremental twin of :func:`audio_span_pairs`
    (incremental_image_span_pairs, audio edition).  The archive is
    never re-decoded: its window hashes ride in the band table.
    Guarantee (hash-locked, id-disjoint snapshots, no cap):
        audio_span_pairs(old ∪ new)
          == audio_span_pairs(old) ∪ incremental_audio_span_pairs(...)
    Re-ingested ids supersede their stored signatures."""
    from prod2vec_spark.functions.arrays import pair_expand

    nb = audio_band_table(
        new_media, window_ms=window_ms, hop_ms=hop_ms, bands=bands,
        id_col=id_col, blob_col=blob_col,
    )
    new_ids = new_media.select(F.col(id_col)).distinct()
    ob = old_bands.join(F.broadcast(new_ids), id_col, "left_anti")
    wid = _composite_id(id_col, F.col("win_idx"), _WIN_ID_BASE).alias("wid")
    allb = ob.select(
        wid, "band", "slice", "whash", F.lit(0).alias("is_new")
    ).unionByName(
        nb.select(wid, "band", "slice", "whash", F.lit(1).alias("is_new"))
    )
    grouped = (
        allb.groupBy("band", "slice")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("wid").alias("id"),
                        F.col("whash").alias("h"),
                        F.col("is_new").alias("is_new"),
                    )
                )
            ).alias("items")
        )
        .filter(
            (F.size("items") > 1)
            & (F.size(F.filter("items", lambda s: s.is_new == 1)) > 0)
        )
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("items") <= max_group)
    wpairs = (
        grouped.select(F.explode(pair_expand(F.col("items"))).alias("p"))
        .where((F.col("p.a.is_new") == 1) | (F.col("p.b.is_new") == 1))
        .select(
            F.col("p.a.id").alias("wa"),
            F.col("p.b.id").alias("wb"),
            F.bit_count(F.col("p.a.h").bitwiseXOR(F.col("p.b.h")))
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
        .select(F.col("wa").alias("id_a"), F.col("wb").alias("id_b"))
        .distinct()  # a window pair may band-collide in several bands
    )
    return _span_rollup(wpairs, _WIN_ID_BASE, min_shared, "n_shared_windows")


def phash_audio(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, ahash) for every row — NULL where the blob isn't decodable
    PCM WAV.  Same Arrow-batched shape as ``phash_images``; feed the
    result to ``phash_neardup(hashes, hash_col='ahash')``."""
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [ahash_wav(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "ahash": pd.array(hashes, dtype="Int64")}
            )

    return src.mapInPandas(run, schema=f"{id_col} long, ahash long")


def phash_images(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, dhash) for every input row — dhash NULL where the blob
    isn't a decodable PNG.  Arrow-batched mapInPandas; only the two
    needed columns cross into Python (project before calling for the
    column-pruning win to reach the scan)."""
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [dhash_png(b) for b in pdf[blob_col]]
            yield pd.DataFrame(
                {id_col: pdf[id_col], "dhash": pd.array(hashes, dtype="Int64")}
            )

    return src.mapInPandas(run, schema=f"{id_col} long, dhash long")


def hamming_candidates(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    bands: int = 4,
    max_group: int | None = None,
) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) sharing at least one
    of ``bands`` disjoint hash slices.  64 must divide evenly into
    ``bands``; recall is exact for Hamming distance < bands."""
    if HASH_BITS % bands:
        raise ValueError(f"bands={bands} must divide {HASH_BITS}")
    width = HASH_BITS // bands
    mask = (1 << width) - 1
    h = F.col(hash_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(h, b * width).bitwiseAND(F.lit(mask)).alias("slice"),
        )
        for b in range(bands)
    ]
    from prod2vec_spark.functions.arrays import pair_expand

    sigs = (
        hashes.where(h.isNotNull())
        .select(id_col, F.explode(F.array(*band_cols)).alias("bs"))
        .select(id_col, F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"))
    )
    grouped = (
        sigs.groupBy("band", "slice")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("ids") <= max_group)
    return (
        grouped.select(F.explode(pair_expand(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def phash_neardup(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_distance: int = 3,
    bands: int = 4,
    max_group: int | None = None,
    extra_key: str | None = None,
) -> DataFrame:
    """Verified near-dup pairs: (id_a, id_b, hamming ≤ max_distance).
    Exact (recall 1) when max_distance < bands — pigeonhole guarantees
    every qualifying pair surfaces as a candidate.

    The hash VALUE rides through the band groups next to the id
    (struct collect → in-array pair expansion → bit_count verify on
    the pair row), so the upstream hash lineage — a Python codec
    chain for every media modality — is evaluated EXACTLY ONCE and
    never joined back (the functions/arrays.pair_expand rule; the
    round-9 fix: the previous join-back shape re-ran the decode 3×).
    The shuffle carries (band, slice) keys + (id, hash) lists —
    16 bytes per member, never pixels.

    ``extra_key``: optional partitioning column folded into the band
    group key (and carried into the output) — rows with different
    values can never pair, in the SAME single scan (the mixed-
    modality case)."""
    if HASH_BITS % bands:
        raise ValueError(f"bands={bands} must divide {HASH_BITS}")
    return _banded_verified_pairs(
        hashes, id_col, hash_col, max_distance, bands, max_group, extra_key
    )


def band_structs(h: Column, bands: int) -> list[Column]:
    """The ``bands`` disjoint (band, slice) structs of a 64-bit hash —
    the shared banding expression of the batch pair plane and the
    streaming first-presenter gate."""
    if HASH_BITS % bands:
        raise ValueError(f"bands={bands} must divide {HASH_BITS}")
    width = HASH_BITS // bands
    mask = (1 << width) - 1
    return [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(h, b * width).bitwiseAND(F.lit(mask)).alias("slice"),
        )
        for b in range(bands)
    ]


def _banded_verified_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int,
    bands: int,
    max_group: int | None,
    extra_key: str | None,
) -> DataFrame:
    h = F.col(hash_col)
    band_cols = band_structs(h, bands)
    from prod2vec_spark.functions.arrays import pair_expand

    keys = ["band", "slice"] + ([extra_key] if extra_key else [])
    sel = [
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(F.array(*band_cols)).alias("bs"),
    ] + ([F.col(extra_key)] if extra_key else [])
    sigs = (
        hashes.where(h.isNotNull())
        .select(*sel)
        .withColumn("band", F.col("bs.band"))
        .withColumn("slice", F.col("bs.slice"))
    )
    grouped = (
        sigs.groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id").alias("id"), F.col("_h").alias("h")))
            ).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("items") <= max_group)
    out_cols = [
        F.col("p.a.id").alias("id_a"),
        F.col("p.b.id").alias("id_b"),
        F.bit_count(F.col("p.a.h").bitwiseXOR(F.col("p.b.h"))).cast("int").alias(
            "hamming"
        ),
    ] + ([F.col(extra_key)] if extra_key else [])
    return (
        grouped.select(
            *([F.col(extra_key)] if extra_key else []),
            F.explode(pair_expand(F.col("items"))).alias("p"),
        )
        .select(*out_cols)
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def media_hashes(
    media: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """(id, modality, mhash) for a MIXED-modality blob column: sniff
    container magic → dHash (PNG / JPEG / GIF / lossless WebP) /
    energy-gradient (WAV) / keyframe-mean dHash (AVI); (NULL, NULL)
    where the blob is undecodable — the auditable-miss contract.  One
    Arrow-batched pass; the blob never leaves the executor."""
    src = media.select(id_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from prod2vec_spark.operators.multimodal import PNG_SIG as _SIG

        for pdf in batches:
            mods, hashes = [], []
            for b in pdf[blob_col]:
                bb = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
                if bb.startswith(_SIG):
                    mods.append("image")
                    hashes.append(dhash_png(bb))
                elif bb[:2] == b"\xff\xd8":
                    mods.append("image")
                    hashes.append(dhash_jpeg(bb))
                elif bb[:6] in (b"GIF87a", b"GIF89a"):
                    mods.append("image")
                    hashes.append(dhash_gif(bb))
                elif bb[:4] == b"RIFF" and bb[8:12] == b"WEBP":
                    mods.append("image")
                    hashes.append(dhash_webp(bb))
                elif bb[:4] == b"RIFF" and bb[8:12] == b"WAVE":
                    mods.append("audio")
                    hashes.append(ahash_wav(bb))
                elif bb[:4] == b"RIFF" and bb[8:12] == b"AVI ":
                    mods.append("video")
                    hashes.append(vhash_avi(bb))
                else:
                    mods.append(None)
                    hashes.append(None)
            # a decodable container that still failed its codec keeps
            # modality but a NULL hash — distinguishable from unknown
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "modality": mods,
                    "mhash": pd.array(hashes, dtype="Int64"),
                }
            )

    return src.mapInPandas(run, schema=f"{id_col} long, modality string, mhash long")


def media_features(
    media: DataFrame,
    tile_px: int = 16,
    stride: int = 8,
    window_ms: int = 1000,
    hop_ms: int = 500,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """EVERY per-blob media feature from ONE decode (round 16, guide
    §4.2/§8 decode-once): (id, fmt, status, modality, mhash, tiles,
    wins) where ``tiles`` is array<struct<tile_idx int, thash long>>
    (the image_tile_hashes rows, in-array) and ``wins`` is
    array<struct<win_idx int, whash long>> (the audio_window_hashes
    rows).  The curation pipeline's media stage previously ran FOUR
    Arrow passes over the blob column — format audit, whole-media
    hash, image tiles, audio windows — each paying the full Python
    codec chain per blob; this pass decodes once and derives all four
    surfaces, bit-identical by construction:

    * fmt/status — the classify_media contract (the decodable six
      fused here; container-metadata formats delegate to
      classify_media, whose walks never decode payloads);
    * modality/mhash — the media_hashes contract (NULL hash where the
      codec fails, modality kept for decodable containers);
    * tiles — tile_rows_py over the SAME gray plane, with the same
      composite-id guard;
    * wins — window_rows_py over the SAME mono signal.

    tests/test_media_features.py locks the equivalence against the
    four standalone passes over the planted mixed fixture."""
    if tile_px < 2:
        raise ValueError(f"tile_px must be >= 2, got {tile_px}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if window_ms <= 0:
        raise ValueError(f"window_ms must be positive, got {window_ms}")
    if hop_ms <= 0:
        raise ValueError(f"hop_ms must be positive, got {hop_ms}")
    src = media.select(id_col, blob_col)

    def one(mid, b):
        from prod2vec_spark.operators.gif import gif_pixels
        from prod2vec_spark.operators.jpeg import decode_jpeg_gray
        from prod2vec_spark.operators.multimodal import (
            _jpeg_unsupported_mode,
            avi_frames,
            classify_media,
        )
        from prod2vec_spark.operators.webp import _vp8l_payload, webp_pixels

        bb = bytes(b) if isinstance(b, (bytes, bytearray)) else b""
        fmt = status = modality = mhash = None
        gray = audio = None
        if bb.startswith(PNG_SIG):
            fmt, modality = "png", "image"
            try:
                pixels, hdr = png_pixels(bb)
                status = "decoded"
                if hdr["bit_depth"] == 8:
                    gray = _gray(
                        pixels, hdr["width"], hdr["height"], hdr["channels"]
                    )
            except Exception:
                status = "corrupt"
        elif bb[:2] == b"\xff\xd8":
            fmt, modality = "jpeg", "image"
            if _jpeg_unsupported_mode(bb):
                status = "unsupported_format"
            else:
                try:
                    g8, w, h = decode_jpeg_gray(bb)
                    status = "decoded"
                    gray = (
                        np.frombuffer(g8, dtype=np.uint8)
                        .astype(np.float64)
                        .reshape(h, w)
                    )
                except Exception:
                    status = "corrupt"
        elif bb[:6] in (b"GIF87a", b"GIF89a"):
            fmt, modality = "gif", "image"
            try:
                rgb, m = gif_pixels(bb)
                status = "decoded"
                gray = _gray(rgb, m["width"], m["height"], m["channels"])
            except Exception:
                status = "corrupt"
        elif bb[:4] == b"RIFF" and bb[8:12] == b"WEBP":
            fmt, modality = "webp", "image"
            try:
                lossless = _vp8l_payload(bb) is not None
            except Exception:
                lossless = None
                status = "corrupt"
            if lossless is False:
                status = "unsupported_format"
            elif lossless:
                try:
                    rgb, m = webp_pixels(bb)
                    status = "decoded"
                    gray = _gray(rgb, m["width"], m["height"], m["channels"])
                except Exception:
                    status = "corrupt"
        elif bb[:4] == b"RIFF" and bb[8:12] == b"WAVE":
            from prod2vec_spark.operators.multimodal import wav_samples

            fmt, modality = "wav", "audio"
            try:
                samples, m = wav_samples(bb)
                status = "decoded"  # classify's contract: parse = decoded
            except Exception:
                status = "corrupt"
                samples = None
            if samples is not None:
                # the audio_mono door, on the ALREADY-decoded samples:
                # channel-mean mono; rate<=0 keeps status but no hash
                a = np.asarray(samples, dtype=np.float64)
                nch = m["n_channels"]
                if nch > 1:
                    a = a[: (len(a) // nch) * nch].reshape(-1, nch).mean(
                        axis=1
                    )
                rate = int(m.get("framerate") or 0)
                if rate > 0:
                    audio = (a, rate)
        elif bb[:4] == b"RIFF" and bb[8:12] == b"AVI ":
            fmt, modality = "avi", "video"
            try:
                frames, m = avi_frames(bb)
                status = "decoded"
                mhash = vhash64(frames, m["width"], m["height"])
            except Exception:
                status = "corrupt"
        else:
            # container-metadata formats (mp4/flac/ogg/aac/mp3) and
            # unknown: classify_media's walks parse headers only —
            # there is no payload decode to fuse, and media_hashes
            # reports (NULL, NULL) for all of them
            fmt, status = classify_media(bb)
        tiles, wins = [], []
        if gray is not None:
            if modality == "image":
                mhash = dhash64(gray)
            for ti, tj, th in tile_rows_py(gray, tile_px, stride):
                if tj >= _TILE_COLS_PER_ROW or (
                    ti * _TILE_COLS_PER_ROW + tj >= _TILE_ID_BASE
                ):
                    raise ValueError(
                        f"image {mid}: tile ({ti},{tj}) exceeds the "
                        f"composite tile-id space "
                        f"(cols<{_TILE_COLS_PER_ROW}, idx<{_TILE_ID_BASE}); "
                        f"raise stride/tile_px or split the image"
                    )
                tiles.append(
                    {"tile_idx": ti * _TILE_COLS_PER_ROW + tj, "thash": th}
                )
        if audio is not None:
            a, rate = audio
            mhash = ahash64(a)
            for wi, wh in window_rows_py(a, rate, window_ms, hop_ms):
                if wi >= _WIN_ID_BASE:
                    raise ValueError(
                        f"clip {mid}: window {wi} exceeds the composite "
                        f"window-id space (<{_WIN_ID_BASE}); raise hop_ms "
                        f"or split the clip"
                    )
                wins.append({"win_idx": wi, "whash": wh})
        if fmt in ("mp4", "flac", "ogg", "aac", "mp3", "unknown"):
            modality = None  # the media_hashes else-branch contract
        return fmt, status, modality, mhash, tiles, wins

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                id_col: [], "fmt": [], "status": [], "modality": [],
                "mhash": [], "tiles": [], "wins": [],
            }
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                fmt, status, modality, mhash, tiles, wins = one(mid, b)
                rows[id_col].append(mid)
                rows["fmt"].append(fmt)
                rows["status"].append(status)
                rows["modality"].append(modality)
                rows["mhash"].append(mhash)
                rows["tiles"].append(tiles)
                rows["wins"].append(wins)
            yield pd.DataFrame(
                {
                    id_col: rows[id_col],
                    "fmt": rows["fmt"],
                    "status": rows["status"],
                    "modality": rows["modality"],
                    "mhash": pd.array(rows["mhash"], dtype="Int64"),
                    "tiles": rows["tiles"],
                    "wins": rows["wins"],
                }
            )

    return src.mapInPandas(
        run,
        schema=(
            f"{id_col} long, fmt string, status string, modality string, "
            f"mhash long, "
            f"tiles array<struct<tile_idx: int, thash: long>>, "
            f"wins array<struct<win_idx: int, whash: long>>"
        ),
    )


MODALITIES = ("image", "audio", "video")


def media_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_distance: int = 3,
    bands: int = 4,
    max_group: int | None = None,
) -> DataFrame:
    """Verified near-dup pairs over a mixed-modality hash table —
    ONE banded-Hamming pass with modality folded into the band group
    key, so an image hash can never band-collide with an audio hash
    AND the (Python codec) hash lineage is scanned exactly once for
    all modalities together (the round-9 single-scan rule; the first
    cut unioned three per-modality passes = three decodes).
    Output: (id_a, id_b, hamming, modality)."""
    return phash_neardup(
        hashes,
        id_col=id_col,
        hash_col="mhash",
        max_distance=max_distance,
        bands=bands,
        max_group=max_group,
        extra_key="modality",
    )


def media_band_table(
    media: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    bands: int = 4,
) -> DataFrame:
    """(id, modality, band, slice, mhash): the PERSISTABLE band table
    of a media corpus — the archive the incremental path probes (the
    text plane's minhash_bands store, media edition).  One decode per
    blob; each row is a 3-key band signature + the 8-byte hash (the
    hash rides along so the incremental verify never re-decodes the
    archive).  Undecodable blobs emit no rows (auditable upstream)."""
    hashes = media_hashes(media, id_col=id_col, blob_col=blob_col)
    return (
        hashes.where(F.col("mhash").isNotNull())
        .select(
            id_col,
            "modality",
            "mhash",
            F.explode(F.array(*band_structs(F.col("mhash"), bands))).alias("bs"),
        )
        .select(
            id_col,
            "modality",
            F.col("bs.band").alias("band"),
            F.col("bs.slice").alias("slice"),
            "mhash",
        )
    )


def incremental_media_pairs(
    old_bands: DataFrame,
    new_media: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    max_distance: int = 3,
    bands: int = 4,
    max_group: int | None = None,
) -> DataFrame:
    """Verified media near-dup pairs INVOLVING at least one new blob,
    probed against a prior snapshot's persisted band table — the
    incremental twin of :func:`media_neardup_pairs` (and the media leg
    of the snapshot-diff plane), completing the media triad next to
    the batch stage (pipeline_llm.media_dedup) and the streaming gate
    (streaming/media.py).

    At 100 TB the point is what does NOT happen: the archived corpus
    is never re-decoded or re-hashed — only its (id, modality, band,
    slice, mhash) table is read back, and only the typically-small
    new fraction runs the codec pass.  Old×old pairs are already
    known and are NOT re-emitted; the output is exactly the delta
    pair set, exact-verified (bit_count ≤ max_distance) from the
    hashes riding in the band rows.  Re-ingested ids supersede their
    stored signatures.  Semantics (pytest-locked, no cap):
        media_neardup_pairs(old ∪ new)
          == media_neardup_pairs(old) ∪ incremental_media_pairs(...)
    for id-disjoint snapshots."""
    from prod2vec_spark.functions.arrays import pair_expand

    nb = media_band_table(new_media, id_col=id_col, blob_col=blob_col, bands=bands)
    new_ids = new_media.select(F.col(id_col)).distinct()
    ob = old_bands.join(F.broadcast(new_ids), id_col, "left_anti")
    allb = ob.select(
        id_col, "modality", "band", "slice", "mhash", F.lit(0).alias("is_new")
    ).unionByName(
        nb.select(
            id_col, "modality", "band", "slice", "mhash", F.lit(1).alias("is_new")
        )
    )
    grouped = (
        allb.groupBy("modality", "band", "slice")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(id_col).alias("id"),
                        F.col("mhash").alias("h"),
                        F.col("is_new").alias("is_new"),
                    )
                )
            ).alias("items")
        )
        .filter(
            (F.size("items") > 1)
            & (F.size(F.filter("items", lambda s: s.is_new == 1)) > 0)
        )
    )
    if max_group is not None:
        grouped = grouped.filter(F.size("items") <= max_group)
    return (
        grouped.select(
            F.col("modality"), F.explode(pair_expand(F.col("items"))).alias("p")
        )
        .where((F.col("p.a.is_new") == 1) | (F.col("p.b.is_new") == 1))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.bit_count(F.col("p.a.h").bitwiseXOR(F.col("p.b.h"))).cast("int").alias(
                "hamming"
            ),
            "modality",
        )
        .filter(F.col("hamming") <= max_distance)
        .distinct()
    )


def media_dedup(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_distance: int = 3,
    bands: int = 4,
    max_group: int | None = None,
) -> DataFrame:
    """Near-dup COLLAPSE for a media corpus — the media twin of the
    text chain minhash→LSH→dedup_clusters (operators/graph.py):
    verified fingerprint pairs → connected components → canonical pick
    (min id per cluster).

    Returns (id_col, cluster_id, is_canonical) covering EVERY input
    row, not just the paired ones: unpaired hashed rows are singleton
    canonicals of their own cluster, and UNDECODABLE rows (NULL hash)
    are singleton canonicals too — the conservative web-pipeline
    default (never drop what you couldn't read), and auditable because
    their fingerprint is NULL upstream.

    100 TB shape: the pair set is the near-dup fraction (small), so
    the component computation runs on a graph orders of magnitude
    smaller than the corpus, and the clustered-node table broadcasts
    into the singleton anti-join — the corpus-sized hash table never
    shuffles here."""
    from prod2vec_spark.operators.graph import dedup_clusters

    pairs = phash_neardup(
        hashes,
        id_col=id_col,
        hash_col=hash_col,
        max_distance=max_distance,
        bands=bands,
        max_group=max_group,
    )
    clustered = dedup_clusters(
        pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    ).select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id"),
        F.col("is_canonical"),
    )
    singles = hashes.select(id_col).join(
        F.broadcast(clustered.select(id_col)), id_col, "left_anti"
    )
    return clustered.unionByName(
        singles.select(
            F.col(id_col),
            F.col(id_col).alias("cluster_id"),
            F.lit(1).alias("is_canonical"),
        )
    )

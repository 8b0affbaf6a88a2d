"""Multimodal column plumbing (ENGINE scope): image/audio/video as
opaque ``binary`` columns with a typed metadata struct, processed by
Arrow-batched ``mapInPandas`` stages.

Image and audio decode is REAL, stdlib-only (round-6): a pure-Python
PNG decoder (``zlib`` inflate + per-scanline unfilter → width/height/
bit-depth/color-type + a digest of the reconstructed pixel bytes) and
a WAV decoder (``wave`` + ``struct`` → sample rate, duration, RMS).
Only VIDEO decode remains stubbed (``_decode_stub`` — no container
codec exists for it); unknown formats take the same deterministic
byte-stats path.  The Spark-side contract is real throughout: the
schema, the Pandas-UDF batch shape (iterator of DataFrames),
partition sizing, and the metadata pushdown-friendly layout (metadata
columns live OUTSIDE the blob so filters prune without touching
bytes).

Scale notes: blobs ride in parquet binary columns; filters on
media_type/width/duration prune row groups without decoding; the
mapInPandas stage is the one place row-at-a-time Python is justified
(per-blob codecs), batched through Arrow.  spark.sql.files.
maxPartitionBytes governs blob-scan partition sizing.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
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
    "blob_digest string, format string, width int, height int, "
    "bit_depth int, sample_rate int, duration_ms double, rms double, "
    "pixel_digest string, feature array<float>"
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


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


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_header(blob: bytes) -> dict:
    """Parse just the IHDR chunk (no inflate) — cheap metadata probe
    for scans that only need dimensions."""
    if len(blob) < 29 or blob[:8] != PNG_SIG or blob[12:16] != b"IHDR":
        # the length guard keeps the contract ValueError on truncated
        # blobs (struct.unpack would raise struct.error otherwise)
        raise ValueError("not a PNG")
    width, height, bit_depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", blob[16:29]
    )
    if comp != 0 or filt != 0:
        raise ValueError("invalid PNG compression/filter method")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"invalid PNG color type {color_type}")
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": _PNG_CHANNELS[color_type],
        "interlace": interlace,
    }


def _png_unfilter(raw: bytes, stride: int, height: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (spec §6: None/Sub/Up/
    Average/Paeth).  Filters are byte-wise with a ``bpp``-byte
    lookback, so this works for every bit depth / color type."""
    out = bytearray(stride * height)
    prev = bytes(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        if len(line) != stride:
            raise ValueError("truncated PNG scanline")
        pos += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa = p - a if p > a else a - p
                pb = p - b if p > b else b - p
                pc = p - c if p > c else c - p
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                line[i] = (line[i] + pr) & 0xFF
        elif ftype != 0:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return bytes(out)


def encode_png_gray8(pixels: bytes, width: int, height: int) -> bytes:
    """Minimal stdlib PNG ENCODER: 8-bit grayscale, filter-0 scanlines,
    one IDAT.  The write half of the codec boundary — lets pipelines
    materialize deterministic image fixtures/thumbnails without any
    imaging dependency, and round-trips exactly through decode_png /
    png_pixels."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match width*height")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type None
        raw += pixels[y * width : (y + 1) * width]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def png_pixels(blob: bytes) -> tuple[bytes, dict]:
    """Chunk walk → IDAT inflate → scanline unfilter: the reconstructed
    raw pixel bytes plus the IHDR metadata.  The shared decode core for
    ``decode_png`` (digest/mean features) and ``operators/phash.py``
    (perceptual hashing, which needs the actual pixels)."""
    hdr = png_header(blob)
    if hdr["interlace"] != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    raw = zlib.decompress(bytes(idat))
    bits_per_pixel = hdr["channels"] * hdr["bit_depth"]
    stride = (hdr["width"] * bits_per_pixel + 7) // 8
    bpp = max(1, bits_per_pixel // 8)
    if len(raw) != (stride + 1) * hdr["height"]:
        raise ValueError("PNG pixel payload size mismatch")
    return _png_unfilter(raw, stride, hdr["height"], bpp), hdr


def decode_png(blob: bytes) -> dict:
    """Real stdlib-only PNG decode: chunk walk → IHDR metadata, IDAT
    concat → ``zlib`` inflate → scanline unfilter → digest + mean of
    the reconstructed raw pixel bytes (palette indices for color type
    3).  Non-interlaced images only (Adam7 is rejected explicitly, not
    silently mis-decoded); every bit depth and color type in the spec
    is handled because PNG filtering is byte-wise."""
    pixels, hdr = png_pixels(blob)
    return {
        "format": "png",
        "width": hdr["width"],
        "height": hdr["height"],
        "bit_depth": hdr["bit_depth"],
        "color_type": hdr["color_type"],
        "channels": hdr["channels"],
        "pixel_digest": hashlib.md5(pixels).hexdigest(),
        "mean_pixel_byte": (sum(pixels) / len(pixels)) if pixels else 0.0,
    }


def wav_samples(blob: bytes) -> tuple[tuple, dict]:
    """PCM sample decode shared by ``decode_wav`` (RMS features) and
    ``operators/phash.py`` (audio fingerprinting): interleaved signed
    samples plus the stream metadata."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    n = len(frames) // sampwidth
    if sampwidth == 1:  # unsigned 8-bit, centered at 128
        samples = tuple(b - 128 for b in frames[:n])
    elif sampwidth == 2:
        samples = struct.unpack(f"<{n}h", frames[: n * 2])
    elif sampwidth == 4:
        samples = struct.unpack(f"<{n}i", frames[: n * 4])
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    meta = {
        "n_channels": n_channels,
        "sampwidth": sampwidth,
        "framerate": framerate,
        "n_frames": n_frames,
    }
    return samples, meta


def encode_wav_pcm16(samples, sample_rate: int = 8000, n_channels: int = 1) -> bytes:
    """Minimal stdlib WAV ENCODER (PCM 16-bit LE): the write half of
    the audio codec boundary — deterministic fixtures/sinks with no
    audio dependency, exact roundtrip through ``wav_samples``."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(blob: bytes) -> dict:
    """Real stdlib-only WAV decode via ``wave``: sample rate, channel
    count, bit depth, duration, and RMS amplitude (in raw sample
    units) computed from the PCM frames with ``struct``."""
    samples, m = wav_samples(blob)
    n_channels, sampwidth = m["n_channels"], m["sampwidth"]
    framerate, n_frames = m["framerate"], m["n_frames"]
    n = len(samples)
    rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
    return {
        "format": "wav",
        "sample_rate": framerate,
        "n_channels": n_channels,
        "bit_depth": sampwidth * 8,
        "duration_ms": (n_frames / framerate * 1000.0) if framerate else 0.0,
        "rms": rms,
    }


def decode_media(media_type: str, blob: bytes) -> dict:
    """Sniff the container by magic bytes and run the REAL decoder
    (PNG / WAV); everything else — video (no codec in the container)
    and unknown formats — falls through to the deterministic
    byte-stats stub with ``format='raw'``.  A corrupt PNG/WAV is
    reported as ``format='corrupt'`` rather than mis-decoded."""
    fmt = "raw"
    if blob[:8] == PNG_SIG:
        try:
            return decode_png(blob)
        except Exception:
            fmt = "corrupt"
    elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        try:
            return decode_wav(blob)
        except Exception:
            fmt = "corrupt"
    return {"format": fmt}


def _decode_stub(media_type: str, blob: bytes) -> list[float]:
    """Byte-stats fallback features for formats with no container
    codec (video) and unknown blobs — the only remaining stub (PNG and
    WAV decode are real above).  Deterministic: 4 features from blob
    length and simple byte stats, so tests have stable expectations."""
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

    Real PNG/WAV decode happens here per blob (``decode_media``); the
    decoded metadata rides in typed columns (width/height/bit_depth
    for images, sample_rate/duration_ms/rms for audio — null where a
    field does not apply to the format), alongside the generic
    byte-stats ``feature`` vector that every format gets.

    ``batch_hint`` caps rows per OUTPUT Arrow batch by slicing inside
    the UDF — no session conf is touched (the round-2 version mutated
    spark.sql.execution.arrow.maxRecordsPerBatch session-wide as a
    side effect; a lazy operator must not).  To also cap the INPUT
    batch size for very large blobs, wrap the action in
    ``arrow_batch_scope`` — that conf only exists session-side."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            step = batch_hint or len(pdf) or 1
            for lo in range(0, len(pdf), step):
                sub = pdf.iloc[lo : lo + step]
                blobs = [b if b is not None else b"" for b in sub["blob"]]
                decoded = [
                    decode_media(mt, b) for mt, b in zip(sub["media_type"], blobs)
                ]
                yield pd.DataFrame(
                    {
                        "media_id": sub["media_id"],
                        "media_type": sub["media_type"],
                        "n_bytes": [len(b) for b in blobs],
                        "blob_digest": [hashlib.md5(b).hexdigest() for b in blobs],
                        "format": [d["format"] for d in decoded],
                        "width": [d.get("width") for d in decoded],
                        "height": [d.get("height") for d in decoded],
                        "bit_depth": [d.get("bit_depth") for d in decoded],
                        "sample_rate": [d.get("sample_rate") for d in decoded],
                        "duration_ms": [d.get("duration_ms") for d in decoded],
                        "rms": [d.get("rms") for d in decoded],
                        "pixel_digest": [d.get("pixel_digest") for d in decoded],
                        "feature": [
                            _decode_stub(mt, b)
                            for mt, b in zip(sub["media_type"], blobs)
                        ],
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

"""Multimodal plumbing: schema contract, Arrow batch shape, REAL
stdlib PNG/WAV decode with golden values (round-6 — only video decode
remains stubbed), and the Spark-side dataflow end-to-end."""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

from pyspark.sql import functions as F

from prod2vec_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    PNG_SIG,
    attach_blobs,
    decode_media,
    decode_png,
    decode_wav,
    extract_features,
    frame_sample_plan,
    png_header,
)
from prod2vec_spark.sources.io import read_table
from tests.conftest import SF_SMOKE

REF_IMG = "/root/reference/Img"


# ------------------------------------------------- fixture encoders
# Independent, test-only PNG writer implementing the spec's filters
# FORWARD (the decoder reverses them) — a round-trip through every
# filter type is therefore a two-implementation cross-check, not a
# self-fulfilling assertion.
def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def make_png(width, height, rows, filters, channels=3, bit_depth=8):
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    bpp = max(1, channels * bit_depth // 8)
    raw = bytearray()
    prev = bytes(len(rows[0]))
    for row, f in zip(rows, filters):
        raw.append(f)
        line = bytearray(row)
        enc = bytearray()
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc.append((line[i] - pred) & 0xFF)
        raw += enc
        prev = line
    idat = zlib.compress(bytes(raw))
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def make_wav(samples, sample_rate=8000, sampwidth=2, channels=1):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        fmt = {1: "B", 2: "h", 4: "i"}[sampwidth]
        w.writeframes(struct.pack(f"<{len(samples)}{fmt}", *samples))
    return buf.getvalue()


# ------------------------------------------------- decoder goldens
def test_png_decode_golden_all_filters():
    """3×2 RGB8 image with known pixel bytes, encoded with every
    filter-type combination: decode must reproduce the exact raw
    pixel bytes (digest) and header fields each time."""
    rows = [bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]),
            bytes([15, 25, 35, 45, 55, 65, 75, 85, 95])]
    expected = hashlib.md5(b"".join(rows)).hexdigest()
    for filters in [(0, 0), (1, 2), (3, 4), (4, 4), (2, 3), (1, 4), (4, 1)]:
        d = decode_png(make_png(3, 2, rows, filters))
        assert (d["width"], d["height"], d["bit_depth"], d["color_type"]) == (3, 2, 8, 2)
        assert d["pixel_digest"] == expected, filters
        assert abs(d["mean_pixel_byte"] - (sum(b"".join(rows)) / 18)) < 1e-9


def test_png_decode_grayscale_and_rgba():
    gray = [bytes([0, 128, 255])]
    d = decode_png(make_png(3, 1, gray, (4,), channels=1))
    assert (d["channels"], d["color_type"]) == (1, 0)
    assert d["pixel_digest"] == hashlib.md5(gray[0]).hexdigest()
    rgba = [bytes(range(16)), bytes(range(100, 116))]
    d = decode_png(make_png(4, 2, rgba, (2, 4), channels=4))
    assert (d["channels"], d["color_type"]) == (4, 6)
    assert d["pixel_digest"] == hashlib.md5(b"".join(rgba)).hexdigest()


def test_png_decode_reference_assets():
    """The reference repo's own PNG assets (richjdowney/prod2vec
    Img/*.PNG) decode to their header dimensions with stable pixel
    digests — real images, not synthetic fixtures."""
    expected = {
        "peanut_butter.PNG": (1370, 48, "1a36fe0b6a6a72fd4ee7fad33db08a20"),
        "prod2vec_infrastructure.PNG": (914, 633, "2fa8425d840a1d2ca30df2f765f0c769"),
        "target_context_basket_example.PNG": (926, 521, "cc2672c66ee0f662ce3456a7921694b1"),
    }
    for name, (w, h, digest) in expected.items():
        blob = open(f"{REF_IMG}/{name}", "rb").read()
        hdr = png_header(blob)
        d = decode_png(blob)
        assert (d["width"], d["height"]) == (hdr["width"], hdr["height"]) == (w, h)
        assert (d["bit_depth"], d["color_type"]) == (8, 6)
        assert d["pixel_digest"] == digest


def test_wav_decode_golden():
    """Square wave of amplitude 1000 → RMS exactly 1000; duration and
    rate from the container header."""
    d = decode_wav(make_wav([1000, -1000] * 2000))
    assert d == {
        "format": "wav", "sample_rate": 8000, "n_channels": 1,
        "bit_depth": 16, "duration_ms": 500.0, "rms": 1000.0,
    }
    # 8-bit unsigned: constant 128 is digital silence (RMS 0)
    d8 = decode_wav(make_wav([128] * 100, sample_rate=4000, sampwidth=1))
    assert (d8["rms"], d8["bit_depth"], d8["duration_ms"]) == (0.0, 8, 25.0)


def test_decode_media_dispatch():
    png = make_png(1, 1, [bytes([7, 8, 9])], (0,))
    assert decode_media("image", png)["format"] == "png"
    assert decode_media("audio", make_wav([0] * 10))["format"] == "wav"
    assert decode_media("video", b"opaque video bytes")["format"] == "raw"
    assert decode_media("image", PNG_SIG + b"truncated")["format"] == "corrupt"
    assert decode_media("audio", b"RIFF\x00\x00\x00\x00WAVEjunk")["format"] == "corrupt"


def test_feature_extraction_contract(spark):
    # spread=False: the id→text cross-check below slices a limit of
    # the raw scan — file-order-dependent by construction
    docs = read_table(spark, SF_SMOKE, "documents", spread=False).limit(50)
    media = attach_blobs(docs)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,n_bytes:int,"
        "blob_digest:string,format:string,width:int,height:int,"
        "bit_depth:int,sample_rate:int,duration_ms:double,rms:double,"
        "pixel_digest:string,feature:array<float>>"
    )
    by_id = {r["media_id"]: r for r in rows}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for mid, r in by_id.items():
        blob = src[mid].encode()
        assert r["n_bytes"] == len(blob)
        assert r["blob_digest"] == hashlib.md5(blob).hexdigest()
        assert r["format"] == "raw"  # text blobs are not PNG/WAV
        assert r["width"] is None and r["rms"] is None
        assert len(r["feature"]) == 4
        assert r["feature"][0] == float(len(blob))


def test_extract_features_decodes_real_blobs(spark):
    """End-to-end through Spark: PNG, WAV, video, and corrupt blobs in
    one DataFrame — the mapInPandas stage dispatches the real decoders
    and the typed metadata columns come back per-format."""
    rows = [bytes([10, 20, 30, 40, 50, 60]), bytes([1, 2, 3, 4, 5, 6])]
    png = make_png(2, 2, rows, (1, 4))
    wav = make_wav([500, -500] * 400, sample_rate=16000)
    data = [
        (1, "image", 2, 2, 0, bytearray(png)),
        (2, "audio", 0, 0, 50, bytearray(wav)),
        (3, "video", 0, 0, 1000, bytearray(b"\x00\x01opaque")),
        (4, "image", 9, 9, 0, bytearray(PNG_SIG + b"xx")),
    ]
    media = spark.createDataFrame(
        data, "media_id long, media_type string, width int, height int, "
        "duration_ms int, blob binary")
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    assert (out[1]["format"], out[1]["width"], out[1]["height"], out[1]["bit_depth"]) == (
        "png", 2, 2, 8)
    assert out[1]["pixel_digest"] == hashlib.md5(b"".join(rows)).hexdigest()
    assert out[1]["rms"] is None
    assert (out[2]["format"], out[2]["sample_rate"], out[2]["duration_ms"]) == (
        "wav", 16000, 50.0)
    assert out[2]["rms"] == 500.0 and out[2]["width"] is None
    assert out[3]["format"] == "raw" and out[3]["pixel_digest"] is None
    assert out[4]["format"] == "corrupt"
    for r in out.values():  # generic byte-stats features always present
        assert len(r["feature"]) == 4 and r["feature"][0] == float(r["n_bytes"])


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
    docs = read_table(spark, SF_SMOKE, "documents", spread=False).limit(30)
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

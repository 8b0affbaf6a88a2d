"""Behavioral tests for the perceptual-hash (dHash + banded Hamming)
image near-dup plane (operators/phash.py): golden hash values, the
perturbation-robustness property the hash exists for, pigeonhole
recall of the banded candidate join, and the NULL-on-undecodable
audit contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from prod2vec_spark.operators import phash as PH
from tests.test_multimodal import make_png


def _gray_png(mat: np.ndarray) -> bytes:
    """Grayscale 8-bit PNG from a (h, w) uint8 matrix (filter 0 rows)."""
    h, w = mat.shape
    rows = [bytes(mat[y]) for y in range(h)]
    return make_png(w, h, rows, filters=[0] * h, channels=1)


def _rand_img(seed: int, h: int = 24, w: int = 36) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)


# ------------------------------------------------------------- golden
def test_dhash_golden_monotone_gradient():
    # strictly increasing left->right: every horizontal gradient bit
    # set -> unsigned 2^64-1 == signed -1
    mat = np.tile(np.arange(0, 252, 7, dtype=np.uint8), (8, 1))
    assert mat.shape == (8, 36)
    assert PH.dhash64(mat.astype(np.float64)) == -1
    # strictly decreasing: no bit set
    assert PH.dhash64(mat[:, ::-1].astype(np.float64)) == 0


def test_dhash_png_matches_matrix_hash():
    mat = _rand_img(1)
    assert PH.dhash_png(_gray_png(mat)) == PH.dhash64(mat.astype(np.float64))


def test_dhash_png_rejects_non_png_and_subbyte_depth():
    assert PH.dhash_png(b"not a png at all") is None
    assert PH.dhash_png(None) is None
    # bit_depth 8 is required; 16 would also be rejected if built


# ------------------------------------------------- robustness property
def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_small_perturbation_small_distance():
    base = _rand_img(2)
    tweaked = base.copy()
    tweaked[3, 5] = min(255, int(tweaked[3, 5]) + 2)  # one pixel, +2
    d_near = _hamming(
        PH.dhash64(base.astype(np.float64)), PH.dhash64(tweaked.astype(np.float64))
    )
    d_far = _hamming(
        PH.dhash64(base.astype(np.float64)),
        PH.dhash64(_rand_img(3).astype(np.float64)),
    )
    assert d_near <= 2, f"one-pixel tweak flipped {d_near} bits"
    assert d_far > 10, f"independent images only {d_far} bits apart"


# --------------------------------------------------- Spark pipeline
def _media_df(spark, imgs: dict[int, bytes]):
    return spark.createDataFrame(
        [(i, b) for i, b in imgs.items()], "media_id long, blob binary"
    )


def test_phash_images_null_for_undecodable(spark):
    imgs = {1: _gray_png(_rand_img(4)), 2: b"\x00garbage"}
    out = {r["media_id"]: r["dhash"] for r in PH.phash_images(_media_df(spark, imgs)).collect()}
    assert out[1] is not None and out[2] is None


def test_phash_neardup_finds_planted_families(spark):
    """4 base images x 3 one-pixel variants: every within-family pair
    verified at hamming <= 3; no cross-family pair survives."""
    imgs: dict[int, bytes] = {}
    fam = {}
    mid = 0
    for f in range(4):
        base = _rand_img(10 + f)
        for v in range(3):
            m = base.copy()
            if v:
                m[v, v] = min(255, int(m[v, v]) + 1)
            imgs[mid] = _gray_png(m)
            fam[mid] = f
            mid += 1
    hashes = PH.phash_images(_media_df(spark, imgs))
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in PH.phash_neardup(hashes, max_distance=3).collect()
    }
    within = {
        (a, b)
        for a in fam
        for b in fam
        if a < b and fam[a] == fam[b]
    }
    # exact-recall check against brute force at the SAME threshold
    hs = {r["media_id"]: r["dhash"] for r in hashes.collect()}
    brute = {
        (a, b)
        for a in hs
        for b in hs
        if a < b and _hamming(hs[a], hs[b]) <= 3
    }
    assert set(pairs) == brute, "banded candidates missed a qualifying pair"
    assert within <= set(pairs), "a planted within-family pair was missed"
    assert all(fam[a] == fam[b] for a, b in pairs), "cross-family false positive"


def test_hamming_candidates_pigeonhole_recall(spark):
    """Adversarial spread: hashes exactly 3 bit-flips apart placed to
    straddle band boundaries still share one intact 16-bit slice."""
    base = 0x0123456789ABCDEF - (1 << 64) if 0x0123456789ABCDEF >= (1 << 63) else 0x0123456789ABCDEF
    flips = [0, 17, 34]  # one flip in each of bands 0,1,2 - band 3 intact
    v = base
    for b in flips:
        v ^= 1 << b
    df = spark.createDataFrame([(1, base), (2, v)], "media_id long, dhash long")
    got = PH.hamming_candidates(df).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]


def test_encode_png_gray8_roundtrip():
    from prod2vec_spark.operators.multimodal import encode_png_gray8, png_pixels

    mat = _rand_img(5, h=16, w=16)
    blob = encode_png_gray8(bytes(mat.tobytes()), 16, 16)
    pixels, hdr = png_pixels(blob)
    assert (hdr["width"], hdr["height"], hdr["channels"]) == (16, 16, 1)
    assert pixels == mat.tobytes()


def test_phash_neardup_query_recovers_planted_families(spark):
    """The rows-only catalog-superset entry: every emitted pair is
    within-family, and every within-family pair is emitted (pigeonhole
    recall at one-pixel perturbation)."""
    from prod2vec_spark.queries_r7c import q_phash_neardup
    from tests.conftest import SF_SMOKE

    rows = q_phash_neardup(spark, SF_SMOKE).collect()
    assert rows, "no near-dup pairs found for planted families"
    assert all(r["same_family"] == 1 for r in rows)
    import collections

    from prod2vec_spark.sources.io import read_table

    doc_ids = [r["doc_id"] for r in read_table(spark, SF_SMOKE, "documents").select("doc_id").collect()]
    fams = collections.Counter(d % 40 for d in doc_ids)
    expect_pairs = sum(c * (c - 1) // 2 for c in fams.values())
    assert len(rows) == expect_pairs


# ------------------------------------------------------------- audio
def _rand_pcm(seed: int, n: int = 4000) -> np.ndarray:
    return np.random.default_rng(seed).integers(-3000, 3000, size=n).astype(np.int64)


def test_ahash_gain_invariance_and_perturbation():
    s = _rand_pcm(11)
    h0 = PH.ahash64(s.astype(np.float64))
    # uniform gain: energy scales by g^2 on both sides of every
    # comparison -> identical fingerprint
    assert PH.ahash64((s * 7).astype(np.float64)) == h0
    assert PH.ahash64((s * 0.25).astype(np.float64)) == h0
    # one-sample glitch flips at most the 2 windows it touches
    t = s.copy(); t[123] += 50
    assert _hamming(h0, PH.ahash64(t.astype(np.float64))) <= 2
    # independent clip is far
    assert _hamming(h0, PH.ahash64(_rand_pcm(12).astype(np.float64))) > 10


def test_ahash_wav_decodes_and_rejects():
    from prod2vec_spark.operators.multimodal import encode_wav_pcm16

    s = _rand_pcm(13)
    blob = encode_wav_pcm16([int(x) for x in s])
    assert PH.ahash_wav(blob) == PH.ahash64(s.astype(np.float64))
    assert PH.ahash_wav(b"not riff") is None
    assert PH.ahash_wav(None) is None
    # too-short clip: no windows
    assert PH.ahash_wav(encode_wav_pcm16([1, 2, 3])) is None


def test_wav_encoder_roundtrip_and_stereo_mix():
    from prod2vec_spark.operators.multimodal import encode_wav_pcm16, wav_samples

    samples = [100, -200, 300, -400]
    blob = encode_wav_pcm16(samples, sample_rate=4000)
    got, m = wav_samples(blob)
    assert list(got) == samples and m["framerate"] == 4000
    # stereo: channel-mean mix is what ahash_wav hashes
    stereo = encode_wav_pcm16([10, 30, 20, 40, 30, 50] * 200, n_channels=2)
    mono = encode_wav_pcm16([20, 30, 40] * 200)
    assert PH.ahash_wav(stereo) == PH.ahash_wav(mono)


def test_phash_audio_neardup_planted_families(spark):
    from prod2vec_spark.operators.multimodal import encode_wav_pcm16

    imgs: dict[int, bytes] = {}
    fam = {}
    mid = 0
    for f in range(3):
        base = _rand_pcm(20 + f)
        for v in range(3):
            s = base.copy()
            if v:
                s[v * 7] += 40  # one-sample glitch
            imgs[mid] = encode_wav_pcm16([int(x) for x in s])
            fam[mid] = f
            mid += 1
    hashes = PH.phash_audio(_media_df(spark, imgs))
    pairs = PH.phash_neardup(hashes, hash_col="ahash", max_distance=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    within = {(a, b) for a in fam for b in fam if a < b and fam[a] == fam[b]}
    assert within <= got
    assert all(fam[a] == fam[b] for a, b in got)


def test_audio_neardup_query_recovers_planted_families(spark):
    from prod2vec_spark.queries_r7c import q_audio_neardup
    from tests.conftest import SF_SMOKE

    rows = q_audio_neardup(spark, SF_SMOKE).collect()
    assert rows, "no audio near-dup pairs found"
    assert all(r["same_family"] == 1 for r in rows)


def test_composite_id_rejects_negative_and_overflow_ids(spark):
    """ADVICE r13 (medium): SQL `div` truncates toward zero, so a
    negative clip id's idx>0 composites would decompose to id+1 and
    same-clip frame pairs slip past the ca != cb filter; |id| beyond
    2^63/BASE silently overflows the multiply.  Both must raise LOUDLY
    at composite-id construction."""
    from pyspark.sql import functions as F

    from prod2vec_spark.operators.phash import _FRAME_ID_BASE, _composite_id

    ok = spark.createDataFrame([(42, 7)], "media_id long, frame_idx int")
    got = ok.select(
        _composite_id("media_id", F.col("frame_idx"), _FRAME_ID_BASE).alias("fid")
    ).collect()
    assert got[0]["fid"] == 42 * _FRAME_ID_BASE + 7

    for bad_id in (-5, (1 << 63) // _FRAME_ID_BASE):
        bad = spark.createDataFrame(
            [(bad_id, 1)], "media_id long, frame_idx int"
        )
        with pytest.raises(Exception, match="composite-id owner out of range"):
            bad.select(
                _composite_id(
                    "media_id", F.col("frame_idx"), _FRAME_ID_BASE
                ).alias("fid")
            ).collect()


def test_phash_pair_fixture_goldens_match_codecs():
    """Fixture-split honesty lock (round 15): the persisted dhash /
    ahash goldens in tests/fixtures/phash_pairs_*.parquet must equal
    the REAL codec chain's output over the persisted blobs — codec
    drift must fail here, not hide behind a stale fixture."""
    import os

    import pyarrow.parquet as pq

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures")
    img = pq.read_table(os.path.join(fixdir, "phash_pairs_images.parquet"))
    for blob, want in zip(img["blob"].to_pylist(), img["dhash"].to_pylist()):
        assert PH.dhash_png(blob) == want
    wav = pq.read_table(os.path.join(fixdir, "phash_pairs_audio.parquet"))
    for blob, want in zip(wav["blob"].to_pylist(), wav["ahash"].to_pylist()):
        assert PH.ahash_wav(blob) == want
    wp = pq.read_table(os.path.join(fixdir, "phash_pairs_webp.parquet"))
    for blob, want in zip(wp["blob"].to_pylist(), wp["dhash"].to_pylist()):
        assert PH.dhash_webp(blob) == want

"""Generate tests/fixtures/resample_goldens.parquet — golden digests
for the round-15 `audio_resample` operator's oracled superset entry
(`resample_audit`), the thumb_goldens protocol on the audio side: for
every blob in the planted phash_pairs_audio corpus, persist
(media_id, res_md5, src_rate, src_samples) where res_md5 is the md5
of the 16 kHz PCM16 WAV the operator itself produces.  The Spark
entry RECOMPUTES the resample from the raw blobs (decode → linear
grid → int16 re-encode); the DuckDB twin reads the goldens — drift
anywhere in the decode door, the interpolation grid, the rounding
rule, or the WAV writer fails the driver-style hash compare, and
tests/test_multimodal_resample.py re-runs the chain against the
fixture (the honesty lock).

Rerun: python tools/gen_resample_golden_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
)
TARGET_RATE = 16000


def golden_row(media_id: int, blob: bytes):
    import numpy as np

    from prod2vec_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_samples,
    )

    samples, meta = wav_samples(blob)
    a = np.asarray(samples, dtype=np.float64)
    nch = meta.get("n_channels", 1) or 1
    if nch > 1:
        a = a[: len(a) - len(a) % nch].reshape(-1, nch).mean(axis=1)
    src_rate = int(meta["framerate"])
    n_out = max(1, int(round(a.size * TARGET_RATE / src_rate)))
    pos = np.clip(
        np.arange(n_out, dtype=np.float64) * (src_rate / float(TARGET_RATE)),
        0.0,
        a.size - 1.0,
    )
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, a.size - 1)
    frac = pos - lo
    out = a[lo] * (1.0 - frac) + a[hi] * frac
    q = np.clip(
        np.sign(out) * np.floor(np.abs(out) + 0.5), -32768, 32767
    ).astype(np.int64)
    wav = bytes(
        encode_wav_pcm16([int(x) for x in q], sample_rate=TARGET_RATE)
    )
    return (
        media_id,
        hashlib.md5(wav).hexdigest(),
        src_rate,
        int(a.size),
    )


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(os.path.join(FIXDIR, "phash_pairs_audio.parquet"))
    rows = [
        golden_row(m, b)
        for m, b in zip(src["media_id"].to_pylist(), src["blob"].to_pylist())
    ]
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array([r[0] for r in rows], pa.int64()),
                "res_md5": pa.array([r[1] for r in rows], pa.string()),
                "src_rate": pa.array([r[2] for r in rows], pa.int32()),
                "src_samples": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        os.path.join(FIXDIR, "resample_goldens.parquet"),
    )
    print(f"wrote {len(rows)} golden rows")


if __name__ == "__main__":
    main()

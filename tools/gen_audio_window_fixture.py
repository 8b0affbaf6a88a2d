"""Regenerate tests/fixtures/audio_windows.parquet — the persisted
per-window hash table behind the `audio_span_audit` superset entry
(round 13: the image-plane split of VERDICT r9 ask #2, audio
edition — codec boundary pytest-golden, query half DuckDB-oracled).

One WAV per doc_id in [0, 5000) (covering every driver scale factor;
sf0.1's documents table tops out at doc_id 4999), windows computed
through the REAL codec chain (planted_audio render → PCM/ADPCM encode
→ audio_mono decode → window_rows_py energy-gradient hash).  Pure
Python (multiprocessing over the ADPCM encode loop), no Spark session.

    python tools/gen_audio_window_fixture.py

tests/test_audio_span.py::test_audio_window_fixture_matches_codec_chain
re-derives a stratified sample through the same chain and fails on any
drift, so the fixture can never silently diverge from the codec.
"""

from __future__ import annotations

import os
import sys
from multiprocessing import Pool

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DOCS = 5000
OUT = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "audio_windows.parquet"
)


def _rows(doc_id: int):
    from prod2vec_spark.queries_r13 import window_hash_rows

    return window_hash_rows(doc_id)


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    with Pool() as pool:
        per_doc = pool.map(_rows, range(N_DOCS), chunksize=50)
    rows = [r for doc in per_doc for r in doc]
    assert rows, "codec chain produced no windows"
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "win_idx": pa.array([r[1] for r in rows], type=pa.int32()),
            "whash": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {len(rows)} window rows ({N_DOCS} clips) -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()

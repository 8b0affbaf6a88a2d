"""Generate tests/fixtures/compress_goldens.parquet — zlib golden
lengths that upgrade `compression_profile` from rows-only to fully
oracled (round 15; the media_format_audit golden-column protocol,
adapted for VALUES DERIVED FROM THE INPUT TABLE rather than planted
blobs: testdata texts differ per scale factor, so goldens key on
md5(text) instead of doc_id and cover every sf dir).

One row per distinct text across /root/testdata/sf{0.001,0.01,0.1}:
(text_md5, raw_len, comp_len) where comp_len = len(zlib.compress(
utf8, level 6)) — the EXACT computation functions/compress.py's
Arrow-batched UDF runs.  The Spark entry keeps computing zlib LIVE
(the codec plane stays exercised); the DuckDB twin joins md5(text)
to the goldens and replays the ratio arithmetic + threshold — codec
drift (level change, encoding change) fails the driver-style hash
compare, and tests/test_llm_ops_r7b.py re-runs zlib over the actual
testdata texts and asserts bit-equality with the persisted goldens
(the honesty lock).

Deterministic given the testdata.  Rerun:
python tools/gen_compress_golden_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)
ZLIB_LEVEL = 6
FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "compress_goldens.parquet",
)


def main() -> None:
    rows: dict[str, tuple[int, int]] = {}
    for d in SF_DIRS:
        t = pq.read_table(os.path.join(d, "documents.parquet"), columns=["text"])
        for text in t["text"].to_pylist():
            if text is None:
                continue
            raw = text.encode("utf-8")
            h = hashlib.md5(text.encode("utf-8")).hexdigest()
            if h not in rows:
                comp = len(zlib.compress(raw, ZLIB_LEVEL)) if raw else None
                rows[h] = (len(raw), comp if raw else 0)
    keys = sorted(rows)
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(keys, pa.string()),
                "raw_len": pa.array([rows[k][0] for k in keys], pa.int64()),
                "comp_len": pa.array([rows[k][1] for k in keys], pa.int64()),
            }
        ),
        FIXTURE,
    )
    print(f"wrote {len(keys)} golden rows to {FIXTURE}")


if __name__ == "__main__":
    main()

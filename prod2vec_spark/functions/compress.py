"""Compression-ratio text signal (ENGINE scope): the entropy proxy
web-corpus pipelines use to catch machine-generated / template /
low-entropy text that token-level repetition features miss —
zlib(deflate) bytes-out over bytes-in; highly repetitive documents
compress far below natural prose.

Policy note (SURVEY §2.12): zlib is a CODEC boundary — exactly the
case the engine's no-Python-in-the-hot-path rule reserves for
Arrow-batched pandas_udfs (same class as the multimodal decoders).
The UDF is scalar, vectorized per Arrow batch, deterministic (fixed
zlib level), and its semantics are pinned against the stdlib
reference in pytest.  No SQL engine ships zlib, but since round 15
the superset entry is FULLY ORACLED anyway via the golden-column
protocol: tools/gen_compress_golden_fixture.py persists per-text
compressed lengths, the DuckDB twin replays the ratio arithmetic
over them, and a pytest locks the goldens to live zlib.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

ZLIB_LEVEL = 6


@pandas_udf("double")
def _compression_ratio(texts: pd.Series) -> pd.Series:
    import zlib

    def ratio(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, ZLIB_LEVEL)) / len(raw)

    return texts.map(ratio)


def compression_ratio(text: Column) -> Column:
    """compressed_bytes / raw_bytes in (0, ~1.1]; empty text → 1.0,
    null → null.  Lower = more repetitive."""
    return _compression_ratio(text)

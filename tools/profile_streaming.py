"""Per-phase wall-clock attribution for the __streaming_corpus__ macro
(optimization round 17, guide §1.1 'empirical first'): replicates
bench._streaming_corpus step by step with timestamps so the macro's
15-16 s is attributed to landing-write / per-stream startup+drain /
final batch reads instead of guessed at.

Run:  SPARK_GRAFT_CPUS=32 python tools/profile_streaming.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from prod2vec_spark.session import get_spark
    from prod2vec_spark.sources.io import read_table
    from prod2vec_spark.streaming.pipeline import (
        StreamCorpusConfig,
        StreamingCorpusPipeline,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm JVM

    marks: list[tuple[str, float]] = []

    def mark(name: str, t0: float) -> None:
        dt = time.perf_counter() - t0
        marks.append((name, dt))
        print(f"{name:28s} {dt:7.3f}s", flush=True)

    for run_i in range(int(os.environ.get("PROFILE_RUNS", "2"))):
        print(f"--- run {run_i} ---")
        work = tempfile.mkdtemp(prefix="profile_streaming_")
        try:
            t0 = time.perf_counter()
            landing = f"{work}/landing"
            (
                read_table(spark, sf_dir, "documents", spread=False)
                .select("doc_id", "text", "lang")
                .coalesce(4)
                .write.parquet(landing)
            )
            mark("landing_write", t0)
            cfg = StreamCorpusConfig(
                landing_dir=landing,
                work_dir=f"{work}/w",
                line_filter=True,
                token_stats=True,
            )
            pipe = StreamingCorpusPipeline(spark, cfg)

            t0 = time.perf_counter()
            pipe.exact_stage()
            mark("exact_stage", t0)

            t0 = time.perf_counter()
            q_ts = pipe._start_token_stats()
            mark("token_stats_start", t0)
            t0 = time.perf_counter()
            q_nd = pipe._start_neardup()
            mark("neardup_start", t0)
            t0 = time.perf_counter()
            q_ts.awaitTermination()
            mark("token_stats_await", t0)
            t0 = time.perf_counter()
            q_nd.awaitTermination()
            mark("neardup_await", t0)

            t0 = time.perf_counter()
            n_curated = pipe.curated().count()
            mark("curated_count", t0)
            t0 = time.perf_counter()
            n_docs, n_tokens = pipe.token_stats()
            mark("token_stats_read", t0)
            print(f"n_curated={n_curated} n_docs={n_docs} n_tokens={n_tokens}")
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

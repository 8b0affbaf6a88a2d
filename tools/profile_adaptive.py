"""Profile the adaptive_block stage's internal actions at sf0.1 —
attribution for OPTIMIZATION_r16 (same config as __curation_all__'s
scrub chain, run in isolation in a fresh JVM)."""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from prod2vec_spark.pipeline_llm import CorpusConfig, CorpusCurationPipeline  # noqa: E402
from prod2vec_spark.session import get_spark  # noqa: E402
from prod2vec_spark.sources.io import write_parquet  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-adaptive")
spark.sparkContext.setLogLevel("ERROR")
spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

work = tempfile.mkdtemp(prefix="prof_adaptive_")
try:
    pipe = CorpusCurationPipeline(
        spark,
        CorpusConfig(
            sf_dir=sf_dir,
            work_dir=work,
            normalize=True,
            badwords_cats={"latency": ("slow",), "scale": ("big big",)},
            badwords_max_frac=0.2,
            scrub_cc=True,
            line_filter=True,
            adaptive_block_k=1,
            adaptive_min_count=100,
        ),
    )

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{label}: {time.perf_counter()-t0:.2f}s", flush=True)
        return out

    docs = pipe.scrubbed_input()
    t("scrub+write adaptive_input", lambda: write_parquet(docs, f"{work}/adaptive_input"))
    staged = spark.read.parquet(f"{work}/adaptive_input")

    from prod2vec_spark.operators.repetition import corpus_ngram_hotspots

    hot = corpus_ngram_hotspots(staged, n=3, min_count=100, k=1)
    t("mine (hotspots) + write", lambda: write_parquet(hot, f"{work}/adaptive_blocklist"))

    from prod2vec_spark.operators.linefilters import adaptive_boilerplate_filter

    rep = adaptive_boilerplate_filter(
        staged, gram_n=3, top_k=1, min_count=100, mode="window", width=10,
        hotspots=spark.read.parquet(f"{work}/adaptive_blocklist"),
    )
    out = (
        rep.where((F.col("n_lines") == 0) | (F.col("n_kept") > 0))
        .withColumn(
            "text",
            F.when(F.col("n_lines") == 0, F.col("text")).otherwise(F.col("kept_text")),
        )
        .drop("hot_grams", "n_lines", "n_kept", "kept_text")
    )
    t("cut + write adaptive_blocked", lambda: write_parquet(out, f"{work}/adaptive_blocked"))
finally:
    shutil.rmtree(work, ignore_errors=True)
spark.stop()

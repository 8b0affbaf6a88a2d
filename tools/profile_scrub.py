"""Attribute the fused scrub chain's per-operator cost at sf0.1:
time a noop write of each incremental composition (best of 3, warm)."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from prod2vec_spark.operators.badwords import badwords_screen  # noqa: E402
from prod2vec_spark.operators.linefilters import apply_line_filter  # noqa: E402
from prod2vec_spark.operators.pii import scrub, scrub_cc  # noqa: E402
from prod2vec_spark.operators.text import normalize_text  # noqa: E402
from prod2vec_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("profile-scrub")
spark.sparkContext.setLogLevel("ERROR")
docs0 = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs0.count()


def bench(label, df):
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
    print(f"{label}: best {min(times):.2f}s  runs {[round(x,2) for x in times]}", flush=True)


base = docs0
bench("0 raw scan", base)
n = base.withColumn("text", normalize_text(F.col("text")))
bench("1 +normalize", n)
lf = apply_line_filter(n, mode="window", width=10)
bench("2 +line_filter", lf)
bw = badwords_screen(lf, cats={"latency": ("slow",), "scale": ("big big",)},
                     lang_lists=None, max_frac=0.2, default_lang=None)
bench("3 +badwords", bw)
p = bw.withColumn("text", scrub(F.col("text")))
bench("4 +pii", p)
pc = p.withColumn("text", scrub_cc(F.col("text")))
bench("5 +scrub_cc", pc)
spark.stop()

"""Per-query oracle verification (driver_sim.py's t2 gate, filtered):

    python tools/verify_queries.py <query> [query ...]

Runs only the named catalog queries against their DuckDB oracles at
sf0.01 — the fast inner loop for optimization work (full driver_sim
for the final gate).
"""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from prod2vec_spark.session import get_spark  # noqa: E402

spark = get_spark(cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

queries = mod.queries()
oracles = mod.oracle_sql()
fail = 0
for name in sys.argv[1:]:
    t0 = time.time()
    try:
        spdf = queries[name](spark, SF_DIR).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        scols, ocols = sorted(spdf.columns), sorted(odf.columns)
        if scols != ocols:
            raise AssertionError(f"schema: spark {scols} vs oracle {ocols}")
        if len(spdf) != len(odf):
            raise AssertionError(f"rows: spark {len(spdf)} vs oracle {len(odf)}")
        a = spdf[scols].sort_values(by=scols).reset_index(drop=True)
        b = odf[scols].sort_values(by=scols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
        )
        print(f"{name}: PASS {len(spdf)} rows {time.time() - t0:.2f}s", flush=True)
    except Exception as e:
        fail += 1
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
sys.exit(1 if fail else 0)

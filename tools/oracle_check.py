"""Targeted oracle parity check: tools/oracle_check.py q1,q2,...

Same t2 gate as driver_sim.py but for a named subset — used for quick
validation after touching one operator without re-running all 50.
"""
import importlib.util
import sys
import time

sys.path.insert(0, "/root/repo")
import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from prod2vec_spark.session import get_spark  # noqa: E402

spark = get_spark(cpus=8, shuffle_partitions=8)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

# the full registry covers both the driver catalog and superset entries
from prod2vec_spark import queries as qmod  # noqa: E402

sup_q = dict(qmod.ALL_QUERIES)
sup_o = dict(qmod.ALL_ORACLES)
queries = mod.queries()
oracles = mod.oracle_sql()

names = sys.argv[1].split(",")
fail = 0
for name in names:
    fn = queries.get(name) or sup_q.get(name)
    sql = oracles.get(name) or sup_o.get(name)
    if fn is None:
        print(f"{name}: NOT FOUND in catalog or superset", flush=True)
        fail += 1
        continue
    t0 = time.time()
    try:
        spdf = fn(spark, SF_DIR).toPandas()
        if sql is None:
            print(f"{name}: rows_only {len(spdf)}", flush=True)
            continue
        odf = con.execute(sql).fetchdf()
        scols, ocols = sorted(spdf.columns), sorted(odf.columns)
        assert scols == ocols, f"schema mismatch: {scols} vs {ocols}"
        assert len(spdf) == len(odf), f"rows: spark {len(spdf)} vs oracle {len(odf)}"
        a = spdf[scols].sort_values(by=scols).reset_index(drop=True)
        b = odf[scols].sort_values(by=scols).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
        )
        print(f"{name}: PASS {len(spdf)} rows {time.time()-t0:.2f}s", flush=True)
    except Exception as e:
        fail += 1
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
print(f"done: {len(names)-fail}/{len(names)} pass", flush=True)
sys.exit(1 if fail else 0)

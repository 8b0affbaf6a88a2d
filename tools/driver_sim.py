"""Driver simulation per verify skill: t1 smoke + t2 oracle gate at sf0.01."""
import importlib.util, json, sys, time
sys.path.insert(0, "/root/repo")
import duckdb, pandas as pd

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from prod2vec_spark.session import get_spark  # noqa: E402
spark = get_spark(cpus=8, shuffle_partitions=8)

# t1 smoke
df = mod.entry(spark)
n = df.count()
print(f"t1 smoke: entry() -> {n} rows, schema {[f.name for f in df.schema.fields]}", flush=True)
assert n >= 0

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

queries = mod.queries()
oracles = mod.oracle_sql()
results = {}
fail = 0
for name, fn in queries.items():
    t0 = time.time()
    try:
        sdf = fn(spark, SF_DIR)
        spdf = sdf.toPandas()
        if name not in oracles:
            results[name] = {"status": "rows_only", "rows": len(spdf)}
            print(f"{name}: rows_only {len(spdf)}", flush=True)
            continue
        odf = con.execute(oracles[name]).fetchdf()
        scols, ocols = sorted(spdf.columns), sorted(odf.columns)
        if scols != ocols:
            raise AssertionError(f"schema mismatch: spark {scols} vs oracle {ocols}")
        if len(spdf) != len(odf):
            raise AssertionError(f"rowcount mismatch: spark {len(spdf)} vs oracle {len(odf)}")
        a = spdf[scols].sort_values(by=scols).reset_index(drop=True)
        b = odf[scols].sort_values(by=scols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9)
        results[name] = {"status": "pass", "rows": len(spdf), "sec": round(time.time() - t0, 2)}
        print(f"{name}: PASS {len(spdf)} rows {results[name]['sec']}s", flush=True)
    except Exception as e:
        fail += 1
        results[name] = {"status": "FAIL", "err": str(e)[:400]}
        print(f"{name}: FAIL {str(e)[:400]}", flush=True)

npass = sum(1 for r in results.values() if r["status"] == "pass")
print(json.dumps({"total": len(results), "pass": npass,
                  "rows_only": sum(1 for r in results.values() if r['status']=='rows_only'),
                  "fail": fail}), flush=True)
sys.exit(1 if fail else 0)

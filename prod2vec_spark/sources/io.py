"""Sources & sinks (SURVEY.md §2.1, S1-S7).

The reference reads CSV from S3 into pandas
(/root/reference/utils/util_functions.py:5-27) and persists pickles
(data_prep.py:204-234).  The engine's data plane is parquet end-to-end:
columnar, splittable, predicate-pushdown-able — the only sane choice at
100 TB.  CSV scan/sink are kept for the reference's CSV surface (S1/S4).

Parquet is self-describing, so scans don't force a schema — Catalyst
still prunes columns and pushes filters into the reader.  The *expected*
schemas live in ``TABLES`` and feed the data-quality gates (Q3/Q4,
operators/quality.py) rather than the reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Expected logical schemas for the driver testdata (FIXTURES.md §2).
# Used by quality gates; parquet supplies physical schemas at scan time.
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def expected_schema(name: str) -> T.StructType:
    return TABLES[name]


def spread_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor before expensive per-row work
    (optimization guide §2.5, input skew: "repartition immediately
    after the read").

    A parquet table written as ONE row group yields one scan task no
    matter how many cores the session has — Spark can only split scans
    at row-group boundaries — so every tokenizer/codec/HOF/n-gram
    chain above it runs serially until the first shuffle.  This helper
    round-robin-repartitions to the session's default parallelism ONLY
    when the scan has fewer partitions than that floor: on a real
    multi-file table (100 TB: thousands of splits) the condition is
    false and the function is an exact no-op — no extra exchange ever
    ships at scale.  The floor derives from the session's core count,
    never a constant, so the driver's lower-core bench runs keep their
    scaling measurement.

    Only worth applying where per-row compute dominates the one-time
    cost of shuffling the rows once (text/codec/vector operators) —
    a plain relational aggregate's map-side partial agg is cheaper
    than the repartition write, so those scans are left alone."""
    spark = df.sparkSession
    n = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


# Tables whose consumers are uniformly compute-heavy per row (text
# tokenization / HOF chains on ``documents``, per-row vector math on
# ``embeddings``) — the two corpus-class tables.  Relational tables
# (lineitem/orders/events/dims) keep their raw scans: their consumers
# are partial-agg-before-shuffle shapes where a blanket repartition
# would pay a full-width shuffle write on the single scan task for no
# downstream win.
_SPREAD_TABLES = frozenset({"documents", "embeddings"})


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | None = None
) -> DataFrame:
    """S1-class scan: one logical table from the testdata directory.

    The events table carries TIMESTAMP(NANOS) parquet, which Spark 4
    refuses by default — enable the nanos-as-long escape hatch
    defensively (harmless otherwise) and convert ns → microsecond
    TimestampType with integer division (no double rounding).

    ``spread`` (default: on for the corpus-class tables, see
    ``_SPREAD_TABLES``) applies the scale-adaptive parallelism floor
    of ``spread_scan`` so compute-heavy consumers never serialize on a
    single-row-group local file; pass ``spread=False`` to pin the raw
    scan partitioning."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if spread is None:
        spread = name in _SPREAD_TABLES
    if spread:
        df = spread_scan(df)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
) -> DataFrame:
    """CSV scan (reference S1, util_functions.py:5-27).

    Explicit schema preferred — inferSchema double-scans the input,
    which is unacceptable at scale.
    """
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Replaces the reference's pickle sink (S2, data_prep.py:204-234)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink (S4, post_process.py:102-103). ``single_file`` mirrors the
    reference's one-file pandas ``to_csv`` — only for small results."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed-table sink (ENGINE scope; SURVEY.md §4.3
    shuffle-minimization): pay the partitioning ONCE at write time so
    every later join/aggregate on the bucket key is exchange-free —
    the standard way to co-locate a fact table that is joined on the
    same key by many downstream queries (at 100 TB, re-shuffling the
    fact per query is the dominant cost).  ``sort_col`` additionally
    sorts within buckets, letting sort-merge joins skip their sort.

    tests/test_plans.py locks the zero-Exchange join plan."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_json(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source (ENGINE scope: the interchange format of most
    LLM-corpus drops).  Explicit schema strongly preferred — inference
    double-scans, and a 100 TB json read without a schema also silently
    widens mixed-type fields."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_json(df: DataFrame, path: str) -> None:
    """JSON-lines sink (ENGINE scope)."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (ENGINE scope): the other columnar interchange format
    a Spark shop encounters (Hive-era warehouses).  Same pushdown /
    pruning behavior as parquet — Catalyst treats both as v2
    file scans with PushedFilters."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """ORC sink (ENGINE scope)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Raw-text source (ENGINE scope): one row per line, single
    ``value`` column — the ingest shape of unstructured corpus drops
    before parsing/scoring assigns structure."""
    return spark.read.text(path)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every registry table as a temp view so users can run
    ad-hoc ``spark.sql`` over the same data the DataFrame catalog
    reads — the SQL entry point of the engine.  Views are lazy
    (metadata only); Catalyst plans SQL over them identically to the
    DataFrame API."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return list(TABLES)


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[str]:
    """SQL surface for the catalog: register driver-catalog queries as
    temp views named ``q_<catalog_name>``, so users can
    ``spark.sql("SELECT * FROM q_vocab")`` any operator the engine
    ships.  Most entries are pure plan definitions (nothing executes
    until queried, and Catalyst optimizes straight through them — a
    filter composed on top in SQL pushes into the underlying parquet
    scan exactly as in the DataFrame form).  The ML-backed audits
    (word2vec_neighbors, kmeans_audit) and the checkpointing audits
    (ann_recall, minhash_jaccard_audit) do their model fit /
    materialization at DEFINITION time — pass ``names`` to register a
    subset when that cost is unwanted.  ``names`` may reference ANY
    superset query (including entries retired from the driver
    catalog); the default registers exactly the driver catalog."""
    from prod2vec_spark.queries import ALL_QUERIES, QUERIES

    todo = list(QUERIES) if names is None else names
    out = []
    for name in todo:
        ALL_QUERIES[name](spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        out.append(f"q_{name}")
    return out


def file_audit(
    spark: SparkSession, path: str, small_bytes: int = 32 * 1024 * 1024
) -> DataFrame:
    """Small-files / layout audit for a parquet dataset — the ops
    check that decides when a 100 TB table needs compaction (many
    small files tank scan throughput: per-file open cost, starved
    vectorized readers, metadata pressure).  One metadata-only pass:
    row counts come from ``input_file_name()`` grouped per file (scan
    of the count-pushdown columns only), byte sizes from the Hadoop
    FileSystem listing (driver-side, no data read).

    Returns one row per file: (file, rows, bytes, is_small 0/1), plus
    the dataset-level verdict is a trivial agg for the caller.
    ENGINE scope — the reference has no storage-ops surface."""
    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("rows"))
    )
    # driver-side listing via the JVM Hadoop FS (works for file://,
    # hdfs://, s3a:// alike); parquet data files only
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    sizes = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        f = st.getPath().toString()
        if f.endswith(".parquet"):
            sizes.append((f, int(st.getLen())))
    sizes_df = spark.createDataFrame(sizes, "file string, bytes long")
    # input_file_name() URIs ("file:///x") and Hadoop Path.toString
    # ("file:/x") differ in slash count — normalize both to a bare
    # path before joining
    norm = lambda c: F.regexp_replace(c, "^[a-z0-9.+-]+:/+", "/")  # noqa: E731
    rows = rows.withColumn("file", norm(F.col("file")))
    sizes_df = sizes_df.withColumn("file", norm(F.col("file")))
    return (
        rows.join(F.broadcast(sizes_df), "file")
        .select(
            "file",
            "rows",
            "bytes",
            (F.col("bytes") < small_bytes).cast("long").alias("is_small"),
        )
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Compaction companion to ``file_audit``: rewrite a fragmented
    parquet dataset into ~target-sized files.  File count derives
    from the CURRENT total byte size (driver-side listing — no data
    read for the estimate), then one shuffle-free coalesce() when
    shrinking.  Writes to ``out_path`` (never in place — the caller
    swaps directories after validating, the same
    write-then-commit discipline as the streaming sinks).  Returns
    the target file count."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    total = 0
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().toString().endswith(".parquet"):
            total += int(st.getLen())
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    # coalesce, not repartition: compaction must not pay a shuffle —
    # it only narrows the file count (if n_files exceeds the current
    # partitioning, coalesce is a no-op and the write keeps them)
    df.coalesce(n_files).write.mode("overwrite").parquet(out_path)
    return n_files

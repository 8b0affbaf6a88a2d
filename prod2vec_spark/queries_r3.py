"""Round-3 catalog queries: date/time + JSON pass-through surface
(SURVEY §2.8 "exposed pass-through"), semi/anti joins, pivot, cube,
exact percentiles, window frames, stratified sampling, and a TF-IDF
document-frequency pipeline (LLM-data-pipeline feature extraction).

Every entry follows the catalog conventions (queries.py header):
aliased columns on both sides, decimal-staged sums, md5-derived
pseudo-randomness so the DuckDB oracle replays the identical stream.

Scale notes (100 TB design point):
  * the semi/anti joins keep the filter side small and broadcast it —
    the fact side never shuffles;
  * pivot uses an explicit value list (no distinct-scan planning pass)
    and is a single partial+final hash agg;
  * the stratified sample is a per-key window top-n — one shuffle on
    the stratum key, no global sort;
  * TF-IDF's document-frequency table aggregates (doc, term) pairs
    already deduped inside the row (array_distinct before explode), so
    the shuffle carries at most |vocab| x |docs| distinct pairs, not
    raw token occurrences.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from prod2vec_spark.sources.io import read_table


def _t(spark, sf_dir, name):
    return read_table(spark, sf_dir, name)


def _dec(c, p=18, s=2):
    return F.col(c).cast(f"decimal({p},{s})")


# ------------------------------------------------------------ JSON (F-ext)
def q_events_json(spark, sf_dir):
    """JSON extraction on the events.props column: get_json_object
    stays JVM-side (Jackson path eval, codegen-friendly) — never a
    Python UDF.  Reference has no JSON plane; SURVEY §2.8 names this
    pass-through."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type,
       count(*) AS n_events,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


# --------------------------------------------------- tumbling window (F-ext)
def q_events_window(spark, sf_dir):
    """Epoch-aligned 6-hour tumbling window aggregation — the batch
    form of the Structured-Streaming windowed agg (streaming/events.py
    uses the same F.window).  One shuffle on (window, event_type)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# 6-hour buckets align to midnight, so day-trunc + floor(hour/6)*6 is
# exactly Spark's epoch-aligned window start, timezone-free.
SQL_EVENTS_WINDOW = """
SELECT date_trunc('day', ts) + INTERVAL (CAST(floor(hour(ts) / 6) * 6 AS INT)) HOUR
         AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------- sliding window (F-ext)
def q_events_sliding(spark, sf_dir):
    """Overlapping 6-hour windows sliding every 3 hours: each event
    lands in exactly size/slide = 2 windows.  Spark plans this as one
    Expand (2x map-side, same machinery as cube) + one hash agg — the
    overlap never re-reads the source."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


# an event at ts belongs to the windows starting at floor_3h(ts) and
# floor_3h(ts) - 3h (both epoch-aligned); unnest replays Spark's Expand
SQL_EVENTS_SLIDING = """
WITH s AS (
  SELECT event_type,
         date_trunc('day', ts)
           + INTERVAL (CAST(floor(hour(ts) / 3) * 3 AS INT)) HOUR AS s0
  FROM events)
SELECT ws AS window_start, event_type, count(*) AS n_events
FROM (SELECT event_type, unnest([s0, s0 - INTERVAL 3 HOUR]) AS ws FROM s)
GROUP BY 1, 2
"""


# ------------------------------------------------------------- semi join (J)
def q_semi_parts(spark, sf_dir):
    """Left-semi join: parts that ship in any high-quantity line item.
    The filtered fact side collapses to distinct keys and broadcasts —
    at 100 TB the part scan never shuffles (plan-locked in
    tests/test_plans.py)."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= 48)
    return part.join(
        F.broadcast(li.select(F.col("l_partkey").alias("p_partkey")).distinct()),
        "p_partkey",
        "left_semi",
    ).select("p_partkey", "p_name", "p_retailprice")


SQL_SEMI_PARTS = """
SELECT p_partkey, p_name, p_retailprice FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 48)
"""


# ------------------------------------------------------------- anti join (J)
def q_anti_customers(spark, sf_dir):
    """Left-anti join: customers with no urgent orders — the blocklist /
    contamination-exclusion shape of an LLM data pipeline (drop every
    document whose key appears in the exclusion set).  The key set is
    filtered, distinct-collapsed and broadcast."""
    cust = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return cust.join(F.broadcast(urgent), "c_custkey", "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


SQL_ANTI_CUSTOMERS = """
SELECT c_custkey, c_name, c_nationkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


# ----------------------------------------------------------------- pivot (A)
PIVOT_STATUSES = ["F", "O", "P"]


def q_pivot_status(spark, sf_dir):
    """Pivot with an explicit value list (no extra distinct-scan job to
    discover pivot values — at scale that pre-pass is a full shuffle).
    Single partial+final hash agg; sums staged as decimal."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", PIVOT_STATUSES)
        .agg(F.sum(_dec("o_totalprice")).cast("double"))
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "P"
FROM orders GROUP BY o_orderpriority
"""


# ------------------------------------------------------------------ cube (A)
def q_cube_pricing(spark, sf_dir):
    """CUBE over (returnflag, linestatus) with grouping_id — the
    grouping-sets plane SURVEY §2.4 notes Spark provides natively.
    Cube is one Expand (4x rows map-side) + one hash agg shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


SQL_CUBE_PRICING = """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag, l_linestatus) AS INT) AS gid,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------- percentiles (A)
def q_order_percentiles(spark, sf_dir):
    """Exact linear-interpolation percentiles per priority class
    (Spark `percentile` == DuckDB `quantile_cont`, both index
    p*(n-1)).  At 100 TB the exact form becomes approx_percentile
    (t-digest) — same call shape, documented error bound, mirroring
    the A3 exact/approx pair."""
    orders = _t(spark, sf_dir, "orders")
    pct = lambda p: F.round(  # noqa: E731
        F.percentile("o_totalprice", F.lit(p)), 4
    )
    return orders.groupBy("o_orderpriority").agg(
        pct(0.25).alias("p25"),
        pct(0.50).alias("p50"),
        pct(0.75).alias("p75"),
    )


SQL_ORDER_PERCENTILES = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
FROM orders GROUP BY o_orderpriority
"""


# ------------------------------------------------------ window frames (W-ext)
def q_running_revenue(spark, sf_dir):
    """Running per-customer revenue — explicit ROWS frame (SURVEY §2.5
    notes frames are available natively; this makes them a checked
    catalog capability).  One shuffle on o_custkey; the frame sum is a
    single sort-based window pass, no self-join."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


SQL_RUNNING_REVENUE = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
"""


# ------------------------------------------------- stratified sample (F-ext)
STRATUM_N = 20


def q_stratified_sample(spark, sf_dir):
    """Seeded stratified sample: top-N per event_type by md5 order —
    the per-stratum analogue of validation_sample (E-F13).  A per-key
    window top-n: one shuffle on the stratum key, no global sort, and
    the md5 key replays identically in the oracle."""
    ev = _t(spark, sf_dir, "events")
    key = F.md5(F.concat_ws("|", F.col("event_id").cast("string"), F.lit("42")))
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= STRATUM_N)
    )


SQL_STRATIFIED_SAMPLE = f"""
SELECT event_id, event_type, rn FROM (
  SELECT event_id, event_type,
         CAST(row_number() OVER (
             PARTITION BY event_type
             ORDER BY md5(CAST(event_id AS VARCHAR) || '|' || '42'), event_id
         ) AS INT) AS rn
  FROM events) WHERE rn <= {STRATUM_N}
"""


# ------------------------------------------------------------- TF-IDF (LLM)
TFIDF_TOP = 100


def q_tfidf_terms(spark, sf_dir):
    """Document-frequency + IDF table over the documents corpus — the
    feature-extraction half of TF-IDF, an LLM-pipeline staple.  Terms
    are deduped INSIDE the row (array_distinct before explode), so the
    aggregation shuffle carries distinct (doc, term) pairs only; the
    corpus-size scalar joins as a broadcast literal (1 row), never a
    global window."""
    docs = _t(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower("text"), "[^a-z]+"),
                    lambda x: F.length(x) > 2,
                )
            )
        ).alias("term")
    )
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_tbl = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        df_tbl.crossJoin(F.broadcast(total))
        .select(
            "term",
            "df",
            F.round(F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1, 5).alias(
                "idf"
            ),
        )
        .orderBy(F.desc("df"), "term")
        .limit(TFIDF_TOP)
    )


SQL_TFIDF_TERMS = f"""
WITH t AS (
  SELECT DISTINCT doc_id, term
  FROM documents,
       UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                          x -> length(x) > 2)) AS u(term)),
n AS (SELECT count(*) AS n_docs FROM documents),
d AS (SELECT term, count(*) AS df FROM t GROUP BY term)
SELECT term, df, round(ln((n_docs + 1) / (df + 1)) + 1, 5) AS idf
FROM d, n ORDER BY df DESC, term LIMIT {TFIDF_TOP}
"""


# ------------------------------------------------- dedup clusters (LLM)
def q_dedup_clusters(spark, sf_dir):
    """Full near-dup pipeline: minhash bands -> LSH candidate pairs ->
    connected components -> (doc_id, cluster_id, is_canonical).  The
    component id is the cluster's min doc_id (deterministic); the
    canonical doc is the one a dedup pass keeps.  CC is min-label
    propagation — 2 shuffles/round, rounds = graph diameter (~2 for
    LSH near-clique clusters), lineage broken per round
    (operators/graph.py scale notes)."""
    from prod2vec_spark.operators import dedup as DD
    from prod2vec_spark.operators import graph as GR
    from prod2vec_spark.queries_ext import LSH_MAX_GROUP

    docs = _t(spark, sf_dir, "documents")
    pairs = DD.lsh_candidate_pairs(DD.minhash_bands(docs), max_group=LSH_MAX_GROUP)
    return GR.dedup_clusters(pairs)


def _sql_dedup_clusters() -> str:
    from prod2vec_spark.queries_ext import _SQL_MINHASH, _SQL_SHINGLES3, LSH_MAX_GROUP

    return f"""
WITH RECURSIVE {_SQL_SHINGLES3},
{_SQL_MINHASH},
eligible AS (
  SELECT band_id, band_sig FROM bands
  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
  JOIN bands b
    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs),
r(a, b) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM e)
  UNION
  SELECT r.a, e.b FROM r JOIN e ON r.b = e.a)
SELECT a AS doc_id, min(b) AS cluster_id,
       CAST(a = min(b) AS INT) AS is_canonical
FROM r GROUP BY a
"""


# ------------------------------------------------- quality filter (LLM)
QUALITY_PCT = 0.25


def q_quality_filter(spark, sf_dir):
    """Percentile-threshold quality gate — the 'drop the worst quartile'
    stage of an LLM data pipeline.  Scores are row-local
    (text.quality_score); the global p25 threshold is a 1-row aggregate
    joined back as a broadcast scalar (same shape as tfidf's corpus
    count — never a global window over the corpus)."""
    from prod2vec_spark.operators import text as TX

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "lang", TX.quality_score(F.col("text")).alias("q")
    )
    thr = scored.agg(
        F.percentile("q", F.lit(QUALITY_PCT)).alias("q_thr")
    )
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("q") >= F.col("q_thr"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("q"), 4).alias("avg_q"),
        )
    )


def _sql_quality_filter() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH t AS (
  SELECT doc_id, lang,
    round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
           + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
           + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS q
  FROM (SELECT doc_id, lang, text, {_TOKS} AS toks FROM documents)),
thr AS (SELECT quantile_cont(q, {QUALITY_PCT}) AS q_thr FROM t)
SELECT lang, count(*) AS n_kept, round(avg(q), 4) AS avg_q
FROM t, thr WHERE q >= q_thr GROUP BY lang
"""


# ------------------------------------------------- kmeans clustering (ML)
def q_kmeans_profile(spark, sf_dir):
    """MLlib KMeans over the embeddings (k-means|| init, seeded) +
    per-cluster profile.  Rows-only catalog entry — iterative ML is
    not SQL-expressible (same class as word2vec_neighbors); the
    nearest-centroid assignment invariant is pytest-checked exactly
    (tests/test_operators.py)."""
    from prod2vec_spark.ml.clustering import cluster_profile, kmeans_fit

    # spread=False for the iterative MLlib fit input (see kmeans_audit)
    emb = read_table(spark, sf_dir, "embeddings", spread=False)
    _, assigned = kmeans_fit(emb, k=8, seed=42, max_iter=10)
    return cluster_profile(assigned).orderBy("cluster")


# ------------------------------------------------- vector-plane DQ (Q-ext)
EMB_DIM = 64


def q_dq_embeddings(spark, sf_dir):
    """Data-quality gate for the embeddings table — the vector-plane
    preconditions every similarity/ANN operator assumes: unique ids,
    no null vectors, every vector exactly EMB_DIM wide, no zero-norm
    vectors (they break cosine).  The vector checks ride the
    ``agg_between`` escape hatch, so all rules still collapse into ONE
    aggregate scan."""
    from prod2vec_spark.operators import quality as Q

    # spread=False: one partial-agg scan — the floor repartition's
    # full-vector shuffle write costs more than the row-local checks
    emb = read_table(spark, sf_dir, "embeddings", spread=False)
    wrong_dim = F.sum((F.size("embedding") != EMB_DIM).cast("long"))
    zero_norm = F.sum(
        (
            F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x.cast("double") * x
            )
            == 0.0
        ).cast("long")
    )
    rules = Q.Rules(
        not_null=["vec_id", "embedding"],
        unique_key=["vec_id"],
        row_count_between=(10.0, 1e12),
        agg_between={
            "wrong_dim": (wrong_dim, 0.0, 0.0),
            "zero_norm": (zero_norm, 0.0, 0.0),
        },
    )
    return Q.expect(emb, rules)


SQL_DQ_EMBEDDINGS = f"""
WITH m AS (
  SELECT CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
         CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
         CAST(count(*) AS DOUBLE) AS nr,
         CAST(count(*) - count(DISTINCT vec_id) AS DOUBLE) AS dup,
         CAST(sum(CASE WHEN len(embedding) != {EMB_DIM} THEN 1 ELSE 0 END) AS DOUBLE) AS wd,
         CAST(sum(CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
                list_transform(embedding, x -> x::DOUBLE * x)), (a, b) -> a + b) = 0
              THEN 1 ELSE 0 END) AS DOUBLE) AS zn
  FROM embeddings)
SELECT 'not_null' AS rule, 'vec_id' AS col_name, n1 AS metric,
       0.0 AS lo, 0.0 AS hi, n1 BETWEEN 0 AND 0 AS passed FROM m
UNION ALL
SELECT 'not_null', 'embedding', n2, 0.0, 0.0, n2 BETWEEN 0 AND 0 FROM m
UNION ALL
SELECT 'row_count_between', '*', nr, 10.0, 1000000000000.0,
       nr BETWEEN 10.0 AND 1000000000000.0 FROM m
UNION ALL
SELECT 'unique_key', 'vec_id', dup, 0.0, 0.0, dup BETWEEN 0 AND 0 FROM m
UNION ALL
SELECT 'agg_between', 'wrong_dim', wd, 0.0, 0.0, wd BETWEEN 0 AND 0 FROM m
UNION ALL
SELECT 'agg_between', 'zero_norm', zn, 0.0, 0.0, zn BETWEEN 0 AND 0 FROM m
"""


R3_QUERIES = {
    "events_json": q_events_json,
    "events_window": q_events_window,
    "events_sliding": q_events_sliding,
    "semi_parts": q_semi_parts,
    "anti_customers": q_anti_customers,
    "pivot_status": q_pivot_status,
    "cube_pricing": q_cube_pricing,
    "order_percentiles": q_order_percentiles,
    "running_revenue": q_running_revenue,
    "stratified_sample": q_stratified_sample,
    "tfidf_terms": q_tfidf_terms,
    "dedup_clusters": q_dedup_clusters,
    "quality_filter": q_quality_filter,
    "dq_embeddings": q_dq_embeddings,
    "kmeans_profile": q_kmeans_profile,
}

R3_ORACLES = {
    "events_json": SQL_EVENTS_JSON,
    "events_window": SQL_EVENTS_WINDOW,
    "events_sliding": SQL_EVENTS_SLIDING,
    "semi_parts": SQL_SEMI_PARTS,
    "anti_customers": SQL_ANTI_CUSTOMERS,
    "pivot_status": SQL_PIVOT_STATUS,
    "cube_pricing": SQL_CUBE_PRICING,
    "order_percentiles": SQL_ORDER_PERCENTILES,
    "running_revenue": SQL_RUNNING_REVENUE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "tfidf_terms": SQL_TFIDF_TERMS,
    "dedup_clusters": _sql_dedup_clusters(),
    "quality_filter": _sql_quality_filter(),
    "dq_embeddings": SQL_DQ_EMBEDDINGS,
}

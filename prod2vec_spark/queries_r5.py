"""Round-5 catalog consolidation (VERDICT r4 ask #1): the driver's
correctness artifact caps at 50 entries, so overlapping single-purpose
queries merge into combined queries that exercise the SAME operators
in one entry each — every §2 operator family keeps ≥1 oracled entry
and the whole catalog fits the cap, so ONE round's CORRECTNESS file
certifies everything.

Merges (the retired single queries stay in the pytest superset —
tests/test_oracle_parity.py runs ALL of them, so their regression
coverage is unchanged; only the driver-facing catalog shrinks):

* ``text_profile``    = text_stats + lang_id + token_counts — one
  row-local pass over documents.
* ``doc_signatures``  = fingerprint + simhash — one row-local pass.
* ``setops_parts``    = intersect_parts + except_parts, tagged rows.
* ``events_windows``  = events_window + events_sliding (tumbling +
  sliding F.window aggs), tagged rows.
* ``dq_suite``        = dq_lineitem + dq_part + dq_documents +
  dq_embeddings — the full expectation-rule surface (Q1-Q5 +
  agg_between) as one violations report keyed by table.
* ``kmeans_audit``    — replaces rows-only kmeans_profile in the
  catalog with an oracled invariant row (VERDICT r4 stretch #7):
  every vector assigned to exactly one of k nonempty clusters.

Catalog conventions (queries.py header) apply throughout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators import text as TX
from prod2vec_spark.sources.io import read_table


# ------------------------------------------------------- text profile
def q_text_profile(spark, sf_dir):
    """Text-analysis plane in one scan: token counts (whitespace +
    BPE-ish lexer), quality features + composite score, language-ID
    argmax.  All row-local expressions — embarrassingly parallel at
    100 TB, no shuffle at all."""
    docs = read_table(spark, sf_dir, "documents")
    f = TX.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).alias("n_ws_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        f["avg_token_len"].alias("avg_token_len"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["symbol_ratio"].alias("symbol_ratio"),
        f["type_token_ratio"].alias("type_token_ratio"),
        TX.quality_score(F.col("text")).alias("quality_score"),
        TX.lang_guess(F.col("text")).alias("lang_pred"),
    )


def _sql_text_profile() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, text, toks,
  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','in','is','to'))) AS INT) AS s_en,
  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS INT) AS s_de,
  CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','es'))) AS INT) AS s_es,
  CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS INT) AS s_fr,
  CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS INT) AS s_zh
FROM t)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 4) AS avg_token_len,
  round(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','in','is','to'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
  round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4) AS symbol_ratio,
  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS type_token_ratio,
  round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
         + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
         + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS quality_score,
  CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM s
"""


# ----------------------------------------------------- doc signatures
def q_doc_signatures(spark, sf_dir):
    """Document-identity sketches in one scan: rolling polynomial-hash
    fingerprint + 32-bit SimHash.  Row-local."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp"),
        TX.simhash32(F.col("text")).alias("simhash"),
    )


def _sql_doc_signatures() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (SELECT doc_id, toks,
        list_transform(toks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
      FROM t),
v AS (SELECT doc_id, toks, hs,
        list_transform(generate_series(0, 31), b ->
          list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1))) AS vs
      FROM h)
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(toks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647)),
    (a, b) -> (a * 131 + b) % 2147483647) AS fp,
  CAST(list_sum(list_transform(generate_series(0, 31), b ->
    CASE WHEN vs[b + 1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
FROM v
"""


# -------------------------------------------------------- set algebra
def q_setops_parts(spark, sf_dir):
    """INTERSECT + EXCEPT (set semantics) in one tagged result: part
    keys ordered at quantity 1 AND at quantity 2, and those at 1 but
    never 2.  ``subtract`` is EXCEPT DISTINCT (exceptAll would be
    multiset-except).  Each leg is Catalyst's native distinct-based
    set-op plan; union of the two legs adds no extra shuffle over the
    single-query forms."""
    li = read_table(spark, sf_dir, "lineitem")
    one = li.where(F.col("l_quantity") == 1).select("l_partkey")
    two = li.where(F.col("l_quantity") == 2).select("l_partkey")
    inter = one.intersect(two).select(F.lit("intersect").alias("op"), "l_partkey")
    exc = one.subtract(two).select(F.lit("except").alias("op"), "l_partkey")
    return inter.unionByName(exc)


SQL_SETOPS_PARTS = """
SELECT 'intersect' AS op, l_partkey FROM (
  SELECT l_partkey FROM lineitem WHERE l_quantity = 1
  INTERSECT
  SELECT l_partkey FROM lineitem WHERE l_quantity = 2)
UNION ALL
SELECT 'except' AS op, l_partkey FROM (
  SELECT l_partkey FROM lineitem WHERE l_quantity = 1
  EXCEPT
  SELECT l_partkey FROM lineitem WHERE l_quantity = 2)
"""


# ------------------------------------------------------ event windows
def q_events_windows(spark, sf_dir):
    """Tumbling (6h) + sliding (6h every 3h) window aggregation in one
    tagged result — the batch forms of the Structured-Streaming
    windowed aggs.  Tumbling is one hash-agg shuffle; sliding is one
    map-side Expand (2× rows, size/slide) + one hash agg — the overlap
    never re-reads the source."""
    ev = read_table(spark, sf_dir, "events")

    def agg(windowed, kind):
        return (
            windowed.agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.lit(kind).alias("kind"),
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    tumb = agg(
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type"), "tumbling"
    )
    slide = agg(
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"), "event_type"),
        "sliding",
    )
    return tumb.unionByName(slide)


# 6h/3h buckets align to midnight: day-trunc + floored hour is exactly
# Spark's epoch-aligned window start; unnest replays the sliding Expand
SQL_EVENTS_WINDOWS = """
WITH s AS (
  SELECT event_type, value,
         date_trunc('day', ts) + INTERVAL (CAST(floor(hour(ts) / 6) * 6 AS INT)) HOUR AS t0,
         date_trunc('day', ts) + INTERVAL (CAST(floor(hour(ts) / 3) * 3 AS INT)) HOUR AS s0
  FROM events)
SELECT 'tumbling' AS kind, t0 AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY 1, 2, 3
UNION ALL
SELECT 'sliding' AS kind, ws AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM (SELECT event_type, value, unnest([s0, s0 - INTERVAL 3 HOUR]) AS ws FROM s)
GROUP BY 1, 2, 3
"""


# ----------------------------------------------------------- DQ suite
def q_dq_suite(spark, sf_dir):
    """The whole expectation-operator surface (Q1-Q5 + the agg_between
    escape hatch) as ONE violations report keyed by table: lineitem
    (not_null / distinct_between / row_count), part (unique_key /
    column_count / schema), documents (corpus gates), embeddings
    (vector-plane gates).  Each table is still a single aggregate
    scan; the union is driver-side plan glue, not an extra pass."""
    # late imports: these live in modules that import queries_r5 at
    # the bottom of queries.py — by call time everything is loaded
    from prod2vec_spark.queries import q_dq_documents, q_dq_lineitem, q_dq_part
    from prod2vec_spark.queries_r3 import q_dq_embeddings

    parts = [
        ("lineitem", q_dq_lineitem),
        ("part", q_dq_part),
        ("documents", q_dq_documents),
        ("embeddings", q_dq_embeddings),
    ]
    out = None
    for name, fn in parts:
        tagged = fn(spark, sf_dir).select(F.lit(name).alias("table_name"), "*")
        out = tagged if out is None else out.unionByName(tagged)
    return out


def _sql_dq_suite() -> str:
    # safe partial-module imports: the SQL_DQ_* constants are defined
    # above the queries_r5 import line in queries.py
    from prod2vec_spark.queries import SQL_DQ_DOCUMENTS, SQL_DQ_LINEITEM, SQL_DQ_PART
    from prod2vec_spark.queries_r3 import SQL_DQ_EMBEDDINGS

    blocks = [
        ("lineitem", SQL_DQ_LINEITEM),
        ("part", SQL_DQ_PART),
        ("documents", SQL_DQ_DOCUMENTS),
        ("embeddings", SQL_DQ_EMBEDDINGS),
    ]
    return "\nUNION ALL\n".join(
        f"SELECT '{name}' AS table_name, * FROM ({sql})" for name, sql in blocks
    )


# -------------------------------------------------------- kmeans audit
KMEANS_K = 8


def q_kmeans_audit(spark, sf_dir):
    """Oracled invariant row for the MLlib KMeans operator (VERDICT r4
    stretch #7): the iterative fit itself is not SQL-expressible, but
    its contract is — every corpus vector assigned to exactly one
    cluster, all k clusters nonempty.  Runs the identical
    kmeans_fit + cluster_profile path as the rows-only profile query,
    then reduces the profile to checkable totals."""
    from prod2vec_spark.ml.clustering import cluster_profile, kmeans_fit

    # spread=False: MLlib's iterative fit re-executes (or one-time
    # persists) its input lineage internally — an input-parallelism
    # repartition under it taxes every init/iteration job for per-row
    # work (array_to_vector) too cheap to pay it back (the round-16
    # adjudicated regression; VERDICT r16 ask #1)
    emb = read_table(spark, sf_dir, "embeddings", spread=False)
    _, assigned = kmeans_fit(emb, k=KMEANS_K, seed=42, max_iter=10)
    prof = cluster_profile(assigned)
    stats = prof.agg(
        F.count(F.lit(1)).alias("n_clusters_nonempty"),
        F.sum("n_vecs").alias("n_assigned"),
    )
    corpus = emb.agg(F.count(F.lit(1)).alias("n_corpus"))
    return stats.crossJoin(F.broadcast(corpus)).select(
        "n_clusters_nonempty",
        "n_assigned",
        "n_corpus",
        (F.col("n_assigned") == F.col("n_corpus")).alias("all_assigned"),
    )


SQL_KMEANS_AUDIT = f"""
SELECT CAST({KMEANS_K} AS BIGINT) AS n_clusters_nonempty,
       count(*) AS n_assigned,
       count(*) AS n_corpus,
       true AS all_assigned
FROM embeddings
"""


# ---------------------------------------------- LSH oversize audit
AUDIT_GROUP_CAP = 2  # low cap so the sf0.01 corpus actually trips it


def q_lsh_oversize_groups(spark, sf_dir):
    """The degenerate-band audit (operators/dedup.lsh_oversize_groups)
    as an oracle-checked query: the (band, signature) groups a
    ``max_group`` cap would DROP, with their cardinality — so a 100 TB
    dedup run reports lost-recall candidates instead of silently
    skipping them.  Uses a deliberately low cap so the testdata
    produces rows; the production cap (64) rarely trips at small SF."""
    from prod2vec_spark.operators import dedup as DD

    docs = read_table(spark, sf_dir, "documents")
    return DD.lsh_oversize_groups(DD.minhash_bands(docs), max_group=AUDIT_GROUP_CAP)


def _sql_lsh_oversize_groups() -> str:
    from prod2vec_spark.queries_ext import _SQL_MINHASH, _SQL_SHINGLES3

    return f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH}
SELECT band_id, band_sig, count(*) AS n_docs
FROM bands GROUP BY 1, 2 HAVING count(*) > {AUDIT_GROUP_CAP}
"""


# ------------------------------------------- approx-percentile twin
def q_order_percentiles_approx(spark, sf_dir):
    """The documented 100 TB swap for order_percentiles
    (queries_r3.py: 'the exact form becomes approx_percentile') as a
    CHECKED claim, mirroring the A3 exact/HLL twin: each engine
    computes its own t-digest/approx estimate and asserts it lands
    between the exact quantiles at p±0.05 — sketch values differ
    across engines, the bound must hold in both."""
    orders = read_table(spark, sf_dir, "orders")
    ex = lambda p: F.percentile("o_totalprice", F.lit(p))  # noqa: E731
    ap = lambda p: F.approx_percentile(  # noqa: E731
        "o_totalprice", F.lit(p), F.lit(10_000)
    )
    ok = lambda p: (  # noqa: E731
        ap(p).between(ex(p - 0.05), ex(p + 0.05))
    )
    return orders.groupBy("o_orderpriority").agg(
        F.round(ex(0.50), 4).alias("p50_exact"),
        ok(0.25).alias("p25_ok"),
        ok(0.50).alias("p50_ok"),
        ok(0.75).alias("p75_ok"),
    )


SQL_ORDER_PERCENTILES_APPROX = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.50), 4) AS p50_exact,
       approx_quantile(o_totalprice, 0.25)
         BETWEEN quantile_cont(o_totalprice, 0.20) AND quantile_cont(o_totalprice, 0.30) AS p25_ok,
       approx_quantile(o_totalprice, 0.50)
         BETWEEN quantile_cont(o_totalprice, 0.45) AND quantile_cont(o_totalprice, 0.55) AS p50_ok,
       approx_quantile(o_totalprice, 0.75)
         BETWEEN quantile_cont(o_totalprice, 0.70) AND quantile_cont(o_totalprice, 0.80) AS p75_ok
FROM orders GROUP BY o_orderpriority
"""


# ------------------------------------------ cross-modal agreement
def q_neardup_modal_agreement(spark, sf_dir):
    """Cross-modal dedup agreement audit (capstone of the audit
    family): the testdata's doc_id and vec_id spaces align 1:1, so the
    TEXT near-dup candidates (MinHash LSH over 3-shingles) and the
    EMBEDDING near-dup pairs (banded sign-LSH + cosine ≥ 0.4) describe
    the same corpus through two modalities — this query measures how
    much they agree: pair counts per modality, the intersection, and
    the Jaccard of the two pair sets.

    Scale shape: both inputs are the OUTPUTS of already-bucketed
    operators (candidate pair lists, orders of magnitude smaller than
    the corpus); the agreement join runs on those lists only."""
    from prod2vec_spark.queries_ext import q_lsh_candidates
    from prod2vec_spark.queries_more import q_embedding_neardup as _q_emb

    txt = q_lsh_candidates(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    emb = _q_emb(spark, sf_dir).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    both = txt.join(emb, ["a", "b"])
    nt = txt.agg(F.count(F.lit(1)).alias("n_text_pairs"))
    ne = emb.agg(F.count(F.lit(1)).alias("n_emb_pairs"))
    nb = both.agg(F.count(F.lit(1)).alias("n_both"))
    return (
        nt.crossJoin(ne)
        .crossJoin(nb)
        .select(
            "n_text_pairs",
            "n_emb_pairs",
            "n_both",
            F.round(
                F.col("n_both")
                / F.nullif(
                    (F.col("n_text_pairs") + F.col("n_emb_pairs") - F.col("n_both")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ),
                5,
            ).alias("pair_jaccard"),
        )
    )


def _sql_neardup_modal_agreement() -> str:
    from prod2vec_spark.queries_ext import SQL_LSH_CANDIDATES
    from prod2vec_spark.queries_more import _sql_neardup

    return f"""
WITH t AS (SELECT doc_a AS a, doc_b AS b FROM ({SQL_LSH_CANDIDATES})),
e AS (SELECT vec_a AS a, vec_b AS b FROM ({_sql_neardup()})),
m AS (SELECT (SELECT count(*) FROM t) AS n_text_pairs,
             (SELECT count(*) FROM e) AS n_emb_pairs,
             (SELECT count(*) FROM t JOIN e USING (a, b)) AS n_both)
SELECT n_text_pairs, n_emb_pairs, n_both,
       round(CAST(n_both AS DOUBLE)
             / nullif(CAST(n_text_pairs + n_emb_pairs - n_both AS DOUBLE), 0), 5)
         AS pair_jaccard
FROM m
"""


# -------------------------------------------- interval-overlap join
OVR_DAYS = 14.0


def q_order_window_overlaps(spark, sf_dir):
    """Interval-overlap join on real data: urgent-order fulfillment
    windows [orderdate, +14d) vs low-priority ones — per urgent order,
    how many low-priority windows it overlaps (top 20).  Exercises
    operators/ranges.overlap_range_join: both interval sides bin to
    14-day buckets, bin-ownership dedups, the naive theta join is the
    oracle."""
    from prod2vec_spark.operators.ranges import overlap_range_join

    orders = read_table(spark, sf_dir, "orders")
    days = F.unix_timestamp("o_orderdate") / 86400.0

    def windows(prio, key, pricemin):
        return (
            orders.where(
                (F.col("o_orderpriority") == prio)
                & (F.col("o_totalprice") > pricemin)
            )
            .select(
                F.col("o_orderkey").alias(key),
                days.alias(f"{key}_lo"),
                (days + OVR_DAYS).alias(f"{key}_hi"),
            )
        )

    a = windows("1-URGENT", "a_key", 400_000.0)
    b = windows("5-LOW", "b_key", 400_000.0)
    joined = overlap_range_join(
        a, b, "a_key_lo", "a_key_hi", "b_key_lo", "b_key_hi", bin_width=OVR_DAYS
    )
    return (
        joined.groupBy("a_key")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy(F.desc("n_overlaps"), F.asc("a_key"))
        .limit(20)
        .select(F.col("a_key").alias("urgent_orderkey"), "n_overlaps")
    )


SQL_ORDER_WINDOW_OVERLAPS = f"""
WITH a AS (
  SELECT o_orderkey AS k, epoch(o_orderdate) / 86400.0 AS lo,
         epoch(o_orderdate) / 86400.0 + {OVR_DAYS} AS hi
  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000),
b AS (
  SELECT o_orderkey AS k, epoch(o_orderdate) / 86400.0 AS lo,
         epoch(o_orderdate) / 86400.0 + {OVR_DAYS} AS hi
  FROM orders WHERE o_orderpriority = '5-LOW' AND o_totalprice > 400000)
SELECT a.k AS urgent_orderkey, count(*) AS n_overlaps
FROM a JOIN b ON a.lo < b.hi AND b.lo < a.hi
GROUP BY a.k ORDER BY n_overlaps DESC, a.k LIMIT 20
"""


# ---------------------------------------- skew-safe distinct count
def q_skew_safe_distinct(spark, sf_dir):
    """skew_safe_count_distinct on the basket fact: distinct parts per
    returnflag via value-hash salting — must equal plain
    COUNT(DISTINCT) exactly (the salting is an internal partitioning
    detail)."""
    from prod2vec_spark.operators.relational import skew_safe_count_distinct

    li = read_table(spark, sf_dir, "lineitem")
    return skew_safe_count_distinct(li, ["l_returnflag"], "l_partkey", n_salts=16)


SQL_SKEW_SAFE_DISTINCT = """
SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
FROM lineitem GROUP BY l_returnflag
"""


R5_QUERIES = {
    "text_profile": q_text_profile,
    "doc_signatures": q_doc_signatures,
    "setops_parts": q_setops_parts,
    "events_windows": q_events_windows,
    "dq_suite": q_dq_suite,
    "kmeans_audit": q_kmeans_audit,
    # superset-only (pytest-oracled; not in the 50-entry driver catalog)
    "order_percentiles_approx": q_order_percentiles_approx,
    "lsh_oversize_groups": q_lsh_oversize_groups,
    "order_window_overlaps": q_order_window_overlaps,
    "skew_safe_distinct": q_skew_safe_distinct,
    "neardup_modal_agreement": q_neardup_modal_agreement,
}

R5_ORACLES = {
    "text_profile": _sql_text_profile(),
    "doc_signatures": _sql_doc_signatures(),
    "setops_parts": SQL_SETOPS_PARTS,
    "events_windows": SQL_EVENTS_WINDOWS,
    # dq_suite's oracle is composed in queries.py AFTER its SQL_DQ_*
    # constants exist (import-order constraint): _sql_dq_suite()
    "kmeans_audit": SQL_KMEANS_AUDIT,
    "order_percentiles_approx": SQL_ORDER_PERCENTILES_APPROX,
    "lsh_oversize_groups": _sql_lsh_oversize_groups(),
    "order_window_overlaps": SQL_ORDER_WINDOW_OVERLAPS,
    "skew_safe_distinct": SQL_SKEW_SAFE_DISTINCT,
    "neardup_modal_agreement": _sql_neardup_modal_agreement(),
}

"""Extension query catalog: LLM-data-pipeline operators (text
analysis, dedup, similarity search), events analytics, and multi-join
relational breadth.  Same contract as queries.py (which merges these
dicts): each Spark callable has a DuckDB oracle evaluating the
identical formula.

DuckDB syntax notes baked into the oracles:
  * regexp_replace needs the 'g' flag (Spark's is global by default);
  * list_reduce has no init — prepend the neutral element;
  * list folds use list_reduce (strict left fold) wherever Spark uses
    ``aggregate``, so float accumulation matches bit-for-bit;
  * len()/count() are BIGINT — cast to INT where Spark emits int.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators import dedup as DD
from prod2vec_spark.operators import simsearch as SS
from prod2vec_spark.operators import text as TX
from prod2vec_spark.sources.io import read_table

EMB_DIMS = 64

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


# ------------------------------------------------------------ text stats
def q_text_stats(spark, sf_dir):
    """Quality-signal features per document (Gopher/C4-style), all
    row-local expressions."""
    docs = read_table(spark, sf_dir, "documents")
    f = TX.quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_tokens"].alias("n_tokens"),
        f["n_distinct_tokens"].alias("n_distinct_tokens"),
        f["avg_token_len"].alias("avg_token_len"),
        f["stopword_ratio"].alias("stopword_ratio"),
        f["symbol_ratio"].alias("symbol_ratio"),
        f["type_token_ratio"].alias("type_token_ratio"),
        TX.quality_score(F.col("text")).alias("quality_score"),
    )


SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
  round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 4) AS avg_token_len,
  round(CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','in','is','to'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
  round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4) AS symbol_ratio,
  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS type_token_ratio,
  round((least(1.0, CAST(len(toks) AS DOUBLE) / 20.0)
         + greatest(0.0, 1.0 - 4.0 * round(CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text), 4))
         + round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)) / 3.0, 4) AS quality_score
FROM t
"""


# -------------------------------------------------------------- lang id
def q_lang_id(spark, sf_dir):
    """Marker-vocabulary language-ID heuristic with deterministic
    argmax (en>de>es>fr>zh precedence, all-zero -> 'und')."""
    docs = read_table(spark, sf_dir, "documents")
    s = TX.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        s["en"].alias("s_en"),
        s["de"].alias("s_de"),
        s["es"].alias("s_es"),
        s["fr"].alias("s_fr"),
        TX.lang_guess(F.col("text")).alias("lang_pred"),
    )


SQL_LANG_ID = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id,
  CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','in','is','to'))) AS INT) AS s_en,
  CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS INT) AS s_de,
  CAST(len(list_filter(toks, x -> x IN ('el','la','de','que','y','es'))) AS INT) AS s_es,
  CAST(len(list_filter(toks, x -> x IN ('le','la','les','et','est','une'))) AS INT) AS s_fr,
  CAST(length(regexp_replace(text, '[\\x00-\\x7F]', '', 'g')) AS INT) AS s_zh
FROM t)
SELECT doc_id, s_en, s_de, s_es, s_fr,
  CASE WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'en'
       WHEN s_de = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'de'
       WHEN s_es = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'es'
       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr, s_zh) THEN 'fr'
       ELSE 'zh' END AS lang_pred
FROM s
"""


# --------------------------------------------------------- token counts
def q_token_counts(spark, sf_dir):
    """Whitespace vs BPE-ish lexer token counts — the 100 TB token
    budget estimator."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(TX.tokens(F.col("text"))).alias("n_ws_tokens"),
        TX.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


SQL_TOKEN_COUNTS = f"""
SELECT doc_id,
  CAST(len({_TOKS}) AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT) AS n_bpe_tokens
FROM documents
"""


# ---------------------------------------------------------- fingerprint
def q_fingerprint(spark, sf_dir):
    """Rolling polynomial hash fingerprint per document."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))


SQL_FINGERPRINT = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(toks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647)),
    (a, b) -> (a * 131 + b) % 2147483647) AS fp
FROM t
"""


# -------------------------------------------------------------- simhash
def q_simhash(spark, sf_dir):
    """32-bit SimHash per document, fully row-local."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", TX.simhash32(F.col("text")).alias("simhash"))


SQL_SIMHASH = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
h AS (SELECT doc_id,
        list_transform(toks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
      FROM t),
v AS (SELECT doc_id,
        list_transform(generate_series(0, 31), b ->
          list_sum(list_transform(hs, x -> ((x >> b) & 1) * 2 - 1))) AS vs
      FROM h)
SELECT doc_id,
  CAST(list_sum(list_transform(generate_series(0, 31), b ->
    CASE WHEN vs[b + 1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)) AS BIGINT) AS simhash
FROM v
"""


# ----------------------------------------------------------- exact dedup
def q_dedup_exact(spark, sf_dir):
    """Exact dedup groups by normalized-content digest."""
    docs = read_table(spark, sf_dir, "documents")
    return DD.exact_dup_groups(docs)


SQL_DEDUP_EXACT = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS text_hash,
       count(*) AS n_docs,
       min(doc_id) AS keep_doc_id
FROM documents GROUP BY 1
"""


_SQL_SHINGLES3 = f"""
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(toks) - 2, 0)),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
  FROM (SELECT doc_id, {_TOKS} AS toks FROM documents))
"""

_SQL_MINHASH = """
hs AS (
  SELECT doc_id,
         list_transform(sh, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS h1,
         list_transform(sh, x -> ('0x' || substr(md5(x), 9, 8))::BIGINT) AS h2
  FROM sh3 WHERE len(sh) > 0),
mh AS (
  SELECT doc_id,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 0 * h2[i]) % 2147483647)) AS mh0,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 1 * h2[i]) % 2147483647)) AS mh1,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 2 * h2[i]) % 2147483647)) AS mh2,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 3 * h2[i]) % 2147483647)) AS mh3,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 4 * h2[i]) % 2147483647)) AS mh4,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 5 * h2[i]) % 2147483647)) AS mh5,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 6 * h2[i]) % 2147483647)) AS mh6,
         list_min(list_transform(generate_series(1, len(h1)), i -> (h1[i] + 7 * h2[i]) % 2147483647)) AS mh7
  FROM hs),
bands AS (
  SELECT doc_id, 0 AS band_id, md5(concat_ws('|', mh0, mh1, mh2, mh3)) AS band_sig FROM mh
  UNION ALL
  SELECT doc_id, 1 AS band_id, md5(concat_ws('|', mh4, mh5, mh6, mh7)) AS band_sig FROM mh)
"""


# -------------------------------------------------------- minhash bands
def q_minhash_bands(spark, sf_dir):
    """MinHash LSH band signatures (8 hashes, 2 bands of 4) over word
    3-shingles."""
    docs = read_table(spark, sf_dir, "documents")
    return DD.minhash_bands(docs)


SQL_MINHASH_BANDS = f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH}
SELECT doc_id, band_id, band_sig FROM bands
"""


# ----------------------------------------------------- LSH candidates
LSH_MAX_GROUP = 64  # degenerate-band cap: a hot signature group above
# this expands quadratically and is an exact-dup cluster in disguise


def q_lsh_candidates(spark, sf_dir):
    """Near-dup candidate pairs: docs sharing a MinHash band, with the
    degenerate-band group cap applied (oracle replays the cap)."""
    docs = read_table(spark, sf_dir, "documents")
    return DD.lsh_candidate_pairs(DD.minhash_bands(docs), max_group=LSH_MAX_GROUP)


SQL_LSH_CANDIDATES = f"""
WITH {_SQL_SHINGLES3},
{_SQL_MINHASH},
eligible AS (
  SELECT band_id, band_sig FROM bands
  GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {LSH_MAX_GROUP})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a
JOIN eligible e ON a.band_id = e.band_id AND a.band_sig = e.band_sig
JOIN bands b
  ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


# ------------------------------------------------------ n-gram jaccard
def q_ngram_jaccard(spark, sf_dir):
    """Exact pairwise Jaccard over word bigram shingles (document
    frequency ≤ 100 — common-gram filtered), pairs ≥ 0.05."""
    docs = read_table(spark, sf_dir, "documents")
    return DD.jaccard_pairs(docs, shingle_k=2, threshold=0.05, max_df=100)


SQL_NGRAM_JACCARD = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s0 AS (SELECT doc_id, unnest(list_distinct(list_transform(
        generate_series(1, greatest(len(toks) - 1, 0)),
        i -> toks[i] || ' ' || toks[i+1]))) AS shingle
      FROM t),
s AS (SELECT doc_id, shingle FROM s0
      WHERE shingle NOT IN (SELECT shingle FROM s0 GROUP BY 1 HAVING count(*) > 100)),
sz AS (SELECT doc_id, count(*) AS n_sh FROM s GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_inter,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 5) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 5) >= 0.05
"""


# ------------------------------------------------------------ ANN topk
def q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-5 for query vectors vec_id < 20 — exact
    baseline of the similarity-search family."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SS.brute_force_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


# dot/norms as strict left folds (list_reduce) to match Spark's
# aggregate() accumulation order bit-for-bit.  Vectors are unit-scaled
# ONCE per row (same as simsearch._with_unit) so the per-pair formula
# is a single dot product — the oracle mirrors the normalize-then-dot
# arithmetic exactly, not just the mathematical value.
_DOT = (
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x, y) -> x + y)"
)
_L2 = (
    "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), (x, y) -> x + y))"
)
_UNIT = (
    "list_transform({a}, x -> x::DOUBLE / nullif(" + _L2 + ", 0))"
)
_NSIM = "(" + _DOT.format(a="qn", b="nvec") + ")"

SQL_ANN_TOPK = f"""
WITH n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec FROM embeddings),
q AS (SELECT vec_id AS query_id, nvec AS qn FROM n WHERE vec_id < 20),
p AS (SELECT query_id, vec_id, {_NSIM} AS sim
      FROM n CROSS JOIN q
      WHERE vec_id != query_id)
SELECT query_id, vec_id AS neighbor_id, round(sim, 5) AS cosine_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM p)
WHERE rank <= 5
"""


# -------------------------------------------------------- IVF ANN topk
def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-5: data-adaptive cells (8 seeded-sample
    centroids, 2 probed per query) — the inverted-file counterpart to
    the sign-LSH bucket path.  Fully deterministic: centroid choice is
    md5 hash order, assignment/probing replayed identically by the
    oracle."""
    # spread=False: ivf_topk's centroid collect + assignment pass run
    # several short jobs over this scan — the blanket floor repartition
    # re-executes under each of them for row-local dot products too
    # cheap to pay it back (VERDICT r16 ask #1); the operator's own
    # min_parallelism floor still spreads the corpus leg exactly once
    emb = read_table(spark, sf_dir, "embeddings", spread=False)
    return SS.ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 20),
        dims=EMB_DIMS,
        k=5,
        n_centroids=8,
        nprobe=2,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


def _sql_ann_ivf() -> str:
    # assignment + probing use RAW dots against the unit centroids
    # (argmax-equivalent to cosine, exactly what the Spark plan does);
    # normalization happens only for the final candidate similarity
    dot_ec = _DOT.format(a="e.embedding", b="c.cvec")
    dot_qc = _DOT.format(a="q.embedding", b="c.cvec")
    dot_qa = _DOT.format(a="qn", b="nvec")
    return f"""
WITH cent AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS cvec
              FROM embeddings
              WHERE {_L2.format(a='embedding')} > 0
              ORDER BY md5('ivf|' || vec_id), vec_id LIMIT 8),
cid AS (SELECT row_number() OVER (ORDER BY md5('ivf|' || vec_id), vec_id) - 1 AS cid,
               cvec
        FROM cent),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY ({dot_ec}) DESC, c.cid) AS rk
    FROM embeddings e CROSS JOIN cid c)
  WHERE rk = 1),
q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 20),
qprobe AS (
  SELECT query_id, qn, cid FROM (
    SELECT q.query_id, {_UNIT.format(a='q.embedding')} AS qn, c.cid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY ({dot_qc}) DESC, c.cid) AS rk
    FROM q CROSS JOIN cid c)
  WHERE rk <= 2),
p AS (SELECT query_id, a.vec_id, ({dot_qa}) AS sim
      FROM (SELECT query_id, qn, cid FROM qprobe) qp
      JOIN (SELECT vec_id, cid, {_UNIT.format(a='embedding')} AS nvec FROM assign) a
        USING (cid)
      WHERE a.vec_id != query_id)
SELECT query_id, vec_id AS neighbor_id, round(sim, 5) AS cosine_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM p)
WHERE rank <= 5
"""


# -------------------------------------------------------- LSH ANN topk
def q_ann_lsh_topk(spark, sf_dir):
    """Sign-LSH bucketed approximate top-5 (scale path): candidates
    restricted to the query's bucket; hyperplanes are shared literal
    constants (simsearch.deterministic_planes), identical in the
    oracle."""
    emb = read_table(spark, sf_dir, "embeddings")
    return SS.lsh_topk(emb, emb.filter(F.col("vec_id") < 20), dims=EMB_DIMS, k=5, num_planes=6)


def _sql_bucket(vec: str) -> str:
    planes = SS.deterministic_planes(EMB_DIMS, 6)
    terms = []
    for p, row in enumerate(planes):
        lits = ", ".join(repr(c) for c in row)
        d = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(generate_series(1, 64), i -> {vec}[i]::DOUBLE * ([{lits}])[i])), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN ({d}) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END)")
    return " + ".join(terms)


def _sql_ann_lsh() -> str:
    return f"""
WITH c AS (SELECT vec_id, ({_sql_bucket('embedding')}) AS bucket,
                  {_UNIT.format(a='embedding')} AS nvec
           FROM embeddings),
q AS (SELECT vec_id AS query_id, nvec AS qn, bucket FROM c WHERE vec_id < 20),
p AS (SELECT query_id, c.vec_id, {_NSIM} AS sim
      FROM c JOIN q USING (bucket)
      WHERE c.vec_id != query_id)
SELECT query_id, vec_id AS neighbor_id, round(sim, 5) AS cosine_sim,
       CAST(rank AS INT) AS rank
FROM (SELECT query_id, vec_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      FROM p)
WHERE rank <= 5
"""


# -------------------------------------------------------- events daily
def q_events_daily(spark, sf_dir):
    """Tumbling daily aggregate per event type with JSON prop
    extraction — the batch form of the streaming windowed agg."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.round(
                F.avg(F.get_json_object("props", "$.k").cast("int")), 4
            ).alias("avg_k"),
        )
    )


SQL_EVENTS_DAILY = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       round(avg(json_extract_string(props, '$.k')::INT), 4) AS avg_k
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------- as-of join
def q_asof_latest_event(spark, sf_dir):
    """As-of join: each order annotated with the customer's most
    recent event value at-or-before the order date (point-in-time
    feature lookup).  The right side is pre-deduped to one row per
    (user, ts) so the at-tie pick is well-defined in both engines;
    the oracle uses DuckDB's native ASOF LEFT JOIN."""
    from prod2vec_spark.operators.asof import asof_join

    orders = read_table(spark, sf_dir, "orders")
    ev = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    out = asof_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        ev.select(F.col("user_id").alias("o_custkey"), "ts", "value"),
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        value_cols=["value"],
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        F.round("value", 4).alias("last_event_value"),
    )


SQL_ASOF_LATEST_EVENT = """
WITH e AS (
  SELECT user_id, ts, max(value) AS value
  FROM events GROUP BY 1, 2)
SELECT o.o_orderkey, o.o_custkey, round(e.value, 4) AS last_event_value
FROM orders o
ASOF LEFT JOIN e ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
"""


# -------------------------------------------------------- sessionize
def q_sessionize(spark, sf_dir):
    """Session counting via lag(): a new session starts after a >30 min
    gap.  The analytic-window + aggregate composition the reference
    never needed but the capability class includes."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # ts arrives as TIMESTAMP or TIMESTAMP_NTZ depending on how the
    # parquet writer stamped isAdjustedToUTC; unix_millis only takes
    # TIMESTAMP, and with the session pinned to UTC (session.py) the
    # cast is exact for both inputs.
    ms = lambda c: F.unix_millis(c.cast("timestamp"))
    gap = ms(F.col("ts")) - ms(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_ms", gap)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("gap_ms").isNull() | (F.col("gap_ms") > 1_800_000), 1).otherwise(0)
            ).alias("n_sessions"),
        )
    )


SQL_SESSIONIZE = """
WITH x AS (
  SELECT user_id,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_ms
  FROM events)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id
"""


# ------------------------------------------------------- revenue topk
def q_revenue_topk(spark, sf_dir):
    """TPC-H Q3-shaped 3-way join: customer ⋈ orders ⋈ lineitem,
    revenue per order, top 10.  Customer dim broadcasts; the
    orders⋈lineitem join shuffles on orderkey."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_REVENUE_TOPK = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


# ----------------------------------------------------- region revenue
def q_region_revenue(spark, sf_dir):
    """TPC-H Q5-shaped star join: fact ⋈ orders ⋈ customer ⋈ nation ⋈
    region with every dim broadcast — one fact shuffle (the orders
    join), everything else map-side."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


SQL_REGION_REVENUE = """
SELECT r_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# ------------------------------------------------------------- set ops
def q_union_nation_counts(spark, sf_dir):
    """Set-op surface: stack customer and supplier by nation
    (unionByName) and count per side."""
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    u = cust.select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    ).unionByName(
        supp.select(F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("side", "nationkey").agg(F.count(F.lit(1)).alias("n"))


SQL_UNION_NATIONS = """
SELECT side, nationkey, count(*) AS n FROM (
  SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier)
GROUP BY side, nationkey
"""


EXT_QUERIES = {
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "token_counts": q_token_counts,
    "fingerprint": q_fingerprint,
    "simhash": q_simhash,
    "dedup_exact": q_dedup_exact,
    "minhash_bands": q_minhash_bands,
    "lsh_candidates": q_lsh_candidates,
    "ngram_jaccard": q_ngram_jaccard,
    "ann_topk": q_ann_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "asof_latest_event": q_asof_latest_event,
    "events_daily": q_events_daily,
    "sessionize": q_sessionize,
    "revenue_topk": q_revenue_topk,
    "region_revenue": q_region_revenue,
    "union_nation_counts": q_union_nation_counts,
}

EXT_ORACLES = {
    "text_stats": SQL_TEXT_STATS,
    "lang_id": SQL_LANG_ID,
    "token_counts": SQL_TOKEN_COUNTS,
    "fingerprint": SQL_FINGERPRINT,
    "simhash": SQL_SIMHASH,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_bands": SQL_MINHASH_BANDS,
    "lsh_candidates": SQL_LSH_CANDIDATES,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "ann_topk": SQL_ANN_TOPK,
    "ann_ivf_topk": _sql_ann_ivf(),
    "ann_lsh_topk": _sql_ann_lsh(),
    "asof_latest_event": SQL_ASOF_LATEST_EVENT,
    "events_daily": SQL_EVENTS_DAILY,
    "sessionize": SQL_SESSIONIZE,
    "revenue_topk": SQL_REVENUE_TOPK,
    "region_revenue": SQL_REGION_REVENUE,
    "union_nation_counts": SQL_UNION_NATIONS,
}

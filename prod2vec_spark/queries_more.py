"""Third query-catalog module: seeded randomness surfaces (F1/F3),
grouping-set aggregates, and the ML-layer queries (rows-only checks —
training output is not SQL-expressible, SURVEY.md §5.2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.functions.arrays import seeded_shuffle
from prod2vec_spark.operators.baskets import assemble_baskets, build_vocab
from prod2vec_spark.operators.skipgram import (
    skipgram_pairs_subsampled,
    subsample_keep_prob,
    with_positions,
)
from prod2vec_spark.sources.io import read_table


# ------------------------------------------------------- F1 seeded shuffle
def q_seeded_shuffle(spark, sf_dir):
    """F1: deterministic basket permutation (hash-sort; the engine's
    seedable replacement for the reference's random.shuffle at
    data_prep.py:156-157).  The oracle replays the identical md5 sort
    keys."""
    li = read_table(spark, sf_dir, "lineitem")
    b = assemble_baskets(li)
    shuffled = seeded_shuffle(F.col("basket"), F.col("order_id"), seed=42)
    return b.select(
        "order_id",
        F.concat_ws(",", F.transform(shuffled, lambda x: x.cast("string"))).alias(
            "shuffled_basket"
        ),
    )


SQL_SEEDED_SHUFFLE = """
WITH b AS (
  SELECT l_orderkey AS order_id,
         list(l_partkey ORDER BY l_linenumber, l_partkey) AS basket
  FROM lineitem GROUP BY l_orderkey)
SELECT order_id, string_agg(v, ',' ORDER BY k, v) AS shuffled_basket
FROM (SELECT order_id, basket[i] AS v,
             md5('42|' || order_id || '|' || basket[i] || '|' || (i - 1)) AS k
      FROM b, LATERAL unnest(generate_series(1, len(basket))) t(i))
GROUP BY order_id
"""


# ---------------------------------------------------- F3 subsample table
def q_subsample_table(spark, sf_dir):
    """F3: word2vec frequent-item subsampling keep-probabilities from
    the frequency rank (keras make_sampling_table formula,
    data_prep.py:150-151)."""
    li = read_table(spark, sf_dir, "lineitem")
    v = build_vocab(li, num_prods=101).filter(F.col("product_id").isNotNull())
    return v.select(
        "idx",
        "product_id",
        F.round(subsample_keep_prob(F.col("idx"), 101), 6).alias("keep_prob"),
    )


SQL_SUBSAMPLE_TABLE = """
WITH vocab AS (
  SELECT product_id,
         CAST(row_number() OVER (ORDER BY cnt DESC, product_id) AS INT) AS idx
  FROM (SELECT l_partkey AS product_id, count(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY cnt DESC, product_id LIMIT 100))
SELECT idx, product_id,
       round(least(1.0, sqrt(1e-5 / (1.0 / (idx * (ln(101.0) + 0.57721566490153286))))
                        + 1e-5 / (1.0 / (idx * (ln(101.0) + 0.57721566490153286)))), 6) AS keep_prob
FROM vocab
"""


# --------------------------------------------- F3 ∘ F4 subsampled pairs
def q_skipgram_subsampled(spark, sf_dir):
    """F3 wired INTO pair generation (the round-2 gap): skip-gram pairs
    with frequent-target subsampling, per-target stats.  Matches the
    reference's ``skipgrams(seq, sampling_table=...)`` composition
    (data_prep.py:150-151,163-169) — one hash coin flip per target
    occurrence, context side unfiltered."""
    li = read_table(spark, sf_dir, "lineitem")
    pos = with_positions(li)
    vocab = build_vocab(li, num_prods=101)
    pairs = skipgram_pairs_subsampled(pos, vocab, vocab_size=101, window=4, seed=42)
    return pairs.groupBy("target").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("context").alias("distinct_ctx"),
        F.sum("context").alias("ctx_sum"),
    )


# keep-prob replayed from the rank exactly as SQL_SUBSAMPLE_TABLE; the
# coin flip replays operators/skipgram.subsampled_positions's
# md5(seed|sub|order|pos) uniform
_SQL_KEEP = (
    "least(1.0, sqrt(1e-5 / (1.0 / (v.idx * (ln(101.0) + 0.57721566490153286))))"
    " + 1e-5 / (1.0 / (v.idx * (ln(101.0) + 0.57721566490153286))))"
)

SQL_SKIPGRAM_SUBSAMPLED = f"""
WITH pos AS (
  SELECT l_orderkey AS o, l_partkey AS item,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey, l_suppkey) AS p
  FROM lineitem),
vocab AS (
  SELECT product_id,
         CAST(row_number() OVER (ORDER BY cnt DESC, product_id) AS INT) AS idx
  FROM (SELECT l_partkey AS product_id, count(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY cnt DESC, product_id LIMIT 100)),
tkeep AS (
  SELECT t.o, t.item, t.p
  FROM pos t LEFT JOIN vocab v ON t.item = v.product_id
  WHERE ('0x' || substr(md5('42|sub|' || t.o || '|' || t.p), 1, 8))::BIGINT
        / 4294967296.0
        < CASE WHEN v.idx IS NULL THEN 1.0 ELSE {_SQL_KEEP} END)
SELECT t.item AS target,
       count(*) AS n_pairs,
       CAST(count(DISTINCT c.item) AS BIGINT) AS distinct_ctx,
       CAST(sum(c.item) AS BIGINT) AS ctx_sum
FROM tkeep t JOIN pos c ON t.o = c.o AND abs(t.p - c.p) BETWEEN 1 AND 4
GROUP BY t.item
"""


# ------------------------------------------------- set ops (§2.7 D1+)
def q_intersect_parts(spark, sf_dir):
    """INTERSECT (set semantics): part keys ordered at quantity 1 AND
    at quantity 2 — distinct-based set op, one shuffle per side + the
    distinct, exactly Catalyst's plan for INTERSECT.  (Quantity
    predicates are selective enough that neither side nor the result
    is the whole part universe.)"""
    li = read_table(spark, sf_dir, "lineitem")
    one = li.where(F.col("l_quantity") == 1).select("l_partkey")
    two = li.where(F.col("l_quantity") == 2).select("l_partkey")
    return one.intersect(two)


SQL_INTERSECT_PARTS = """
SELECT l_partkey FROM lineitem WHERE l_quantity = 1
INTERSECT
SELECT l_partkey FROM lineitem WHERE l_quantity = 2
"""


def q_except_parts(spark, sf_dir):
    """EXCEPT (set semantics): part keys ordered at quantity 1 but
    never at quantity 2.  ``subtract`` is Spark's EXCEPT DISTINCT
    (``exceptAll`` would be multiset-except: a key seen 3x on the
    left and 1x on the right would wrongly survive)."""
    li = read_table(spark, sf_dir, "lineitem")
    one = li.where(F.col("l_quantity") == 1).select("l_partkey")
    two = li.where(F.col("l_quantity") == 2).select("l_partkey")
    return one.subtract(two)


SQL_EXCEPT_PARTS = """
SELECT l_partkey FROM lineitem WHERE l_quantity = 1
EXCEPT
SELECT l_partkey FROM lineitem WHERE l_quantity = 2
"""


# ----------------------------------------- A3 at scale: approx distinct
def q_approx_distinct_parts(spark, sf_dir):
    """A3's 100 TB form (SURVEY §2.4): HyperLogLog++
    approx_count_distinct beside the exact count.  The sketch value
    itself is engine-specific (Spark HLL++ vs DuckDB HLL give
    different estimates), so the oracle-checkable output is the exact
    count plus the DOCUMENTED ERROR BOUND assertion: rsd=0.05 ⇒
    |approx−exact|/exact < 0.15 (3σ) with overwhelming probability at
    this cardinality — both engines' estimates must satisfy it."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_cnt"),
        (
            (
                F.abs(
                    F.approx_count_distinct("l_partkey", rsd=0.05)
                    - F.countDistinct("l_partkey")
                )
                / F.countDistinct("l_partkey")
            )
            < 0.15
        ).alias("approx_ok"),
    )


SQL_APPROX_DISTINCT = """
SELECT count(DISTINCT l_partkey) AS exact_cnt,
       (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        / CAST(count(DISTINCT l_partkey) AS DOUBLE)) < 0.15 AS approx_ok
FROM lineitem
"""


# -------------------------------------------------------------- rollup
def q_rollup_pricing(spark, sf_dir):
    """Grouping sets: revenue rollup over (returnflag, linestatus) with
    subtotals and grand total — free from Catalyst (SURVEY.md §2.4),
    exposed as a first-class query."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


SQL_ROLLUP_PRICING = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ------------------------------------------------------ F8 seeded sample
def q_validation_sample(spark, sf_dir):
    """F8: seeded sample-without-replacement of 20 validation products
    from the top-100 vocabulary — the engine's form of the reference's
    ``np.random.choice(top_1000, 100, replace=False)``
    (model_train.py:18-20).  md5 hash order, so the oracle replays the
    identical draw."""
    from prod2vec_spark.operators.relational import seeded_sample

    li = read_table(spark, sf_dir, "lineitem")
    v = build_vocab(li, num_prods=101).filter(F.col("product_id").isNotNull())
    return seeded_sample(v.select("product_id", "idx"), 20, ["product_id"], seed=42)


SQL_VALIDATION_SAMPLE = """
WITH vocab AS (
  SELECT product_id,
         CAST(row_number() OVER (ORDER BY cnt DESC, product_id) AS INT) AS idx
  FROM (SELECT l_partkey AS product_id, count(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY cnt DESC, product_id LIMIT 100))
SELECT product_id, idx FROM vocab
ORDER BY md5('42|' || product_id), product_id LIMIT 20
"""


# ------------------------------------------------- F9 ranked string agg
def q_string_agg_names(spark, sf_dir):
    """F9: rank-ordered name aggregation with a separator — the
    engine's form of the reference's neighbor-name report
    (model_train.py:48, ``Series.str.cat(sep='; ')`` over the top-20
    names): top-3 part names per brand, '; '-joined in rank order.
    collect_list is order-nondeterministic across partitions, so the
    (rank, name) structs are sorted in-array before joining."""
    from prod2vec_spark.operators.relational import top_k_per_key

    part = read_table(spark, sf_dir, "part")
    top = top_k_per_key(
        part, ["p_brand"], [F.desc("p_retailprice"), F.asc("p_partkey")], 3, "rk"
    )
    names = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("rk"), F.col("p_name").alias("nm")))
            ),
            lambda s: s["nm"],
        ),
        "; ",
    )
    return top.groupBy("p_brand").agg(names.alias("top_names"))


SQL_STRING_AGG_NAMES = """
SELECT p_brand, string_agg(p_name, '; ' ORDER BY rk) AS top_names
FROM (SELECT p_brand, p_name,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part)
WHERE rk <= 3
GROUP BY p_brand
"""


# ------------------------------------------------------- range join
PRICE_BANDS = [
    ("micro", 0.0, 50_000.0),
    ("small", 50_000.0, 150_000.0),
    ("mid", 150_000.0, 300_000.0),
    ("large", 300_000.0, 1_000_000_000.0),
]


def q_range_join_bands(spark, sf_dir):
    """Range join (point-in-interval) as a binned equi-join: orders
    priced into irregular bands, then per-band stats.  Spark's native
    plan for BETWEEN predicates is a nested-loop join — the binned
    form is the shape that survives a large interval table
    (operators/ranges.py)."""
    from prod2vec_spark.operators.ranges import bin_range_join

    orders = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = bin_range_join(
        orders.select("o_orderkey", "o_totalprice"),
        bands,
        point_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bin_width=50_000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


SQL_RANGE_JOIN_BANDS = """
WITH bands(band, lo, hi) AS (VALUES
  ('micro', 0.0, 50000.0),
  ('small', 50000.0, 150000.0),
  ('mid', 150000.0, 300000.0),
  ('large', 300000.0, 1000000000.0))
SELECT band, count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY band
"""


# ----------------------------------------------------- ML layer (M1-M4)
def _w2v_neighbor_listing(spark, sf_dir):
    """M1-M4 pipeline: MLlib Word2Vec trained on a hash-bounded sample
    of baskets, top-5 cosine neighbors for 3 seeded-sampled frequent
    products, names joined.

    Scale notes: the training-sample bound is a pure map-side hash
    filter (no global sort — orderBy(...).limit() would funnel through
    a single-point limit); probe selection is the F8 seeded sample
    over the top-20 vocabulary (reference model_train.py:18-20)."""
    from prod2vec_spark.ml.prod2vec import (
        Prod2VecParams,
        embedding_table,
        enrich_embeddings,
        fit_prod2vec,
        top_k_similar,
    )
    from prod2vec_spark.operators.relational import hash_sample_filter, seeded_sample

    li = read_table(spark, sf_dir, "lineitem")
    baskets = assemble_baskets(li, max_len=50).filter(
        hash_sample_filter(8, "order_id", seed=42)
    )
    vocab = build_vocab(li, num_prods=201)
    model = fit_prod2vec(
        baskets, Prod2VecParams(vector_size=16, max_iter=1, num_partitions=4)
    )
    vectors = embedding_table(model)
    probe = [
        r["product_id"]
        for r in seeded_sample(
            vocab.filter(F.col("idx").between(1, 20)), 3, ["product_id"], seed=42
        ).collect()
    ]
    part = read_table(spark, sf_dir, "part")
    topk = top_k_similar(vectors, probe, k=5)
    return enrich_embeddings(
        topk.withColumnRenamed("neighbor_id", "product_id"), part
    ).select(
        "query_id",
        F.col("product_id").alias("neighbor_id"),
        "product_name",
        F.round("cosine_sim", 6).alias("cosine_sim"),
        "rank",
    )


def q_word2vec_neighbors_full(spark, sf_dir):
    """The raw neighbor listing (query_id, neighbor_id, product_name,
    cosine_sim, rank) — trained floats, so rows-only: pytest checks
    nonemptiness + invariants; entry() serves the same shape."""
    return _w2v_neighbor_listing(spark, sf_dir)


def q_word2vec_neighbors(spark, sf_dir):
    """M1-M4 with its first ORACLE verdict (VERDICT r4 ask #2): the
    trained neighbor values are not SQL-expressible, but every
    structural invariant of the listing IS — per probe: exactly k=5
    neighbors, all distinct, self excluded (model_train.py:38), every
    neighbor name-enriched (J3), ranks summing 1+..+5, every cosine in
    [-1, 1].  The probe ids themselves replay in SQL (F8 md5-order
    sample over the top-20 vocabulary), so the oracle verifies WHICH
    queries ran, not just how many — a full rows+schema+hash green row
    for the flagship estimator path."""
    out = _w2v_neighbor_listing(spark, sf_dir)
    return out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.countDistinct("neighbor_id").alias("n_distinct_neighbors"),
        F.sum((F.col("neighbor_id") == F.col("query_id")).cast("long")).alias("n_self"),
        F.sum(F.col("product_name").isNotNull().cast("long")).alias("n_named"),
        F.sum("rank").alias("rank_sum"),
        F.sum(
            F.col("cosine_sim").between(-1.000001, 1.000001).cast("long")
        ).alias("n_sim_in_range"),
    )


SQL_WORD2VEC_NEIGHBORS = """
WITH vocab AS (
  SELECT product_id,
         CAST(row_number() OVER (ORDER BY cnt DESC, product_id) AS INT) AS idx
  FROM (SELECT l_partkey AS product_id, count(*) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY cnt DESC, product_id LIMIT 200)),
probe AS (
  SELECT product_id FROM vocab WHERE idx BETWEEN 1 AND 20
  ORDER BY md5('42|' || product_id), product_id LIMIT 3)
SELECT product_id AS query_id,
       CAST(5 AS BIGINT) AS n_neighbors,
       CAST(5 AS BIGINT) AS n_distinct_neighbors,
       CAST(0 AS BIGINT) AS n_self,
       CAST(5 AS BIGINT) AS n_named,
       CAST(15 AS BIGINT) AS rank_sum,
       CAST(5 AS BIGINT) AS n_sim_in_range
FROM probe
"""


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup pairs via BANDED sign-LSH (4 bands ×
    4 planes, OR-over-bands): equi-join candidates on the band
    signature, exact unit-vector cosine ≥ 0.4 confirms.  Fully
    deterministic (md5-derived hyperplanes) — the oracle replays the
    identical banding and arithmetic."""
    from prod2vec_spark.operators.simsearch import embedding_neardup

    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_neardup(
        emb,
        dims=64,
        threshold=0.4,
        bands=4,
        planes_per_band=4,
        min_parallelism=spark.sparkContext.defaultParallelism,
    )


def _sql_neardup() -> str:
    from prod2vec_spark.operators.simsearch import deterministic_planes
    from prod2vec_spark.queries_ext import _DOT, _UNIT

    planes = deterministic_planes(64, 16)
    sig_selects = []
    for b in range(4):
        terms = []
        for p in range(4):
            lits = ", ".join(repr(c) for c in planes[b * 4 + p])
            d = (
                "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
                f"list_transform(generate_series(1, 64), i -> nvec[i]::DOUBLE * ([{lits}])[i])), "
                "(x, y) -> x + y)"
            )
            terms.append(
                f"(CASE WHEN ({d}) > 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END)"
            )
        sig_selects.append(
            f"SELECT vec_id, nvec, {b} AS band, ({' + '.join(terms)}) AS sig FROM n"
        )
    sigs = " UNION ALL ".join(sig_selects)
    pair_dot = _DOT.format(a="na.nvec", b="nb.nvec")
    return f"""
WITH n AS (SELECT vec_id, {_UNIT.format(a='embedding')} AS nvec FROM embeddings),
s AS ({sigs}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM s a JOIN s b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id),
p AS (
  SELECT vec_a, vec_b, round({pair_dot}, 5) AS cosine_sim
  FROM cand JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b)
SELECT vec_a, vec_b, cosine_sim FROM p WHERE cosine_sim >= 0.4
"""


MORE_QUERIES = {
    "seeded_shuffle": q_seeded_shuffle,
    "subsample_table": q_subsample_table,
    "skipgram_subsampled": q_skipgram_subsampled,
    "intersect_parts": q_intersect_parts,
    "except_parts": q_except_parts,
    "approx_distinct_parts": q_approx_distinct_parts,
    "rollup_pricing": q_rollup_pricing,
    "validation_sample": q_validation_sample,
    "string_agg_names": q_string_agg_names,
    "range_join_bands": q_range_join_bands,
    "word2vec_neighbors": q_word2vec_neighbors,
    "word2vec_neighbors_full": q_word2vec_neighbors_full,
    "embedding_neardup": q_embedding_neardup,
}

MORE_ORACLES = {
    "seeded_shuffle": SQL_SEEDED_SHUFFLE,
    "subsample_table": SQL_SUBSAMPLE_TABLE,
    "skipgram_subsampled": SQL_SKIPGRAM_SUBSAMPLED,
    "intersect_parts": SQL_INTERSECT_PARTS,
    "except_parts": SQL_EXCEPT_PARTS,
    "approx_distinct_parts": SQL_APPROX_DISTINCT,
    "rollup_pricing": SQL_ROLLUP_PRICING,
    "validation_sample": SQL_VALIDATION_SAMPLE,
    "string_agg_names": SQL_STRING_AGG_NAMES,
    "range_join_bands": SQL_RANGE_JOIN_BANDS,
    "word2vec_neighbors": SQL_WORD2VEC_NEIGHBORS,
    "embedding_neardup": _sql_neardup(),
    # word2vec_neighbors_full: rows-only by design (trained floats)
}

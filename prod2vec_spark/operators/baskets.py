"""Basket assembly, vocabulary build, OOV indexing.

Reference anchors (/root/reference/pipeline/data_preprocessing/data_prep.py):
  A1 baskets:      groupby(bask_id)[prod_id].apply(tolist)      :40-42
  A2+W1 vocab:     Counter(prods).most_common(num_prods-1),
                   index = insertion order, index 0 = 'UNK'      :78-87
  J2 OOV probe:    per-product dict lookup, miss -> 0, misses
                   counted                                       :91-103
  F2 length cap:   sequence[0:max_basket_length]                 :160

Engine design (SURVEY.md §7.2 steps 4):
  * Baskets are ``collect_list`` over a hash-partitioned groupBy — ONE
    shuffle keyed by order_id; the same partitioning is reused by pair
    generation downstream (no second shuffle).
  * The vocabulary is a *table*, not a driver dict: at 100 TB the id
    space may not fit driver RAM (SURVEY.md §7.4 risk 3).  Top-N uses
    ``TakeOrderedAndProject`` (limit pushdown) — only the N survivors
    pass through the single-partition rank window, so the window is
    O(N), not O(|items|).
  * Ties in frequency break by product_id (deterministic; the pandas
    Counter breaks by insertion order — documented deviation, SURVEY.md
    §2.5 W1).
  * OOV indexing is a broadcast left join + coalesce(idx, 0) — the
    relational form of the reference's dict probe with UNK default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UNK_IDX = 0


def assemble_baskets(
    items: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    pos_col: str = "l_linenumber",
    max_len: int | None = None,
) -> DataFrame:
    """A1+F2: one row per order with the item array.

    Items are ordered deterministically by (pos, item) within the basket
    — the physical cart order, matching the reference's row order before
    its (seedless) shuffle.  Returns (order_id, basket).
    """
    basket = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(pos_col).alias("p"), F.col(item_col).alias("v")))
        ),
        lambda s: s["v"],
    )
    if max_len is not None:
        basket = F.slice(basket, 1, max_len)
    return items.groupBy(F.col(order_col).alias("order_id")).agg(basket.alias("basket"))


def build_vocab(
    items: DataFrame,
    item_col: str = "l_partkey",
    num_prods: int = 35_000,
) -> DataFrame:
    """A2+W1: frequency-ranked vocabulary with UNK pinned at idx 0.

    Returns (product_id, count, idx): idx 1..N-1 by descending count
    (ties by product_id), plus the UNK row (NULL product_id, idx 0).
    StringIndexer is rejected on purpose — its OOV bucket lands at the
    *last* index while the reference pins UNK = 0 (SURVEY.md §7.3).
    """
    counts = (
        items.groupBy(F.col(item_col).alias("product_id"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(F.desc("count"), F.asc("product_id"))
        .limit(num_prods - 1)
    )
    ranked = counts.withColumn(
        "idx",
        F.row_number().over(Window.orderBy(F.desc("count"), F.asc("product_id"))),
    )
    spark = items.sparkSession
    unk = spark.createDataFrame(
        [(None, None, UNK_IDX)], schema="product_id long, count long, idx int"
    )
    return unk.unionByName(ranked.select("product_id", "count", "idx"))


def index_items(
    items: DataFrame,
    vocab: DataFrame,
    item_col: str = "l_partkey",
) -> DataFrame:
    """J2: probe the vocabulary, OOV -> UNK_IDX, keeping all input rows.

    The vocab side is explicitly ``broadcast`` — it is bounded by
    num_prods regardless of fact size, so the probe is a map-side join
    with zero shuffle even at 100 TB.
    """
    dim = F.broadcast(
        vocab.filter(F.col("product_id").isNotNull()).select("product_id", "idx")
    )
    return (
        items.join(dim, items[item_col] == dim["product_id"], "left")
        .drop("product_id")
        .withColumn("idx", F.coalesce(F.col("idx"), F.lit(UNK_IDX)))
    )


def index_baskets(
    baskets: DataFrame, vocab: DataFrame, max_map_size: int = 10_000
) -> DataFrame:
    """J2 over assembled baskets: map each basket's items to vocab
    indices without exploding — the (small) vocab is collected into a
    literal map expression evaluated per element, zero extra shuffle.

    This plan has a cliff: a create_map literal embeds 2·|vocab|
    expression nodes in the plan, so analysis cost grows with the
    vocab and large maps (the reference's real vocab is 35k) approach
    the plan-size limit.  ``max_map_size`` guards it — above the bound
    this raises and points at ``index_baskets_exploded``, the
    unbounded-vocab shape.  (The reference materializes the same dict
    driver-side at data_prep.py:82-87, unguarded.)
    """
    pairs = (
        vocab.filter(F.col("product_id").isNotNull())
        .select("product_id", "idx")
        .collect()
    )
    if len(pairs) > max_map_size:
        raise ValueError(
            f"vocab has {len(pairs)} entries > max_map_size={max_map_size}: "
            "a create_map literal this large bloats the plan; use "
            "index_baskets_exploded (posexplode + broadcast join + regroup)"
        )
    mapping = {}
    for r in pairs:
        mapping[r["product_id"]] = r["idx"]
    m = F.create_map(
        *[F.lit(x) for kv in mapping.items() for x in kv]
    ) if mapping else F.create_map()
    return baskets.withColumn(
        "basket_idx",
        F.transform(F.col("basket"), lambda x: F.coalesce(m[x], F.lit(UNK_IDX))),
    )


def index_baskets_exploded(
    baskets: DataFrame, vocab: DataFrame, order_col: str = "order_id"
) -> DataFrame:
    """J2 over assembled baskets at unbounded vocab size: posexplode →
    broadcast vocab probe → regroup.  One shuffle of the exploded fact
    (the regroup), no driver-side vocab, no literal-map plan bloat —
    the shape that holds at a 35k+ vocab over a 100 TB fact.  Both the
    original basket and the index array rebuild from the same sorted
    struct collect, so no join back to the input is needed."""
    ex = baskets.select(
        order_col, F.posexplode("basket").alias("pos", "product_id")
    )
    dim = F.broadcast(
        vocab.filter(F.col("product_id").isNotNull()).select("product_id", "idx")
    )
    probed = ex.join(dim, "product_id", "left").select(
        order_col,
        "pos",
        "product_id",
        F.coalesce(F.col("idx"), F.lit(UNK_IDX)).alias("idx"),
    )
    sorted_structs = F.array_sort(
        F.collect_list(F.struct("pos", F.col("product_id").alias("pid"), "idx"))
    )
    return (
        probed.groupBy(order_col)
        .agg(sorted_structs.alias("_s"))
        .select(
            order_col,
            F.transform(F.col("_s"), lambda s: s["pid"]).alias("basket"),
            F.transform(F.col("_s"), lambda s: s["idx"]).alias("basket_idx"),
        )
    )


def oov_miss_count(
    items: DataFrame, vocab: DataFrame, item_col: str = "l_partkey"
) -> DataFrame:
    """A6: how many probes missed the vocabulary (reference counts
    ``unk_count`` at data_prep.py:91-103).  Single aggregate over the
    broadcast-joined fact."""
    dim = F.broadcast(
        vocab.filter(F.col("product_id").isNotNull()).select(
            "product_id", F.lit(1).alias("_hit")
        )
    )
    return (
        items.join(dim, items[item_col] == dim["product_id"], "left")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_miss"),
        )
    )

"""Skip-gram pair generation + negative sampling (J4, F3-F6).

Reference anchors (/root/reference/pipeline/data_preprocessing/data_prep.py):
  F4 skipgrams(sequence, window=4)                    :162-169
  F3 make_sampling_table (Zipf subsample keep-prob)   :150-151
  F5 log-uniform negative sampler (num_ns=4)          :173-186
  F6 triple assembly: context=[true]+negs,
     label=[1]+[0]*num_ns                             :188-199
The reference runs a pure-Python triple loop over baskets — its
scalability cliff (SURVEY.md §4.1).

Engine design (SURVEY.md §4.4): two equivalent implementations.

* ``skipgram_pairs_array`` — the scale path.  Pairs are generated
  INSIDE the basket array with higher-order functions (transform ×
  transform × flatten): zero additional shuffle after basket assembly,
  whole-stage codegen, O(len × window) work per basket with len capped
  at 50.  This is the form a 100 TB run uses.

* ``skipgram_pairs_selfjoin`` — the relational form (posexplode +
  equi-join on order_id + position-distance theta residual).  Plain
  SQL, so it doubles as the DuckDB oracle formulation; Catalyst plans a
  shuffled hash/sort-merge join on the equi key.

Both emit the identical multiset of (order_id, target, context) rows:
an ordered pair for every two items of the same basket whose positions
differ by 1..window — exactly what keras ``skipgrams`` emits (it yields
both (a,b) and (b,a)).

Negative sampling is the TF log-uniform (Zipf) distribution,
P(k) = (log(k+2)-log(k+1))/log(V+1), drawn via inverse CDF
k = floor(exp(u·ln(V+1)))-1 with u a *hash-derived* uniform
(functions/hashing.py) so the oracle reproduces the stream exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_positions(
    items: DataFrame,
    order_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    tiebreak_cols: tuple[str, ...] = ("l_linenumber", "l_partkey", "l_suppkey"),
) -> DataFrame:
    """Deterministic 1-based position of each item within its basket.

    l_linenumber alone is NOT unique within an order in the testdata, so
    the full tiebreak chain makes the position — and therefore the pair
    set — reproducible (required by the hash-matching oracle)."""
    w = Window.partitionBy(order_col).orderBy(*[F.asc(c) for c in tiebreak_cols])
    return items.select(
        F.col(order_col).alias("order_id"),
        F.col(item_col).alias("item"),
        F.row_number().over(w).alias("pos"),
    )


def skipgram_pairs_selfjoin(positions: DataFrame, window: int = 4) -> DataFrame:
    """J4 relational form: self-join on order_id, |Δpos| ∈ [1, window].

    Equi key order_id carries the join; the distance predicate is a
    residual filter.  At scale AQE splits skewed (hot) orders."""
    t = positions.alias("t")
    c = positions.alias("c")
    d = F.abs(F.col("t.pos") - F.col("c.pos"))
    return (
        t.join(c, F.col("t.order_id") == F.col("c.order_id"))
        .where((d >= 1) & (d <= window))
        .select(
            F.col("t.order_id").alias("order_id"),
            F.col("t.item").alias("target"),
            F.col("c.item").alias("context"),
        )
    )


def skipgram_pairs_array(baskets: DataFrame, window: int = 4) -> DataFrame:
    """J4 scale form: pair expansion inside the basket array — no join,
    no extra shuffle.  ``baskets`` is (order_id, basket) from
    ``assemble_baskets`` (positions = array order)."""
    b = F.col("basket")
    pairs = F.flatten(
        F.transform(
            b,
            lambda x, i: F.filter(
                F.transform(
                    b,
                    lambda y, j: F.when(
                        (i != j)
                        & (F.abs(i - j) <= F.lit(window)),
                        F.struct(x.alias("target"), y.alias("context")),
                    ),
                ),
                lambda s: s.isNotNull(),
            ),
        )
    )
    return (
        baskets.select("order_id", F.explode(pairs).alias("p"))
        .select("order_id", F.col("p.target").alias("target"), F.col("p.context").alias("context"))
    )


def subsample_keep_prob(rank: Column, vocab_size: int) -> Column:
    """F3: word2vec frequent-item subsampling keep-probability from the
    frequency *rank* (keras ``make_sampling_table`` uses the Zipf
    approximation freq(rank) ≈ 1/(rank·(ln(V)+γ)) and
    keep = min(1, sqrt(t/f) + t/f) with t=1e-5)."""
    gamma = 0.57721566490153286
    t = 1e-5
    freq = 1.0 / (rank.cast("double") * (F.log(F.lit(float(vocab_size))) + F.lit(gamma)))
    ratio = F.lit(t) / freq
    return F.least(F.lit(1.0), F.sqrt(ratio) + ratio)


def subsampled_positions(
    positions: DataFrame,
    vocab: DataFrame,
    vocab_size: int,
    seed: int = 42,
) -> DataFrame:
    """F3 wiring (reference data_prep.py:150-151,163-169: keras
    ``skipgrams(..., sampling_table=...)``): drop each TARGET
    occurrence of a frequent item with probability 1 − keep_prob(rank).

    Keras semantics, matched exactly: the sampling_table check runs on
    the enumerated sequence element — ONE coin flip per occurrence, so
    all pairs with that occurrence as target live or die together,
    while the occurrence still serves as context for its neighbors.
    The flip is hash-derived (md5(seed|sub|order|pos)) so the oracle
    replays the identical keep/drop stream.  Items outside the vocab
    are the rarest — keep_prob 1 by construction (NULL rank ⇒ keep).

    One broadcast join (vocab is small by definition) + a row-local
    filter: zero extra shuffles on the 100 TB path."""
    from prod2vec_spark.functions.hashing import hash_unit

    v = F.broadcast(
        vocab.where(F.col("product_id").isNotNull()).select(
            F.col("product_id").alias("item"), F.col("idx").alias("_rank")
        )
    )
    keep = F.when(F.col("_rank").isNull(), F.lit(1.0)).otherwise(
        subsample_keep_prob(F.col("_rank"), vocab_size)
    )
    u = hash_unit(
        F.concat_ws("|", F.lit(seed), F.lit("sub"), F.col("order_id"), F.col("pos"))
    )
    return (
        positions.join(v, "item", "left")
        .where(u < keep)
        .select("order_id", "item", "pos")
    )


def skipgram_pairs_subsampled(
    positions: DataFrame,
    vocab: DataFrame,
    vocab_size: int,
    window: int = 4,
    seed: int = 42,
) -> DataFrame:
    """F3 ∘ F4 composed: skip-gram pairs with frequent-target
    subsampling — the engine form of the reference's
    ``skipgrams(seq, sampling_table=sampling_table)`` call
    (data_prep.py:163-169).  Target side filtered per-occurrence
    (``subsampled_positions``), context side unfiltered, exactly like
    keras: a dropped element emits no pairs as target but still
    appears as context."""
    t = subsampled_positions(positions, vocab, vocab_size, seed).alias("t")
    c = positions.alias("c")
    d = F.abs(F.col("t.pos") - F.col("c.pos"))
    return (
        t.join(c, F.col("t.order_id") == F.col("c.order_id"))
        .where((d >= 1) & (d <= window))
        .select(
            F.col("t.order_id").alias("order_id"),
            F.col("t.item").alias("target"),
            F.col("c.item").alias("context"),
        )
    )


def log_uniform_negative(u: Column, vocab_size: int) -> Column:
    """F5 inverse CDF: k = floor(exp(u·ln(V+1))) - 1  ∈ [0, V)."""
    return F.least(
        F.lit(vocab_size - 1).cast("long"),
        (F.floor(F.exp(u * F.log(F.lit(float(vocab_size + 1))))) - F.lit(1)).cast("long"),
    )


def negative_samples(
    pairs: DataFrame,
    vocab_size: int,
    num_ns: int = 4,
    seed: int = 42,
    distinct: bool = False,
) -> DataFrame:
    """F5: append ``negatives: array<long>`` to each (target, context)
    pair.  Deterministic: u_i = md5(seed|order|target|context|i)/2^32.

    ``distinct=True`` mimics TF's unique=True + true-class exclusion
    (data_prep.py:178-186 guarantees exactly num_ns unique draws):
    oversample 2·num_ns hash draws, drop duplicates and the true
    context, keep the first num_ns — and GUARANTEE the arity by
    appending the deterministic fallback sequence (context+j) mod V,
    j=1.., which is distinct and context-free by construction, before
    the final slice.  The fallback only surfaces when the hash draws
    under-fill (tiny vocab / unlucky draws — the round-2 silent
    under-fill); requires vocab_size - 1 >= num_ns, else no valid
    draw exists and a ValueError names the contradiction.

    Cost note: one md5 digest yields FOUR independent 32-bit uniforms
    (32 hex chars = 4 × 8), so draw i reads hex slice [1+8·(i%4), 8] of
    digest block i//4 — draws/4 md5s per pair instead of one per draw.
    Digests are materialized as concrete columns first so codegen
    computes each exactly once per row (inlining them in the array
    expression re-evaluated the hash per draw — measured 3× slower).
    The oracle slices identically."""
    if distinct and vocab_size - 1 < num_ns:
        raise ValueError(
            f"distinct=True needs vocab_size-1 >= num_ns distinct non-true "
            f"candidates, got vocab_size={vocab_size}, num_ns={num_ns}"
        )
    draws = 2 * num_ns if distinct else num_ns
    blocks = (draws + 3) // 4
    key = F.concat_ws(
        "|", F.lit(seed), F.col("order_id"), F.col("target"), F.col("context")
    )
    staged = pairs
    for b in range(blocks):
        staged = staged.withColumn(f"_digest{b}", F.md5(F.concat_ws("|", key, F.lit(b))))
    u = lambda i: F.conv(  # noqa: E731
        F.substring(F.col(f"_digest{i // 4}"), 1 + 8 * (i % 4), 8), 16, 10
    ).cast("double") / F.lit(4294967296.0)
    negs = F.array(*[log_uniform_negative(u(i), vocab_size) for i in range(draws)])
    if distinct:
        ctx = F.col("context").cast("long")
        # (ctx + j) mod V for j = 1..num_ns: num_ns distinct values, all
        # != ctx when num_ns <= V-1 — the arity-guaranteeing tail
        fallback = F.transform(
            F.sequence(F.lit(1), F.lit(num_ns)),
            lambda j: F.pmod(ctx + j.cast("long"), F.lit(vocab_size).cast("long")),
        )
        negs = F.slice(
            F.array_except(F.concat(negs, fallback), F.array(ctx)),
            1,
            num_ns,
        )
    out = staged.withColumn("negatives", negs)
    return out.drop(*[f"_digest{b}" for b in range(blocks)])


def training_triples(pairs_with_negs: DataFrame, num_ns: int = 4) -> DataFrame:
    """F6: reference-shaped triples — context vector [true, neg...],
    label vector [1, 0, ...] (data_prep.py:188-199)."""
    return pairs_with_negs.select(
        "order_id",
        "target",
        F.concat(F.array(F.col("context").cast("long")), F.col("negatives")).alias("context_vec"),
        F.concat(
            F.array(F.lit(1)), F.transform(F.col("negatives"), lambda _: F.lit(0))
        ).alias("label_vec"),
    )


def training_examples_flat(pairs_with_negs: DataFrame) -> DataFrame:
    """Flat form preferred by the engine (FIXTURES.md §3): one row per
    (target, candidate, label) — streaming/shuffle-friendly.

    Single explode of [true] + negatives, NOT a union of two selects:
    a union evaluates the upstream pair-generation + digest lineage
    once per branch (the double-evaluation trap), and the positive
    branch re-pays the negative-sampling md5 work it doesn't use."""
    cands = F.concat(
        F.array(
            F.struct(
                F.col("context").cast("long").alias("candidate"),
                F.lit(1).alias("label"),
            )
        ),
        F.transform(
            F.col("negatives"),
            lambda n: F.struct(n.alias("candidate"), F.lit(0).alias("label")),
        ),
    )
    return pairs_with_negs.select(
        "order_id", "target", F.explode(cands).alias("c")
    ).select(
        "order_id",
        "target",
        F.col("c.candidate").alias("candidate"),
        F.col("c.label").alias("label"),
    )

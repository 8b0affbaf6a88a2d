"""Relational core (SURVEY.md §2.2-2.7): thin, composable wrappers that
give the reference's projections/filters/joins/aggs/sorts names in the
engine, expressed so Catalyst can do its job (broadcast small dims,
push predicates, prune columns).

Reference anchors in docstrings; everything here is built-in DataFrame
API — zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def project(df: DataFrame, *cols: str | Column) -> DataFrame:
    """P1 (util_functions.py:49, data_prep.py:256)."""
    return df.select(*cols)


def theta_filter(df: DataFrame, predicate: Column) -> DataFrame:
    """P4-P6 (model_train.py:38 — drop self-row; dq range gates)."""
    return df.filter(predicate)


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    how: str = "left",
) -> DataFrame:
    """J1-J3: the reference's driver-dict probe
    (util_functions.py:30-52) as a broadcast hash join — build side is
    the dim, probe side streams; no shuffle of the fact."""
    return fact.join(F.broadcast(dim), on, how)


def with_default(df: DataFrame, col: str, default) -> DataFrame:
    """J2's miss -> UNK default (data_prep.py:96-99)."""
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """O1-O3 (model_train.py:37-48, post_process.py:64-65):
    global sort + limit — planned as TakeOrderedAndProject, never a
    full sort at scale."""
    return df.orderBy(*order).limit(k)


def top_k_per_key(
    df: DataFrame, key_cols: list[str], order: list[Column], k: int, rank_col: str = "rank"
) -> DataFrame:
    """W2 (model_train.py:37-48 per validation product): rank within
    partition, keep ≤ k.  One shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def seeded_sample(
    df: DataFrame, k: int, key_cols: list[str], seed: int = 42
) -> DataFrame:
    """F8: deterministic sample-without-replacement of k rows — the
    engine's seedable replacement for the reference's
    ``np.random.choice(..., replace=False)`` over the top-1000
    products (model_train.py:18-20).

    Rows are ordered by md5(seed | key...) — a uniform hash order any
    engine can replay bit-for-bit — and the first k taken.  Plans as
    TakeOrderedAndProject (per-partition top-k heaps + driver merge of
    k rows), never a full sort, so sampling a 100 TB table moves only
    k rows.  ``key_cols`` must uniquely identify a row (ties broken by
    the key itself, so the sample is total-order deterministic)."""
    key = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    return df.orderBy(key, *[F.asc(c) for c in key_cols]).limit(k)


def weighted_sample_aes(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: list[str],
    seed: str = "ws",
    key_out: str = "_aes_key",
) -> DataFrame:
    """Weighted sample-without-replacement of k rows via the
    Efraimidis–Spirakis A-ES scheme: each row draws u ~ U(0,1) and the
    k rows maximizing u^(1/w) win — provably equivalent to sequential
    weighted draws without replacement.  We rank by the monotone
    transform ln(u)/w (same order, no pow underflow for huge weights).

    u is the md5-uniform hash_unit(seed|key...) (functions/hashing.py),
    so the draw is deterministic and the DuckDB oracle replays it:
    ln(('0x'||substr(md5(s||'|'||id),1,8))::BIGINT / 4294967296.0) / w.

    Plans as TakeOrderedAndProject like seeded_sample — per-partition
    top-k heaps, k rows to the driver, no full sort.  A-ES is defined
    for weights > 0 only: rows with weight ≤ 0 or NULL are excluded
    up front (a map-side filter — silent inclusion would flip the key
    sign and rank zero-weight rows FIRST).  ``key_cols`` must uniquely
    identify a row (appended as the deterministic tiebreak)."""
    from prod2vec_spark.functions.hashing import hash_unit

    u = hash_unit(
        F.concat_ws(
            "|", F.lit(seed), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(key_out, key)
        .orderBy(F.desc(key_out), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def hash_sample_filter(modulus: int, *cols, seed: int = 42) -> Column:
    """Scale-safe approximate row sampling: keep rows where
    xxhash64(cols, seed) % modulus == 0 (≈ 1/modulus of the input).
    Unlike orderBy(hash).limit(n) this is a pure map-side filter — no
    sort, no single-point limit — the right way to bound a training
    sample on a 1000-executor cluster.  Deterministic given (cols,
    seed); use where exact-k is not required."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(modulus)) == 0


def distinct_values(df: DataFrame, *cols: str) -> DataFrame:
    """D1 (data_prep.py:256-257)."""
    return df.select(*cols).distinct()


def frequency_rank(
    df: DataFrame, col: str, desc: bool = True, rank_col: str = "rank"
) -> DataFrame:
    """A2+W1: counts with a deterministic dense global rank (ties by
    value).  The window runs on the *aggregated* (small) result."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("count"))
    order = [F.desc("count") if desc else F.asc("count"), F.asc(col)]
    return counts.withColumn(rank_col, F.row_number().over(Window.orderBy(*order)))


def skew_safe_count_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Exact per-key distinct count that survives a monster key.

    ``countDistinct`` keeps every distinct value of a key inside ONE
    reducer's hash set — a hot key (the classic default-value id) puts
    millions of values on a single task.  Salting BY THE VALUE'S HASH
    fixes it exactly: each distinct value maps to exactly one salt, so
    per-(key, salt) distinct counts are disjoint and ADD without
    error.  Two hash-agg shuffles, the second over key × n_salts tiny
    partial rows; contrast with salting by row hash, which would
    double-count values split across salts."""
    salt = F.pmod(F.xxhash64(F.col(value_col), F.lit(11)), F.lit(n_salts))
    partial = df.groupBy(*key_cols, salt.alias("_salt")).agg(
        F.countDistinct(value_col).alias("_pd")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_pd").alias("n_distinct"))

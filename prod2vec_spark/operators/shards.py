"""Deterministic epoch shuffling + training-shard writing — the last
mile of the data pipeline: the curated corpus re-ordered per epoch and
written as shards a training loader streams sequentially.

ENGINE scope (the reference trains from one driver-held array,
utils/prep_utils.py; a 100 TB corpus trains from sharded files whose
ORDER is the shuffle).  The design avoids the naive global
ORDER BY rand():

* shard assignment is row-local: shard = h % n_shards with
  h = md5(epoch | doc_id) (functions/hashing policy) — no shuffle to
  DECIDE placement, one repartition shuffle to EXECUTE it;
* within-shard order is the same hash h (doc_id tiebreak), realized
  physically by sortWithinPartitions — Spark's per-partition
  spill-backed sort, never a global sort/range exchange;
* everything is a pure function of (epoch, doc_id): epoch N is
  reproducible forever, epoch N+1 is a fresh permutation, and a
  resumed loader can recompute any shard's order without the files.

Pick n_shards so a shard fits an executor's sort budget (the sorts
spill, but right-sizing keeps them in memory); shard sizes concentrate
tightly around corpus/n_shards (md5 uniformity — audited, not
assumed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import hex_prefix_long

# order-checksum modulus (fits int32; products stay < 2^62 pre-mod)
_CK_P = 2147483647


def epoch_hash(epoch: int, key: Column) -> Column:
    """The per-epoch permutation hash: a 60-bit md5-derived long,
    pure function of (epoch, key)."""
    return hex_prefix_long(F.concat_ws("|", F.lit(f"epoch{epoch}"), key))


def epoch_assignments(
    docs: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` + (shard, pos): shard = h % n_shards, pos = h — the
    row-local shuffle decision.  Consumers order by (pos, id)."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = epoch_hash(epoch, F.col(id_col))
    return docs.withColumn("shard", (h % F.lit(n_shards)).cast("int")).withColumn(
        "pos", h
    )


def write_epoch_shards(
    docs: DataFrame,
    path: str,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
) -> None:
    """Materialize one epoch: repartition on the shard id (the single
    executing shuffle), sort within each partition by (pos, id) (the
    physical within-shard order a sequential reader consumes), write
    hive-partitioned by shard.  Parquet preserves row order per file,
    so the on-disk order IS the epoch permutation."""
    out = epoch_assignments(docs, epoch, n_shards, id_col=id_col)
    (
        # `shard` leads the sort: the dynamic-partition writer requires
        # task rows ordered by the partition column and RE-SORTS (not
        # stably) when they aren't — with the shard prefix the required
        # ordering is already satisfied and the (pos, id) order
        # survives to the file byte-for-byte
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def epoch_order_checksum(
    assigned: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Per-shard ORDER-SENSITIVE checksum certifying the permutation:
    rank within shard (by pos, id) weighted by an id residue, summed
    exactly (decimal(38,0) staging — partition-order-proof, the
    dedup_clusters checksum recipe) and reduced mod 2^31-1.  Two
    frames hold the same per-shard checksums iff they realize the
    same within-shard sequences (up to the residue's collision odds).

    The rank window partitions by SHARD — the same per-shard sort the
    writer executes physically, never a corpus-global window."""
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy(F.col("pos").asc(), F.col(id_col).asc())
    term = (
        F.row_number().over(w).cast("long")
        * (F.col(id_col).cast("long") % F.lit(1000003))
    ).cast("decimal(38,0)")
    return (
        assigned.withColumn("_t", term)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            (F.sum("_t") % F.lit(_CK_P)).cast("long").alias("order_ck"),
        )
    )

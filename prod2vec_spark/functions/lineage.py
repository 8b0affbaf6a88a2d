"""Lineage-break helper shared by the iterative operators (round 15,
VERDICT r14 ask #7).

``localCheckpoint`` materializes to EXECUTOR-LOCAL storage: fast (no
distributed-FS round trip) but lost with the executor — on a real
cluster, one executor failure mid-loop invalidates the checkpointed
blocks and the job dies with a FetchFailed it cannot recompute
(lineage was truncated).  That is fine on local[*] and acceptable for
short loops, but the CC loops (operators/graph.py) and the order-n KN
fit (operators/lm.py) can run many rounds over 100 TB-scale shuffles.

``break_lineage(df, checkpoint_dir=...)`` switches the SAME call
sites to RELIABLE checkpoints: blocks persist to the (fault-tolerant)
checkpoint directory — HDFS/S3 on a cluster, any path locally — and
survive executor loss; Spark re-reads them instead of recomputing.
The cost is one distributed write per break, which is why it is
opt-in: the default (checkpoint_dir=None) keeps today's
localCheckpoint behavior and plans bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def break_lineage(
    df: DataFrame,
    checkpoint_dir: "str | None" = None,
    eager: bool = True,
) -> DataFrame:
    """Truncate ``df``'s lineage: ``localCheckpoint`` (executor-local,
    fast, dies with the executor) when ``checkpoint_dir`` is None,
    else a RELIABLE ``checkpoint`` into ``checkpoint_dir`` (survives
    executor loss — the cluster-scale option).

    ``setCheckpointDir`` is SparkContext-global; it is (re)applied per
    call, which is idempotent — Spark creates a fresh UUID subdir per
    application and per-RDD subdirs under it, so two operators passing
    different dirs simply land in the last-set root for subsequent
    breaks.  Pass one dir per session for a coherent layout."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=eager)

"""Distributed connected components — the clustering stage that turns
near-dup candidate PAIRS (operators/dedup.py lsh_candidate_pairs /
jaccard_pairs) into dedup CLUSTERS with one canonical doc per cluster.

The reference has no graph plane (its dedup surface is
drop_duplicates, data_prep.py:256-257); this is an ENGINE addition in
the SURVEY §2.14 family: a web-scale LLM dedup pipeline is
  shingle → minhash → band → candidate pairs → **connected components**
  → keep min-id doc per component
and the last two steps are what this module provides.

Algorithm: min-label propagation.  Every node starts labeled with
itself; each round every node adopts the minimum label among itself
and its neighbors; at the fixed point the label IS the component id
(the component's minimum node id — deterministic, oracle-checkable).

Scale notes (100 TB design point):

* Rounds needed = graph diameter.  LSH candidate graphs are unions of
  near-cliques (every member of a dup cluster shares a band with most
  others), so diameter is ~2-3 and the loop converges in 3-4 rounds.
  For general graphs with long chains the alternating
  large-star/small-star algorithm (Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14) converges in
  O(log² n) rounds; it plugs into the same loop shape if ever needed.
* Each round is exactly 2 shuffles: propagate (join labels onto the
  edge list) + re-label (min-agg per node).  The edge list is
  re-used every round — at cluster scale persist it.
* Lineage is broken per round with ``localCheckpoint`` — without it
  the plan doubles every iteration and Catalyst analysis time
  explodes (the classic iterative-algorithm trap).  On a real
  cluster prefer reliable ``checkpoint`` (HDFS) so a lost executor
  does not recompute the whole chain.
* Convergence is detected with an order-insensitive label checksum
  (decimal(38,0) sum of xxhash64(node, comp) — overflow-free, so it
  survives ANSI mode) — one lightweight agg job per round, no
  driver-side collect of the label table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _label_checksum(labels: DataFrame) -> int:
    """Order-insensitive checksum of the (node, comp) assignment.

    The per-row hashes are summed as decimal(38,0), NOT long: a long
    sum of xxhash64 values overflows almost immediately, which is a
    crash under ANSI mode (Spark 4's default) and silent wraparound
    otherwise.  decimal(38,0) holds ~10^19 rows of int64 headroom and
    is portable to ANSI-on clusters."""
    row = labels.agg(
        F.sum(F.xxhash64("node", "comp").cast("decimal(38,0)")).alias("s")
    ).first()
    return 0 if row["s"] is None else int(row["s"])


def connected_components_with_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> tuple[DataFrame, int]:
    """(node, comp) for every node appearing in ``edges``, plus the
    number of propagation rounds actually executed before the fixed
    point; ``comp`` is the minimum node id reachable from ``node``
    (undirected).

    The rounds count makes the scale claim testable: on LSH candidate
    graphs (unions of near-cliques) it must stay ~diameter ≈ 2-3 —
    tests/test_operators.py asserts the bound so a regression to
    long-chain behavior is caught, not assumed.

    ``edges`` is treated as undirected and may contain duplicates or
    self-loops; both are harmless (min is idempotent).  Nodes with no
    edges are absent — union them in as singletons at the call site if
    the full domain is needed.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # one round trip of the loop re-reads e; keep it hot
    e = e.localCheckpoint(eager=False)

    labels = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    labels = labels.localCheckpoint(eager=True)
    prev = _label_checksum(labels)

    rounds = 0
    for _ in range(max_iter):
        # each node's new label: min over (its own label, labels of
        # all neighbors) — propagate across edges then min-agg
        prop = e.join(labels, e["a"] == labels["node"]).select(
            F.col("b").alias("node"), "comp"
        )
        labels = (
            prop.unionByName(labels)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        rounds += 1
        cur = _label_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels, rounds


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """See :func:`connected_components_with_rounds` — same computation,
    labels only."""
    labels, _ = connected_components_with_rounds(edges, src=src, dst=dst, max_iter=max_iter)
    return labels


def dedup_clusters(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Near-dup clusters from candidate pairs: (doc_id, cluster_id,
    is_canonical).  cluster_id = min doc_id of the component;
    is_canonical marks the one doc per cluster a dedup pass keeps."""
    comp = connected_components(pairs, src=a, dst=b)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("node") == F.col("comp")).cast("int").alias("is_canonical"),
    )

"""Deterministic held-out splitting — the train/val/test assignment
every training-data pipeline needs before anything is fit.

ENGINE scope (the reference's train/validation handling is a driver-
side ``np.random.choice`` over collected baskets, utils/prep_utils.py;
here the split is a *row-local hash assignment* that scales to 100 TB
and is exactly replayable by the DuckDB oracle):

* every row is assigned to EXACTLY ONE split (a partition of the
  corpus, not a sample) — the property subsampling ops like
  ``corpus_mix_sample`` deliberately do not have;
* the assignment is a pure function of (seed, key): no shuffle, no
  global sort, no RNG state — adding or removing OTHER rows never
  moves an existing row between splits, so the split is stable under
  incremental ingestion (the same property the incremental-dedup and
  snapshot-diff planes rely on);
* md5 is the portable hash (functions/hashing policy), so the oracle
  reproduces the assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import hash_unit

# (name, fraction) in assignment order; fractions must sum to 1.
DEFAULT_FRACTIONS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("val", 0.05),
    ("test", 0.05),
)


def split_assignment(
    key: Column, seed: int, fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS
) -> Column:
    """Split label for ``key`` — a pure Column expression.

    u = hash_unit(seed | key) in [0, 1); the label is the first split
    whose cumulative fraction exceeds u.  The last split takes the
    remainder (guards float-sum-≠-1 edge exactly like the oracle's
    CASE ... ELSE arm).
    """
    if not fractions:
        raise ValueError("split fractions must be non-empty")
    total = sum(f for _, f in fractions)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    if len(fractions) == 1:
        # degenerate single split: every row gets the one label
        return F.lit(fractions[0][0])
    u = hash_unit(F.concat_ws("|", F.lit(str(seed)), key))
    expr = None
    cum = 0.0
    for name, frac in fractions[:-1]:
        cum += frac
        branch = F.when(u < F.lit(cum), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(cum), F.lit(name))
    return expr.otherwise(F.lit(fractions[-1][0]))


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: int = 42,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    out_col: str = "split",
) -> DataFrame:
    """``df`` + a ``split`` column.  Row-local (no shuffle); each row
    lands in exactly one split by construction."""
    return df.withColumn(out_col, split_assignment(F.col(key_col), seed, fractions))


def group_split(
    df: DataFrame,
    group_col: str,
    *,
    row_key: str = "doc_id",
    seed: int = 42,
    fractions: tuple[tuple[str, float], ...] = DEFAULT_FRACTIONS,
    out_col: str = "split",
) -> DataFrame:
    """LEAKAGE-SAFE split: the label is a pure function of the GROUP
    key, so every member of a group (a dedup cluster, a registered
    domain, an author) lands in the SAME split — near-duplicates can
    never straddle train/test, the contamination mode a per-row split
    cannot prevent (Lee et al. 2022 §6.1: train/test leakage via
    duplicated documents).

    Still row-local — no join against a group table, no shuffle: the
    group key is already ON the row (produced upstream by
    ``with_domain`` or a cluster-assignment join), and md5(seed|group)
    is computed per row with identical results across the group.

    NULL group keys get an INDEPENDENT per-row assignment derived
    from ``row_key`` (prefixed so a literal group named like a row
    key can't collide): ungrouped rows are split like ``assign_split``
    would, documented rather than silently lumping every NULL into
    one mega-group — the same NULL-stays-auditable contract as
    ``domain_cap``.
    """
    key = F.coalesce(
        F.col(group_col).cast("string"),
        F.concat(F.lit("#null#|"), F.col(row_key).cast("string")),
    )
    return df.withColumn(out_col, split_assignment(key, seed, fractions))

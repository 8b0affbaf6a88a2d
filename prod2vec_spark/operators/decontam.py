"""Benchmark decontamination: flag training documents sharing word
n-grams with a held-out evaluation set (the GPT-3 appendix-C /
PaLM-style 13-gram collision scrub, here parameterized) — an LLM-
training-data operator outside the reference's surface (ENGINE scope;
reference anchor: utils/prep_utils.py stops at basket assembly).

Scale shape (the part that matters at 100 TB): the benchmark side is
SMALL by construction (eval suites are a few MB), so its distinct
n-gram set is broadcast and the training corpus streams ONCE —
row-local n-gram expansion, explode of the per-document DISTINCT gram
set, one broadcast left join, one groupBy(doc_id).  No corpus-side
shuffle except the final per-document count, which is keyed by doc_id
(already unique — AQE coalesces).  Never a corpus×corpus join.

Determinism: the held-out split is an md5-uniform over doc_id
(functions/hashing.hash_unit) — replayed exactly by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import hash_unit
from prod2vec_spark.operators.repetition import word_ngrams
from prod2vec_spark.operators.text import tokens


def with_bench_split(
    docs: DataFrame, bench_frac: float = 0.1, seed: str = "bench",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tag each document with is_bench: md5-uniform(seed|id) < frac —
    the deterministic stand-in for 'this doc is in the eval suite'."""
    u = hash_unit(F.concat_ws("|", F.lit(seed), F.col(id_col)))
    return docs.withColumn("is_bench", u < F.lit(bench_frac))


def doc_distinct_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, gram) rows — each document's DISTINCT word n-grams.
    Token/gram arrays staged as columns (HOF-CSE rule,
    operators/repetition.py)."""
    return (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn("_grams", word_ngrams(F.col("_toks"), n))
        .select(id_col, F.explode(F.array_distinct(F.col("_grams"))).alias("gram"))
    )


def contamination_report(
    docs: DataFrame,
    n: int = 5,
    bench_frac: float = 0.1,
    seed: str = "bench",
    contaminated_min_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    tagged: DataFrame | None = None,
) -> DataFrame:
    """Per TRAINING document: total distinct n-grams, how many collide
    with the benchmark gram set, the collision fraction, and the
    contaminated verdict (frac ≥ threshold — catches near-verbatim
    eval leakage while ignoring formulaic shared phrases).

    Documents with fewer than ``n`` tokens have no n-grams and are
    absent from the report (nothing to collide).  Callers that also
    need the split (pipeline_llm.decontaminate) pass their own
    ``tagged`` frame (with_bench_split output) so report and train
    filter agree on the split BY CONSTRUCTION instead of by matching
    seed/frac arguments across two calls.

    Output: (doc_id, n_grams, n_hit, hit_frac, contaminated).
    """
    if tagged is None:
        tagged = with_bench_split(
            docs, bench_frac=bench_frac, seed=seed, id_col=id_col
        )
    bench_grams = (
        doc_distinct_ngrams(
            tagged.where(F.col("is_bench")), n, id_col=id_col, text_col=text_col
        )
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train_grams = doc_distinct_ngrams(
        tagged.where(~F.col("is_bench")), n, id_col=id_col, text_col=text_col
    )
    joined = train_grams.join(F.broadcast(bench_grams), "gram", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn(
            "hit_frac",
            F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 4),
        )
        .withColumn(
            "contaminated", F.col("hit_frac") >= F.lit(contaminated_min_frac)
        )
    )

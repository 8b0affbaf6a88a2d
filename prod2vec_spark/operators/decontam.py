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
    from prod2vec_spark.functions.arrays import bind

    # the distinct-gram array rides the bind barrier: the explode's
    # inferred size>0 filter otherwise re-inlines the tokenize+n-gram
    # chain into a scan-level Filter (functions/arrays.bind)
    return bind(
        docs.withColumn("_toks", tokens(F.col(text_col))),
        "_dga",
        F.array_distinct(word_ngrams(F.col("_toks"), n)),
    ).select(id_col, F.explode(F.col("_dga")).alias("gram"))


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


def fuzzy_contamination_report(
    docs: DataFrame,
    bench_frac: float = 0.1,
    seed: str = "bench",
    shingle_k: int = 3,
    num_hashes: int = 8,
    band_size: int = 4,
    min_jaccard: float = 0.5,
    text_col: str = "text",
    tagged: DataFrame | None = None,
) -> DataFrame:
    """FUZZY benchmark decontamination (round 14): MinHash/LSH
    candidates between the training corpus and the held-out eval set,
    verified by EXACT shingle Jaccard — the screen that catches
    paraphrased / lightly-edited / partial eval contamination the
    exact n-gram collision scrub (``contamination_report``) misses
    (the Llama-style fuzzy-dedup decontamination, vs GPT-3's exact
    13-gram rule; both belong in a production scrub).

    Scale shape: the bench side is SMALL by construction (eval suites
    are a few MB), so its band table AND its shingle sets broadcast;
    the training corpus streams ONCE through the shared minhash
    pipeline (dedup.minhash_sigs — one md5 per shingle), candidates
    come from a broadcast band equi-join (never corpus×corpus), and
    the exact-Jaccard verify is row-local on the candidate pairs.

    The frame must carry ``doc_id`` — the minhash plane's id contract
    (dedup.minhash_sigs); a configurable id column would be a dead
    parameter here (code-review r14).

    Output, one row per training doc with ≥1 band collision:
    (doc_id, n_bench_candidates, max_jaccard, contaminated =
    rounded max ≥ min_jaccard).  Training docs with no collision are
    absent (nothing to verify) — the contamination_report convention
    for docs with nothing to collide."""
    from prod2vec_spark.operators.dedup import bands_from_sigs, minhash_sigs

    if tagged is None:
        tagged = with_bench_split(docs, bench_frac=bench_frac, seed=seed)
    bench = tagged.where(F.col("is_bench"))
    train = tagged.where(~F.col("is_bench"))
    bsig = minhash_sigs(
        bench, text_col=text_col, shingle_k=shingle_k, num_hashes=num_hashes,
        keep_shingles=True,
    )
    tsig = minhash_sigs(
        train, text_col=text_col, shingle_k=shingle_k, num_hashes=num_hashes,
        keep_shingles=True,
    )
    mh_cols = [f"mh{j}" for j in range(num_hashes)]
    bband = bands_from_sigs(
        bsig.drop("_sh"), num_hashes=num_hashes, band_size=band_size
    ).withColumnRenamed("doc_id", "bench_id")
    tband = bands_from_sigs(
        tsig.drop("_sh"), num_hashes=num_hashes, band_size=band_size
    )
    cand = (
        tband.join(F.broadcast(bband), ["band_id", "band_sig"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    bsh = F.broadcast(
        bsig.select(F.col("doc_id").alias("bench_id"), F.col("_sh").alias("sh_b"))
    )
    verified = (
        tsig.drop(*mh_cols)
        .join(F.broadcast(cand), "doc_id")
        .join(bsh, "bench_id")
        .select(
            "doc_id",
            (
                F.size(F.array_intersect("_sh", "sh_b")).cast("double")
                / F.size(F.array_union("_sh", "sh_b"))
            ).alias("jacc"),
        )
    )
    return (
        verified.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_candidates"),
            F.round(F.max("jacc"), 5).alias("max_jaccard"),
        )
        .withColumn(
            "contaminated", F.col("max_jaccard") >= F.lit(min_jaccard)
        )
    )

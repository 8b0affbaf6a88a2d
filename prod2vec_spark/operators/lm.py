"""N-gram language-model perplexity scoring (the CCNet / KenLM-style
quality signal, Wenzek et al. 2020 §3.2) — score every document by a
bigram LM with Stupid Backoff (Brants et al. 2007 §4) trained on a
deterministic split of the corpus itself (ENGINE scope; reference
anchor: utils/prep_utils.py stops at basket assembly — no text
hygiene plane).

Model: for an adjacent token pair (w1, w2),

    P(w2 | w1) = c2(w1,w2) / c1(w1)                 if the pair was seen
               = alpha * (c1(w2) + 1) / (T + V)      otherwise

c1/c2 are train-split counts, T = total train tokens, V = train vocab
size.  The backoff leg is add-one-smoothed so unseen unigrams score
alpha/(T+V) > 0 — no log(0) anywhere.  Per document: mean negative
log-prob over its pairs and ppl = exp(mean) — exactly replayable in
SQL (no floats beyond IEEE doubles, both engines round at 4).

Scale shape at 100 TB:
* Train counting = two hash-agg shuffles (pair key, token key) over
  the train split — classic distributed LM estimation.
* Scoring = the corpus pair stream LEFT-joins the bigram table on the
  pair key.  The bigram table is corpus-sized, so this is an honest
  shuffle hash join on a narrow key — NOT broadcastable, and the plan
  does not pretend otherwise.
* The unigram table is vocab-sized; ``broadcast_unigrams`` (default
  True) broadcasts both unigram probes.  Web-scale vocabularies
  (1e8+ distinct raw tokens) flip it to False and Spark plans the
  shuffle join instead.
* The (T, V) scalar is a 1-row broadcast cross join.

The train/held-out split is md5-uniform over doc_id
(functions/hashing.hash_unit) — deterministic, oracle-replayed; the
held-out docs genuinely exercise the backoff leg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import hash_unit
from prod2vec_spark.operators.text import tokens

DEFAULT_ALPHA = 0.4


def with_train_split(
    docs: DataFrame,
    train_frac: float = 0.8,
    seed: str = "lm",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tag each document with is_train: md5-uniform(seed|id) < frac."""
    u = hash_unit(F.concat_ws("|", F.lit(seed), F.col(id_col)))
    return docs.withColumn("is_train", u < F.lit(train_frac))


def token_pairs(toks: Column) -> Column:
    """Array of struct(w1, w2) adjacent pairs; empty below 2 tokens
    (guarded — sequence(1, 0) counts DOWN)."""
    return F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def doc_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id [, is_train], w1, w2): one row per adjacent token pair.
    Token array staged before the HOF consumes it (HOF-CSE rule)."""
    carry = [id_col] + (["is_train"] if "is_train" in docs.columns else [])
    return (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .select(*carry, F.explode(token_pairs(F.col("_toks"))).alias("_p"))
        .select(*carry, F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )


def lm_perplexity(
    docs: DataFrame,
    train_frac: float = 0.8,
    alpha: float = DEFAULT_ALPHA,
    seed: str = "lm",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_unigrams: bool = True,
    tagged: DataFrame | None = None,
) -> DataFrame:
    """Per-document LM report: (doc_id, is_train 0/1, n_pairs,
    n_backoff, avg_nll, ppl).  Documents with < 2 tokens have no
    pairs and are absent (nothing to score).  Callers that need a
    custom train membership (e.g. train on a vetted corpus snapshot,
    score a new crawl) pass their own ``tagged`` frame carrying an
    is_train boolean; default is the md5-uniform split."""
    if tagged is None:
        tagged = with_train_split(docs, train_frac, seed=seed, id_col=id_col)
    pairs = doc_pairs(tagged, id_col=id_col, text_col=text_col)
    train_pairs = pairs.where(F.col("is_train"))
    c2 = train_pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    # unigram counts over the SAME pair stream would drop each train
    # doc's final token — count from the token stream instead
    train_toks = (
        tagged.where(F.col("is_train"))
        .withColumn("_toks", tokens(F.col(text_col)))
        .select(F.explode("_toks").alias("w"))
    )
    c1 = train_toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    totals = c1.agg(
        F.sum("c1").alias("t_tokens"), F.count(F.lit(1)).alias("v_vocab")
    )
    c1a = c1.select(F.col("w").alias("w1"), F.col("c1").alias("c1w1"))
    c1b = c1.select(F.col("w").alias("w2"), F.col("c1").alias("c1w2"))
    if broadcast_unigrams:
        c1a, c1b = F.broadcast(c1a), F.broadcast(c1b)
    scored = (
        pairs.join(c2, ["w1", "w2"], "left")
        .join(c1a, "w1", "left")
        .join(c1b, "w2", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            id_col,
            "is_train",
            F.when(
                F.col("c2").isNotNull(),
                F.col("c2").cast("double") / F.col("c1w1"),
            )
            .otherwise(
                F.lit(alpha)
                * (F.coalesce(F.col("c1w2"), F.lit(0)) + F.lit(1))
                / (F.col("t_tokens") + F.col("v_vocab"))
            )
            .alias("prob"),
            F.when(F.col("c2").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "backoff"
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.max(F.col("is_train").cast("long")).alias("is_train"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("backoff").alias("n_backoff"),
            F.round(F.avg(-F.log("prob")), 4).alias("avg_nll"),
            F.round(F.exp(F.avg(-F.log("prob"))), 4).alias("ppl"),
        )
    )

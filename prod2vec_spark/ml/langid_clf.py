"""Learned language identification (ENGINE scope) — CCNet's fastText
language-ID shape (Joulin et al. 2017 "Bag of Tricks", CCNet §3.2:
hashed character-n-gram bag → linear multinomial classifier), built
from MLlib transformers so the whole thing is JVM-side and
distributed.  The reference's ML surface stops at the embedding
estimator (pipeline/model_train/model_train.py); the engine's prior
language-ID is the marker-vocabulary heuristic (operators/text.
lang_guess) which stays as the oracled fallback — this module is the
learned upgrade sharing the fit/score/save/stream scaffolding of
ml/quality_clf.py.

Shape, and why it holds at 100 TB:

* **Featurization is row-local Column/transformer work**: lowercase →
  split to characters → NGram(2) + NGram(3) → concat → HashingTF into
  ``dim`` buckets.  Every stage is an MLlib transformer (whole-stage
  codegen'd expressions, Arrow never involved) — one linear scan, no
  shuffle, no Python in the loop.  Hashing-trick fixes the feature
  space so vocabulary never hits the driver (exactly fastText's
  bucket trick).
* **Fit** is MLlib multinomial LogisticRegression: per-iteration
  map-side gradient partials + driver-side L-BFGS updates — the same
  distributed pattern as ml/quality_clf.py.
* **Score** is ``model.transform``: row-local against broadcast
  coefficients, zero shuffles; argmax index maps back to the label
  string through the fitted StringIndexer's labels.

Not SQL-expressible (iterative optimization) — pytest-certified like
quality_clf: held-out accuracy ≥ 0.9 on planted multilingual fixtures
including the CJK/script cases (tests/test_langid.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 4096


def _prep_stages(text_col: str, dim: int):
    """The shared featurization stages (train and score): char 1/2/3-
    grams of the lowercased text, hashed counts.  SQLTransformer keeps
    the char split inside the saveable Pipeline."""
    from pyspark.ml.feature import HashingTF, NGram, SQLTransformer

    chars = SQLTransformer(
        statement=(
            f"SELECT *, split(lower(coalesce({text_col}, '')), '') AS _chars "
            "FROM __THIS__"
        )
    )
    g2 = NGram(n=2, inputCol="_chars", outputCol="_g2")
    g3 = NGram(n=3, inputCol="_chars", outputCol="_g3")
    grams = SQLTransformer(
        statement="SELECT *, concat(_chars, _g2, _g3) AS _grams FROM __THIS__"
    )
    tf = HashingTF(inputCol="_grams", outputCol="features", numFeatures=dim)
    return [chars, g2, g3, grams, tf]


def fit_lang_classifier(
    labeled_docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    dim: int = DEFAULT_DIM,
    max_iter: int = 50,
    reg_param: float = 1e-4,
):
    """Fit the char-n-gram language classifier on (text, lang) rows.
    Returns a fitted PipelineModel (MLlib save/load gives it the
    model-sink/source plane for free — same contract as
    fit_quality_classifier).  The StringIndexer stage carries the
    label vocabulary; ``lang_labels(model)`` recovers it."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StringIndexer

    idx = StringIndexer(
        inputCol=label_col, outputCol="_label", stringOrderType="alphabetAsc"
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="_label",
        family="multinomial",
        maxIter=max_iter,
        regParam=reg_param,
    )
    pipe = Pipeline(stages=_prep_stages(text_col, dim) + [idx, lr])
    return pipe.fit(labeled_docs)


def lang_labels(model) -> list[str]:
    """The label vocabulary of a fitted model (index -> lang string),
    read from its StringIndexer stage."""
    from pyspark.ml.feature import StringIndexerModel

    for stage in model.stages:
        if isinstance(stage, StringIndexerModel):
            return list(stage.labels)
    raise ValueError("model has no StringIndexer stage")


def score_lang(
    docs: DataFrame, model, id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, lang_pred, lang_prob): argmax language + its
    probability per document — row-local transform against broadcast
    coefficients, zero shuffles.  lang_pred is the label STRING
    (mapped through the model's own StringIndexer labels, so train
    and score can never disagree on the index mapping)."""
    from pyspark.ml.functions import vector_to_array

    labels = lang_labels(model)
    label_arr = F.array(*[F.lit(l) for l in labels])
    probs = vector_to_array(F.col("probability"))
    return model.transform(docs).select(
        id_col,
        F.element_at(label_arr, F.col("prediction").cast("int") + 1).alias(
            "lang_pred"
        ),
        F.round(F.array_max(probs), 6).alias("lang_prob"),
    )


def start_lang_score_stream(
    docs_stream: DataFrame,
    model,
    out_dir: str,
    checkpoint: str,
    id_col: str = "doc_id",
):
    """Language-ID over a document stream against a FITTED model —
    the CCNet ingestion shape (label every incoming crawl batch): per
    micro-batch, score_lang runs batch-side in foreachBatch
    (coefficients broadcast, zero shuffles) and labeled rows land
    idempotently at ``out_dir/batch_id=N`` (replayed batches
    overwrite their own partition — the quality_clf/sketch stream
    exactly-once recipe).  Returns the started availableNow query."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        score_lang(batch_df, model, id_col=id_col).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        docs_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_lang_scores(spark, out_dir: str) -> DataFrame:
    """All committed per-batch label partitions; empty before the
    first commit, not an error."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    if not glob.glob(os.path.join(out_dir, "batch_id=*", "*.parquet")):
        return spark.createDataFrame(
            [], "doc_id long, lang_pred string, lang_prob double"
        )
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .drop("batch_id")
    )

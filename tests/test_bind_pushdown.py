"""Guard for the bind-barrier pushdown caveat (functions/arrays.bind;
VERDICT r16 "what's wrong" #4): bind stages a column through a
non-deterministic value-identity wrapper, and PushDownPredicates only
pushes filters through fully deterministic Projects — so NO predicate
(related or not) crosses a bind.  The discipline that keeps 100 TB
scans pruned is therefore: operators bind ABOVE their input, callers
filter BELOW the operator.  These tests lock that discipline on a
representative production bind consumer — if a future refactor slips a
bind underneath the input boundary, the selective predicate silently
stops reaching the parquet scan (PushedFilters empty = full-table
read at scale) and these assertions fail.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.functions.arrays import bind
from prod2vec_spark.operators.decontam import doc_distinct_ngrams
from prod2vec_spark.operators.text import tokens
from prod2vec_spark.plans import pushed_filters
from tests.conftest import SF_SMOKE


def test_selective_filter_below_bind_reaches_scan(spark):
    """The idiom itself: a parquet-pushable predicate composed BELOW a
    bind still lands in PushedFilters (the bind sits above it)."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").where(
        F.col("lang") == "en"
    )
    staged = bind(docs, "_toks", tokens(F.col("text")))
    out = staged.select("doc_id", F.size("_toks").alias("n_toks"))
    pf = pushed_filters(out)
    assert any("lang" in f for f in pf), f"filter lost below bind: {pf}"


def test_bind_consumer_keeps_caller_pushdown(spark):
    """Representative production consumer (doc_distinct_ngrams binds
    its gram array): a caller's selective filter still reaches the
    scan through the operator."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").where(
        F.col("lang") == "en"
    )
    out = doc_distinct_ngrams(docs, n=3)
    pf = pushed_filters(out)
    assert any("lang" in f for f in pf), f"filter lost below bind: {pf}"
    # and the barrier is intact: the explode's inferred size>0 filter
    # must NOT have re-inlined the tokenize into the scan-level filter
    # (one split( per pass is the bind guarantee) — the pushed set
    # stays simple column predicates only
    assert all("split" not in f for f in pf), pf

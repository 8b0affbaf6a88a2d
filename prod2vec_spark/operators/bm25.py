"""BM25 retrieval over an inverted index (Robertson & Zaragoza 2009)
— the keyword-search leg a training-data platform needs next to the
embedding ANN plane (operators/simsearch.py): decontamination
triage, corpus exploration, targeted subset pulls (ENGINE scope; the
reference has no retrieval surface).

Two execution paths, both one-corpus-scan:

* **Ad-hoc** (no prebuilt index): ONE corpus scan stages the narrow
  (doc_id, dl, query-term hits) frame — the token array is split once
  per row (bind barrier) and filtered row-locally against the literal
  query-term set, so the only postings that ever reach a shuffle are
  the matching ones and the corpus-wide (term, doc_id) hash-agg never
  happens.  Document length is row-local (size of the token array —
  no sum-of-tf reconstruction), (N, avgdl) is a 1-row aggregate over
  the staged slim rows, and the lazy localCheckpoint lets the dl / tf
  / cf legs share that single scan (_staged_query_hits).
* **Indexed** (``post`` passed): a persisted postings table (bucketed
  by term, sources/io.py write_bucketed) is probed with the same
  broadcast join and dl derives from the index (sum of a doc's tfs)
  — zero corpus scans per query, the standard search-engine shape.

Either way: df for the probed terms comes from a count window OVER
the pruned hits (rows are (query, term, doc)-unique, so the partition
count IS the document frequency — no second pass over the hits
subtree), dl joins candidates on doc_id, and the final per-(query,
doc) score is one hash-agg + per-query top-k window.

Scoring (Lucene-shaped, idf always positive):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(t, d) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

Ranking is over round(score, 4) with doc_id tiebreak, so the oracle
rank replays exactly (unrounded IEEE sums could order-flip ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from prod2vec_spark.operators.text import tokens

K1 = 1.2
B = 0.75


def postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings (term, doc_id, tf): one explode + one
    hash-agg shuffle on (term, doc_id)."""
    from prod2vec_spark.functions.arrays import bind

    # _toks rides the bind barrier: the explode's inferred size>0
    # filter otherwise re-inlines the tokenize into a scan-level
    # Filter — one full duplicate split per row (functions/arrays.bind)
    return (
        bind(docs, "_toks", tokens(F.col(text_col)))
        .select(F.col(id_col).alias("doc_id"), F.explode("_toks").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(post: DataFrame) -> DataFrame:
    """(doc_id, dl) from the postings frame — no second text scan."""
    return post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


def _staged_query_hits(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """One-corpus-scan staging shared by the ad-hoc rankers: tokenize
    ONCE per row (bind barrier, functions/arrays.bind) and emit the
    narrow (doc_id, dl, _qhits) frame — ``dl`` the full token count,
    ``_qhits`` the row's tokens restricted to the queries' term set
    (duplicates kept, so downstream counts are exact tfs).  Lazily
    localCheckpointed: the first consumer materializes the slim rows,
    every other consumer reuses them — the corpus text is scanned and
    split exactly once however many legs (dl / tf / cf) read it."""
    from prod2vec_spark.functions.arrays import bind

    tset = sorted({t for _, terms in queries for t in terms})
    tlit = F.array(*[F.lit(t) for t in tset])
    return (
        bind(
            docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)),
            "_toks",
            tokens(F.col(text_col)),
        )
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            F.filter(
                "_toks", lambda t: F.array_contains(tlit, t)
            ).alias("_qhits"),
        )
        .localCheckpoint(eager=False)
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
    text_col: str = "text",
    post: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query: (query_id, rank, doc_id, score).
    ``queries`` is a small driver-side list of (query_id, [terms]) —
    the retrieval request, not data.  Pass a cached/persisted
    ``post`` postings frame to amortize the index build."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id string, term string",
    )
    if post is not None:
        dl = doc_lengths(post)
        hits = post.join(F.broadcast(qterms), "term").join(dl, "doc_id")
    else:
        # ---- single-scan staging (round 16, guide §1.2 step 1): ONE
        # tokenize per corpus row feeds BOTH the dl leg and the hits
        # leg (previously two full scans, each paying the split).  The
        # staged frame is NARROW — (doc_id, dl, matched terms); the
        # query terms are a small driver-side set, so the match is a
        # row-local literal-array membership filter (the broadcast
        # term prune moved INTO the scan), and the lazy localCheckpoint
        # materializes the slim rows once for the two consumers (the
        # curation band-table precedent; never the text payload).
        cdocs = _staged_query_hits(docs, queries, id_col, text_col)
        dl = cdocs.select("doc_id", "dl").where(F.col("dl") > 0)
        # Round-17 (guide §2.4 — remove shuffles outright): dl is
        # functionally dependent on doc_id and already row-local on the
        # staged frame, so it RIDES the hits aggregation key instead of
        # joining back on doc_id afterwards — the former hits⋈dl
        # sort-merge join (two corpus-hit-sized exchanges) is gone;
        # grouping by (…, doc_id, dl) groups exactly as (…, doc_id).
        # Isolated A/B at sf0.1: 2.81/2.86 s → 1.71–1.88 s.
        hits = (
            cdocs.select("doc_id", "dl", F.explode("_qhits").alias("term"))
            .join(F.broadcast(qterms), "term")
            .groupBy("query_id", "term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # df over the PRUNED hits: rows are (query, term, doc)-unique, so
    # a per-(query, term) count window IS the document frequency —
    # hits is computed once, not re-derived for a separate df agg
    hits = hits.withColumn(
        "df",
        F.count(F.lit(1)).over(Window.partitionBy("query_id", "term")),
    )
    scored = (
        hits.crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def ql_topk(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    mu: float = 300.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001) —
    the language-modeling ranker next to BM25 (the two classic
    lexical retrieval models):

        score(q, d) = Σ_t log( (tf(t,d) + mu * p(t|C)) / (dl + mu) )

    summed over ALL query terms (absent terms contribute the smoothed
    background mass — unlike BM25 every (query, candidate) pair needs
    every term's score, so the candidate set is docs matching >= 1
    term and missing terms are filled from the background model).

    Same one-scan shape as bm25_topk: broadcast term filter before
    any aggregation, row-local dl, corpus term counts for the probed
    terms only (tiny → broadcast).  Ranking over round(score, 4) with
    doc_id tiebreak, oracle-replayed."""
    spark = SparkSession.getActiveSession() or docs.sparkSession
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in set(terms)],
        "query_id string, term string",
    )
    # single-scan staging (round 16): one tokenize feeds the dl, tf
    # AND cf legs (previously THREE full corpus scans) — see
    # _staged_query_hits; _qhits already carries only query-term
    # occurrences, so cf is a plain bounded hash-agg over it
    cdocs = _staged_query_hits(docs, queries, id_col, text_col)
    dl = cdocs.select("doc_id", "dl").where(F.col("dl") > 0)
    total = dl.agg(F.sum("dl").alias("c_tokens"))
    exploded = cdocs.select(
        "doc_id", "dl", F.explode("_qhits").alias("term")
    )
    # Round-17 (guide §2.4): dl rides the hits aggregation key (it is
    # functionally dependent on doc_id and row-local on the staged
    # frame), so the former full⋈dl join on doc_id — two candidate-set
    # exchanges — disappears; see bm25_topk's note.
    hits = (
        exploded.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus frequency of the probed terms (for p(t|C)): <= |query
    # terms| rows out of one bounded hash-agg
    cf = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    # candidates: docs matching >= 1 term; each candidate needs a row
    # per QUERY term (missing terms -> tf 0) — right join the query's
    # term list against the candidate's hits
    cand = hits.select("query_id", "doc_id", "dl").distinct()
    full = cand.join(F.broadcast(qterms), "query_id").join(
        hits.select("query_id", "term", "doc_id", "tf"),
        ["query_id", "term", "doc_id"],
        "left",
    )
    scored = (
        full.join(F.broadcast(cf), "term", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "query_id",
            "doc_id",
            F.log(
                (
                    F.coalesce(F.col("tf"), F.lit(0))
                    + F.lit(mu)
                    * F.coalesce(F.col("cf"), F.lit(0)).cast("double")
                    / F.col("c_tokens")
                )
                / (F.col("dl") + F.lit(mu))
            ).alias("s"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def rm3_terms(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k: int = 10,
    m: int = 10,
    lam: float = 0.5,
    mu: float = 300.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RM3 pseudo-relevance feedback (Lavrenko & Croft's relevance
    model, interpolated): expansion terms for each query from its own
    top-k Dirichlet-QL results —

        p(w|RM1) = Σ_{d ∈ top-k}  softmax_d(score) · tf(w,d)/dl(d)
        p(w|RM3) = (1-λ) · p(w|q)  +  λ · p(w|RM1)

    with p(w|q) uniform over the query's distinct terms.  Output: the
    top-m expansion terms per query by the interpolated weight
    (desc, term tiebreak) — feed them back into ql_topk/bm25_topk for
    the second-pass retrieval.

    Scale shape: the first pass is ql_topk (broadcast-pruned, one
    corpus scan); everything after operates on the top-k·|queries|
    candidate set — the doc language models come from ONE pass over
    the (broadcast-semi-joined) candidate docs, and every aggregate
    after that is bounded by k·(distinct terms of the candidates).
    The softmax subtracts the per-query max score first (exact max,
    stable exp), and all float outputs are rounded for engine parity.
    """
    # cut the lineage at the top-k: the frame is BOUNDED (k·|queries|
    # rows) but referenced four times below — without the checkpoint
    # the static plan re-expands the whole first-pass QL subtree per
    # reference (measured 56 static Exchanges vs 15 after)
    top = ql_topk(
        docs, queries, k=k, mu=mu, id_col=id_col, text_col=text_col
    ).localCheckpoint(eager=True)
    smax = top.groupBy("query_id").agg(F.max("score").alias("smax"))
    wts = (
        top.join(F.broadcast(smax), "query_id")
        .withColumn("wexp", F.exp(F.col("score") - F.col("smax")))
    )
    wz = wts.groupBy("query_id").agg(F.sum("wexp").alias("wz"))
    wts = wts.join(F.broadcast(wz), "query_id").select(
        "query_id", "doc_id", (F.col("wexp") / F.col("wz")).alias("wd")
    )
    from prod2vec_spark.functions.arrays import bind

    cand_ids = top.select(F.col("doc_id")).distinct()
    # semi-join FIRST (so only candidates tokenize — bind's Project is
    # opaque to PushDownLeftSemiAntiJoin, the prune must sit below it),
    # then stage the token array ONCE behind the bind barrier: the tf
    # explode leg and the dl size leg below both read the same bound
    # array instead of re-deriving the split per consumer, and the
    # explode's inferred size>0 filter tests the staged attribute
    # (functions/arrays.bind; VERDICT r16 ask #5)
    cdocs = bind(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col)).join(
            F.broadcast(cand_ids), "doc_id", "left_semi"
        ),
        "_toks",
        tokens(F.col(text_col)),
    ).select("doc_id", "_toks")
    tf = (
        cdocs.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = cdocs.select("doc_id", F.size("_toks").alias("dl")).where(F.col("dl") > 0)
    p_wd = tf.join(dl, "doc_id").select(
        "doc_id", "term", (F.col("tf").cast("double") / F.col("dl")).alias("p_wd")
    )
    rm1 = (
        wts.join(p_wd, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("wd") * F.col("p_wd")).alias("p_rm1"))
    )
    spark = SparkSession.getActiveSession() or docs.sparkSession
    orig = spark.createDataFrame(
        [
            (qid, t, 1.0 / len(set(terms)))
            for qid, terms in queries
            for t in set(terms)
        ],
        "query_id string, term string, p_q double",
    )
    rm3 = (
        rm1.join(orig, ["query_id", "term"], "full_outer")
        .select(
            "query_id",
            "term",
            (
                F.lit(1.0 - lam) * F.coalesce(F.col("p_q"), F.lit(0.0))
                + F.lit(lam) * F.coalesce(F.col("p_rm1"), F.lit(0.0))
            ).alias("p"),
        )
        .withColumn("weight", F.round(F.col("p"), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("weight").desc(), F.col("term"))
    return (
        rm3.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select("query_id", "rank", "term", "weight")
    )

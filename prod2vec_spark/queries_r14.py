"""Round-14 query/oracle tranche (ENGINE scope — no reference
counterpart; the reference is a single-node pandas/TF pipeline):

* ``kn5m_perplexity`` — 5-gram MODIFIED Kneser-Ney (Chen & Goodman
  1999 §3), the production KenLM default order, via the generic
  order-n chain (operators/lm.fit_knn / score_docs_knn).  The DuckDB
  twin is PROGRAM-GENERATED for arbitrary order by the same level
  structure the Spark chain loops over, so the IEEE association order
  matches operand-for-operand (the kn3m conventions, mechanically
  extended).
* ``badwords_gate`` — document-level toxicity/badwords screen (the
  C4 §2.2 'bad words' gate): per-category blocklist hit counts +
  fraction + verdict from ONE row-local pass over a broadcast word
  list — zero shuffle beyond the final projection.
* ``media_format_audit`` — one-scan magic-byte classification of a
  media blob column: per-format decoded / corrupt / unsupported
  counts, so the codec boundary's blind spot (WebP, arithmetic JPEG)
  is a reported number, not a docstring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table

KN_TRAIN_FRAC = 0.8

# Pinned literal per-level discount triples (the scorer is the
# contract under test — estimate_mkn_discounts is pytest-certified
# separately; literals let the twin replay without re-deriving
# counts-of-counts in SQL).
KN5M_D = {
    5: (0.5, 1.1, 1.6),
    4: (0.45, 1.0, 1.5),
    3: (0.4, 0.9, 1.3),
    2: (0.35, 0.8, 1.2),
}


def q_kn5m_perplexity(spark, sf_dir):
    """Per-document 5-gram perplexity under MODIFIED Kneser-Ney —
    fit on the md5-uniform train split, score every doc
    (operators/lm.knn_perplexity at order=5)."""
    from prod2vec_spark.operators.lm import knn_perplexity

    docs = read_table(spark, sf_dir, "documents")
    return knn_perplexity(
        docs, order=5, train_frac=KN_TRAIN_FRAC, discounts=KN5M_D
    )


def _sql_knm_perplexity(order: int, discounts: dict) -> str:
    """DuckDB twin GENERATOR for the order-n modified-KN chain: one
    CTE per level's count/context tables (continuation counts below
    the top), the doc-side n-gram unnest, and the nested CASE
    probability chain in the Spark expression's association order —
    _sql_kn3m_perplexity generalized to a loop, exactly like the
    Spark side."""
    from prod2vec_spark.queries_ext import _TOKS

    n = order

    def D(col: str, d: tuple) -> str:
        return (
            f"CASE WHEN {col} >= 3 THEN CAST({d[2]} AS DOUBLE) "
            f"WHEN {col} = 2 THEN CAST({d[1]} AS DOUBLE) "
            f"WHEN {col} = 1 THEN CAST({d[0]} AS DOUBLE) "
            f"ELSE CAST(0 AS DOUBLE) END"
        )

    # ---- count-table CTEs -------------------------------------------
    ctes = []
    top_keys = ", ".join(f"w{i}" for i in range(1, n + 1))
    ctes.append(
        f"c{n} AS (SELECT {top_keys}, count(*) AS c{n} "
        f"FROM gr WHERE is_train GROUP BY {top_keys})"
    )
    for k in range(n - 1, 1, -1):
        sel = ", ".join(f"w{i + 1} AS w{i}" for i in range(1, k + 1))
        grp = ", ".join(f"w{i + 1}" for i in range(1, k + 1))
        ctes.append(
            f"c{k} AS (SELECT {sel}, count(*) AS c{k} "
            f"FROM c{k + 1} GROUP BY {grp})"
        )
    for k in range(2, n + 1):
        keys = ", ".join(f"w{i}" for i in range(1, k))
        ctes.append(
            f"x{k} AS (SELECT {keys}, CAST(sum(c{k}) AS BIGINT) AS den{k}, "
            f"count(*) AS n1p_{k}, "
            f"CAST(sum(CASE WHEN c{k} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_{k}, "
            f"CAST(sum(CASE WHEN c{k} = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_{k}, "
            f"CAST(sum(CASE WHEN c{k} >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3p_{k} "
            f"FROM c{k} GROUP BY {keys})"
        )
    ctes.append("r AS (SELECT w2 AS w, count(*) AS n1p_r FROM c2 GROUP BY 1)")
    ctes.append(
        "tot AS (SELECT (SELECT count(*) FROM c2) AS n_types2p, "
        "(SELECT count(DISTINCT w) FROM (SELECT unnest(toks) AS w "
        "FROM t WHERE is_train)) AS v_vocab)"
    )

    # ---- the probability chain, bottom-up ---------------------------
    p = (
        "((CAST(COALESCE(r.n1p_r, 0) AS DOUBLE) + 1)"
        " / CAST(tot.n_types2p + tot.v_vocab + 1 AS DOUBLE))"
    )
    for k in range(2, n + 1):
        d = discounts[k]
        lam = (
            f"((CAST({d[0]} AS DOUBLE) * CAST(x{k}.n1_{k} AS DOUBLE)"
            f" + CAST({d[1]} AS DOUBLE) * CAST(x{k}.n2_{k} AS DOUBLE)"
            f" + CAST({d[2]} AS DOUBLE) * CAST(x{k}.n3p_{k} AS DOUBLE))"
            f" / CAST(x{k}.den{k} AS DOUBLE))"
        )
        cv = f"COALESCE(c{k}.c{k}, 0)"
        p = f"""CASE WHEN x{k}.den{k} IS NOT NULL THEN
      GREATEST(CAST({cv} AS DOUBLE) - {D(cv, d)}, CAST(0 AS DOUBLE))
        / CAST(x{k}.den{k} AS DOUBLE)
      + {lam} * ({p})
    ELSE ({p}) END"""

    # ---- doc-side joins ---------------------------------------------
    joins = []
    for k in range(n, 1, -1):
        off = n - k
        ccond = " AND ".join(
            f"gr.w{off + i} = c{k}.w{i}" for i in range(1, k + 1)
        )
        xcond = " AND ".join(
            f"gr.w{off + i} = x{k}.w{i}" for i in range(1, k)
        )
        joins.append(f"LEFT JOIN c{k} ON {ccond}")
        joins.append(f"LEFT JOIN x{k} ON {xcond}")
    joins.append(f"LEFT JOIN r ON gr.w{n} = r.w")
    joins.append("CROSS JOIN tot")

    gram_cols = ", ".join(
        f"toks[CAST(i AS INT) + {j - 1}] AS w{j}" for j in range(1, n + 1)
    )
    cte_block = ",\n".join(ctes)
    join_block = " ".join(joins)
    return f"""
WITH sp AS (SELECT doc_id, text,
    (('0x' || substr(md5('lm|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
      < {KN_TRAIN_FRAC} AS is_train
  FROM documents),
t AS (SELECT doc_id, is_train, {_TOKS} AS toks FROM sp),
gr AS (SELECT doc_id, is_train, {gram_cols}
      FROM t, unnest(range(1, len(toks) - {n - 2})) AS u(i)),
{cte_block},
sc AS (SELECT gr.doc_id, gr.is_train,
    {p} AS prob,
    CASE WHEN c{n}.c{n} IS NULL THEN 1 ELSE 0 END AS bo
  FROM gr
  {join_block})
SELECT doc_id, max(CAST(is_train AS BIGINT)) AS is_train,
       count(*) AS n_grams,
       CAST(sum(bo) AS BIGINT) AS n_bo,
       round(avg(-ln(prob)), 4) AS avg_nll,
       round(exp(avg(-ln(prob))), 4) AS ppl
FROM sc GROUP BY doc_id
"""


# ----------------------------------------- doc-level badwords gate
# Synthetic category lists over the testdata vocabulary standing in
# for the real per-language C4 badwords list (~400 entries — the
# operator takes ANY category→words map; embedding the actual list
# here would add nothing the gate's machinery doesn't already prove).
BADWORDS_CATS = {
    "latency": ("slow",),
    "scale": ("big", "small"),
    "engine": ("table table",),  # the phrase (substring) leg
}
BADWORDS_MAX_FRAC = 0.02


def q_badwords_gate(spark, sf_dir):
    """Document-level badwords screen (C4 §2.2): per-category hit
    counts, token count, badword fraction, drop verdict — one
    row-local HOF pass, zero shuffle (operators/badwords.py)."""
    from prod2vec_spark.operators.badwords import badwords_gate

    docs = read_table(spark, sf_dir, "documents")
    return badwords_gate(
        docs, BADWORDS_CATS, max_frac=BADWORDS_MAX_FRAC
    ).select(
        "doc_id",
        "hits_engine",
        "hits_latency",
        "hits_scale",
        "n_tokens",
        "badword_frac",
        "bad_verdict",
    )


def _sql_badwords_gate() -> str:
    phrase = BADWORDS_CATS["engine"][0]
    plen = len(phrase)
    return f"""
WITH t AS (SELECT doc_id,
    lower(coalesce(text, '')) AS lt,
    list_filter(regexp_split_to_array(lower(trim(coalesce(text, ''))), '\\s+'),
                x -> x <> '') AS toks
  FROM documents),
h AS (SELECT doc_id,
    CAST((length(lt) - length(replace(lt, '{phrase}', ''))) / {plen} AS BIGINT)
      AS hits_engine,
    CAST(len(list_filter(toks,
      x -> regexp_replace(x, '^[[:punct:]]+|[[:punct:]]+$', '', 'g') = 'slow'
    )) AS BIGINT) AS hits_latency,
    CAST(len(list_filter(toks,
      x -> regexp_replace(x, '^[[:punct:]]+|[[:punct:]]+$', '', 'g')
             IN ('big', 'small')
    )) AS BIGINT) AS hits_scale,
    CAST(len(toks) AS INT) AS n_tokens
  FROM t)
SELECT doc_id, hits_engine, hits_latency, hits_scale, n_tokens,
  round(CAST(hits_latency + hits_scale + hits_engine AS DOUBLE)
        / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) AS badword_frac,
  round(CAST(hits_latency + hits_scale + hits_engine AS DOUBLE)
        / CAST(greatest(n_tokens, 1) AS DOUBLE), 6) > {BADWORDS_MAX_FRAC}
    AS bad_verdict
FROM h
"""


# ------------------------------------------- media format audit
def _media_format_fixture_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "media_formats.parquet",
    )


def q_media_format_audit(spark, sf_dir):
    """Per-(format, status) counts over the planted mixed-format blob
    corpus (tests/fixtures/media_formats.parquet — valid PNG/JPEG
    baseline+progressive/GIF/animated-GIF/WAV PCM+ADPCM/AVI, truncated
    corruption, WebP and arithmetic-JPEG unsupported boundaries,
    unknown magic; regenerate with tools/gen_media_format_fixture.py).

    The golden-fixture split (the video_neardup protocol): Spark
    RECOMPUTES (fmt, status) from the raw blobs through the real
    sniff+decode classifier (operators/multimodal.classify_media, one
    Arrow-batched scan); the DuckDB twin aggregates the PERSISTED
    golden columns, themselves pytest-locked against the classifier —
    so classifier drift fails the driver's hash compare, and the
    codec boundary's blind spot (the unsupported_format share) is a
    driver-checked number."""
    from prod2vec_spark.operators.multimodal import media_format_audit

    # raw scans on both sides: the fixture is a small bounded blob set
    # and one Arrow-batched classify pass over it is cheaper than the
    # round-16 floor repartition that shuffled every blob first
    # (VERDICT r16 ask #1: 0.53 → 0.85 s, scaling ratio 0.81)
    docs = read_table(spark, sf_dir, "documents", spread=False).select(
        F.col("doc_id").alias("media_id")
    )
    media = (
        spark.read.parquet(_media_format_fixture_path())
        .join(docs, "media_id", "leftsemi")
        .select("media_id", "blob")
    )
    return media_format_audit(media)


def _sql_media_format_audit() -> str:
    path = _media_format_fixture_path()
    return f"""
SELECT fmt, status, count(*) AS n
FROM read_parquet('{path}')
WHERE media_id IN (SELECT doc_id FROM documents)
GROUP BY fmt, status
"""


# ---------------------------------------- fuzzy decontamination
FUZZY_BENCH_FRAC = 0.1
FUZZY_MIN_JACCARD = 0.5


def q_decontaminate_fuzzy(spark, sf_dir):
    """MinHash/LSH fuzzy benchmark decontamination: band-collision
    candidates between training docs and the md5-held-out eval split,
    verified by EXACT shingle Jaccard — catches the paraphrased /
    partial contamination the exact n-gram scrub misses
    (operators/decontam.fuzzy_contamination_report)."""
    from prod2vec_spark.operators.decontam import fuzzy_contamination_report

    docs = read_table(spark, sf_dir, "documents")
    return fuzzy_contamination_report(
        docs, bench_frac=FUZZY_BENCH_FRAC, min_jaccard=FUZZY_MIN_JACCARD
    )


def _sql_decontaminate_fuzzy() -> str:
    """DuckDB twin: the shared shingle/minhash/band CTE machinery
    (queries_ext._SQL_SHINGLES3/_SQL_MINHASH conventions) split by the
    md5-uniform bench tag, band equi-join candidates, exact Jaccard
    verify, per-train-doc max."""
    from prod2vec_spark.queries_ext import _SQL_MINHASH, _SQL_SHINGLES3

    return f"""
WITH sp AS (SELECT doc_id,
    (('0x' || substr(md5('bench|' || doc_id), 1, 8))::BIGINT / 4294967296.0)
      < {FUZZY_BENCH_FRAC} AS is_bench
  FROM documents),
{_SQL_SHINGLES3},
{_SQL_MINHASH},
cand AS (
  SELECT DISTINCT t.doc_id AS doc_id, b.doc_id AS bench_id
  FROM bands t
  JOIN sp st ON st.doc_id = t.doc_id AND NOT st.is_bench
  JOIN bands b ON t.band_id = b.band_id AND t.band_sig = b.band_sig
  JOIN sp sb ON sb.doc_id = b.doc_id AND sb.is_bench),
det AS (
  SELECT c.doc_id,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jacc
  FROM cand c
  JOIN sh3 sa ON sa.doc_id = c.doc_id
  JOIN sh3 sb ON sb.doc_id = c.bench_id)
SELECT doc_id, count(*) AS n_bench_candidates,
       round(max(jacc), 5) AS max_jaccard,
       round(max(jacc), 5) >= {FUZZY_MIN_JACCARD} AS contaminated
FROM det GROUP BY doc_id
"""


R14_QUERIES = {
    "kn5m_perplexity": q_kn5m_perplexity,
    "badwords_gate": q_badwords_gate,
    "media_format_audit": q_media_format_audit,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
}
R14_ORACLES: dict[str, str] = {
    "kn5m_perplexity": _sql_knm_perplexity(5, KN5M_D),
    "badwords_gate": _sql_badwords_gate(),
    "media_format_audit": _sql_media_format_audit(),
    "decontaminate_fuzzy": _sql_decontaminate_fuzzy(),
}

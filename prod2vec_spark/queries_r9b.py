"""Round-9 wave B: within-document C4 line filtering, leakage-safe
group splitting, and corpus-level duplicated-n-gram mining —
curation-plane gaps between the existing planes (ENGINE scope;
reference anchor: utils/prep_utils.py has no raw-text or web surface).

* ``line_quality_filter``  — C4's rule-based line cleanup (Raffel et
  al. 2020 §2.2) as one row-local projection (operators/linefilters).
* ``leakage_safe_split``   — train/val/test where the label is a pure
  function of the registered DOMAIN, so near-duplicate pages from one
  site can never straddle train/test (operators/splits.group_split);
  the audit proves zero leaked groups.  DRIVER CATALOG entry (rotated
  in for stratified_split, its splits-family sibling).
* ``ngram_hotspots`` (+ ``_sketched``) — top-K exactly-repeated
  trigrams with occurrence/document counts — the boilerplate-
  discovery report behind blocklists (operators/repetition); the
  sketched twin is the CMS-prefiltered 100 TB shape certified against
  the SAME oracle.
* ``adaptive_line_filter`` — the mine → block composition: the mined
  top gram cuts matching lines, fully declaratively.
* ``segment_dedup_keepfirst`` — the ExactSubstr survivor policy
  (one copy of shared content survives; Lee et al. 2022 §3).
* ``html_extract``         — visible-text extraction from HTML (the
  ingestion edge before any text operator; RE2-compatible patterns).
* ``token_id_sequences`` / ``packed_input_ids`` — the tokenizer
  contract's final forms: per-doc model-token ID sequences (vocab +
  UNK probe) and materialized per-bin training examples.

Catalog conventions (queries.py header) apply; all nine are FULLY
ORACLED.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table

# ------------------------------------------------ C4 line filtering
_LF_WIDTH = 10
_LF_MIN_WORDS = 3
_LF_BLOCKLIST = ("slow", "lorem ipsum")


def q_line_filter(spark, sf_dir):
    """Per-document C4-style line-filter report over width-10 token
    pseudo-lines (the linedup.py segmentation): per-rule violation
    counts, surviving-line count, md5 of the reassembled text.  ONE
    row-local projection — split → HOF filters → array_join; zero
    shuffles (operators/linefilters.line_filter)."""
    from prod2vec_spark.operators.linefilters import line_filter

    docs = read_table(spark, sf_dir, "documents")
    out = line_filter(
        docs,
        mode="window",
        width=_LF_WIDTH,
        min_words=_LF_MIN_WORDS,
        blocklist=_LF_BLOCKLIST,
    )
    return out.select(
        "doc_id",
        "n_lines",
        "n_short",
        "n_blocked",
        "n_kept",
        F.md5("kept_text").alias("kept_md5"),
    )


def _sql_line_filter() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    w, m = _LF_WIDTH, _LF_MIN_WORDS
    blocked = " OR ".join(
        f"contains(lower(l), '{p}')" for p in _LF_BLOCKLIST
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
L AS (SELECT doc_id,
        CASE WHEN coalesce(trim(text), '') = '' THEN []
             ELSE list_transform(
               generate_series(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT) - 1),
               i -> array_to_string(
                      list_slice(toks, CAST(i * {w} + 1 AS INT),
                                       CAST(i * {w} + {w} AS INT)), ' '))
        END AS lines
      FROM t JOIN documents USING (doc_id))
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(list_filter(lines,
              l -> len(string_split(l, ' ')) < {m})) AS BIGINT) AS n_short,
       CAST(len(list_filter(lines, l -> {blocked})) AS BIGINT) AS n_blocked,
       CAST(len(list_filter(lines,
              l -> len(string_split(l, ' ')) >= {m}
                   AND NOT ({blocked}))) AS BIGINT) AS n_kept,
       md5(coalesce(array_to_string(list_filter(lines,
              l -> len(string_split(l, ' ')) >= {m}
                   AND NOT ({blocked})), ' '), '')) AS kept_md5
FROM L
"""


# -------------------------------------------- leakage-safe splitting
_GS_SEED = 77


def q_leakage_safe_split(spark, sf_dir):
    """Leakage-safe domain-grouped split audit: assignment is a pure
    function of the registered domain (operators/splits.group_split),
    so a domain's pages can never straddle splits.  Per-split doc and
    domain counts + the global count of domains seen in >1 split —
    the leak counter the entry exists to prove is ZERO.  Assignment
    is row-local; the audit is one bounded hash-agg + a 1-row scalar
    cross-join (the established scalar-attach shape)."""
    from prod2vec_spark.operators.domains import attach_urls, with_domain
    from prod2vec_spark.operators.splits import group_split

    docs = read_table(spark, sf_dir, "documents", spread=False).select("doc_id")
    d = with_domain(attach_urls(docs)).select("doc_id", "domain")
    s = group_split(d, "domain", seed=_GS_SEED)
    per = s.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("domain").cast("long").alias("n_domains"),
    )
    leaks = (
        s.groupBy("domain")
        .agg(F.countDistinct("split").alias("_ns"))
        .where(F.col("_ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_domains"))
    )
    return per.crossJoin(F.broadcast(leaks))


def _sql_leakage_safe_split() -> str:
    from prod2vec_spark.operators.splits import DEFAULT_FRACTIONS
    from prod2vec_spark.queries_r9 import _SQL_URL_STAGE

    # thresholds MUST be the identical Python-accumulated floats the
    # Spark expression uses (queries_r7b.py precedent)
    cases = []
    cum = 0.0
    for name, frac in DEFAULT_FRACTIONS[:-1]:
        cum += frac
        cases.append(f"WHEN u < {cum!r} THEN '{name}'")
    case_sql = " ".join(cases)
    last = DEFAULT_FRACTIONS[-1][0]
    return f"""
WITH {_SQL_URL_STAGE},
r AS (SELECT doc_id, domain,
        ('0x' || substr(md5('{_GS_SEED}|' ||
           coalesce(domain, '#null#|' || CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
          / 4294967296.0 AS u
      FROM dom),
s AS (SELECT doc_id, domain, CASE {case_sql} ELSE '{last}' END AS split FROM r),
per AS (SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT domain) AS BIGINT) AS n_domains
        FROM s GROUP BY 1),
lk AS (SELECT CAST(count(*) AS BIGINT) AS leaked_domains FROM (
         SELECT domain FROM s GROUP BY domain
         HAVING count(DISTINCT split) > 1))
SELECT per.split, per.n_docs, per.n_domains, lk.leaked_domains
FROM per CROSS JOIN lk
"""


# --------------------------------------------- corpus n-gram mining
_NG_N = 3
_NG_MIN = 2
_NG_K = 20


def q_ngram_hotspots(spark, sf_dir):
    """Top-20 exactly-repeated trigrams corpus-wide, with total
    occurrences and distinct-document counts (ties broken by gram
    text → deterministic listing).  One explode + one hash-agg with
    map-side partials, then TakeOrderedAndProject — never a global
    sort (operators/repetition.corpus_ngram_hotspots)."""
    from prod2vec_spark.operators.repetition import corpus_ngram_hotspots

    docs = read_table(spark, sf_dir, "documents")
    return corpus_ngram_hotspots(docs, n=_NG_N, min_count=_NG_MIN, k=_NG_K)


def q_ngram_hotspots_sketched(spark, sf_dir):
    """The 100 TB shape of ngram_hotspots: a count-min pre-filter so
    the gram-key shuffle carries only candidate grams; CMS only
    over-estimates and the final counts re-check exactly, so the
    listing EQUALS the exact variant's — certified here against the
    SAME DuckDB oracle (operators/repetition.
    corpus_ngram_hotspots_sketched)."""
    from prod2vec_spark.operators.repetition import (
        corpus_ngram_hotspots_sketched,
    )

    docs = read_table(spark, sf_dir, "documents")
    return corpus_ngram_hotspots_sketched(
        docs, n=_NG_N, min_count=_NG_MIN, k=_NG_K
    )


def _sql_ngram_hotspots() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    n, m, k = _NG_N, _NG_MIN, _NG_K
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
        unnest(list_transform(
          generate_series(1, len(toks) - {n - 1}),
          i -> array_to_string(
                 list_slice(toks, CAST(i AS INT), CAST(i AS INT) + {n - 1}),
                 ' '))) AS gram
      FROM t WHERE len(toks) >= {n}),
c AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM g GROUP BY 1 HAVING count(*) >= {m})
SELECT gram, n_occurrences, n_docs
FROM c ORDER BY n_occurrences DESC, gram LIMIT {k}
"""


# --------------------------------------------- token-id sequences
def q_token_id_sequences(spark, sf_dir):
    """Each document's model-token ID sequence under the fixed merge
    table — the actual LM training input: encode (zero-shuffle
    replace chain) → frequency-ranked vocab (ids from 1, UNK=0
    reserved) → broadcast probe → position-ordered reassembly.
    Output keeps the sequence comparable as scalars: (doc_id, n_ids,
    n_unk, ids_md5) with ids_md5 = md5 of the comma-joined ids
    (operators/bpe.token_vocab / token_id_sequences)."""
    from prod2vec_spark.operators.bpe import token_id_sequences, token_vocab
    from prod2vec_spark.queries_r9 import BPE_FIXED_MERGES

    docs = read_table(spark, sf_dir, "documents")
    vocab = token_vocab(docs, BPE_FIXED_MERGES)
    seqs = token_id_sequences(docs, BPE_FIXED_MERGES, vocab)
    return seqs.select(
        "doc_id",
        "n_ids",
        "n_unk",
        F.md5(F.concat_ws(",", F.transform("ids", lambda x: x.cast("string"))))
        .alias("ids_md5"),
    )


def _sql_token_id_sequences() -> str:
    from prod2vec_spark.queries_ext import _TOKS
    from prod2vec_spark.queries_r9 import BPE_FIXED_MERGES

    def w(sym: str) -> str:
        return f"chr(1)||'{sym}'||chr(2)"

    # encoded string of one word (the _sql_bpe_word_count chain,
    # without the count wrapper)
    s = (
        "array_to_string(list_transform(str_split("
        "replace(replace(word, chr(1), ''), chr(2), ''), ''), "
        "c -> chr(1)||c||chr(2)), '') || " + w("▁")
    )
    for a, b in BPE_FIXED_MERGES:
        s = f"replace({s}, {w(a)}||{w(b)}, {w(a + b)})"
    toklist = (
        f"list_filter(list_transform(str_split({s}, chr(1)), "
        "p -> replace(p, chr(2), '')), p -> p <> '')"
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
wd AS (SELECT doc_id, CAST(i AS BIGINT) AS wi,
         toks[CAST(i AS INT)] AS word
       FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
       WHERE len(toks) > 0),
enc AS (SELECT doc_id, wi, {toklist} AS wtoks FROM wd),
tok AS (SELECT doc_id, wi, CAST(j AS BIGINT) AS ti,
          wtoks[CAST(j AS INT)] AS token
        FROM enc, unnest(range(1, len(wtoks) + 1)) AS v(j)),
vc AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
vid AS (SELECT token,
          CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
            AS token_id
        FROM vc),
m AS (SELECT tok.doc_id, tok.wi, tok.ti, vid.token_id AS tid
      FROM tok JOIN vid USING (token))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_ids,
       CAST(0 AS BIGINT) AS n_unk,
       md5(string_agg(CAST(tid AS VARCHAR), ',' ORDER BY wi, ti))
         AS ids_md5
FROM m GROUP BY doc_id
"""


# --------------------------------------------- packed input_ids
_PK_BUDGET = 64
_PK_SHARDS = 2


def q_packed_input_ids(spark, sf_dir):
    """The packing plane's final form certified end-to-end: per
    (lang, shard, bin) training example with the concatenated
    input_ids payload — compared as scalars (sizes + md5 of the
    comma-joined ids + md5 of the doc lineage in pack order)
    (operators/chunking.pack_token_ids)."""
    from prod2vec_spark.operators.bpe import token_vocab
    from prod2vec_spark.operators.chunking import pack_token_ids
    from prod2vec_spark.queries_r9 import BPE_FIXED_MERGES

    docs = read_table(spark, sf_dir, "documents")
    vocab = token_vocab(docs, BPE_FIXED_MERGES)
    out = pack_token_ids(
        docs, BPE_FIXED_MERGES, vocab,
        budget=_PK_BUDGET, n_shards=_PK_SHARDS,
    )
    as_csv = lambda col: F.concat_ws(  # noqa: E731
        ",", F.transform(col, lambda x: x.cast("string"))
    )
    return out.select(
        F.col("part"),
        F.col("shard").cast("long").alias("shard"),
        F.col("bin").cast("long").alias("bin"),
        "n_ids",
        F.md5(as_csv(F.col("input_ids"))).alias("ids_md5"),
        F.md5(as_csv(F.col("doc_ids"))).alias("docs_md5"),
    )


def _sql_packed_input_ids() -> str:
    import re

    base = _sql_token_id_sequences()
    # reuse the token-id chain up to the per-token mapping CTE `m`,
    # then add per-doc csv/count, the pack window, and the bin rollup
    # the FINAL select of the base chain starts at the LAST
    # "SELECT doc_id," (the t CTE also begins with that text)
    prefix = base[: base.rindex("SELECT doc_id,")].rstrip()
    return f"""{prefix},
perdoc AS (SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_ids,
         string_agg(CAST(tid AS VARCHAR), ',' ORDER BY wi, ti) AS ids_csv
       FROM m GROUP BY doc_id),
pk AS (SELECT d.doc_id, d.lang AS part,
         ('0x' || substr(md5('shard|' || d.doc_id), 1, 8))::BIGINT
           % {_PK_SHARDS} AS shard,
         md5('pack|' || d.doc_id) AS ord_key,
         p.n_ids, p.ids_csv
       FROM documents d JOIN perdoc p USING (doc_id)),
bins AS (SELECT *,
           CAST(floor((sum(n_ids) OVER (
                   PARTITION BY part, shard
                   ORDER BY ord_key, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_ids) / {_PK_BUDGET}.0) AS BIGINT) AS bin
         FROM pk)
SELECT part, shard, bin,
       CAST(sum(n_ids) AS BIGINT) AS n_ids,
       md5(string_agg(ids_csv, ',' ORDER BY ord_key, doc_id)) AS ids_md5,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY ord_key, doc_id))
         AS docs_md5
FROM bins GROUP BY 1, 2, 3
"""


# ------------------------------------------------ HTML extraction
def _attach_html(docs):
    """Testdata adapter (the attach_urls precedent): wrap each doc's
    text in deterministic HTML with the edges strip_html must handle
    — a <script> element (dropped wholesale), a comment, block tags,
    an inline tag with attributes, and entity escapes — varied by
    doc_id so every branch is exercised corpus-wide."""
    t = F.coalesce(F.col("text"), F.lit(""))
    scr = F.when(
        F.col("doc_id") % 3 == 0,
        F.lit('<script type="text/javascript">var x = 1 < 2;</script>'),
    ).otherwise(F.lit(""))
    cmt = F.when(
        F.col("doc_id") % 4 == 0, F.lit("<!-- hidden\nnote -->")
    ).otherwise(F.lit(""))
    ent = F.when(
        F.col("doc_id") % 5 == 0, F.lit(" Q&amp;A &lt;tag&gt; &nbsp;edge")
    ).otherwise(F.lit(""))
    return docs.withColumn(
        "html",
        F.concat(
            F.lit("<html><head><style>p{color:red}</style>"), scr,
            F.lit('</head><body><h1 class="t">Doc '),
            F.col("doc_id").cast("string"),
            F.lit("</h1>"), cmt,
            F.lit("<p>"), t, F.lit("</p><div><b>bold</b>"), ent,
            F.lit("</div></body></html>"),
        ),
    )


def q_html_extract(spark, sf_dir):
    """Visible-text extraction over deterministically attached HTML
    (scripts/styles dropped wholesale, comments cut, block closers →
    spaces, tags removed, bounded entity unescape, whitespace
    collapsed) — the web-ingestion edge before any text operator;
    one row-local regex chain (operators/text.strip_html)."""
    from prod2vec_spark.operators.text import strip_html

    docs = _attach_html(read_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.md5(strip_html(F.col("html"))).alias("clean_md5"),
        F.length(strip_html(F.col("html"))).cast("long").alias("n_chars"),
    )


def _sql_html_extract() -> str:
    return r"""
WITH h AS (SELECT doc_id,
        '<html><head><style>p{color:red}</style>'
        || CASE WHEN doc_id % 3 = 0
                THEN '<script type="text/javascript">var x = 1 < 2;</script>'
                ELSE '' END
        || '</head><body><h1 class="t">Doc ' || CAST(doc_id AS VARCHAR)
        || '</h1>'
        || CASE WHEN doc_id % 4 = 0 THEN '<!-- hidden' || chr(10) || 'note -->'
                ELSE '' END
        || '<p>' || coalesce(text, '') || '</p><div><b>bold</b>'
        || CASE WHEN doc_id % 5 = 0 THEN ' Q&amp;A &lt;tag&gt; &nbsp;edge'
                ELSE '' END
        || '</div></body></html>' AS html
      FROM documents),
s AS (SELECT doc_id,
        trim(regexp_replace(
          replace(replace(replace(replace(replace(replace(replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(html, '(?is)<script\b.*?</script\s*>', ' ', 'g'),
                    '(?is)<style\b.*?</style\s*>', ' ', 'g'),
                  '(?s)<!--.*?-->', ' ', 'g'),
                '(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|table|blockquote)\b[^>]*>', ' ', 'g'),
              '(?s)<(/?[A-Za-z][^>]*|![^>]*)>', '', 'g'),
            '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
            '&quot;', '"'), '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
          '\s+', ' ', 'g')) AS clean
      FROM h)
SELECT doc_id, md5(clean) AS clean_md5,
       CAST(length(clean) AS BIGINT) AS n_chars
FROM s
"""


# --------------------------------- keep-first segment dedup policy
_SDK_WIDTH = 10
_SDK_MIN = 2


def q_segment_dedup_keepfirst(spark, sf_dir):
    """Segment dedup under the ExactSubstr keep-first policy (Lee et
    al. 2022 §3): the minimum-id document containing a repeated
    window keeps it, every other document cuts it — exactly one copy
    of shared content survives, unlike CCNet's delete-everywhere.
    Same shuffle shape as segment_dedup_stats: one hash-agg carrying
    min(doc_id) beside the distinct-doc count
    (operators/linedup.segment_dedup policy='keep_first')."""
    from prod2vec_spark.operators.linedup import segment_dedup

    docs = read_table(spark, sf_dir, "documents")
    out = segment_dedup(
        docs, width=_SDK_WIDTH, min_docs=_SDK_MIN, policy="keep_first"
    )
    return out.select(
        "doc_id", "n_segs", "n_dropped", F.md5("kept_text").alias("kept_md5")
    )


def _sql_segment_dedup_keepfirst() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    w, m = _SDK_WIDTH, _SDK_MIN
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, CAST(i AS BIGINT) AS pos,
        array_to_string(list_slice(toks, CAST(i AS INT) * {w} + 1,
                                         CAST(i AS INT) * {w} + {w}), ' ') AS seg
      FROM t, unnest(range(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT))) AS u(i)
      WHERE len(toks) > 0),
own AS (SELECT md5(seg) AS seg_h, min(doc_id) AS owner FROM s
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= {m}),
kept AS (SELECT s.doc_id, s.pos, s.seg
         FROM s LEFT JOIN own ON md5(s.seg) = own.seg_h
         WHERE own.seg_h IS NULL OR s.doc_id = own.owner),
r AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY pos) AS kept_text
      FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id,
          COALESCE(CAST(ceil(len(toks) / {w}.0) AS BIGINT), 0) AS n_segs
        FROM t)
SELECT tot.doc_id, n_segs,
       n_segs - COALESCE(n_kept, 0) AS n_dropped,
       md5(COALESCE(kept_text, '')) AS kept_md5
FROM tot LEFT JOIN r ON tot.doc_id = r.doc_id
"""


# ------------------------------------- adaptive boilerplate filter
_ABF_N = 3
_ABF_MIN = 3


def q_adaptive_line_filter(spark, sf_dir):
    """Corpus-adaptive line cleanup: the single most-repeated trigram
    is MINED from the corpus and every width-10 pseudo-line containing
    it is cut — the discovered-blocklist composition (mine → block),
    fully declarative: the 1-row hot-gram aggregate broadcast-joins
    onto the corpus, no driver round-trip
    (operators/linefilters.adaptive_boilerplate_filter).

    Invariant: the oracle's CROSS JOIN (and this entry's row count)
    assumes at least one gram clears min_count — true by a wide
    margin at the correctness scale factor (2,289 qualifying trigrams
    at sf0.01); the operator itself degrades gracefully (empty mined
    list blocks nothing)."""
    from prod2vec_spark.operators.linefilters import (
        adaptive_boilerplate_filter,
    )

    docs = read_table(spark, sf_dir, "documents")
    out = adaptive_boilerplate_filter(
        docs, gram_n=_ABF_N, top_k=1, min_count=_ABF_MIN,
        mode="window", width=_LF_WIDTH,
    )
    return out.select(
        "doc_id",
        F.element_at("hot_grams", 1).alias("hot_gram"),
        "n_lines",
        "n_kept",
        F.md5("kept_text").alias("kept_md5"),
    )


def _sql_adaptive_line_filter() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    n, m, w = _ABF_N, _ABF_MIN, _LF_WIDTH
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id,
        unnest(list_transform(
          generate_series(1, len(toks) - {n - 1}),
          i -> array_to_string(
                 list_slice(toks, CAST(i AS INT), CAST(i AS INT) + {n - 1}),
                 ' '))) AS gram
      FROM t WHERE len(toks) >= {n}),
c AS (SELECT gram, count(*) AS n_occ FROM g GROUP BY 1
      HAVING count(*) >= {m}),
hg AS (SELECT gram AS hot_gram FROM c
       ORDER BY n_occ DESC, gram LIMIT 1),
L AS (SELECT doc_id,
        CASE WHEN coalesce(trim(text), '') = '' THEN []
             ELSE list_transform(
               generate_series(0, CAST(ceil(len(toks) / {w}.0) AS BIGINT) - 1),
               i -> array_to_string(
                      list_slice(toks, CAST(i * {w} + 1 AS INT),
                                       CAST(i * {w} + {w} AS INT)), ' '))
        END AS lines
      FROM t JOIN documents USING (doc_id))
SELECT doc_id, hot_gram,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(list_filter(lines,
              l -> NOT contains(l, hot_gram))) AS BIGINT) AS n_kept,
       md5(coalesce(array_to_string(list_filter(lines,
              l -> NOT contains(l, hot_gram)), ' '), '')) AS kept_md5
FROM L CROSS JOIN hg
"""


R9B_QUERIES = {
    "line_quality_filter": q_line_filter,
    "leakage_safe_split": q_leakage_safe_split,
    "ngram_hotspots": q_ngram_hotspots,
    "ngram_hotspots_sketched": q_ngram_hotspots_sketched,
    "adaptive_line_filter": q_adaptive_line_filter,
    "segment_dedup_keepfirst": q_segment_dedup_keepfirst,
    "html_extract": q_html_extract,
    "token_id_sequences": q_token_id_sequences,
    "packed_input_ids": q_packed_input_ids,
}

R9B_ORACLES: dict[str, str] = {
    "adaptive_line_filter": _sql_adaptive_line_filter(),
    "segment_dedup_keepfirst": _sql_segment_dedup_keepfirst(),
    "html_extract": _sql_html_extract(),
    "token_id_sequences": _sql_token_id_sequences(),
    "packed_input_ids": _sql_packed_input_ids(),
    "line_quality_filter": _sql_line_filter(),
    "leakage_safe_split": _sql_leakage_safe_split(),
    "ngram_hotspots": _sql_ngram_hotspots(),
    "ngram_hotspots_sketched": _sql_ngram_hotspots(),
}

"""Round-9 tranche: the video near-dup plane (real stdlib AVI decode
→ keyframe-mean dHash → the generic banded-Hamming join) plus the
URL/domain curation plane (ENGINE scope; reference anchor:
utils/prep_utils.py has no media or web-curation surface).

Catalog conventions (queries.py header) apply.  Since round 11 the
video entry is SPLIT (VERDICT r9 ask #2): the codec boundary (render
→ AVI encode/decode → keyframe-mean dHash) persists its per-clip
hashes as a pytest-golden fixture, and the catalog entry is the
banded-Hamming pair plane over that table — pure integer SQL with a
full DuckDB oracle, so all 50 driver entries are hash-verified.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table


def planted_clip(doc_id: int) -> bytes:
    """The deterministic planted video corpus, one clip per doc id: a
    4-frame 16×16 grayscale AVI whose frames are md5-expanded from the
    family id (doc_id % 40), plus a one-pixel single-frame edit per
    member (doc_id // 40) — 40 families of near-identical clips.
    Shared by the persisted-hash fixture generator
    (tools/gen_video_hash_fixture.py), the pytest-golden codec gate,
    and the distributed render below."""
    import hashlib

    from prod2vec_spark.operators.multimodal import encode_avi_gray8

    fam, member = int(doc_id) % 40, int(doc_id) // 40
    frames = [
        bytearray(
            b"".join(
                hashlib.md5(f"vid{fam}|{t}|{k}".encode()).digest()
                for k in range(16)
            )
        )
        for t in range(4)
    ]
    if member:
        pos = (member * 41) % 256
        f = frames[member % 4]
        f[pos] = (f[pos] + 1) % 256
    return encode_avi_gray8([bytes(f) for f in frames], 16, 16)


def rendered_video_hashes(spark, doc_ids):
    """(media_id, vhash) via the REAL codec chain: mapInPandas render
    (encode_avi_gray8) → mapInPandas keyframe-mean dHash (stdlib AVI
    decode, operators/phash.vhash_avi).  The pytest-golden gate runs
    this against the persisted fixture so the codec boundary stays
    verified even though the driver entry reads the fixture."""
    from typing import Iterator

    import pandas as pd

    from prod2vec_spark.operators import phash as PH

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [planted_clip(i) for i in pdf["doc_id"]]
            yield pd.DataFrame({"media_id": pdf["doc_id"], "blob": blobs})

    media = doc_ids.mapInPandas(render, schema="media_id long, blob binary")
    return PH.phash_videos(media)


def _video_fixture_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "video_vhash.parquet",
    )


def q_video_neardup(spark, sf_dir):
    """Video near-dup pairs — the banded-Hamming candidate join +
    bit_count verify plane over the PERSISTED per-clip hash table
    (tests/fixtures/video_vhash.parquet, doc_id → keyframe-mean dHash
    of the planted clip corpus; regenerate with
    tools/gen_video_hash_fixture.py).

    Round-11 split (VERDICT r9 ask #2): the codec/hash half is a
    pytest-golden boundary (``rendered_video_hashes`` must reproduce
    the fixture bit-for-bit, tests/test_video.py), while THIS entry —
    pure integer SQL: band slices by shift+mask, pair expansion,
    XOR bit_count — carries a full DuckDB oracle, restoring the
    driver's 50/50 rows+schema+hash signal with video-family
    coverage intact.  ``same_family`` keeps the entry self-auditing:
    pytest asserts it is 1 on every pair and that all within-family
    pairs surface (pigeonhole recall)."""
    from prod2vec_spark.operators import phash as PH

    docs = read_table(spark, sf_dir, "documents", spread=False).select("doc_id")
    hashes = (
        spark.read.parquet(_video_fixture_path())
        .join(docs, "doc_id", "leftsemi")
        .select(F.col("doc_id").alias("media_id"), "vhash")
    )
    pairs = PH.phash_neardup(hashes, hash_col="vhash", max_distance=3)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        ((F.col("id_a") % 40) == (F.col("id_b") % 40)).cast("bigint").alias(
            "same_family"
        ),
    )


def _sql_video_neardup() -> str:
    """DuckDB twin of the banded-Hamming plane over the persisted hash
    table: 4 disjoint 16-bit slices by shift+mask (arithmetic vs
    logical shift is neutralised by the mask), slice-equality
    candidate join, XOR bit_count verify — byte-identical semantics
    to operators/phash.phash_neardup at bands=4, max_distance=3."""
    path = _video_fixture_path()
    return f"""
WITH h AS (
  SELECT v.doc_id AS media_id, v.vhash
  FROM read_parquet('{path}') v
  WHERE v.vhash IS NOT NULL
    AND v.doc_id IN (SELECT doc_id FROM documents)
),
sig AS (
  SELECT media_id, vhash, band, (vhash >> (band * 16)) & 65535 AS slice
  FROM h CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, a.vhash AS ha,
                  b.media_id AS id_b, b.vhash AS hb
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.slice = b.slice AND a.media_id < b.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(ha, hb)) AS INT) AS hamming,
       CAST(CASE WHEN id_a % 40 = id_b % 40 THEN 1 ELSE 0 END AS BIGINT)
         AS same_family
FROM cand
WHERE bit_count(xor(ha, hb)) <= 3
"""


_LID_VOCAB = {
    "en": ("the cat sat on a mat and that dog is in his house of king "
           "with this from they were not what when there which").split(),
    "de": ("der hund ist nicht und das haus die katze war schön über "
           "auch ein eine wird nach bei durch für müssen zwischen").split(),
    "es": ("el perro la casa de que y es en los niños una para con "
           "por como está pero más sobre años también").split(),
    "fr": ("le chien la maison les et est une dans pour avec des pas "
           "sur qui plus sont leurs cette très après").split(),
    "zh": list("我是中国人他们的学生在大学里学习中文和数学这个时候没有什么问题可以知道"),
}


def _lid_text(lang: str, key: str) -> str:
    """Deterministic planted sentence: md5-expanded draws from the
    language's vocabulary (unsegmented for zh — the realistic case)."""
    import hashlib

    vocab = _LID_VOCAB[lang]
    digest = hashlib.md5(f"lid|{lang}|{key}".encode()).digest()
    n = 8 + digest[0] % 8
    words = []
    for k in range(n):
        b = hashlib.md5(f"lid|{lang}|{key}|{k}".encode()).digest()
        words.append(vocab[int.from_bytes(b[:4], "big") % len(vocab)])
    return ("" if lang == "zh" else " ").join(words)


def q_lang_id_learned(spark, sf_dir):
    """Learned char-n-gram language-ID (ml/langid_clf.py — CCNet's
    fastText shape; rows-only: iterative L-BFGS fit, no SQL twin; the
    marker heuristic ``lang_id`` stays the oracled fallback).

    Self-auditing per-language accuracy report: a deterministic
    planted 5-language corpus (md5-expanded sentences, CJK
    unsegmented) splits by doc_id parity into train/held-out; the
    classifier fits on train and the entry returns
    (lang, n_docs, n_correct) on held-out.  pytest asserts total
    accuracy ≥ 0.9 — the L-LANGID analog of ann_recall's checked
    number."""
    from prod2vec_spark.ml.langid_clf import fit_lang_classifier, score_lang

    langs = sorted(_LID_VOCAB)
    docs = read_table(spark, sf_dir, "documents", spread=False).select("doc_id")
    # cap the planted corpus: enough to fit/score, bounded driver work
    ids = [r["doc_id"] for r in docs.orderBy("doc_id").limit(400).collect()]
    rows = [
        (int(d), _lid_text(langs[int(d) % 5], str(int(d))), langs[int(d) % 5])
        for d in ids
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = corpus.where((F.col("doc_id") / 5).cast("long") % 2 == 0)
    heldout = corpus.where((F.col("doc_id") / 5).cast("long") % 2 == 1)
    model = fit_lang_classifier(train, max_iter=30)
    scored = score_lang(heldout, model).join(
        heldout.select("doc_id", "lang"), "doc_id"
    )
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("lang_pred") == F.col("lang")).cast("bigint"))
            .cast("bigint")
            .alias("n_correct"),
        )
        .orderBy("lang")
    )


# ------------------------------------------- BPE-budget chunk contract
# Fixed literal merge table: the contract under test is the ENCODER
# (train_bpe is pytest-certified separately) — a static table is what
# lets DuckDB replay the identical replace chain.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("th", "e"), ("e", "r"), ("i", "n"),
    ("a", "n"), ("an", "d"), ("o", "n"), ("the", "▁"),
]
_B_LEN, _B_STRIDE, _B_MIN = 24, 16, 6


def q_bpe_chunk_budget(spark, sf_dir):
    """Training chunks with BPE-token accounting: the whitespace-token
    slicing contract of ``doc_chunks`` plus ``n_budget_tokens`` — the
    chunk's size in MODEL tokens under a fixed merge table
    (operators/bpe.bpe_counter plugged into the chunker's
    ``count_fn``), so sequence budgets downstream speak tokenizer
    units.  Fully oracled: DuckDB replays the sentinel-wrapped
    replace chain merge-for-merge."""
    from prod2vec_spark.operators.bpe import bpe_counter
    from prod2vec_spark.operators.chunking import doc_chunks

    docs = read_table(spark, sf_dir, "documents")
    return doc_chunks(
        docs,
        seq_len=_B_LEN,
        stride=_B_STRIDE,
        min_len=_B_MIN,
        count_fn=bpe_counter(BPE_FIXED_MERGES),
    ).select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        "chunk_fp",
        F.col("n_budget_tokens").cast("int").alias("n_budget_tokens"),
    )


def _sql_bpe_word_count(var: str) -> str:
    """DuckDB expression: BPE token count of one word under
    BPE_FIXED_MERGES — the identical sentinel-wrapped replace chain as
    operators/bpe.apply_merges (strip sentinels, wrap every char, one
    replace per merge in order, count surviving close-sentinels)."""

    def w(sym: str) -> str:
        return f"chr(1)||'{sym}'||chr(2)"

    s = (
        "array_to_string(list_transform(str_split("
        f"replace(replace({var}, chr(1), ''), chr(2), ''), ''), "
        "c -> chr(1)||c||chr(2)), '') || " + w("▁")
    )
    for a, b in BPE_FIXED_MERGES:
        s = f"replace({s}, {w(a)}||{w(b)}, {w(a + b)})"
    return f"(length({s}) - length(replace({s}, chr(2), '')))"


def _sql_bpe_chunk_budget() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    cnt = _sql_bpe_word_count("w")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, toks,
        unnest(generate_series(1, len(toks), {_B_STRIDE})) AS st
      FROM t),
c AS (SELECT doc_id,
        CAST((st - 1) / {_B_STRIDE} AS INT) AS chunk_idx,
        list_slice(toks, st, st + {_B_LEN - 1}) AS ctoks
      FROM s)
SELECT doc_id, chunk_idx,
       CAST(len(ctoks) AS INT) AS n_tokens,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(ctoks, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % 2147483647)),
         (a, b) -> (a * 131 + b) % 2147483647) AS chunk_fp,
       CAST(list_sum(list_transform(ctoks, w -> {cnt})) AS INT)
         AS n_budget_tokens
FROM c
WHERE len(ctoks) >= {_B_MIN}
"""


def q_text_normalize_nfc(spark, sf_dir):
    """NFC-complete normalization digests: (doc_id, norm_md5) — the
    digest of normalize_text(text, nfc=True), the key the exact-dedup
    plane uses when composed/decomposed variants must collapse
    (operators/text.nfc_normalize).

    Round-14 upgrade: previously rows-only (the declared Arrow codec
    boundary), now FULLY ORACLED — DuckDB ships ``nfc_normalize``
    (UAX #15, the same normalization stdlib unicodedata implements),
    so the twin replays the whole chain including the NFC hop.  The
    codec-boundary pytests (tests/test_nfc.py) keep pinning the
    composed/decomposed behavior on real non-ASCII fixtures."""
    from prod2vec_spark.operators.text import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.coalesce(normalize_text(F.col("text"), nfc=True), F.lit("")))
        .alias("norm_md5"),
    )


def _sql_text_normalize_nfc() -> str:
    return r"""
WITH n AS (
  SELECT doc_id,
    lower(trim(regexp_replace(
      regexp_replace(nfc_normalize(text), '[\x00-\x1F\x7F]', ' ', 'g'),
      '\s+', ' ', 'g'))) AS norm
  FROM documents)
SELECT doc_id, md5(coalesce(norm, '')) AS norm_md5 FROM n
"""


# -------------------------------------------- URL/domain curation plane
_DOMCAP_K = 20

_SQL_URL_STAGE = """
u AS (SELECT doc_id, text,
        ('0x' || substr(md5('url|' || doc_id), 1, 8))::BIGINT % 100 AS d
      FROM documents),
uu AS (SELECT doc_id, text,
         'https://www.site' || CAST(floor(d * d / 400.0) AS BIGINT)
           || '.' || (['com','org','net'])[CAST(d % 3 AS INT) + 1]
           || CASE WHEN doc_id % 7 = 0 THEN ':8080' ELSE '' END
           || '/doc/' || doc_id AS url
       FROM u),
h AS (SELECT doc_id, text, url,
        lower(nullif(regexp_extract(url, '^[A-Za-z]+://([^/:?#]+)', 1), ''))
          AS host
      FROM uu),
dom AS (SELECT doc_id, text, url, host,
          CASE WHEN len(str_split(host, '.')) <= 2 THEN host
               ELSE str_split(host, '.')[-2] || '.' || str_split(host, '.')[-1]
          END AS domain
        FROM h)
"""


def q_domain_profile(spark, sf_dir):
    """Per-domain corpus dashboard (C4/RefinedWeb's URL-level input
    signal): registered-domain keyed doc/host/token counts + verbatim
    dup share, over deterministically attached skewed urls
    (operators/domains.py — host extraction is the parse_url JVM
    builtin; the oracle replays the identical synthesis + a regexp
    host twin)."""
    from prod2vec_spark.operators.domains import attach_urls, domain_profile

    docs = read_table(spark, sf_dir, "documents")
    prof = domain_profile(attach_urls(docs))
    return prof.select(
        "domain", "n_hosts", "n_docs", "n_tokens", "dup_share"
    )


def _sql_domain_profile() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    toks = _TOKS.replace("text", "dom.text")
    return f"""
WITH {_SQL_URL_STAGE}
SELECT domain,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({toks})) AS BIGINT) AS n_tokens,
       round(1.0 - CAST(count(DISTINCT md5(coalesce(dom.text, ''))) AS DOUBLE)
                   / count(*), 4) AS dup_share
FROM dom
GROUP BY domain
"""


def q_domain_cap(spark, sf_dir):
    """Per-domain document cap: at most {_DOMCAP_K} docs kept per
    registered domain, chosen by a seeded md5 draw — ONE rank window
    on the domain key; the operator that removes mega-domain skew for
    every downstream stage.  Hash-matching kept ids certifies WHICH
    docs survive (operators/domains.domain_cap)."""
    from prod2vec_spark.operators.domains import attach_urls, domain_cap

    docs = read_table(spark, sf_dir, "documents")
    kept = domain_cap(attach_urls(docs), max_per_domain=_DOMCAP_K)
    return kept.select("doc_id", "domain", "domain_rk")


def _sql_domain_cap() -> str:
    return f"""
WITH {_SQL_URL_STAGE},
r AS (SELECT doc_id, domain,
        CAST(row_number() OVER (
          PARTITION BY domain
          ORDER BY md5('domcap|' || doc_id), doc_id) AS INT) AS domain_rk
      FROM dom)
SELECT doc_id, domain, domain_rk
FROM r
WHERE domain IS NULL OR domain_rk <= {_DOMCAP_K}
"""


# ----------------------------------------------- corpus drift audit
_DRIFT_TOPK = 50


def _v2_docs(spark, sf_dir):
    """The deterministically-derived "next crawl" shared with
    snapshot_diff (queries_r7): id%13 dropped, id%7 text-modified,
    10 fresh ids appended."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    survived = docs.where(F.col("doc_id") % 13 != 0)
    return survived.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionByName(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), F.col("text")
        )
    )


_SQL_V2 = """
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id < 10)
"""


def q_token_drift(spark, sf_dir):
    """Per-token distribution drift between crawl N and the derived
    crawl N+1 (the language-shift monitor next to the row-level
    snapshot diff): top-50 tokens by combined count with smoothed
    frequencies and log-ratio (operators/drift.token_drift — one
    word-count shuffle per side, full outer join on the token key,
    1-row totals broadcast)."""
    from prod2vec_spark.operators.drift import token_drift

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return token_drift(docs, _v2_docs(spark, sf_dir), top_k=_DRIFT_TOPK)


def _sql_token_drift() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH {_SQL_V2},
co AS (SELECT token, CAST(count(*) AS BIGINT) AS n_old
       FROM (SELECT unnest({_TOKS}) AS token FROM documents) GROUP BY 1),
cn AS (SELECT token, CAST(count(*) AS BIGINT) AS n_new
       FROM (SELECT unnest({_TOKS}) AS token FROM v2) GROUP BY 1),
j AS (SELECT COALESCE(co.token, cn.token) AS token,
        COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM co FULL JOIN cn ON co.token = cn.token),
t AS (SELECT CAST(sum(n_old) AS DOUBLE) AS t_old,
             CAST(sum(n_new) AS DOUBLE) AS t_new,
             CAST(count(*) AS DOUBLE) AS v FROM j),
top AS (SELECT * FROM j ORDER BY n_old + n_new DESC, token LIMIT {_DRIFT_TOPK})
SELECT token, n_old, n_new,
       round((n_old + 1) / (t.t_old + t.v), 8) AS p_old,
       round((n_new + 1) / (t.t_new + t.v), 8) AS p_new,
       round(log10(((n_new + 1) / (t.t_new + t.v))
                   / ((n_old + 1) / (t.t_old + t.v))), 4) AS log10_ratio
FROM top, t
"""


def q_corpus_drift(spark, sf_dir):
    """One-row corpus-level drift summary over the FULL vocabulary:
    token/vocab sizes, shared-vocab count, and the smoothed
    Jensen-Shannon divergence (0 = identical corpora, ln 2 = fully
    disjoint) between crawl N and the derived N+1
    (operators/drift.distribution_drift)."""
    from prod2vec_spark.operators.drift import distribution_drift

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return distribution_drift(docs, _v2_docs(spark, sf_dir))


def _sql_corpus_drift() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH {_SQL_V2},
co AS (SELECT token, CAST(count(*) AS BIGINT) AS n_old
       FROM (SELECT unnest({_TOKS}) AS token FROM documents) GROUP BY 1),
cn AS (SELECT token, CAST(count(*) AS BIGINT) AS n_new
       FROM (SELECT unnest({_TOKS}) AS token FROM v2) GROUP BY 1),
j AS (SELECT COALESCE(co.token, cn.token) AS token,
        COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM co FULL JOIN cn ON co.token = cn.token),
t AS (SELECT CAST(sum(n_old) AS DOUBLE) AS t_old,
             CAST(sum(n_new) AS DOUBLE) AS t_new,
             CAST(count(*) AS DOUBLE) AS v FROM j),
s AS (SELECT n_old, n_new,
        (n_old + 1) / (t.t_old + t.v) AS p,
        (n_new + 1) / (t.t_new + t.v) AS q
      FROM j, t)
SELECT CAST(sum(n_old) AS BIGINT) AS n_tokens_old,
       CAST(sum(n_new) AS BIGINT) AS n_tokens_new,
       CAST(sum(CASE WHEN n_old > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_old,
       CAST(sum(CASE WHEN n_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new,
       CAST(sum(CASE WHEN n_old > 0 AND n_new > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_shared,
       round(sum((p * ln(p / ((p + q) / 2)) + q * ln(q / ((p + q) / 2))) / 2), 6)
         AS js_divergence
FROM s
"""


def q_drift_by_lang(spark, sf_dir):
    """Per-language drift summary in ONE grouped computation (the
    lm_by_lang rule: lang joins every count key) between crawl N and
    the derived N+1 — the CCNet ops view of distribution shift
    (operators/drift.distribution_drift_by_lang)."""
    from prod2vec_spark.operators.drift import distribution_drift_by_lang

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    v2 = _v2_docs_lang(spark, sf_dir)
    return distribution_drift_by_lang(docs, v2)


def _v2_docs_lang(spark, sf_dir):
    """The derived next crawl carrying the lang column (the
    snapshot_diff derivation, lang preserved)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    survived = docs.where(F.col("doc_id") % 13 != 0)
    return survived.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    ).unionByName(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), F.col("text"), "lang"
        )
    )


def _sql_drift_by_lang() -> str:
    from prod2vec_spark.queries_ext import _TOKS

    return f"""
WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
         lang
  FROM documents WHERE doc_id % 13 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang FROM documents WHERE doc_id < 10),
co AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n_old
       FROM (SELECT lang, unnest({_TOKS}) AS token FROM documents) GROUP BY 1, 2),
cn AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n_new
       FROM (SELECT lang, unnest({_TOKS}) AS token FROM v2) GROUP BY 1, 2),
j AS (SELECT COALESCE(co.lang, cn.lang) AS lang,
        COALESCE(co.token, cn.token) AS token,
        COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
      FROM co FULL JOIN cn ON co.lang = cn.lang AND co.token = cn.token),
t AS (SELECT lang, CAST(sum(n_old) AS DOUBLE) AS t_old,
             CAST(sum(n_new) AS DOUBLE) AS t_new,
             CAST(count(*) AS DOUBLE) AS v
      FROM j GROUP BY lang),
s AS (SELECT j.lang, n_old, n_new,
        (n_old + 1) / (t.t_old + t.v) AS p,
        (n_new + 1) / (t.t_new + t.v) AS q
      FROM j JOIN t ON j.lang = t.lang)
SELECT lang,
       CAST(sum(n_old) AS BIGINT) AS n_tokens_old,
       CAST(sum(n_new) AS BIGINT) AS n_tokens_new,
       CAST(sum(CASE WHEN n_old > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_old,
       CAST(sum(CASE WHEN n_new > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_new,
       CAST(sum(CASE WHEN n_old > 0 AND n_new > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS vocab_shared,
       round(sum((p * ln(p / ((p + q) / 2)) + q * ln(q / ((p + q) / 2))) / 2), 6)
         AS js_divergence
FROM s
GROUP BY lang
"""


R9_QUERIES = {
    "video_neardup": q_video_neardup,
    "lang_id_learned": q_lang_id_learned,
    "bpe_chunk_budget": q_bpe_chunk_budget,
    "text_normalize_nfc": q_text_normalize_nfc,
    "domain_profile": q_domain_profile,
    "domain_cap": q_domain_cap,
    "token_drift": q_token_drift,
    "corpus_drift": q_corpus_drift,
    "drift_by_lang": q_drift_by_lang,
}
R9_ORACLES: dict[str, str] = {
    "video_neardup": _sql_video_neardup(),
    "text_normalize_nfc": _sql_text_normalize_nfc(),
    "bpe_chunk_budget": _sql_bpe_chunk_budget(),
    "domain_profile": _sql_domain_profile(),
    "domain_cap": _sql_domain_cap(),
    "token_drift": _sql_token_drift(),
    "corpus_drift": _sql_corpus_drift(),
    "drift_by_lang": _sql_drift_by_lang(),
}

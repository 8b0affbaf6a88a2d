"""Round-9 tranche: the video near-dup plane (real stdlib AVI decode
→ keyframe-mean dHash → the generic banded-Hamming join) plus the
URL/domain curation plane (ENGINE scope; reference anchor:
utils/prep_utils.py has no media or web-curation surface).

Catalog conventions (queries.py header) apply where an oracle exists;
codec-boundary entries (video render/decode/hash) are rows-only by
the same contract as phash_neardup / audio_neardup.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.sources.io import read_table


def q_video_neardup(spark, sf_dir):
    """Video perceptual-hash near-dup over deterministically RENDERED
    uncompressed AVI clips (rows-only: the codec/hash stage is the
    Python codec boundary, no SQL twin — the video sibling of
    phash_neardup / audio_neardup).

    Every document renders a 4-frame 16×16 grayscale clip whose frames
    are md5-expanded from its family id (doc_id % 40) plus a one-pixel
    single-frame variant per member, so the corpus contains 40 planted
    families of near-identical clips.  The pipeline is the real one
    end-to-end: mapInPandas render (encode_avi_gray8) → mapInPandas
    keyframe-mean dHash (stdlib AVI decode, operators/phash.vhash_avi)
    → banded-Hamming candidate join → bit_count verify.
    ``same_family`` makes the entry self-auditing: pytest asserts it
    is 1 on every pair and that all within-family pairs surface
    (pigeonhole recall)."""
    import hashlib
    from typing import Iterator

    import pandas as pd

    from prod2vec_spark.operators import phash as PH
    from prod2vec_spark.operators.multimodal import encode_avi_gray8

    docs = read_table(spark, sf_dir, "documents").select("doc_id")

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                fam = int(doc_id) % 40
                member = int(doc_id) // 40
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
                blobs.append(
                    encode_avi_gray8([bytes(f) for f in frames], 16, 16)
                )
            yield pd.DataFrame({"media_id": pdf["doc_id"], "blob": blobs})

    media = docs.mapInPandas(render, schema="media_id long, blob binary")
    hashes = PH.phash_videos(media)
    pairs = PH.phash_neardup(hashes, hash_col="vhash", max_distance=3)
    return pairs.select(
        "id_a",
        "id_b",
        "hamming",
        ((F.col("id_a") % 40) == (F.col("id_b") % 40)).cast("bigint").alias(
            "same_family"
        ),
    )


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
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
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


R9_QUERIES = {
    "video_neardup": q_video_neardup,
    "lang_id_learned": q_lang_id_learned,
}
R9_ORACLES: dict[str, str] = {}

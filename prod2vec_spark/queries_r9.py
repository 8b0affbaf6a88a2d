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


R9_QUERIES = {
    "video_neardup": q_video_neardup,
}
R9_ORACLES: dict[str, str] = {}

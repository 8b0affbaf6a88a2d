"""Training-sequence chunking: slide a fixed-length token window with
overlap across each document, producing the sequence rows a
pre-training data loader consumes (the "pack documents into seq_len
examples" prep stage; ENGINE scope — reference anchor: none, the
reference stops at basket assembly).

Row-local: window starts come from ``sequence(1, n_tokens, stride)``
and each chunk is a ``slice`` — one transform + one explode, no
shuffle, no UDF.  Both engines implement stride sequences and
beyond-end slice truncation identically (parity probed in tests), so
the DuckDB oracle replays chunking exactly.  The per-chunk rolling
fingerprint (functions/hashing.rolling_fingerprint) lets an aggregate
certify chunk CONTENT without shipping token arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.functions.hashing import rolling_fingerprint
from prod2vec_spark.operators.text import tokens


def chunk_starts(toks: Column, stride: int) -> Column:
    """1-based window start positions: 1, 1+stride, … ≤ n_tokens."""
    return F.sequence(F.lit(1), F.size(toks), F.lit(stride))


def doc_chunks(
    docs: DataFrame,
    seq_len: int = 32,
    stride: int = 24,
    min_len: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_fn=None,
) -> DataFrame:
    """One row per training chunk: (doc_id, chunk_idx, n_tokens,
    chunk_fp).  Tail windows shorter than ``min_len`` tokens are
    dropped (they duplicate the previous window's suffix).  stride <
    seq_len gives overlapping context windows; stride = seq_len packs
    disjointly.

    ``count_fn`` (text Column → token-count Column, e.g.
    ``bpe.bpe_counter(merges)``) adds an ``n_budget_tokens`` column —
    the chunk's size in MODEL tokens (counted over the reassembled
    chunk text) — so downstream budget accounting speaks the
    tokenizer's unit while the slicing unit stays whitespace words.

    Token arrays are staged as columns (HOF-CSE rule,
    operators/repetition.py) and the chunk structs are built inside
    ONE transform over the start sequence, so each document is
    tokenized and sliced exactly once."""
    if not (0 < stride <= seq_len):
        raise ValueError(f"need 0 < stride <= seq_len, got {stride}/{seq_len}")
    staged = docs.withColumn("_toks", tokens(F.col(text_col)))
    # chunk_idx derives from the start position ((s-1)/stride is an
    # exact multiple → exact in double arithmetic), NOT the lambda's
    # element index: Spark's transform index is 0-based while DuckDB's
    # is 1-based, and start-derived indexes sidestep the mismatch.
    chunks = F.filter(
        F.transform(
            chunk_starts(F.col("_toks"), stride),
            lambda s: F.struct(
                ((s - F.lit(1)) / F.lit(stride)).cast("int").alias("idx"),
                F.slice(F.col("_toks"), s, seq_len).alias("ctoks"),
            ),
        ),
        lambda c: F.size(c["ctoks"]) >= min_len,
    )
    out_cols = [
        F.col("_c.idx").alias("chunk_idx"),
        F.size(F.col("_c.ctoks")).alias("n_tokens"),
        rolling_fingerprint(F.col("_c.ctoks")).alias("chunk_fp"),
    ]
    if count_fn is not None:
        out_cols.append(
            count_fn(F.array_join(F.col("_c.ctoks"), " ")).alias(
                "n_budget_tokens"
            )
        )
    return staged.select(id_col, F.explode(chunks).alias("_c")).select(
        id_col, *out_cols
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_shards: int = 1,
    part_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    count_fn=None,
) -> DataFrame:
    """Greedy contiguous sequence packing: lay documents end-to-end in
    a deterministic md5 order and assign each to the bin its starting
    token offset falls in — the prep step between chunking and the
    data loader that turns ragged documents into ~budget-token
    training examples (short docs share a bin instead of wasting pad).
    A doc straddling a boundary belongs to its STARTING bin, so bins
    can overflow by at most one document — the standard contiguous-
    packing tradeoff (no doc splitting here; chain with doc_chunks to
    split first when hard caps are needed).

    Scale shape: ONE window cumulative sum partitioned by
    (part_col, shard) where shard = md5-uniform(id) % n_shards — no
    global single-partition window ever.  n_shards=1 packs each
    language as one sequence-stream (fine to ~10⁸ docs/partition);
    at 100 TB raise n_shards so each shard's window sort fits an
    executor — packing quality is unaffected (each shard packs
    contiguously) and the md5 shard assignment keeps the oracle
    replay exact.

    Output: (id, part, shard, n_tokens, bin) — one row per doc.

    ``count_fn`` (text Column → token-count Column) swaps the token
    accounting unit; default whitespace words, pass
    ``bpe.bpe_counter(merges)`` so the budget means MODEL tokens.
    Any counter stays row-local, so the packing shape is unchanged.
    """
    from prod2vec_spark.functions.hashing import hex_prefix_long
    from pyspark.sql import Window

    if budget <= 0 or n_shards <= 0:
        raise ValueError(f"need budget > 0 and n_shards > 0, got {budget}/{n_shards}")
    if count_fn is None:
        count_fn = lambda c: F.size(tokens(c))  # noqa: E731
    shard = hex_prefix_long(
        F.concat_ws("|", F.lit("shard"), F.col(id_col)), 8
    ) % F.lit(n_shards)
    staged = docs.select(
        F.col(id_col),
        F.col(part_col).alias("part"),
        shard.alias("shard"),
        count_fn(F.col(text_col)).alias("n_tokens"),
        F.md5(F.concat_ws("|", F.lit("pack"), F.col(id_col))).alias("_ord"),
    )
    w = (
        Window.partitionBy("part", "shard")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return staged.withColumn(
        "bin", F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("int")
    ).drop("_ord")


def pack_token_ids(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    budget: int = 512,
    n_shards: int = 1,
    part_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    eod_id: int | None = None,
    tokens_fn=None,
    count_fn=None,
) -> DataFrame:
    """The packing plane's FINAL form: materialized training examples
    — one row per (part, shard, bin) carrying the concatenated
    model-token ID array (``input_ids``) plus the doc ids laid into
    it, in pack order.  This is exactly what a data loader reads:
    ``pack_sequences`` decides the bins (same md5 order, same
    straddle-forward rule), ``bpe.token_id_sequences`` supplies each
    doc's id sequence, and one grouped reassembly per bin emits the
    payload (sort_array-over-structs — deterministic, never
    collection-order dependent).

    Scale shape: the bin assignment is pack_sequences' windowed
    cumulative sum (sharded, never a global window); the payload step
    is ONE groupBy on (part, shard, bin) whose rows carry id arrays
    already produced by the token-id plane.  A bin's payload is
    bounded by budget + one straddling doc, so collected arrays stay
    executor-sized by construction.

    ``doc_lens`` carries each packed doc's id-count in pack order —
    the boundary metadata attention masking / sequence unpacking
    needs (sum(doc_lens) == n_ids minus separators).  ``eod_id``
    (when set) appends the end-of-document separator AFTER each
    doc's ids — the GPT-style corpus delimiter — counted in n_ids
    but never in doc_lens.
    """
    from prod2vec_spark.operators.bpe import (
        bpe_token_count,
        bpe_tokens,
        token_id_sequences,
        token_ids_column,
    )

    # tokenizer-family seam (round 12): tokens_fn/count_fn swap the
    # tokenizer (the unigram plane passes its Viterbi segmenter +
    # counter); pass BOTH or neither — the count must be the size of
    # the stream or bins and payloads disagree.  Default: BPE.
    if (tokens_fn is None) != (count_fn is None):
        raise ValueError("pass both tokens_fn and count_fn, or neither")
    count = count_fn if count_fn is not None else (
        lambda c: bpe_token_count(c, merges)
    )
    # with an EOD separator, the budget counts ids as WRITTEN —
    # each doc costs its token count plus one separator
    sep = 1 if eod_id is not None else 0
    tf = tokens_fn if tokens_fn is not None else (
        lambda c: bpe_tokens(c, merges)
    )
    ids_of = token_ids_column(tf(F.col(text_col)), vocab)
    if ids_of is not None:
        # single-scan form (round 16, guide §2.3/§2.4): when the vocab
        # fits the broadcast-map guard, encode each document ONCE and
        # carry its id array through the one unavoidable shuffle (the
        # pack window's part+shard exchange).  The previous shape ran
        # the tokenizer over the corpus twice (count pass + id pass),
        # reassembled ids through a posexplode → join → groupBy (two
        # more corpus-sized exchanges), then joined bins back to
        # payloads; count(text) + sep == size(ids)+sep by the
        # tokens_fn/count_fn contract, so the bin assignment is
        # bit-identical.  The final groupBy re-uses the window's
        # (part, shard) hash partitioning — no new exchange.
        from prod2vec_spark.functions.hashing import hex_prefix_long
        from pyspark.sql import Window

        if budget <= 0 or n_shards <= 0:
            raise ValueError(
                f"need budget > 0 and n_shards > 0, got {budget}/{n_shards}"
            )
        ids_col = ids_of
        if eod_id is not None:
            ids_col = F.concat(
                ids_col, F.array(F.lit(eod_id).cast("long"))
            )
        staged = docs.select(
            F.col(id_col),
            F.col(part_col).alias("part"),
            (
                hex_prefix_long(
                    F.concat_ws("|", F.lit("shard"), F.col(id_col)), 8
                )
                % F.lit(n_shards)
            ).alias("shard"),
            F.md5(
                F.concat_ws("|", F.lit("pack"), F.col(id_col))
            ).alias("_ord"),
            ids_col.alias("ids"),
        ).withColumn("n_tokens", F.size("ids"))
        w = (
            Window.partitionBy("part", "shard")
            .orderBy("_ord", id_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        ordered = staged.withColumn(
            "bin",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / F.lit(budget)
            ).cast("int"),
        )
    else:
        bins = pack_sequences(
            docs,
            budget=budget,
            n_shards=n_shards,
            part_col=part_col,
            id_col=id_col,
            text_col=text_col,
            count_fn=lambda c: count(c) + F.lit(sep),
        )
        seqs = token_id_sequences(
            docs, merges, vocab, id_col=id_col, text_col=text_col,
            tokens_fn=tokens_fn,
        ).select(id_col, "ids")
        if eod_id is not None:
            seqs = seqs.withColumn(
                "ids", F.concat("ids", F.array(F.lit(eod_id).cast("long")))
            )
        ordered = bins.withColumn(
            "_ord", F.md5(F.concat_ws("|", F.lit("pack"), F.col(id_col)))
        ).join(seqs, id_col)
    return (
        ordered.groupBy("part", "shard", "bin")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_ord", F.col(id_col).alias("doc")))
                ),
                lambda s: s.doc,
            ).alias("doc_ids"),
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("_ord", (F.size("ids") - sep).alias("len"))
                    )
                ),
                lambda s: s.len.cast("long"),
            ).alias("doc_lens"),
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("_ord", F.col("ids").alias("seq")))
                    ),
                    lambda s: s.seq,
                )
            ).alias("input_ids"),
        )
        .withColumn("n_ids", F.size("input_ids").cast("long"))
    )

"""BPE tokenizer training on the corpus (Sennrich et al. 2016) — the
last tokenizer gap: token-BUDGET estimation uses the BPE-ish lexer
(operators/text.bpe_ish_token_count), but a training-data platform
also trains the real merge table on its own corpus (ENGINE scope; the
reference has no tokenizer surface).

Scale split, the standard one (GPT-2/SentencePiece train on a corpus
SAMPLE for the same reason):

* The corpus-sized part is ONE scan + ONE hash-agg shuffle: the word
  frequency table.  BPE statistics are a function of (word, count)
  pairs only — never of document structure.
* The iterative merge loop runs on the TOP ``max_vocab_words`` rows
  by count (TakeOrdered — k rows move), a driver-side bounded edge
  exactly like the IVF centroid literal: at web scale the tail of the
  word distribution contributes negligible pair mass, and the cap is
  the knob that keeps the loop driver-safe.  Determinism: ties break
  by (count desc, word asc) for the vocab cut and by
  (pair-count desc, pair asc) for each merge.

* ENCODING is row-local Column arithmetic: each word becomes a
  sentinel-wrapped symbol string (every symbol is ``\x01sym\x02``),
  each learned merge is one literal ``replace`` of the wrapped
  adjacent pair (leftmost non-overlapping, applied in merge order —
  identical to the symbol-list semantics of train_bpe_from_counts:
  the sentinels anchor matches on full-symbol boundaries, so a merge
  ``(a, b)`` can never fire across the tail of a multi-char symbol).
  Token count = surviving symbol count.  No UDF, no shuffle — a
  linear 100 TB scan.  The sentinel bytes themselves are stripped
  from input words inside the encoder (and the Python twins), so
  un-normalized corpora cannot forge symbol boundaries.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.text import tokens

END = "▁"  # end-of-word marker (SentencePiece's block char)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the corpus-sized half of BPE training — one explode
    + one hash-agg shuffle."""
    return (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .select(F.explode("_toks").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_from_counts(
    wc: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Reference merge-learning loop over a (word, count) list —
    driver-side by design (the input is the bounded top-K vocab).
    Returns merges in learned order.  Sentinel bytes (\\x01/\\x02)
    are stripped from words first — same defensive normalization as
    the Column encoder's _sym_string."""
    symbols = {
        w: [c for c in w if c not in (_L, _R)] + [END] for w, _ in wc
    }
    counts = dict(wc)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for w, syms in symbols.items():
            n = counts[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        # deterministic argmax: count desc, pair lexicographic asc
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, syms in symbols.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = out
    return merges


def train_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    max_vocab_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Corpus scan + capped-vocab merge loop (module docstring)."""
    top = (
        word_counts(docs, text_col=text_col)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return train_bpe_from_counts([(r["word"], r["n"]) for r in top], n_merges)


_L = "\x01"  # symbol-open sentinel
_R = "\x02"  # symbol-close sentinel


def _wrap(sym: str) -> str:
    return _L + sym + _R


def _sym_string(word: Column) -> Column:
    """'hello' -> '\x01h\x02\x01e\x02...\x01▁\x02' — every symbol
    wrapped in sentinels so merges anchor on full-symbol boundaries.

    Defensive in-place normalization: the sentinel bytes themselves
    are stripped from the input word (they are C0 control chars no
    real tokenizer emits), so a hostile/unnormalized corpus cannot
    forge symbol boundaries or inflate the close-sentinel token count.
    The pattern carries ``(?s)`` so '.' also matches line terminators
    (\\u0085, \\u2028, \\u2029) — Java regex '.' excludes them by
    default, which would leave such chars unwrapped and diverge from
    the every-code-point-is-a-symbol semantics of encode_word /
    train_bpe_from_counts."""
    clean = F.regexp_replace(word, "[\x01\x02]", "")
    return F.concat(
        F.regexp_replace(clean, "(?s)(.)", _L + "$1" + _R), F.lit(_wrap(END))
    )


def apply_merges(sym: Column, merges: list[tuple[str, str]]) -> Column:
    """Apply learned merges in order as literal replaces of the
    wrapped adjacent pair (leftmost non-overlapping).  Because each
    occurrence consumes two whole wrapped symbols, matches can never
    cross a symbol boundary nor overlap — exactly the symbol-list
    semantics of train_bpe_from_counts."""
    out = sym
    for a, b in merges:
        out = F.replace(out, F.lit(_wrap(a) + _wrap(b)), F.lit(_wrap(a + b)))
    return out


def bpe_token_count(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-document BPE token count under a learned merge table —
    row-local Column chain (one replace per merge), zero shuffle.
    Token count = number of close-sentinels surviving the merges."""
    toks = tokens(text)
    per_word = F.transform(
        toks,
        lambda w: (
            lambda s: F.length(s) - F.length(F.replace(s, F.lit(_R), F.lit("")))
        )(apply_merges(_sym_string(w), merges)),
    )
    return F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)


def bpe_counter(merges: list[tuple[str, str]]):
    """text-Column → BPE-token-count closure: the plug-in tokenizer
    for the budget-bearing operators (chunking.doc_chunks /
    pack_sequences, mixing.temperature_mix take a ``count_fn``), so
    token budgets mean MODEL tokens instead of whitespace words.
    Still a pure row-local Column chain — one replace per merge,
    zero shuffle, safe in a 100 TB scan."""

    def count(text: Column) -> Column:
        return bpe_token_count(text, merges)

    return count


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Python reference encoder with the IDENTICAL replace semantics
    as apply_merges (sentinel-wrapped symbols, leftmost
    non-overlapping, merge order) — and, by the boundary anchoring,
    identical to applying train_bpe_from_counts' symbol-list merge
    loop to a single word."""
    s = "".join(_wrap(c) for c in word if c not in (_L, _R)) + _wrap(END)
    for a, b in merges:
        s = s.replace(_wrap(a) + _wrap(b), _wrap(a + b))
    return [t[:-1] for t in s.split(_L) if t]


def bpe_tokens(text: Column, merges: list[tuple[str, str]]) -> Column:
    """Per-document BPE token SEQUENCE (array<string>) under a
    learned merge table — the actual model-token stream, not just its
    count (the column a vocabulary-id mapping or sequence packer by
    token ids consumes).  Same row-local replace chain as
    ``bpe_token_count``; the wrapped string then splits on the open
    sentinel and sheds the close sentinel — zero shuffle, zero UDFs.
    Parity with ``encode_word`` is pytest-locked token-for-token."""
    toks = tokens(text)

    def word_tokens(w: Column) -> Column:
        s = apply_merges(_sym_string(w), merges)
        parts = F.split(s, _L)
        return F.filter(
            F.transform(parts, lambda p: F.replace(p, F.lit(_R), F.lit(""))),
            lambda p: p != "",
        )

    return F.flatten(F.transform(toks, word_tokens))


def decode_tokens(token_seq: list[str]) -> str:
    """Inverse of ``encode_word``: BPE merges only ever CONCATENATE
    adjacent symbols, so decoding one word's token list is plain
    concatenation with the end-of-word marker stripped — lossless
    under ANY merge table (roundtrip identity pytest-locked,
    including multi-byte and line-terminator code points)."""
    joined = "".join(token_seq)
    return joined[: -len(END)] if joined.endswith(END) else joined


def token_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    tokens_fn=None,
) -> DataFrame:
    """(token, token_id, n): frequency-ranked vocabulary of the
    ENCODED corpus — the id table the training loader ships with the
    merge table.  Ids start at 1; id 0 is reserved for UNK (the
    baskets.build_vocab convention, so a vocab built on corpus N
    still maps corpus N+1's novel tokens).  One explode + hash-agg;
    the rank window runs on the vocab-sized aggregate (bounded by
    merges + charset, the W1 global-rank shape).  Deterministic:
    ties break lexicographically.

    ``tokens_fn`` (text Column → array<string> Column) swaps the
    tokenizer family — the unigram plane (operators/unigram.py)
    passes its Viterbi segmenter here; default is BPE under
    ``merges``."""
    from pyspark.sql import Window

    tf = tokens_fn if tokens_fn is not None else (
        lambda c: bpe_tokens(c, merges)
    )
    counts = (
        docs.select(F.explode(tf(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return counts.select(
        "token", F.row_number().over(w).cast("long").alias("token_id"), "n"
    )


def token_id_sequences(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_fn=None,
) -> DataFrame:
    """(doc_id, n_ids, n_unk, ids): each document's model-token ID
    sequence — the actual LM training input.  posexplode the token
    stream, broadcast-probe the vocab with UNK→0 default (the J2
    OOV shape), reassemble in position order (the linedup
    sort_array-over-structs shape — deterministic, never
    collection-order dependent).  One reassembly shuffle on the doc
    key; the vocab probe is a broadcast hash join.  ``tokens_fn``
    swaps the tokenizer family (token_vocab's contract — pass the
    SAME fn to both or the id table won't match the stream)."""
    tf = tokens_fn if tokens_fn is not None else (
        lambda c: bpe_tokens(c, merges)
    )
    ids = token_ids_column(tf(F.col(text_col)), vocab)
    if ids is not None:
        # row-local form (round 16): the vocab fits the broadcast-map
        # guard, so each doc's id sequence is one in-array transform —
        # zero shuffle, versus the posexplode → join → reassembly
        # shape below (2 exchanges of corpus-sized token rows).
        return docs.select(
            F.col(id_col),
            ids.alias("ids"),
        ).select(
            id_col,
            F.size("ids").cast("long").alias("n_ids"),
            F.size(F.filter("ids", lambda t: t == 0)).cast("long").alias(
                "n_unk"
            ),
            "ids",
        )
    toks = docs.select(
        F.col(id_col),
        F.posexplode(tf(F.col(text_col))).alias("pos", "token"),
    )
    mapped = toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        id_col, "pos", F.coalesce("token_id", F.lit(0)).cast("long").alias("tid")
    )
    return mapped.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ids"),
        F.sum((F.col("tid") == 0).cast("long")).alias("n_unk"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s.tid,
        ).alias("ids"),
    )


# vocab tables above this row count keep the shuffle-join id mapping:
# element_at on a map LITERAL is a linear key scan (ArrayBasedMapData),
# so past a few thousand entries the per-token probe loses to the
# broadcast hash join it replaces (the baskets.index_items
# max_map_size precedent, tightened for the per-element call site)
TOKEN_MAP_MAX = 4096


def token_ids_column(toks: Column, vocab: DataFrame) -> "Column | None":
    """token-array Column → id-array Column via a broadcast map
    literal (UNK→0, the J2 OOV convention) — or None when the vocab
    exceeds TOKEN_MAP_MAX rows and callers must keep the join path.
    Collecting the vocab is a bounded driver edge by the same
    contract that lets it broadcast (token_vocab output is capped by
    merge count + charset)."""
    # limit()+collect: one bounded job decides fit AND fetches the
    # entries (a separate count() would execute the vocab DAG twice)
    rows = vocab.select("token", "token_id").limit(TOKEN_MAP_MAX + 1).collect()
    if len(rows) > TOKEN_MAP_MAX:
        return None
    if not rows:
        return F.transform(toks, lambda t: F.lit(0).cast("long"))
    m = F.create_map(
        *[
            F.lit(x)
            for r in rows
            for x in (r["token"], int(r["token_id"]))
        ]
    )
    return F.transform(
        toks,
        lambda t: F.coalesce(F.element_at(m, t), F.lit(0)).cast("long"),
    )

"""Unigram-LM tokenizer training on the corpus (Kudo 2018, the
SentencePiece 'unigram' model) — the OTHER production tokenizer
family next to BPE (operators/bpe.py): instead of greedy merge
learning, a piece VOCABULARY with unigram probabilities is fit by EM
and encoding is the Viterbi-best segmentation under those
probabilities (ENGINE scope; the reference has no tokenizer surface).

Scale split — identical to BPE's, because unigram statistics are
likewise a function of (word, count) pairs only:

* The corpus-sized part is ONE scan + ONE hash-agg shuffle: the word
  frequency table (bpe.word_counts, shared).
* Seeding, EM, and pruning run on the TOP ``max_vocab_words`` rows by
  count — the same bounded driver edge as BPE's merge loop and the
  IVF centroid literal.  Hard (Viterbi) EM: each round re-segments
  every vocab word under the current piece log-probs, recounts pieces
  weighted by word count, prunes to ``vocab_size`` keeping every
  single character (the coverage guarantee), and renormalizes.
  Deterministic throughout: seeds and prunes tie-break by
  (count desc, piece asc); Viterbi ties prefer the LONGER last piece,
  then lexicographic.

* ENCODING is a declared Arrow-batched pandas_udf boundary — Viterbi
  segmentation is a per-word shortest-path DP with data-dependent
  backpointers, which has no replace-chain form (BPE's merges are
  literal rewrites; unigram's argmax is not).  Same sanctioned class
  as the media codecs: batch-vectorized, row-local, zero shuffle, the
  blob/text never leaves the executor, and the Python reference twin
  (``encode_word_unigram``) is parity-locked token-for-token in
  pytest.  The piece table is a bounded dim (≤ vocab_size entries)
  captured in the closure — the broadcast-literal class.

Word boundaries: each word is segmented as ``word + END`` (the same
end-of-word marker BPE appends), so pieces may span the boundary
marker, token streams of different words can never be confused, and
``bpe.decode_tokens`` decodes a unigram word's token list unchanged —
concatenate and strip END (roundtrip pytest-locked).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from prod2vec_spark.operators.bpe import _L, _R, END, word_counts

# Java regex \s (the class operators/text.tokens splits on) — spelled
# out so the Python twin can never diverge on unicode spaces
_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"


def _clean(word: str) -> str:
    """Strip the symbol sentinels BPE reserves — same defensive
    normalization as bpe._sym_string, so the two tokenizer families
    agree on what a character is."""
    return "".join(c for c in word if c not in (_L, _R))


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    summed log-prob; a character absent from the vocab contributes a
    floor score as its own piece (byte-fallback analog — coverage can
    never fail).  Ties prefer the longer last piece, then the
    lexicographically smaller one (deterministic)."""
    floor = min(logp.values(), default=-1e9) - 100.0
    n = len(word)
    # dp[i] = (score, start_of_last_piece, last_piece)
    dp: list[tuple[float, int, str]] = [(0.0, 0, "")] + [
        (-math.inf, 0, "") for _ in range(n)
    ]
    for i in range(1, n + 1):
        best = (-math.inf, 0, "")
        for j in range(max(0, i - max_len), i):
            if dp[j][0] == -math.inf:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) != 1:
                    continue
                lp = floor
            score = dp[j][0] + lp
            cand = (score, j, piece)
            if score > best[0] or (
                score == best[0]
                and (
                    len(piece) > len(best[2])
                    or (len(piece) == len(best[2]) and piece < best[2])
                )
            ):
                best = cand
        dp[i] = best
    out: list[str] = []
    i = n
    while i > 0:
        _, j, piece = dp[i]
        out.append(piece)
        i = j
    return out[::-1]


def train_unigram_from_counts(
    wc: list[tuple[str, int]],
    vocab_size: int = 200,
    max_piece_len: int = 8,
    em_rounds: int = 4,
    seed_factor: int = 4,
) -> list[tuple[str, float]]:
    """Reference trainer over a (word, count) list — driver-side by
    design (the input is the bounded top-K vocab).  Returns the fitted
    (piece, logprob) table sorted by (count desc, piece asc), capped
    at ``vocab_size`` with every single character (plus END) always
    kept.  Seeding: every substring of ``word+END`` up to
    ``max_piece_len``, scored by count·(len−1) (longer frequent
    substrings matter more, the SentencePiece seed heuristic), top
    ``seed_factor·vocab_size`` kept."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    words = [(_clean(w) + END, n) for w, n in wc if _clean(w)]
    singles = {c for w, _ in words for c in w}
    # --- seed: frequent substrings -----------------------------------
    sub_counts: Counter = Counter()
    for w, n in words:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                sub_counts[w[i:j]] += n
    seed_scored = sorted(
        ((s, c) for s, c in sub_counts.items() if len(s) > 1),
        key=lambda kv: (-kv[1] * (len(kv[0]) - 1), kv[0]),
    )[: seed_factor * vocab_size]
    counts: Counter = Counter({s: c for s, c in seed_scored})
    for c in singles:
        counts[c] += sub_counts.get(c, 1)

    def _normalize(cts: Counter) -> dict[str, float]:
        total = sum(cts.values())
        return {p: math.log(c / total) for p, c in cts.items() if c > 0}

    logp = _normalize(counts)
    # --- hard EM + prune ---------------------------------------------
    for _ in range(em_rounds):
        new: Counter = Counter()
        for w, n in words:
            for piece in _viterbi(w, logp, max_piece_len):
                new[piece] += n
        multis = sorted(
            ((p, c) for p, c in new.items() if len(p) > 1 and c > 0),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept: Counter = Counter()
        for c in singles:
            kept[c] = max(new.get(c, 0), 1)  # coverage floor
        budget = max(0, vocab_size - len(kept))
        for p, c in multis[:budget]:
            kept[p] = c
        logp = _normalize(kept)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 8,
    em_rounds: int = 4,
    max_vocab_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, float]]:
    """Corpus scan + capped-vocab EM loop (module docstring) — the
    train_bpe shape with a piece table instead of a merge list."""
    top = (
        word_counts(docs, text_col=text_col)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return train_unigram_from_counts(
        [(r["word"], r["n"]) for r in top],
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_rounds=em_rounds,
    )


def encode_word_unigram(
    word: str, model: list[tuple[str, float]]
) -> list[str]:
    """Python reference encoder: Viterbi-best segmentation of
    ``word+END`` under the fitted piece log-probs — the twin the
    Arrow-batched Column path is parity-locked against."""
    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)
    w = _clean(word) + END
    return _viterbi(w, logp, max_len)


def unigram_tokens(
    text: Column, model: list[tuple[str, float]]
) -> Column:
    """Per-document unigram token SEQUENCE (array<string>) — the
    bpe_tokens contract under the unigram model.  One Arrow-batched
    pandas_udf (declared boundary class: Viterbi has no replace-chain
    form); the piece table is a bounded closure literal; row-local,
    zero shuffle."""
    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        # Zipf memo: words repeat massively, so segment each DISTINCT
        # word once per executor.  Bounded (the IVF-centroid class of
        # executor-local state) — on overflow the memo stops growing
        # and rare tails pay the DP, which is the right trade.
        memo: dict[str, list[str]] = {}

        def word_toks(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = _viterbi(_clean(w) + END, logp, max_len)
                if len(memo) < 1 << 17:
                    memo[w] = got
            return got

        def run(t) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in re.split(_JAVA_WS, t.strip()):
                # split(trim, \s+) of '' yields [''] — encode the
                # empty word as just END for exact tokens() parity
                out.extend(word_toks(w))
            return out

        return texts.map(run)

    return seg(text)


def unigram_token_count(
    text: Column, model: list[tuple[str, float]]
) -> Column:
    """Per-document unigram token count — size of the Viterbi
    segmentation (the budget column)."""
    return F.size(unigram_tokens(text, model))


def unigram_counter(model: list[tuple[str, float]]):
    """text-Column → unigram-token-count closure: the plug-in
    tokenizer for the budget-bearing operators (chunking.doc_chunks /
    pack_sequences, mixing.temperature_mix take a ``count_fn``) — the
    bpe_counter seam, second tokenizer family."""

    def count(text: Column) -> Column:
        return unigram_token_count(text, model)

    return count

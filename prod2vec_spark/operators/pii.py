"""PII redaction for LLM training corpora: regex scrub of emails and
phone numbers with per-document redaction counts (the C4/Dolma-style
pre-training scrub; ENGINE scope — the reference has no text surface).

Patterns are PORTABLE by construction: no backreferences, no
lookarounds — the same pattern string compiles identically under
Spark's Java regex and DuckDB's RE2, so the oracle replays the scrub
bit-for-bit (parity probed in tests).  Everything is a row-local
Column expression: regexp_extract_all to count, regexp_replace to
redact — a linear scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def scrub(text: Column) -> Column:
    """Redact emails first (their local parts can contain digits that
    a phone pattern could half-match), then phones — the oracle
    applies the same order."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN),
        PHONE_PATTERN,
        PHONE_TOKEN,
    )


def redaction_report(text: Column) -> dict[str, Column]:
    """Per-row counts + an md5 of the scrubbed text, so an aggregate
    over the report certifies the exact redacted output without
    shipping the strings.  Counts mirror the scrub ORDER: phones are
    counted on the email-scrubbed intermediate, so a digit run inside
    an email's local part (swallowed by the <EMAIL> token) never
    reports a phantom phone redaction — n_emails + n_phones equals
    the number of tokens actually present in the certified stream."""
    email_scrubbed = F.regexp_replace(text, EMAIL_PATTERN, EMAIL_TOKEN)
    return {
        "n_emails": count_matches(text, EMAIL_PATTERN),
        "n_phones": count_matches(email_scrubbed, PHONE_PATTERN),
        "scrub_md5": F.md5(
            F.regexp_replace(email_scrubbed, PHONE_PATTERN, PHONE_TOKEN)
        ),
    }


# --- checksum-verified credit-card detection ------------------------
# candidate shape: 13-19 digits, optionally space/dash separated in
# groups (portable regex: no backreferences/lookarounds).  Detection
# is then CHECKSUM-exact: a candidate only counts as a card number if
# its digit string passes the Luhn check — the standard trick for
# keeping card-redaction recall high without nuking every long number
# (order ids, timestamps) in the corpus.
CC_PATTERN = r"[0-9](?:[ -]?[0-9]){12,18}"


def _digits(text: Column) -> Column:
    """The candidate's digit array (separators stripped), as ints."""
    return F.transform(
        F.split(F.regexp_replace(text, "[ -]", ""), ""),
        lambda c: c.cast("int"),
    )


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over a candidate string — a pure Column fold
    (aggregate over the reversed digit array: odd positions kept,
    even positions doubled with 9 subtracted past 9), no UDF.

    DuckDB oracle twin: list_reduce over the same reversed list with
    the identical per-position expression."""
    ds = F.reverse(_digits(candidate))
    total = F.aggregate(
        F.zip_with(
            ds,
            F.sequence(F.lit(0), F.size(ds) - 1),
            lambda d, i: F.when(
                i % 2 == 0, d
            ).otherwise(F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n = F.size(ds)
    return (n >= 13) & (n <= 19) & (total % 10 == 0)


def cc_report(text: Column) -> dict[str, Column]:
    """Per-row candidate extraction + Luhn validation counts: the
    audit distinguishes digit runs that merely LOOK like cards from
    checksum-valid ones.  Row-local (regexp_extract_all + a bounded
    fold per candidate)."""
    cands = F.regexp_extract_all(text, F.lit(CC_PATTERN), 0)
    valid = F.filter(cands, luhn_valid)
    return {
        "n_cc_candidates": F.size(cands),
        "n_cc_valid": F.size(valid),
    }


CC_TOKEN = "<CC>"


def scrub_cc(text: Column) -> Column:
    """Redact ONLY checksum-valid card candidates: regexp_replace
    can't consult the Luhn check, so the scrub is a bounded fold over
    the validated candidate list — acc = replace(acc, cand, <CC>) —
    which replaces every occurrence of each valid candidate string
    (validity is a function of the string, so duplicates agree).
    Invalid look-alikes (order ids, timestamps) are left untouched —
    the precision property the checksum buys.

    DuckDB twin: list_reduce over the same filtered list with
    replace().  Row-local; candidate lists are tiny."""
    cands = F.filter(
        F.array_distinct(F.regexp_extract_all(text, F.lit(CC_PATTERN), 0)),
        luhn_valid,
    )
    return F.aggregate(
        cands, text, lambda acc, c: F.replace(acc, c, F.lit(CC_TOKEN))
    )

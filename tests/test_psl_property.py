"""Differential fuzz for the full-PSL registered-domain operator
(round 12): 300 seeded-random hosts against a seeded-random rule set
(plain + wildcard + exception rules, comments, the default '*'),
compared host-for-host with an independent pure-Python implementation
of the publicsuffix.org algorithm — ONE Spark pass, deterministic
seed, so any divergence in precedence (exception beats all, longest
match wins), the wildcard binds-one-label rule, or the fallback fold
reproduces exactly."""

from __future__ import annotations

import hashlib

from prod2vec_spark.operators.domains import with_domain

LABELS = ["a", "bb", "ck", "com", "co", "uk", "www", "x", "kawasaki", "jp"]
MAX_LABELS = 4  # the operator's documented rule cap


def _draw(seed: str, n: int) -> int:
    return int.from_bytes(hashlib.md5(seed.encode()).digest()[:4], "big") % n


def _rules(n: int = 40) -> list[str]:
    rules: list[str] = ["*", "// a comment line"]
    for i in range(n):
        k = 1 + _draw(f"rl|{i}", MAX_LABELS)
        body = ".".join(
            LABELS[_draw(f"rb|{i}|{j}", len(LABELS))] for j in range(k)
        )
        kind = _draw(f"rk|{i}", 5)
        if kind == 0 and k < MAX_LABELS:
            rules.append("*." + body)
        elif kind == 1:
            rules.append("!" + body)
        else:
            rules.append(body)
    return rules


def _hosts(n: int = 300) -> list[str]:
    out = []
    for i in range(n):
        k = 1 + _draw(f"hl|{i}", 6)
        out.append(
            ".".join(LABELS[_draw(f"hb|{i}|{j}", len(LABELS))] for j in range(k))
        )
    return out


def _py_registered_domain(host: str, rules: list[str]) -> str | None:
    """Independent reference: the publicsuffix.org algorithm, written
    against the SPEC (not the operator) — exception beats everything
    (longest first), else the longest matching plain/wildcard rule,
    else the default-* fold to the last two labels; a host that IS a
    public suffix has no registrable domain."""
    labels = host.split(".")
    exc_len, best = 0, 0
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//") or r == "*":
            continue
        if r.startswith("!"):
            t = r[1:].split(".")
            if len(t) <= MAX_LABELS and labels[-len(t):] == t:
                exc_len = max(exc_len, len(t))
        elif r.startswith("*."):
            t = r[2:].split(".")
            k = len(t) + 1
            if k <= MAX_LABELS and len(labels) >= k and labels[-(k - 1):] == t:
                best = max(best, k)
        else:
            t = r.split(".")
            if len(t) <= MAX_LABELS and labels[-len(t):] == t:
                best = max(best, len(t))
    if exc_len:
        ps = exc_len - 1
    elif best:
        ps = best
    else:
        return host if len(labels) <= 2 else ".".join(labels[-2:])
    if len(labels) <= ps:
        return None  # the host IS a public suffix
    return ".".join(labels[-(ps + 1):])


def test_psl_matches_independent_reference_on_random_corpus(spark):
    rules = _rules()
    hosts = _hosts()
    assert any(r.startswith("*.") for r in rules)
    assert any(r.startswith("!") for r in rules)
    psl = spark.createDataFrame([(r,) for r in rules], ["suffix"])
    docs = spark.createDataFrame(
        [(i, f"https://{h}/p") for i, h in enumerate(hosts)],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in with_domain(docs, psl=psl).select("doc_id", "domain").collect()
    }
    mism = {
        (i, hosts[i], got[i], _py_registered_domain(hosts[i], rules))
        for i in range(len(hosts))
        if got[i] != _py_registered_domain(hosts[i], rules)
    }
    assert not mism, sorted(mism)[:10]
    # the random corpus genuinely exercises all four outcome classes
    outcomes = set()
    for i, h in enumerate(hosts):
        d = got[i]
        outcomes.add(
            "null" if d is None else
            "host" if d == h else
            "fold" if len(d.split(".")) == 2 and _py_registered_domain(h, []) == d else
            "rule"
        )
    assert {"null", "host", "rule"} <= outcomes, outcomes

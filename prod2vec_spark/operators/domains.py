"""URL/domain curation plane (ENGINE scope) — the standard
C4/RefinedWeb web-corpus input signals the engine was missing: host
extraction, per-domain profiling, domain blocklisting, and per-domain
document caps (Raffel et al. 2020 §2.2 C4 filters; Penedo et al. 2023
RefinedWeb §3.1 URL filtering + §3.4 per-domain dedup pressure).
Reference anchor: none — the reference (utils/prep_utils.py) has no
web surface; this is the curation plane's ingestion edge.

Scale shapes:

* **Host extraction is a JVM builtin** (``parse_url(url, 'HOST')``) —
  row-local, whole-stage codegen, no Python.  The naive registered-
  domain fold (last two labels + a two-level literal subset) is a
  Column expression; a USER-SUPPLIED full eTLD (public-suffix list)
  table plugs in via ``with_domain(..., psl=table)`` — a
  longest-matching-suffix lookup as ``PSL_MAX_LABELS`` broadcast
  hash joins, zero shuffle (the UNK-default vocab-probe shape,
  operators/baskets.py).  The literal subset stays the default so
  every existing oracle replays unchanged.
* **domain_profile** is one hash-agg on the host key with map-side
  partial aggregation — the ``source_profile`` shape keyed by domain;
  at 100 TB hosts are ~10⁷-cardinality, far under shuffle pressure.
* **domain_cap** ranks each domain by a seeded md5 draw
  (deterministic, oracle-replayable) — but the exact rank window
  runs on a BOUNDED survivor set: broadcast mega-domain counts feed
  a row-local draw-fraction prefilter (keep ≈ K·safety + slack rows
  per domain, a deterministic prefix of the draw order) with a
  rescue branch that restores any under-covered domain, so no task
  ever sorts a mega-domain's full row set and the output is exactly
  the naive window's.
* **Blocklists**: exact path is a broadcast anti-join on host
  (blocklists are small dimensions); the sketch path reuses the Bloom
  plane (operators/sketches.bloom_bits) when the blocklist itself is
  too hot to ship — FP-auditable, same contract as bloom_blocklist.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from prod2vec_spark.operators.text import tokens


def attach_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Testdata adapter (the multimodal.attach_blobs precedent):
    manufacture a deterministic, SKEWED url column from the doc id so
    the domain plane is exercised end-to-end without a url column in
    the testdata — and so the DuckDB oracle replays the same corpus.

    d = md5-draw in [0,100); site = floor(d²/400) (quadratic skew:
    site 0 alone gets ~20% of docs — the mega-domain the cap exists
    for); tld cycles com/org/net; every 7th doc carries an explicit
    port so host extraction is exercised beyond the clean case."""
    from prod2vec_spark.functions.hashing import hex_prefix_long

    d = hex_prefix_long(
        F.concat_ws("|", F.lit("url"), F.col(id_col)), 8
    ) % F.lit(100)
    site = F.floor((d * d) / F.lit(400.0)).cast("long")
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")), (d % 3 + 1).cast("int")
    )
    port = F.when(F.col(id_col) % 7 == 0, F.lit(":8080")).otherwise(F.lit(""))
    return docs.withColumn(
        "url",
        F.concat(
            F.lit("https://www.site"), site, F.lit("."), tld, port,
            F.lit("/doc/"), F.col(id_col),
        ),
    )


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (port stripped, NULL for unparseable
    input — the auditable-miss contract)."""
    return F.lower(F.parse_url(url, F.lit("HOST")))


# Tracking parameters every major canonicalizer strips (utm_* is the
# Google Analytics family; the rest are click-identifier params that
# differ per visitor for the SAME page — exactly the noise that makes
# byte-equal URL dedup miss real duplicates).  Deliberately EXCLUDES
# ambiguous names like 'ref': on code hosts ?ref=<branch> selects
# DIFFERENT content, so stripping it would silently drop documents —
# only unambiguous click identifiers belong in the default set.
TRACKING_PARAM_RE = (
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|igshid)(=|$)"
)


def _idn_ascii_py(host: "str | None") -> "str | None":
    """Pure-Python IDNA ACE canonical form of one host: per dot-label,
    nameprep + punycode via the stdlib ``idna`` codec — a Unicode host
    and its ``xn--`` form (any case) collapse to one lowercase ASCII
    string.  Labels the codec rejects (length/format edge cases) fall
    back to their lowercased selves — conservative: never a silent
    drop, never an exception on corpus data."""
    if host is None:
        return None
    out = []
    for label in host.split("."):
        if not label:
            out.append(label)
            continue
        try:
            out.append(label.encode("idna").decode("ascii"))
        except UnicodeError:
            out.append(label.lower())
    return ".".join(out)


def idn_ascii_host(host: Column) -> Column:
    """IDNA ACE host normalization as an Arrow-batched Pandas UDF —
    a DECLARED codec boundary (the nfc_normalize class: Unicode
    nameprep tables aren't expressible as Column functions), applied
    only on the opt-in ``idn_hosts``/``idn`` paths so the default
    canonical_url / PSL chains keep their zero-UDF whole-stage-codegen
    plans and their DuckDB oracles."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _udf(s):  # type: ignore[no-untyped-def]
        return s.map(_idn_ascii_py)

    return _udf(host)


def canonical_url(
    url: Column,
    tracking_param_re: str = TRACKING_PARAM_RE,
    idn_hosts: bool = False,
) -> Column:
    """RFC 3986-style URL normalization as ONE row-local Column chain
    (zero UDFs, whole-stage codegen) — the ingestion-edge prep that
    makes URL-level exact dedup catch real duplicates: the SAME page
    arrives as ``HTTP://WWW.Site.com:80/a/?utm_source=x&b=1#frag`` and
    ``http://www.site.com/a?b=1`` and must collapse.

    Normalizations applied (each standard, each deterministic):
      * scheme and host lowercased (path/query case preserved — those
        are case-significant per the RFC);
      * default ports stripped (``:80`` for http, ``:443`` for https);
      * fragment stripped (never sent to the server);
      * tracking parameters dropped (TRACKING_PARAM_RE: utm_*,
        fbclid, gclid, ...), remaining params SORTED (param order is
        not semantic), empty query dropped;
      * empty path → ``/``; non-root trailing slashes stripped.

    NULL for input with no ``scheme://host`` shape (the
    auditable-miss contract — unparseable rows group separately, the
    with_domain convention)."""
    u = F.trim(url)
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    auth = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    if idn_hosts:
        # round-13 opt-in: fold Unicode and xn-- forms of one host
        # together (IDNA ACE canonical form).  The port survives; the
        # host half routes through the declared Arrow boundary.
        port_sfx = F.regexp_extract(auth, r"(:\d+)$", 1)
        host_part = F.regexp_replace(auth, r":\d+$", "")
        auth = F.concat(idn_ascii_host(host_part), port_sfx)
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, "/+$", "")).otherwise(
        path
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(tracking_param_re),
    )
    qs = F.concat_ws("&", F.array_sort(params))
    out = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(
        (scheme == "") | (auth == ""), F.lit(None).cast("string")
    ).otherwise(out)


# Common two-level public suffixes (a well-known subset of the public
# suffix list — the full PSL is an external artifact; this literal set
# covers the major ccTLD second-level registries so 'a.b.co.uk' folds
# to 'b.co.uk', not 'co.uk').  Extend via the ``two_level_suffixes``
# parameter, or broadcast-join a full PSL table for exactness.
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "co.nz", "org.nz",
    "com.mx", "org.mx", "com.sg", "com.tr", "com.tw",
    "co.za", "org.za",
)


def registered_domain(
    host: Column, two_level_suffixes: tuple[str, ...] = TWO_LEVEL_SUFFIXES
) -> Column:
    """Registered domain: the last two dot-labels
    ('www.a.example.com' → 'example.com') — except when they form a
    known two-level public suffix ('a.b.co.uk' → 'b.co.uk'), checked
    against the built-in ``TWO_LEVEL_SUFFIXES`` subset as a pure
    Column `isin` (the bounded literal set compiles into the scan; a
    FULL public-suffix list would broadcast-join the same way the
    UNK-default vocab probe does).  Pass ``two_level_suffixes=()``
    for the strict last-two-labels fold."""
    parts = F.split(host, r"\.")
    last2 = F.concat_ws(".", F.slice(parts, -2, 2))
    last3 = F.concat_ws(".", F.slice(parts, -3, 3))
    out = F.when(F.size(parts) <= 2, host)
    if two_level_suffixes:
        out = out.when(
            last2.isin(*two_level_suffixes) & (F.size(parts) >= 3), last3
        )
    return out.otherwise(last2)


def with_domain(
    docs: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    psl: DataFrame | None = None,
) -> DataFrame:
    """docs + host + registered domain columns.

    Default (``psl=None``): one row-local projection using the
    built-in two-level literal subset — zero joins, whole-stage
    codegen, the oracle-replayable path every catalog entry uses.

    ``psl``: a user-supplied public-suffix table (1 string column of
    suffixes, e.g. the full publicsuffix.org list) switches to the
    longest-matching-suffix BROADCAST join (VERDICT r9 ask #5) — see
    ``psl_registered_domain``."""
    staged = docs.withColumn("host", url_host(F.col(url_col)))
    if psl is None:
        return staged.withColumn(out_col, registered_domain(F.col("host")))
    return psl_registered_domain(staged, psl, out_col=out_col)


PSL_MAX_LABELS = 4  # longest suffix the join considers (the real PSL
# tops out at 4 dot-labels, e.g. 'pvt.k12.ma.us')


def psl_registered_domain(
    staged: DataFrame,
    psl: DataFrame,
    host_col: str = "host",
    out_col: str = "domain",
    max_labels: int = PSL_MAX_LABELS,
    idn: bool = False,
) -> DataFrame:
    """Registered domain via a full public-suffix table with COMPLETE
    publicsuffix.org rule semantics: plain rules (longest matching
    suffix + one label), wildcard rules (``*.ck`` — the ``*`` binds
    exactly one real host label, so the public suffix is the tail
    plus that label), and exception rules (``!www.ck`` — the named
    suffix is NOT a public suffix; its registrable domain is itself).
    Prevailing-rule order per the spec: a matching exception rule
    beats everything (longest exception first), else the longest
    matching plain/wildcard rule, else the default ``*`` rule — the
    last-two-labels fold for unlisted TLDs.  ``//`` comment lines and
    blanks in the rule column are ignored, so the raw published list
    loads as-is.  (``*`` is honored only as the leftmost label, the
    only position the published list uses.)

    Scale shape: the PSL is a ~10⁴-row dimension, so the lookup is
    BROADCAST hash joins — one per candidate suffix length for plain
    rules, plus one per wildcard-tail / exception length ONLY when the
    table carries such rules (a plain-only table keeps the exact
    ``max_labels``-join plan) — each a row-local stream with NO
    shuffle (the explode → groupBy(max) alternative would shuffle the
    whole corpus on the doc key).  Fallbacks mirror PSL convention: a
    host matching no rule uses the last-two-labels fold (unlisted
    TLDs), and a host that IS a public suffix has no registrable
    domain → NULL (groups with unparseable URLs, which downstream
    cap/blocklist stages already pass through).

    ``idn=True`` (round-13): hosts route through the IDNA ACE
    normalizer (idn_ascii_host — a declared Arrow boundary) and the
    RULES are ACE-normalized driver-side, so a Unicode host, its
    ``xn--`` form, and a published Unicode PSL rule (the real list
    carries both forms) all match — e.g. ``пример.рф`` folds under the
    ``рф``/``xn--p1ai`` suffix rule.  Default keeps the pure-Column
    zero-UDF plan."""
    if idn:
        staged = staged.withColumn(
            host_col, idn_ascii_host(F.col(host_col))
        )
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    # A duplicate rule (easy when wildcard expansions collide with
    # plain rules) would fan out the per-k joins and duplicate corpus
    # rows.  The PSL is a bounded ~10⁴-row dimension — the same class
    # as the centroid/plane literals — so dedup DRIVER-side into local
    # relations: duplicate-proof without adding the Exchange a
    # distributed distinct() would (the zero-shuffle plan contract is
    # pytest-locked).
    raw = {
        r["_s"]
        for r in psl.select(
            F.lower(F.trim(F.col(psl.columns[0]))).alias("_s")
        ).collect()
        if r["_s"]  # a NULL/empty rule can never match
    }
    if idn:
        # ACE-normalize the rule labels driver-side (a bounded table);
        # '!'/'*.' markers pass through — they're never IDN labels
        def _ace_rule(s: str) -> str:
            if s.startswith("//"):
                return s
            if s.startswith("!"):
                return "!" + _idn_ascii_py(s[1:])
            if s.startswith("*."):
                return "*." + _idn_ascii_py(s[2:])
            return _idn_ascii_py(s)

        raw = {_ace_rule(s) for s in raw}
    plain, wild_tails, excs = set(), set(), set()
    for s in sorted(raw):
        if s.startswith("//"):
            continue  # comment line from the raw published list
        if s.startswith("!"):
            excs.add(s[1:])
        elif s.startswith("*."):
            wild_tails.add(s[2:])
        elif s == "*":
            continue  # the default rule — already the no-match fold
        else:
            plain.add(s)

    def _dim(values: set[str], col: str) -> DataFrame:
        # explicit schema: an all-NULL/empty table must degrade to the
        # no-match fallback (last-two-labels fold), not crash inference
        return psl.sparkSession.createDataFrame(
            [(s,) for s in sorted(values)], f"{col} string"
        )

    nlab = {s: s.count(".") + 1 for s in plain | wild_tails | excs}
    out = staged
    for k in range(max_labels, 0, -1):
        out = out.withColumn(
            f"_sfx{k}",
            F.when(n >= k, F.concat_ws(".", F.slice(parts, -k, k))),
        )
        pk = _dim({s for s in plain if nlab[s] == k}, f"_m{k}")
        out = out.join(
            F.broadcast(pk), out[f"_sfx{k}"] == pk[f"_m{k}"], "left"
        )
    # wildcard tails: a rule *.T (T = k-1 labels) matches a k-label
    # suffix; the * must bind a REAL label, so the match needs n >= k
    # rules beyond max_labels never join — same cap as plain rules
    wild_lens = sorted(
        {nlab[t] + 1 for t in wild_tails if nlab[t] + 1 <= max_labels},
        reverse=True,
    )
    for k in wild_lens:
        wk = _dim({t for t in wild_tails if nlab[t] == k - 1}, f"_w{k}")
        out = out.join(
            F.broadcast(wk), out[f"_sfx{k - 1}"] == wk[f"_w{k}"], "left"
        )
    # exception rules: !E (E = k labels) means E is NOT a public
    # suffix — its own registrable domain is E, i.e. ps_len = k-1
    exc_lens = sorted(
        {nlab[e] for e in excs if nlab[e] <= max_labels}, reverse=True
    )
    for k in exc_lens:
        ek = _dim({e for e in excs if nlab[e] == k}, f"_e{k}")
        out = out.join(
            F.broadcast(ek), out[f"_sfx{k}"] == ek[f"_e{k}"], "left"
        )
    # prevailing rule: exception (longest first) beats all, then the
    # longest plain/wildcard match, then the default-* fold
    ml = F.when(F.lit(False), F.lit(None).cast("int"))
    for k in exc_lens:
        ml = ml.when(F.col(f"_e{k}").isNotNull(), F.lit(k - 1))
    for k in range(max_labels, 0, -1):
        hit = F.col(f"_m{k}").isNotNull()
        if k in wild_lens:
            hit = hit | (F.col(f"_w{k}").isNotNull() & (n >= k))
        ml = ml.when(hit, F.lit(k))
    reg_len = ml + F.lit(1)
    reg = (
        F.when(F.col(host_col).isNull(), F.lit(None).cast("string"))
        .when(
            ml.isNull(),  # no PSL rule: unlisted-TLD fold (last two labels)
            F.when(n <= 2, F.col(host_col)).otherwise(
                F.concat_ws(".", F.slice(parts, -2, 2))
            ),
        )
        .when(n <= ml, F.lit(None).cast("string"))  # host IS a public suffix
        .otherwise(
            F.concat_ws(".", F.slice(parts, reg_len * F.lit(-1), reg_len))
        )
    )
    drop = (
        [f"_sfx{k}" for k in range(1, max_labels + 1)]
        + [f"_m{k}" for k in range(1, max_labels + 1)]
        + [f"_w{k}" for k in wild_lens]
        + [f"_e{k}" for k in exc_lens]
    )
    return out.withColumn(out_col, reg).drop(*drop)


def domain_profile(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain corpus dashboard — the source_profile shape keyed by
    registered domain: (domain, n_hosts, n_docs, n_tokens, dup_share)
    where dup_share = 1 − distinct text digests / docs (the verbatim-
    duplicate pressure that drives per-domain caps).  One hash-agg
    shuffle on the domain key; unparseable URLs group under NULL
    domain so nothing silently drops."""
    staged = with_domain(docs, url_col).select(
        "domain",
        "host",
        F.size(tokens(F.col(text_col))).cast("long").alias("_nt"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_dig"),
    )
    return staged.groupBy("domain").agg(
        F.countDistinct("host").cast("bigint").alias("n_hosts"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
        F.round(
            1.0 - F.countDistinct("_dig") / F.count(F.lit(1)), 4
        ).alias("dup_share"),
    )


def _domain_cap_prerank(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: str = "domcap",
    prefilter_safety: float = 4.0,
    prefilter_slack: int = 64,
) -> DataFrame:
    """The skew-safe pre-rank stage of ``domain_cap`` — exposed so the
    scale-stress tests can assert the per-domain row count that feeds
    the rank window is BOUNDED (≈ K·safety + slack, not the domain's
    raw doc count).

    Three steps, all shuffle-shapes that survive a mega-domain:

    1. **broadcast per-domain counts**, restricted to domains large
       enough to need a prefilter (``n > K·safety + slack``) — only
       the mega-domains ship, so the broadcast stays tiny even at
       10⁷-domain corpora;
    2. **row-local draw-fraction prefilter**: the rank draw is the
       md5 hex ``_draw``; its first 8 hex chars read as a uniform
       fraction u ∈ [0,1) that is MONOTONE in the string order the
       rank window uses, so keeping ``u ≤ (K·safety + slack) / n``
       keeps a deterministic PREFIX of each mega-domain's draw order
       — expected ≈ K·safety + slack rows — and the true top-K by
       draw are inside it whenever ≥ K rows survive (Chernoff lower
       tail: P[< K survivors] ≤ exp(−(K·(safety−1)+slack)²
       / (2·(K·safety+slack))) — ~e⁻³³ even at K = 1);
    3. **deterministic rescue**: a per-domain count over the
       survivors finds any prefiltered domain that (against those
       odds) kept < K rows and pulls ALL its rows back, so the final
       output is EXACTLY the naive window's — the prefilter is a
       pure physical optimisation, never a semantic one.

    No single task ever sorts a mega-domain's full row set: the only
    full-data shuffles are map-side-combining counts (one row per
    (task, domain)), and the rank window runs on the bounded
    survivor set.  NULL-domain rows bypass the prefilter (they are
    all kept; unparseable URLs are assumed a bounded sliver — chain
    a DQ gate upstream if they are not)."""
    if max_per_domain <= 0:
        raise ValueError(f"max_per_domain must be positive, got {max_per_domain}")
    staged = with_domain(docs, url_col).withColumn(
        "_draw", F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col)))
    )
    keep_target = float(max_per_domain) * prefilter_safety + float(prefilter_slack)
    mega = (
        staged.where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > F.lit(keep_target))
    )
    u = F.conv(F.substring(F.col("_draw"), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    surv = staged.join(F.broadcast(mega), "domain", "left").where(
        F.col("_n").isNull() | (u <= F.lit(keep_target) / F.col("_n"))
    )
    # LEFT join from mega so a domain with ZERO survivors (absent from
    # the survivor agg entirely) is still rescued
    surv_counts = (
        surv.where(F.col("_n").isNotNull())
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("_sn"))
    )
    short = (
        mega.join(surv_counts, "domain", "left")
        .where(F.coalesce(F.col("_sn"), F.lit(0)) < F.lit(max_per_domain))
        .select("domain")
    )
    rescued = staged.join(F.broadcast(short), "domain", "leftsemi")
    return (
        surv.drop("_n")
        .join(F.broadcast(short), "domain", "left_anti")
        .select(*staged.columns)
        .unionByName(rescued)
    )


def domain_cap(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    seed: str = "domcap",
    prefilter_safety: float = 4.0,
    prefilter_slack: int = 64,
) -> DataFrame:
    """Per-domain document cap: keep at most ``max_per_domain`` docs
    per registered domain, chosen by a seeded md5 draw (deterministic
    and insertion-order-free, so incremental crawls keep a stable
    sample).  Returns docs + (host, domain, domain_rk) with only kept
    rows.  NULL-domain rows (unparseable URLs) are all kept: the cap
    is a web-pressure valve, not a validity filter (chain a
    blocklist/DQ gate for drops).

    Skew shape: the exact rank window runs on the BOUNDED survivor
    set of ``_domain_cap_prerank`` (broadcast mega-domain counts →
    row-local md5-draw-fraction prefilter → deterministic rescue), so
    a mega-domain holding 20% of the corpus contributes ≈
    ``max_per_domain·safety + slack`` rows to its window partition
    instead of 20% of the corpus — the output is provably identical
    to the naive single-window form (the prefilter keeps a prefix of
    each domain's draw order, so survivor ranks equal global ranks)."""
    from pyspark.sql import Window

    base = _domain_cap_prerank(
        docs,
        max_per_domain,
        url_col=url_col,
        id_col=id_col,
        seed=seed,
        prefilter_safety=prefilter_safety,
        prefilter_slack=prefilter_slack,
    )
    w = Window.partitionBy("domain").orderBy("_draw", id_col)
    ranked = base.withColumn(
        "domain_rk", F.row_number().over(w).cast("int")
    )
    return ranked.where(
        F.col("domain").isNull() | (F.col("domain_rk") <= max_per_domain)
    ).drop("_draw")


def filter_blocked_domains(
    docs: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
    use_bloom: bool = False,
) -> DataFrame:
    """Drop documents whose registered domain is on the blocklist.
    ``blocked`` is a 1-column DataFrame of domains (small dimension →
    broadcast anti-join, the exact path).  ``use_bloom=True``
    prefilters through the Bloom plane first (bloom_bits broadcast as
    a bitset literal): docs whose domain the filter rules OUT skip
    the join entirely — the shape for blocklists too large to
    broadcast raw, with the anti-join verifying the maybe-hits so
    false positives never drop documents."""
    staged = with_domain(docs, url_col)
    bl = blocked.select(F.col(blocked.columns[0]).alias("domain"))
    if use_bloom:
        from prod2vec_spark.operators.sketches import (
            bloom_bits,
            bloom_maybe_contains,
        )

        bits = bloom_bits(bl, col="domain")
        maybe = bloom_maybe_contains(
            bits,
            staged.select("domain").where(F.col("domain").isNotNull()).distinct(),
            col="domain",
        )
        hits = maybe.where(F.col("maybe") == 1).select("domain")
        # verify maybe-hits exactly (Bloom FPs must not drop docs)
        confirmed = hits.join(F.broadcast(bl), "domain", "left_semi")
        return staged.join(F.broadcast(confirmed), "domain", "left_anti")
    return staged.join(F.broadcast(bl), "domain", "left_anti")

"""URL/domain curation plane (operators/domains.py): host/registered-
domain extraction edges, per-domain cap invariants, and the
blocklist's exact-vs-Bloom agreement (FPs must never drop docs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from prod2vec_spark.operators.domains import (
    attach_urls,
    domain_cap,
    domain_profile,
    filter_blocked_domains,
    registered_domain,
    url_host,
    with_domain,
)


def test_url_host_and_registered_domain_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.A.Example.COM:8443/p?q=1"),
            (2, "http://example.org/x"),
            (3, "https://a.b.co.uk/"),     # two-level public suffix
            (4, "not a url"),
            (5, None),
            (6, "ftp://files.site9.net/f"),
        ],
        "doc_id long, url string",
    )
    out = {
        r["doc_id"]: (r["host"], r["domain"])
        for r in with_domain(df).collect()
    }
    assert out[1] == ("www.a.example.com", "example.com")  # lowered, port stripped
    assert out[2] == ("example.org", "example.org")        # <=2 labels kept whole
    assert out[3] == ("a.b.co.uk", "b.co.uk")              # PSL-aware fold
    assert out[4] == (None, None)                          # auditable miss
    assert out[5] == (None, None)
    assert out[6] == ("files.site9.net", "site9.net")


def test_registered_domain_suffix_modes(spark):
    from pyspark.sql import functions as F  # noqa: F811

    from prod2vec_spark.operators.domains import registered_domain

    df = spark.createDataFrame(
        [("a.b.co.uk",), ("co.uk",), ("shop.example.com.au",), ("x.example.com",)],
        ["h"],
    )
    psl = {
        r["h"]: r["d"]
        for r in df.select("h", registered_domain(F.col("h")).alias("d")).collect()
    }
    assert psl == {
        "a.b.co.uk": "b.co.uk",          # suffix-aware: registrant level kept
        "co.uk": "co.uk",                # the bare suffix stays itself
        "shop.example.com.au": "example.com.au",
        "x.example.com": "example.com",
    }
    strict = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registered_domain(F.col("h"), two_level_suffixes=()).alias("d")
        ).collect()
    }
    assert strict["a.b.co.uk"] == "co.uk"  # strict last-two fold on request


def test_attach_urls_deterministic_and_skewed(spark):
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    dom = with_domain(attach_urls(docs))
    counts = {
        r["domain"]: r["n"]
        for r in dom.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert all(d is not None for d in counts)
    # quadratic skew: the heaviest domain holds a mega share
    assert max(counts.values()) > 3 * (sum(counts.values()) / len(counts))
    # deterministic: same ids -> same urls
    a = sorted(r["url"] for r in attach_urls(docs).collect())
    b = sorted(r["url"] for r in attach_urls(docs).collect())
    assert a == b


def test_domain_cap_invariants(spark):
    docs = attach_urls(
        spark.range(0, 400).select(F.col("id").alias("doc_id"))
    )
    k = 5
    kept = domain_cap(docs, max_per_domain=k)
    per_dom = kept.groupBy("domain").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= k for r in per_dom if r["domain"] is not None)
    # rank column is 1..n and dense within each domain
    assert kept.where(F.col("domain_rk") > k).where(
        F.col("domain").isNotNull()
    ).count() == 0
    # deterministic selection
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in domain_cap(docs, max_per_domain=k).collect())
    assert a == b
    # domains smaller than the cap keep everything
    sizes = {
        r["domain"]: r["n"]
        for r in with_domain(docs).groupBy("domain").agg(
            F.count("*").alias("n")
        ).collect()
    }
    kept_sizes = {r["domain"]: r["n"] for r in per_dom}
    for d, n in sizes.items():
        assert kept_sizes.get(d, 0) == min(n, k), d


def test_psl_registered_domain_longest_match(spark):
    """with_domain(psl=...) — the full public-suffix-list option
    (VERDICT r9 ask #5): longest matching suffix + one label, with
    three- and four-level suffixes the built-in two-level literal set
    cannot know about; unlisted TLDs fall back to the last-two fold;
    a host that IS a public suffix yields NULL."""
    psl = spark.createDataFrame(
        [("com",), ("uk",), ("co.uk",), ("act.edu.au",), ("pvt.k12.ma.us",)],
        ["suffix"],
    )
    docs = spark.createDataFrame(
        [
            (1, "https://www.example.com/x"),        # com -> example.com
            (2, "https://a.b.co.uk/x"),              # co.uk -> b.co.uk
            (3, "https://www.school.act.edu.au/x"),  # 3-level suffix
            (4, "https://w.x.pvt.k12.ma.us/x"),      # 4-level suffix
            (5, "https://co.uk/x"),                  # host IS a suffix
            (6, "https://foo.bar.example/x"),        # unlisted TLD fold
            (7, "junk"),                             # unparseable -> NULL
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in with_domain(docs, psl=psl).select("doc_id", "domain").collect()
    }
    assert got == {
        1: "example.com",
        2: "b.co.uk",
        3: "school.act.edu.au",
        4: "x.pvt.k12.ma.us",
        5: None,
        6: "bar.example",
        7: None,
    }
    # the literal-subset default gets the 3-level case WRONG — the
    # reason the PSL option exists
    naive = {
        r["doc_id"]: r["domain"]
        for r in with_domain(docs).select("doc_id", "domain").collect()
    }
    assert naive[3] == "edu.au"


def test_canonical_url_normalizations(spark):
    """Each RFC 3986-style normalization, hand-pinned: scheme/host
    case, default ports (scheme-matched only), fragment, tracking
    params, param sorting, empty-query drop, trailing slash, empty
    path — and the things that must NOT change: path/query case,
    non-default ports, a legit 'refresh' param that merely PREFIXES a
    tracking name."""
    from prod2vec_spark.operators.domains import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b/?utm_source=x&b=1&a=2#frag",
         "http://www.ex.com/A/b?a=2&b=1"),
        ("https://ex.com:443", "https://ex.com/"),
        ("https://ex.com:8443/x", "https://ex.com:8443/x"),  # non-default port
        ("http://ex.com:443/x", "http://ex.com:443/x"),  # wrong-scheme port
        ("https://ex.com/a///", "https://ex.com/a"),
        ("https://ex.com/?gclid=1&fbclid=2&utm_campaign=c", "https://ex.com/"),
        ("https://ex.com/p?refresh=1&a=B", "https://ex.com/p?a=B&refresh=1"),
        # 'ref' is content-bearing (?ref=<branch> on code hosts) and is
        # deliberately NOT in the default strip set — preserved, sorted.
        ("https://ex.com/p?ref=home&a=1", "https://ex.com/p?a=1&ref=home"),
        ("  https://ex.com/p  ", "https://ex.com/p"),
        ("not a url", None),
        ("/relative/only", None),
        (None, None),
    ]
    docs = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in docs.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_psl_wildcard_and_exception_rules(spark):
    """Full publicsuffix.org rule semantics (VERDICT r11 ask #3): a
    wildcard rule ``*.ck`` makes every <label>.ck a public suffix, an
    exception rule ``!www.ck`` carves its suffix back OUT (www.ck's
    registrable domain is www.ck itself).  Exception beats wildcard,
    longest rule wins among plain/wildcard, ``//`` comments and the
    default ``*`` rule are ignored, so the raw published list loads
    as-is."""
    psl = spark.createDataFrame(
        [
            ("com",),
            ("ck",),  # plain TLD rule coexists with the wildcard
            ("*.ck",),
            ("!www.ck",),
            ("jp",),
            ("*.kawasaki.jp",),      # 3-label wildcard (real PSL rule)
            ("!city.kawasaki.jp",),  # its real exception
            ("// this is a comment",),
            ("*",),  # the default rule — already the fallback fold
        ],
        ["suffix"],
    )
    docs = spark.createDataFrame(
        [
            (1, "https://example.com/x"),        # plain: example.com
            (2, "https://www.foo.ck/x"),         # *.ck -> foo.ck is a
            #                                      suffix -> www.foo.ck
            (3, "https://foo.ck/x"),             # IS a suffix -> NULL
            (4, "https://www.ck/x"),             # exception: www.ck
            (5, "https://a.www.ck/x"),           # under the exception
            #                                      suffix ck+www -> www.ck
            (6, "https://ck/x"),                 # bare TLD, plain 'ck'
            #                                      rule -> NULL
            (7, "https://a.b.kawasaki.jp/x"),    # *.kawasaki.jp ->
            #                                      b.kawasaki.jp suffix
            (8, "https://city.kawasaki.jp/x"),   # exception: itself
            (9, "https://x.city.kawasaki.jp/x"),  # under the exception
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in with_domain(docs, psl=psl).select("doc_id", "domain").collect()
    }
    assert got == {
        1: "example.com",
        2: "www.foo.ck",
        3: None,
        4: "www.ck",
        5: "www.ck",
        6: None,
        7: "a.b.kawasaki.jp",
        8: "city.kawasaki.jp",
        9: "city.kawasaki.jp",
    }


def test_psl_wildcard_plan_stays_broadcast_only(spark):
    """Wildcard/exception rules add broadcast joins, never a shuffle;
    and a plain-only table keeps the exact plain-only join count."""
    from prod2vec_spark.plans.inspect import count_exchanges, has_broadcast_join

    psl = spark.createDataFrame(
        [("com",), ("*.ck",), ("!www.ck",)], ["suffix"]
    )
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/")], "doc_id long, url string"
    )
    out = with_domain(docs, psl=psl)
    assert count_exchanges(out) == 0
    assert has_broadcast_join(out)


def test_psl_duplicate_rules_do_not_duplicate_rows(spark):
    """A suffix listed twice (wildcard expansions colliding with plain
    rules) must not fan out the per-k joins — one output row per doc,
    identical domains to the deduped table."""
    psl_dup = spark.createDataFrame(
        [("com",), ("com",), ("co.uk",), ("co.uk",), ("co.uk",)], ["suffix"]
    )
    docs = spark.createDataFrame(
        [(1, "https://www.example.com/x"), (2, "https://a.b.co.uk/x")],
        "doc_id long, url string",
    )
    out = with_domain(docs, psl=psl_dup).select("doc_id", "domain").collect()
    assert len(out) == 2
    assert {r["doc_id"]: r["domain"] for r in out} == {
        1: "example.com",
        2: "b.co.uk",
    }


def test_psl_null_and_empty_tables_degrade_gracefully(spark):
    """A NULL rule can never match; an empty PSL means no rule
    matches anywhere — both must fall back to the last-two-labels
    fold, not crash (regression: the driver-side dedup sorted None
    and inferred a schema from zero rows)."""
    docs = spark.createDataFrame(
        [(1, "https://www.example.com/x")], "doc_id long, url string"
    )
    for psl in (
        spark.createDataFrame([("com",), (None,)], "suffix string"),
        spark.createDataFrame([], "suffix string"),
    ):
        got = with_domain(docs, psl=psl).select("domain").collect()
        assert got[0]["domain"] == "example.com"


def test_psl_plan_is_broadcast_only(spark):
    """The PSL lookup must stay a zero-shuffle chain of broadcast
    joins — no Exchange may appear between the scan and the domain
    projection (the 100 TB contract of the operator)."""
    from prod2vec_spark.plans.inspect import count_exchanges, has_broadcast_join

    psl = spark.createDataFrame([("com",), ("co.uk",)], ["suffix"])
    docs = spark.createDataFrame([(1, "https://a.example.com/")],
                                 "doc_id long, url string")
    out = with_domain(docs, psl=psl)
    assert count_exchanges(out) == 0  # shuffle Exchanges only
    assert has_broadcast_join(out)


def _naive_domain_cap(docs, k, id_col="doc_id", seed="domcap"):
    """The pre-round-11 single-window form — the semantic ground truth
    the skew-safe prefilter must reproduce bit-for-bit."""
    from pyspark.sql import Window

    staged = with_domain(docs).withColumn(
        "_draw", F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col)))
    )
    w = Window.partitionBy("domain").orderBy("_draw", id_col)
    ranked = staged.withColumn("domain_rk", F.row_number().over(w).cast("int"))
    return ranked.where(
        F.col("domain").isNull() | (F.col("domain_rk") <= k)
    ).drop("_draw")


def test_domain_cap_matches_naive_window_form(spark):
    """Output equality: the skew-safe prefilter + rescue is a pure
    physical optimisation — kept ids AND rank values are identical to
    the naive all-rows window."""
    docs = attach_urls(spark.range(0, 600).select(F.col("id").alias("doc_id")))
    for k in (1, 3, 25):
        got = {
            (r["doc_id"], r["domain"], r["domain_rk"])
            for r in domain_cap(docs, max_per_domain=k)
            .select("doc_id", "domain", "domain_rk")
            .collect()
        }
        want = {
            (r["doc_id"], r["domain"], r["domain_rk"])
            for r in _naive_domain_cap(docs, k)
            .select("doc_id", "domain", "domain_rk")
            .collect()
        }
        assert got == want, f"k={k}"


def test_domain_cap_rescue_path_is_exact(spark):
    """Degenerate prefilter params (safety=0, slack=0) make the draw
    threshold ~0 so ~every mega-domain under-covers — the rescue
    branch must pull every such domain back whole and the output must
    still equal the naive window (covers the zero-survivor hole)."""
    docs = attach_urls(spark.range(0, 300).select(F.col("id").alias("doc_id")))
    k = 4
    got = {
        (r["doc_id"], r["domain_rk"])
        for r in domain_cap(
            docs, max_per_domain=k, prefilter_safety=0.0, prefilter_slack=0
        )
        .select("doc_id", "domain_rk")
        .collect()
    }
    want = {
        (r["doc_id"], r["domain_rk"])
        for r in _naive_domain_cap(docs, k).select("doc_id", "domain_rk").collect()
    }
    assert got == want


def test_domain_cap_keeps_null_domain_rows(spark):
    docs = spark.createDataFrame(
        [(1, "https://a.example.com/x"), (2, "junk"), (3, None)],
        "doc_id long, url string",
    )
    kept = domain_cap(docs, max_per_domain=1)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2, 3]  # cap never drops unparseable rows


def test_filter_blocked_domains_exact_and_bloom_agree(spark):
    docs = attach_urls(
        spark.range(0, 300).select(F.col("id").alias("doc_id"))
    )
    blocked = spark.createDataFrame(
        [("site0.com",), ("site3.org",), ("nosuch.net",)], ["domain"]
    )
    exact = sorted(
        r["doc_id"] for r in filter_blocked_domains(docs, blocked).collect()
    )
    bloom = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(docs, blocked, use_bloom=True).collect()
    )
    assert exact == bloom  # bloom path verifies maybe-hits exactly
    # and the blocked domains are actually gone
    left = {
        r["domain"]
        for r in filter_blocked_domains(docs, blocked)
        .select("domain")
        .distinct()
        .collect()
    }
    assert "site0.com" not in left and "site3.org" not in left
    assert left  # something survives


def test_domain_profile_shape(spark):
    docs = attach_urls(
        spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok "), (F.col("id") % 7).cast("string")).alias(
                "text"
            ),
        )
    )
    prof = domain_profile(docs).collect()
    assert prof
    total = sum(r["n_docs"] for r in prof)
    assert total == 200  # every doc lands in exactly one domain row
    for r in prof:
        assert r["n_hosts"] >= 1
        assert 0.0 <= r["dup_share"] <= 1.0
        assert r["n_tokens"] >= r["n_docs"]  # every text has >= 1 token


def test_idn_hosts_collapse_unicode_and_punycode(spark):
    """Round-13 (VERDICT r12 ask #6): with idn_hosts=True the Unicode
    and xn-- forms of one host canonicalize to the SAME URL (IDNA ACE
    form); ports and paths survive; ASCII hosts are unchanged; the
    default path stays UDF-free and keeps both forms distinct (the
    documented pre-r13 behavior)."""
    from prod2vec_spark.operators.domains import canonical_url

    cases = [
        ("https://пример.рф/p?a=1", "https://xn--e1afmkfd.xn--p1ai/p?a=1"),
        ("https://XN--E1AFMKFD.xn--p1ai/p?a=1",
         "https://xn--e1afmkfd.xn--p1ai/p?a=1"),
        ("https://bücher.example:8443/x", "https://xn--bcher-kva.example:8443/x"),
        ("https://plain.example.com/x", "https://plain.example.com/x"),
        ("not a url", None),
    ]
    docs = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in docs.select(
            "i", canonical_url(F.col("url"), idn_hosts=True).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)
    # the two IDN forms now collapse to one canonical key
    assert got[0] == got[1]


def test_psl_idn_rules_match_both_host_forms(spark):
    """A real IDN public suffix (рф / xn--p1ai, from the published
    PSL): with idn=True a Unicode-form rule matches BOTH the Unicode
    and the punycode form of a host under it, and a Unicode wildcard
    rule binds its label — the ACE normalization applies to rules and
    hosts symmetrically."""
    from prod2vec_spark.operators.domains import psl_registered_domain

    psl = spark.createDataFrame(
        [("рф",), ("com",), ("*.栃木.jp",)], "suffix string"
    )
    hosts = [
        (1, "пример.рф"),
        (2, "xn--e1afmkfd.xn--p1ai"),
        (3, "www.пример.рф"),
        (4, "shop.example.com"),
        (5, "a.b.栃木.jp"),  # wildcard: *.栃木.jp -> ps = b.栃木.jp (ACE)
    ]
    staged = spark.createDataFrame(hosts, "doc_id long, host string")
    got = {
        r["doc_id"]: r["domain"]
        for r in psl_registered_domain(staged, psl, idn=True).collect()
    }
    assert got[1] == got[2] == "xn--e1afmkfd.xn--p1ai"
    assert got[3] == "xn--e1afmkfd.xn--p1ai"
    assert got[4] == "example.com"
    assert got[5] == "a.b.xn--4pvxs.jp"

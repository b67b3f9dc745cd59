"""URL curation operators (operators/urls.py)."""

from pyspark.sql import functions as F

from dataingestion_spark.operators.urls import url_signals


def _signals(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], ["doc_id", "url"]
    )
    rows = url_signals(df).orderBy("doc_id").collect()
    return rows


def test_normalize_case_port_fragment_tracking(spark):
    (r,) = _signals(
        spark,
        ["HTTPS://WWW.Example.COM:443/Path/Sub?utm_source=x&id=3&fbclid=z#frag"],
    )
    assert r.normalized_url == "https://www.example.com/Path/Sub?id=3"
    assert r.host == "www.example.com"
    assert r.registered_domain == "example.com"
    assert r.path_depth == 2
    assert r.n_query_params == 1
    assert not r.is_blocked


def test_public_suffix_and_blocklist(spark):
    rows = _signals(
        spark,
        [
            "http://news.bbc.co.uk/sport",
            "http://a.b.spam.example/x?y=1",
            "http://localhost/",
        ],
    )
    assert rows[0].registered_domain == "bbc.co.uk"
    assert rows[1].registered_domain == "spam.example"
    assert rows[1].is_blocked
    assert rows[2].registered_domain == "localhost"
    assert rows[2].path_depth == 0


def test_tracking_only_query_drops_question_mark(spark):
    rows = _signals(
        spark,
        [
            "http://e.com/a?utm_source=1&utm_medium=2",
            "http://user:pw@e.com:80/a",
            "http://e.com",
        ],
    )
    assert rows[0].normalized_url == "http://e.com/a"
    assert rows[1].normalized_url == "http://e.com/a"
    assert rows[1].host == "e.com"
    assert rows[2].normalized_url == "http://e.com"
    assert rows[2].n_query_params == 0


def test_url_dedup_by_normalized(spark):
    urls = [
        "https://E.com/x?utm_source=a",
        "https://e.COM:443/x?utm_campaign=b",
        "https://e.com/y",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], ["doc_id", "url"])
    n = (
        url_signals(df)
        .select("normalized_url")
        .distinct()
        .count()
    )
    assert n == 2


# ---------------------------------------------------------------------------
# Full-PSL registered_domain (wildcard / exception / longest-match)
# ---------------------------------------------------------------------------

_PSL_SAMPLE = [
    "// ===BEGIN ICANN DOMAINS===",
    "com", "uk", "co.uk",
    "ck", "*.ck", "!www.ck",
    "jp", "kobe.jp", "*.kobe.jp", "!city.kobe.jp",
    "",
]


def _psl_cases():
    # (host, public_suffix, registered_domain) — from the PSL test vectors
    return [
        ("example.com", "com", "example.com"),
        ("a.b.example.com", "com", "example.com"),
        ("example.co.uk", "co.uk", "example.co.uk"),
        ("sub.example.co.uk", "co.uk", "example.co.uk"),
        ("uk", "uk", None),
        ("co.uk", "co.uk", None),
        # wildcard *.ck: every 2-label suffix is public...
        ("another.example.ck", "example.ck", "another.example.ck"),
        ("example.ck", "example.ck", None),
        # ...except the !www.ck exception
        ("www.ck", "ck", "www.ck"),
        ("sub.www.ck", "ck", "www.ck"),
        # ck alone: wildcard needs a label to consume → implicit * rule
        ("ck", "ck", None),
        # longest match: *.kobe.jp beats kobe.jp beats jp
        ("other.kobe.jp", "other.kobe.jp", None),
        ("x.other.kobe.jp", "other.kobe.jp", "x.other.kobe.jp"),
        ("city.kobe.jp", "kobe.jp", "city.kobe.jp"),
        ("sub.city.kobe.jp", "kobe.jp", "city.kobe.jp"),
        # unlisted TLD → implicit * rule
        ("example.xyz", "xyz", "example.xyz"),
        ("MiXeD.ExAmPlE.cOm", "com", "example.com"),
    ]


def test_registered_domain_psl_vectors(spark):
    from dataingestion_spark.operators.urls import psl_rules, registered_domain_psl

    cases = _psl_cases()
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(cases)], "doc_id long, host string"
    )
    out = registered_domain_psl(df, psl_rules(spark, _PSL_SAMPLE))
    got = {r.host: (r.public_suffix, r.registered_domain) for r in out.collect()}
    for host, ps, reg in cases:
        assert got[host] == (ps, reg), f"{host}: {got[host]} != {(ps, reg)}"


def test_registered_domain_psl_agrees_with_subset(spark):
    # on hosts covered by the inlined two-label subset, the full-PSL path
    # and the expression-only registered_domain() must agree
    from pyspark.sql import functions as F

    from dataingestion_spark.operators.urls import (
        TWO_LABEL_SUFFIXES, psl_rules, registered_domain, registered_domain_psl,
    )

    hosts = ["example.com", "a.example.co.uk", "b.example.com.au", "x.co.jp"]
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "doc_id long, host string"
    )
    rules = psl_rules(spark, ["com", "uk", "co.uk", "au", "com.au", "jp", "co.jp"])
    full = {r.host: r.registered_domain
            for r in registered_domain_psl(df, rules).collect()}
    subset = {r.host: r.rd for r in df.select(
        "host", registered_domain(F.col("host")).alias("rd")).collect()}
    assert full == subset


def test_parse_robots_rfc9309_grouping(spark):
    from dataingestion_spark.operators.urls import parse_robots

    robots = spark.createDataFrame(
        [("a.com",
          "# comment\nUser-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
          "\nUser-agent: gptbot\nUser-agent: ccbot\nDisallow: /\n"),
         ("b.com", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    got = {tuple(r) for r in parse_robots(robots).collect()}
    assert got == {
        ("a.com", "*", "disallow", "/private/"),
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "gptbot", "disallow", "/"),  # group binds to BOTH agents
        ("a.com", "ccbot", "disallow", "/"),
        ("b.com", "*", "disallow", ""),        # empty = allow-all marker
    }


def test_robots_disallowed_longest_match_and_defaults(spark):
    from dataingestion_spark.operators.urls import parse_robots, robots_disallowed

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p/\nAllow: /p/ok\n")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    urls = spark.createDataFrame(
        [(1, "https://a.com/p/x"), (2, "https://a.com/p/ok/deep"),
         (3, "https://a.com/q"), (4, "https://nowhere.com/p/x"),
         (5, "https://a.com/p/x")],  # duplicate row must survive
        "id int, url string",
    )
    got = sorted((r.id, r.disallowed)
                 for r in robots_disallowed(urls, rules).collect())
    assert got == [(1, True), (2, False), (3, False), (4, False), (5, True)]


def test_robots_wildcards_rfc9309(spark):
    """RFC 9309 §2.2.3 wildcard rule classes: * spans, trailing $
    anchors, mid-string $ is literal, regex metachars match literally,
    and specificity = rule octet length (allow wins ties)."""
    from dataingestion_spark.operators.urls import parse_robots, robots_disallowed

    robots = spark.createDataFrame(
        [("w.com",
          "User-agent: *\n"
          "Disallow: /fish*\n"          # /fish, /fishheads, /fish/salmon
          "Allow: /fish/free\n"         # longer → overrides for /fish/free*
          "Disallow: /*.php$\n"         # only paths ENDING .php
          "Disallow: /a+b/\n"           # '+' literal, not regex
          "Disallow: /pr$ice\n"         # mid-string $ literal
          )],
        "host string, robots_txt string",
    )
    cases = [
        ("https://w.com/fish", True),
        ("https://w.com/fishheads/yummy", True),
        ("https://w.com/fish/salmon.html", True),
        ("https://w.com/fish/free/zone", False),      # allow overrides
        ("https://w.com/Fish", False),                # case-sensitive paths
        ("https://w.com/index.php", True),
        ("https://w.com/folder/site.php", True),
        ("https://w.com/index.php5", False),          # $ anchored
        ("https://w.com/a+b/page", True),
        ("https://w.com/aab/page", False),            # + not regex
        ("https://w.com/pr$ice", True),               # literal mid $
        ("https://w.com/price", False),
        ("https://w.com/other", False),
    ]
    urls = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.disallowed for r in
           robots_disallowed(urls, parse_robots(robots), agent="*").collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_psl_rules_loads_rule_file(spark, tmp_path):
    """psl_rules accepts a PATH to a publicsuffix.org-format rule file
    (the full downloaded list drops in verbatim): an EXTENDED file —
    the sample rules plus entries absent from the vendored subset
    (private-section style multi-label and wildcard rules) — must parse
    identically to passing the lines, and the extra rules must take
    effect in registered_domain_psl."""
    from dataingestion_spark.operators.urls import (
        psl_rules, registered_domain_psl,
    )

    extended = _PSL_SAMPLE + [
        "// ===BEGIN PRIVATE DOMAINS===",
        "github.io",            # multi-label private-section entry
        "s3.amazonaws.com",
        "*.futurecms.at", "at",
        "// ===END PRIVATE DOMAINS===",
    ]
    p = tmp_path / "public_suffix_list.dat"
    p.write_text("\n".join(extended) + "\n", encoding="utf-8")

    from_file = psl_rules(spark, str(p))
    from_lines = psl_rules(spark, extended)
    assert sorted(map(tuple, from_file.collect())) == \
        sorted(map(tuple, from_lines.collect()))

    df = spark.createDataFrame(
        [(0, "user.github.io"), (1, "bucket.s3.amazonaws.com"),
         (2, "x.y.futurecms.at"), (3, "example.com")],
        "doc_id long, host string")
    out = registered_domain_psl(df, from_file)
    got = {r.host: (r.public_suffix, r.registered_domain)
           for r in out.collect()}
    assert got["user.github.io"] == ("github.io", "user.github.io")
    assert got["bucket.s3.amazonaws.com"] == (
        "s3.amazonaws.com", "bucket.s3.amazonaws.com")
    # wildcard *.futurecms.at consumes one host label
    assert got["x.y.futurecms.at"] == ("y.futurecms.at", "x.y.futurecms.at")
    assert got["example.com"] == ("com", "example.com")

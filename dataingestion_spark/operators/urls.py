"""URL curation for web-scale corpora: parse, normalize, registered
domain, tracking-param stripping, domain blocklists.

Crawl pipelines key nearly everything on URLs — dedup by normalized
URL, per-domain quality priors, blocklist filtering, domain-level
mixing — so these are pure column projections over built-in regex and
array functions: no UDFs, no shuffles, codegen'd, and expressible
verbatim in DuckDB for the oracle (all patterns are RE2-safe: no
lookaround, no backreferences).

The reference operates on file paths only (``IngestionDocument.Id``;
``src/Microsoft.Extensions.DataIngestion/IngestionDocument.cs``) — URL
handling is part of the beyond-reference curation surface, like
``operators/text_analysis.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Window, functions as F

# Query parameters that identify a click, not a resource. Stripping them
# is the single highest-yield URL-dedup normalization on web crawls.
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "ref", "ref_src", "igshid")

# Two-label public suffixes (a deliberately small, fixed subset of the
# Mozilla Public Suffix List — the operator contract is determinism;
# swap in the full PSL as a broadcast join for production).
# Provenance: hand-picked high-traffic entries from the PSL's ICANN
# section as published at publicsuffix.org circa 2024-06; it is NOT a
# complete snapshot and never will be — completeness is the job of
# psl_rules(spark, path_or_lines) + registered_domain_psl, which accept
# the full, current list verbatim.
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

DEFAULT_BLOCKLIST = ("spam.example", "malware.example", "tracker.example")

_HOSTPORT = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))


def url_host(url: Column) -> Column:
    """Lowercased host, default :80/:443 ports and userinfo stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT, 1))
    no_user = F.regexp_replace(hostport, r"^[^@]*@", "")
    return F.regexp_replace(no_user, r":(80|443)$", "")


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, r"\?([^#]*)", 1)


def path_depth(url: Column) -> Column:
    """Number of non-empty path segments."""
    p = url_path(url)
    segs = F.filter(F.split(p, "/"), lambda s: F.length(s) > 0)
    return F.size(segs).cast("int")


def kept_query_params(url: Column) -> Column:
    """Query parameters surviving the tracking strip, original order."""
    q = url_query(url)
    parts = F.when(F.length(q) > 0, F.split(q, "&")).otherwise(
        F.array().cast("array<string>")
    )

    def keep(p: Column) -> Column:
        name = F.lower(F.split_part(p, F.lit("="), F.lit(1)))
        cond = F.length(p) > 0
        for pref in TRACKING_PARAM_PREFIXES:
            cond = cond & ~name.startswith(pref)
        cond = cond & ~name.isin(*TRACKING_PARAMS)
        return cond

    return F.filter(parts, keep)


def url_normalize(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default port and userinfo
    gone, fragment gone, tracking params gone, '?' dropped when no
    params survive. Path is preserved byte-for-byte (case-sensitive by
    spec)."""
    kept = kept_query_params(url)
    query = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(url_scheme(url), F.lit("://"), url_host(url), url_path(url), query)


def registered_domain(host: Column) -> Column:
    """eTLD+1: last two labels, or last three when the final two form a
    listed public suffix (co.uk and friends)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3))
    return F.when((n >= 3) & last2.isin(*TWO_LABEL_SUFFIXES), last3).otherwise(last2)


def url_signals(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist=DEFAULT_BLOCKLIST,
) -> DataFrame:
    """Per-document URL curation columns. ``is_blocked`` matches on the
    registered domain; for blocklists too big to inline (host-level
    denylists run to millions of rows), broadcast-join a blocklist
    table against ``registered_domain`` instead."""
    u = F.col(url_col)
    host = url_host(u)
    dom = registered_domain(host)
    return df.select(
        F.col(id_col).alias(id_col),
        url_normalize(u).alias("normalized_url"),
        host.alias("host"),
        dom.alias("registered_domain"),
        path_depth(u).alias("path_depth"),
        F.size(kept_query_params(u)).cast("int").alias("n_query_params"),
        dom.isin(*blocklist).alias("is_blocked"),
    )


# ---------------------------------------------------------------------------
# Full Public Suffix List support (broadcast-join path)
# ---------------------------------------------------------------------------

def psl_rules(spark, rules) -> DataFrame:
    """Parse the Public Suffix List (publicsuffix.org/list/ format) into
    a rule table for :func:`registered_domain_psl`.

    ``rules`` is either an iterable of raw PSL lines OR a path to a rule
    file (e.g. a downloaded ``public_suffix_list.dat``, ~15k rules) —
    the full current list loads verbatim; ship it alongside the job and
    load it here rather than relying on the vendored
    ``TWO_LABEL_SUFFIXES`` subset. Comments (``//``) and blank lines are
    skipped. Each rule becomes:

    * ``lit`` — the literal label-suffix to equi-join on (wildcard ``*.``
      and exception ``!`` markers stripped),
    * ``rule_n`` — the rule's label count (prevailing-rule tiebreak: the
      PSL algorithm picks the matching rule with the most labels),
    * ``ps_n`` — labels in the resulting public suffix (wildcard consumes
      one extra host label; an exception rule's suffix drops its leftmost
      label),
    * ``req_n`` — minimum host labels for the rule to match (a wildcard
      must consume a real label: ``*.ck`` does not match host ``ck``),
    * ``is_exc`` — exception rules prevail over everything.
    """
    if isinstance(rules, (str, bytes, os.PathLike)):
        with open(rules, encoding="utf-8") as f:
            rules = f.read().splitlines()
    parsed = []
    for raw in rules:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        is_exc = line.startswith("!")
        body = line.lstrip("!")
        wild = body.startswith("*.")
        lit = body[2:] if wild else body
        lit_n = lit.count(".") + 1
        rule_n = lit_n + (1 if wild else 0)
        ps_n = rule_n - (1 if is_exc else 0)
        req_n = rule_n
        parsed.append((lit.lower(), rule_n, ps_n, req_n, is_exc))
    return spark.createDataFrame(
        parsed, "lit string, rule_n int, ps_n int, req_n int, is_exc boolean"
    )


def registered_domain_psl(df: DataFrame, rules: DataFrame,
                          host_col: str = "host", id_col: str = "doc_id",
                          max_depth: int = 6) -> DataFrame:
    """eTLD+1 with FULL Public Suffix List semantics (wildcard ``*.ck``,
    exception ``!www.ck``, longest-match precedence) — the production
    replacement for the inlined-subset :func:`registered_domain`.

    Algorithm (publicsuffix.org): among all rules matching a suffix of the
    host, the prevailing rule is the exception rule if any, else the one
    with the most labels; no match → the implicit ``*`` rule (TLD is the
    public suffix). Output adds ``public_suffix`` and
    ``registered_domain`` (null when the host IS a public suffix).

    Scale shape: each host explodes into ≤ ``max_depth`` candidate label
    suffixes, equi-joined against the **broadcast** rule table (the full
    PSL is ~15k rules ≈ 1 MB — always broadcastable), then one groupBy on
    the row id picks the prevailing rule. The corpus text never moves:
    the shuffle carries (id, host, tiny-rule-struct) rows only. For a
    zero-shuffle variant, resolve DISTINCT hosts first and broadcast the
    host→domain map back (distinct hosts ≪ rows on real crawls).
    """
    h = F.lower(F.col(host_col))
    labels = F.split(h, r"\.")
    n = F.size(labels)
    # candidate suffixes: last i labels for i = 1..min(n, max_depth)
    cand = F.transform(
        F.sequence(F.lit(1), F.least(n, F.lit(max_depth))),
        lambda i: F.concat_ws(".", F.slice(labels, n - i + 1, i)),
    )
    exploded = df.select(
        F.col(id_col), h.alias("_h"), n.alias("_n"),
        F.explode(cand).alias("lit"),
    )
    joined = (
        exploded.join(F.broadcast(rules), "lit")
        .filter(F.col("_n") >= F.col("req_n"))
        .groupBy(id_col)
        .agg(
            F.first("_h").alias("_h"), F.first("_n").alias("_n"),
            F.max(
                F.struct(
                    F.col("is_exc").cast("int").alias("exc"),
                    F.col("rule_n").alias("rule_n"),
                    F.col("ps_n").alias("ps_n"),
                )
            ).alias("_best"),
        )
        .select(id_col, F.col("_best.ps_n").alias("_ps_n"))
    )
    out = df.join(joined, id_col, "left")
    labels2 = F.split(F.lower(F.col(host_col)), r"\.")
    n2 = F.size(labels2)
    ps_n = F.coalesce(F.col("_ps_n"), F.lit(1))
    ps = F.concat_ws(".", F.slice(labels2, n2 - F.least(ps_n, n2) + 1,
                                  F.least(ps_n, n2)))
    reg = F.when(
        n2 > ps_n,
        F.concat_ws(".", F.slice(labels2, n2 - ps_n, ps_n + 1)),
    )
    return out.select(
        *[c for c in df.columns],
        ps.alias("public_suffix"),
        reg.alias("registered_domain"),
    )


def parse_robots(df: DataFrame, text_col: str = "robots_txt",
                 host_col: str = "host") -> DataFrame:
    """Parse robots.txt bodies into a rules table
    ``(host, agent, directive, rule_path)`` — RFC 9309 grouping: a run of
    consecutive ``User-agent`` lines opens a group; following
    ``Allow``/``Disallow`` lines bind to EVERY agent of that group.

    Expression-only: posexplode lines → field/value split → group ids by
    counting group-OPENING user-agent lines (a UA line whose predecessor
    is not a UA line) with a running sum window — the same construction
    as sessionization, so the whole parse is SQL-oracle-checkable.
    Comments (#…) and blank/unknown lines are ignored; field names are
    case-insensitive; empty Disallow values (allow-all markers) are kept
    with ``rule_path = ''``."""
    lines = F.split(F.col(text_col), "\n")
    ex = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(lines).alias("_i", "_line"),
    )
    clean = F.trim(F.regexp_replace(F.col("_line"), "#.*$", ""))
    field = F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1)))
    value = F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1))
    parsed = (
        ex.select("host", "_i", field.alias("_f"), value.alias("_v"))
        .filter(F.col("_f").isin("user-agent", "allow", "disallow"))
    )
    w = Window.partitionBy("host").orderBy("_i")
    is_ua = (F.col("_f") == "user-agent").cast("int")
    prev_ua = F.coalesce(F.lag(is_ua).over(w), F.lit(0))
    opens = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    grouped = parsed.withColumn(
        "_g",
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    agents = (
        grouped.filter(F.col("_f") == "user-agent")
        .select("host", "_g", F.lower(F.col("_v")).alias("agent"))
    )
    rules = grouped.filter(F.col("_f") != "user-agent").select(
        "host", "_g", F.col("_f").alias("directive"),
        F.col("_v").alias("rule_path"),
    )
    return agents.join(rules, ["host", "_g"]).select(
        "host", "agent", "directive", "rule_path"
    )


def _rule_regex(rule_path: Column) -> Column:
    """RFC 9309 rule path → anchored regex, expression-only:

    * regex metacharacters are escaped so rule text matches literally,
    * ``*`` matches any run of characters (``.*``),
    * a TRAILING ``$`` anchors the end of the path (a ``$`` anywhere
      else is literal, the common-implementation reading of §2.2.3).

    A wildcard-free rule compiles to ``^<literal>`` — exactly the
    longest-prefix semantics of the pre-wildcard fast path, so one code
    path serves both."""
    esc = F.regexp_replace(rule_path, r"([\\.\+\?\(\)\[\]\{\}\|\^$])", r"\\$1")
    # trailing escaped-$ becomes the anchor ("\\$" in the replacement is
    # Java's escape for a literal $ — bare $ is a group reference there)
    anchored = F.regexp_replace(esc, r"\\\$$", "\\$")
    return F.concat(F.lit("^"), F.regexp_replace(anchored, r"\*", ".*"))


def robots_disallowed(urls: DataFrame, rules: DataFrame,
                      agent: str = "*", url_col: str = "url") -> DataFrame:
    """Gate URLs against parsed robots rules for one agent, full
    RFC 9309 matching incl. ``*``/``$`` wildcards (§2.2.3): the MOST
    SPECIFIC matching rule — longest rule string in octets — decides;
    ties prefer Allow; no matching rule ⇒ allowed. Adds ``disallowed``
    (bool). Rules for the agent broadcast (robots tables are rule-sized,
    not crawl-sized); the crawl side only shuffles if the join itself
    does — with the broadcast, never."""
    mine = rules.filter(F.lower(F.col("agent")) == agent.lower()).select(
        "host", "directive", "rule_path",
        _rule_regex(F.col("rule_path")).alias("_re"),
    ).filter(F.col("rule_path") != "")
    u = urls.withColumn("_h", url_host(F.col(url_col))).withColumn(
        "_p", url_path(F.col(url_col))
    )
    # decide per DISTINCT (host, path) — far fewer than crawl rows — then
    # join verdicts back, preserving input multiplicity
    pairs = u.select("_h", "_p").distinct()
    j = pairs.join(
        F.broadcast(mine),
        (F.col("_h") == F.col("host")) & F.regexp_like(F.col("_p"), F.col("_re")),
    )
    # longest match wins; tie -> allow (max of the (len, is_allow) struct)
    verdict = j.groupBy("_h", "_p").agg(
        F.max(
            F.struct(
                F.length("rule_path").alias("l"),
                (F.col("directive") == "allow").cast("int").alias("a"),
            )
        ).alias("_best")
    )
    return (
        u.join(verdict, ["_h", "_p"], "left")
        .select(
            *urls.columns,
            F.coalesce(F.col("_best.a") == 0, F.lit(False)).alias("disallowed"),
        )
    )

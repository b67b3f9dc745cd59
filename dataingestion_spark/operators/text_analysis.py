"""Text analytics for training-data curation: language id, quality scoring,
token counting, fingerprinting.

All four are pure column projections over built-in functions — no UDFs,
fully codegen'd — so the per-row work runs at scan speed on 100 TB and the
semantics are reproducible in any engine with md5/regex (DuckDB oracle).
On under-parallel small inputs, operators conditionally insert one
round-robin exchange via ``fan_out`` (kill switch ``SPARK_GRAFT_FANOUT=0``)
so the scan stage fills the cluster; a structural no-op at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..partitioning import fan_out

from .dedup import normalized

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Deliberately small and fixed: the operator contract is determinism, not
# linguistic accuracy (swap in fasttext/CLD3 via pandas UDF for production).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "de", "y", "es", "un", "una", "en", "por"),
}

# GPT-2-style pretokenizer pattern (RE2-safe: no lookaround) used for the
# BPE-ish token count.
BPEISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def _words(col: Column) -> Column:
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace word count + BPE-ish subword count per document."""
    empty = F.length(F.trim(F.col(text_col))) == 0
    return fan_out(df).select(
        F.col(id_col).alias(id_col),
        F.when(empty, 0).otherwise(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("n_words"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPEISH_PATTERN), 0)).alias(
            "n_tokens_bpeish"
        ),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language detection over the fixed lists; 'und' when no
    list scores a hit. Ties break by language code order (deterministic)."""
    words = _words(F.col(text_col))
    langs = sorted(STOPWORDS)

    # Single-parameter lambdas only: a second parameter would be bound to the
    # array index by PySpark, shadowing a default-arg closure.
    def hit_fn(lang: str):
        stop = STOPWORDS[lang]
        return lambda x: x.isin(*stop)

    scores = {lang: F.size(F.filter(words, hit_fn(lang))) for lang in langs}
    df = fan_out(df)
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    for lang in reversed(langs):
        pick = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(pick)
    return df.select(
        F.col(id_col).alias(id_col),
        pick.alias("detected_lang"),
        best.cast("int").alias("stopword_hits"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length, mean word length, alpha ratio,
    stopword ratio — the standard cheap pre-filter signals (à la C4/Gopher
    rules), emitted as columns plus a [0,1] composite score."""
    df = fan_out(df)
    text = F.col(text_col)
    words = _words(text)
    n_words = F.when(F.length(F.trim(text)) == 0, 0).otherwise(F.size(words))
    n_chars = F.length(text)
    alpha_chars = F.length(F.regexp_replace(F.lower(text), r"[^a-z]", ""))
    sw = F.size(F.filter(words, lambda x: x.isin(*STOPWORDS["en"])))
    mean_word_len = (n_chars - F.greatest(n_words - 1, F.lit(0))) / F.greatest(n_words, F.lit(1))
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1))
    stop_ratio = sw / F.greatest(n_words, F.lit(1))
    length_ok = F.when((n_words >= 20) & (n_words <= 100000), 1.0).otherwise(0.0)
    wordlen_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    score = F.round(
        0.3 * length_ok + 0.2 * wordlen_ok + 0.3 * alpha_ratio + 0.2 * F.least(stop_ratio * 5, F.lit(1.0)),
        6,
    )
    return df.select(
        F.col(id_col).alias(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        score.alias("quality"),
    )


# RE2-safe patterns (no lookaround) so any engine applies them identically.
# ORDER MATTERS: the broad phone pattern would otherwise consume SSN-shaped
# ids and dotted-quad IPs before their specific patterns run. Dates like
# 2026-08-13 still match the phone shape — a known false positive shared by
# most regex scrubbers; prefer over-redaction for this operator.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn_like", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<ID>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact common PII shapes (emails, phone numbers, IPs, SSN-like ids)
    and count the redactions — the standard pre-training scrub pass. Pure
    regexp projection: scan-speed per-row work, no UDFs (conditional
    scan fan-out per the module note). Patterns apply in list order
    (an email is redacted before its digits could look like a phone)."""
    df = fan_out(df)
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(
        F.col(id_col).alias(id_col),
        scrubbed.alias("text_scrubbed"),
        *counts,
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                shingle_n: int = 5) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact identity) plus a
    winnowing-style min-shingle hash (stable under small edits)."""
    from .dedup import word_shingles

    sh = word_shingles(F.col(text_col), shingle_n)
    return fan_out(df).select(
        F.col(id_col).alias(id_col),
        F.md5(normalized(F.col(text_col))).alias("content_md5"),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("min_shingle_md5"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       ngram_ns: tuple = (2, 3)) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    documents dominated by repeated lines or a single repeated n-gram are
    low-quality (boilerplate, scraper loops, keyword stuffing) and these
    ratios are the standard filter inputs.

    Per document:

    * ``dup_line_ratio`` — lines occurring more than once / total lines
      (counting every occurrence);
    * ``dup_line_char_ratio`` — characters inside those duplicated lines
      / total line characters;
    * ``top_{n}gram_ratio`` — occurrences of the document's most frequent
      word n-gram / total n-gram occurrences, for each n in ``ngram_ns``
      (NON-distinct n-grams — repetition is the signal here, unlike the
      dedup shingles).

    Scale shape: one explode + two-level aggregate per signal family,
    all keyed by doc id — map-side combinable, shuffle payload is
    (id, counter) rows, never text. Single-line documents score 0 on the
    line ratios only if the line is unique (a doc that is one line
    repeated can't exist — lines are split on newline), and documents
    shorter than n words have one whole-text n-gram → ratio 1 (flagged
    as degenerate, which suits the filter's purpose).
    """
    df = fan_out(df)
    lines = df.select(
        F.col(id_col).alias(id_col),
        F.explode(F.split(F.col(text_col), r"\n")).alias("_ln"),
    ).filter(F.trim(F.col("_ln")) != "")
    line_counts = lines.groupBy(id_col, "_ln").agg(F.count("*").alias("_c"))
    line_sig = line_counts.groupBy(id_col).agg(
        F.round(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(0))
            / F.sum("_c"), 6
        ).alias("dup_line_ratio"),
        F.round(
            F.sum(F.when(F.col("_c") > 1, F.col("_c") * F.length("_ln")).otherwise(0))
            / F.sum(F.col("_c") * F.length("_ln")), 6
        ).alias("dup_line_char_ratio"),
    )
    from .dedup import word_ngrams  # occurrences, not distinct shingles

    out = line_sig
    for n in ngram_ns:
        g = df.select(
            F.col(id_col).alias(id_col),
            F.explode(word_ngrams(F.col(text_col), n)).alias("_g"),
        )
        gc = g.groupBy(id_col, "_g").agg(F.count("*").alias("_c"))
        gs = gc.groupBy(id_col).agg(
            F.round(F.max("_c") / F.sum("_c"), 6).alias(f"top_{n}gram_ratio")
        )
        out = out.join(gs, id_col)
    return out


def c4_signals(df: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """C4-style heuristic cleaning signals (Raffel et al. 2020, §2.2) —
    the classic web-scrape filters the reference has no counterpart for
    (its pipeline never inspects content quality):

    * ``punct_line_ratio`` — fraction of lines ending in terminal
      punctuation (C4 keeps only such lines);
    * ``short_line_ratio`` — fraction of lines under 3 words (menus,
      nav crumbs);
    * ``has_lorem_ipsum`` / ``has_brace`` — template and code tells;
    * ``n_sentences`` — terminal-punctuation count (C4 drops pages
      with < 3 sentences);
    * ``c4_keep`` — the composite keep decision.

    Pure column projection (split + HOF filter + regex — per-row work
    at scan speed; conditional scan fan-out per the module note);
    thresholds are the operator's
    contract, tune per corpus. Mirrored in SQL by
    :func:`c4_signals_sql`."""
    df = fan_out(df)
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    punct = F.size(F.filter(lines, lambda l: F.trim(l).rlike('[.!?"]$')))
    short = F.size(F.filter(
        lines, lambda l: F.size(F.split(F.trim(l), r"\s+")) < 3
    ))
    n_sent = F.length(F.regexp_replace(text, r"[^.!?]", ""))
    has_lorem = F.lower(text).contains("lorem ipsum")
    has_brace = text.contains("{")
    punct_ratio = F.round(punct / n_lines, 6)
    short_ratio = F.round(short / n_lines, 6)
    return df.select(
        F.col(id_col).alias(id_col),
        punct_ratio.alias("punct_line_ratio"),
        short_ratio.alias("short_line_ratio"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_brace"),
        n_sent.alias("n_sentences"),
        (
            (punct_ratio >= 0.3) & ~has_lorem & ~has_brace & (n_sent >= 3)
        ).alias("c4_keep"),
    )


def c4_signals_sql(table: str, text_col: str = "text",
                   id_col: str = "doc_id") -> str:
    """The identical signals as DuckDB SQL (regexp_replace needs the 'g'
    flag there; float literals cast through DOUBLE explicitly)."""
    t = f"COALESCE({text_col}, '')"
    lines = f"string_split({t}, chr(10))"
    punct = (f"len(list_filter({lines}, "
             "l -> regexp_matches(trim(l), '[.!?\"]$')))")
    short = (f"len(list_filter({lines}, "
             r"l -> len(string_split_regex(trim(l), '\s+')) < 3))")
    n_sent = f"length(regexp_replace({t}, '[^.!?]', '', 'g'))"
    pr = f"round({punct} / CAST(len({lines}) AS DOUBLE), 6)"
    sr = f"round({short} / CAST(len({lines}) AS DOUBLE), 6)"
    lorem = f"contains(lower({t}), 'lorem ipsum')"
    brace = f"contains({t}, '{{')"
    return f"""
SELECT {id_col},
       {pr} AS punct_line_ratio,
       {sr} AS short_line_ratio,
       {lorem} AS has_lorem_ipsum,
       {brace} AS has_brace,
       {n_sent} AS n_sentences,
       ({pr} >= CAST(0.3 AS DOUBLE) AND NOT {lorem} AND NOT {brace}
        AND {n_sent} >= 3) AS c4_keep
FROM {table}
"""


def gopher_signals(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Gopher-style document-quality rules (Rae et al. 2021, A1.1's
    quality half — the repetition half is :func:`repetition_signals`):

    * ``n_words``, ``mean_word_len`` — Gopher keeps 50..100k words and
      mean word length 3..10;
    * ``alpha_word_ratio`` — fraction of words containing a letter
      (keep > 0.8);
    * ``bullet_line_ratio`` / ``ellipsis_line_ratio`` — fraction of
      lines starting with a bullet (keep < 0.9) / ending in an ellipsis
      (keep < 0.3);
    * ``hash_word_ratio`` — '#' symbols per word (keep < 0.1);
    * ``gopher_keep`` — the composite (with the word-count floor scaled
      to 5 so the rule set stays exercisable on short test corpora;
      production corpora pass 50).

    Pure projection over split/HOF-filter/regex — scan-speed per-row
    work (conditional scan fan-out per the module note). Mirrored by
    :func:`gopher_signals_sql`."""
    df = fan_out(df)
    text = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(text), r"\s+")
    n_words = F.size(words)
    mean_wl = F.round(
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).cast("double") / n_words,
        6,
    )
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullets = F.size(F.filter(lines, lambda l: F.trim(l).rlike("^([•*-])")))
    ellipsis = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"\.\.\.$")))
    hashes = F.length(F.regexp_replace(text, "[^#]", ""))
    alpha_ratio = F.round(alpha / n_words, 6)
    bullet_ratio = F.round(bullets / n_lines, 6)
    ell_ratio = F.round(ellipsis / n_lines, 6)
    hash_ratio = F.round(hashes / n_words, 6)
    return df.select(
        F.col(id_col).alias(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_word_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ell_ratio.alias("ellipsis_line_ratio"),
        hash_ratio.alias("hash_word_ratio"),
        (
            (n_words >= 5)
            & (mean_wl >= 3) & (mean_wl <= 10)
            & (alpha_ratio > 0.8)
            & (bullet_ratio < 0.9)
            & (ell_ratio < 0.3)
            & (hash_ratio < 0.1)
        ).alias("gopher_keep"),
    )


def gopher_signals_sql(table: str, text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """The identical signals as DuckDB SQL."""
    t = f"COALESCE({text_col}, '')"
    words = rf"string_split_regex(trim({t}), '\s+')"
    lines = f"string_split({t}, chr(10))"
    n_words = f"len({words})"
    n_lines = f"len({lines})"
    total_wl = (f"list_reduce(list_transform({words}, "
                "w -> CAST(length(w) AS BIGINT)), (a, b) -> a + b)")
    mean_wl = f"round(CAST({total_wl} AS DOUBLE) / {n_words}, 6)"
    alpha = f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
    bullets = (f"len(list_filter({lines}, "
               "l -> regexp_matches(trim(l), '^([•*-])')))")
    ellipsis = (f"len(list_filter({lines}, "
                r"l -> regexp_matches(trim(l), '\.\.\.$')))")
    hashes = f"length(regexp_replace({t}, '[^#]', '', 'g'))"
    ar = f"round({alpha} / CAST({n_words} AS DOUBLE), 6)"
    br = f"round({bullets} / CAST({n_lines} AS DOUBLE), 6)"
    er = f"round({ellipsis} / CAST({n_lines} AS DOUBLE), 6)"
    hr = f"round({hashes} / CAST({n_words} AS DOUBLE), 6)"
    return f"""
SELECT {id_col},
       CAST({n_words} AS INT) AS n_words,
       {mean_wl} AS mean_word_len,
       {ar} AS alpha_word_ratio,
       {br} AS bullet_line_ratio,
       {er} AS ellipsis_line_ratio,
       {hr} AS hash_word_ratio,
       ({n_words} >= 5
        AND {mean_wl} >= 3 AND {mean_wl} <= 10
        AND {ar} > CAST(0.8 AS DOUBLE)
        AND {br} < CAST(0.9 AS DOUBLE)
        AND {er} < CAST(0.3 AS DOUBLE)
        AND {hr} < CAST(0.1 AS DOUBLE)) AS gopher_keep
FROM {table}
"""


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Shannon entropy of the character distribution (nats) — the cheap
    gibberish/keyboard-mash/base64-blob detector: natural language sits in
    a narrow entropy band, while repeated-char spam scores near 0 and
    random alphanumeric blobs score near ln(alphabet). Degenerate-text
    filtering à la Gopher's symbol rules, but distribution-level.

    Expression-only (no explode; conditional scan fan-out per the
    module note): per row, the distinct-char
    array is sorted and each character's count comes from one pass over
    the char array — O(|alphabet| · len) compute at scan speed, fine
    because |alphabet| is small by construction for text. The entropy fold
    runs in sorted-char order, so the double is bit-identical across
    engines (same discipline as the BM25 fold)."""
    df = fan_out(df)
    text = F.col(text_col)
    cs = F.filter(F.split(text, ""), lambda c: F.length(c) > 0)
    n = F.size(cs)
    uniq = F.array_sort(F.array_distinct(cs))
    ent = -F.aggregate(
        uniq,
        F.lit(0.0),
        lambda acc, c: acc
        + (F.size(F.filter(cs, lambda x: x == c)).cast("double") / n)
        * F.log(F.size(F.filter(cs, lambda x: x == c)).cast("double") / n),
    )
    return df.select(
        F.col(id_col).alias(id_col),
        n.cast("int").alias("n_chars"),
        F.size(uniq).cast("int").alias("n_distinct_chars"),
        F.when(n > 0, F.round(ent, 6)).otherwise(0.0).alias("entropy"),
    )


#: HTML entities unescaped by normalize_text — &amp; LAST, so an escaped
#: entity like "&amp;lt;" single-unescapes to the literal text "&lt;"
HTML_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]

#: typographic chars → ASCII (1:1, translate()-compatible in any engine)
_PUNCT_FROM = "‘’“”–— "
_PUNCT_TO = "''\"\"-- "

#: C0 controls except \t \n, plus DEL — never content, always breakage
_CONTROL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Web-text cleanup pass (the C4/CCNet pre-filter hygiene step),
    entirely in codegen'd string expressions — no UDF (conditional scan
    fan-out per the module note):

    1. line endings: CRLF / lone CR → LF;
    2. strip C0 control chars (except tab/newline) and DEL;
    3. single-pass HTML entity unescape (``&amp;`` last — escaped
       entities unescape exactly once);
    4. typographic quotes/dashes/NBSP → ASCII via ``translate``;
    5. collapse space/tab runs to one space, drop line-trailing spaces,
       collapse 3+ blank lines to one blank line, trim the ends.

    Every step is a regexp_replace / replace / translate with identical
    semantics in DuckDB (RE2) and Spark (java.util.regex) for these
    patterns, which is what makes the op oracle-checkable. Output: the
    input row with ``clean_text`` and ``n_removed_chars`` added."""
    df = fan_out(df)
    c = F.col(text_col)
    c = F.regexp_replace(c, "\\r\\n?", "\n")
    c = F.regexp_replace(c, _CONTROL_RE, "")
    for ent, rep in HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.translate(c, _PUNCT_FROM, _PUNCT_TO)
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " +\\n", "\n")
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    # trim() strips spaces only (both engines): drop boundary newlines too
    c = F.regexp_replace(c, "^[\\n ]+|[\\n ]+$", "")
    return df.withColumn("clean_text", c).withColumn(
        "n_removed_chars",
        (F.length(F.col(text_col)) - F.length("clean_text")).cast("int"),
    )


def normalize_text_sql(text_expr: str) -> str:
    """The DuckDB restatement of :func:`normalize_text`'s pipeline for a
    given SQL text expression — kept adjacent so the two stay in lock
    step (same trick as c4_signals_sql)."""
    c = f"regexp_replace({text_expr}, '\\r\\n?', chr(10), 'g')"
    c = f"regexp_replace({c}, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g')"
    for ent, rep in HTML_ENTITIES:
        r = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{r}')"
    c = f"translate({c}, '{_PUNCT_FROM}', '''''\"\"-- ')"
    c = f"regexp_replace({c}, '[ \\t]+', ' ', 'g')"
    c = f"regexp_replace({c}, ' +\\n', chr(10), 'g')"
    c = f"regexp_replace({c}, '\\n{{3,}}', chr(10) || chr(10), 'g')"
    return f"regexp_replace({c}, '^[\\n ]+|[\\n ]+$', '', 'g')"


#: script name → (java.util.regex class, RE2 class) — same Unicode script
#: property, different spelling per engine
SCRIPTS = [
    ("latin", "\\p{IsLatin}", "\\p{Latin}"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("greek", "\\p{IsGreek}", "\\p{Greek}"),
    ("arabic", "\\p{IsArabic}", "\\p{Arabic}"),
    ("devanagari", "\\p{IsDevanagari}", "\\p{Devanagari}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("hiragana", "\\p{IsHiragana}", "\\p{Hiragana}"),
    ("katakana", "\\p{IsKatakana}", "\\p{Katakana}"),
    ("hangul", "\\p{IsHangul}", "\\p{Hangul}"),
]


def script_profile(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Unicode script composition per document: codepoint counts per
    script (Latin, Cyrillic, Greek, Arabic, Devanagari, Han, Hiragana,
    Katakana, Hangul) and the dominant script (most codepoints, ties by
    script name; 'none' when nothing matches) — the cheap writing-system
    gate that runs BEFORE any model-based language id in multilingual
    curation. Expression-only: one regexp per script, counts via
    length-after-stripping-others, so the whole profile is one codegen'd
    projection (conditional scan fan-out per the module note) and
    SQL-oracle-checkable (RE2 spells the same property
    \\p{Latin} where Java says \\p{IsLatin} — see the SCRIPTS table)."""
    df = fan_out(df)
    c = F.col(text_col)
    counts = {
        name: F.length(F.regexp_replace(c, f"[^{java}]", ""))
        for name, java, _ in SCRIPTS
    }
    best = F.greatest(*counts.values())
    pick = F.lit("none")
    for name in sorted(counts, reverse=True):  # alphabetical-first wins ties
        pick = F.when((best > 0) & (counts[name] == best),
                      F.lit(name)).otherwise(pick)
    return df.select(
        F.col(id_col),
        *[cnt.alias(f"n_{name}") for name, cnt in counts.items()],
        pick.alias("main_script"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Deflate compression ratio per document (compressed/raw bytes) —
    the classic cheap gibberish-vs-boilerplate axis (used alongside the
    Gopher/C4 rules): highly repetitive text compresses far below
    normal prose (~0.3-0.6), while random gibberish stays near 1.0.

    Arrow-batched pandas UDF over zlib (a UDF is unavoidable — no
    relational deflate exists); DEFLATE output for a fixed level and
    zlib build is deterministic, so results are stable run-to-run but
    NOT SQL-expressible → the driver query is rows-only, semantics
    pinned against direct zlib in tests. Output adds ``n_bytes``,
    ``n_bytes_deflate``, ``compression_ratio``."""
    lvl = int(level)

    def scan(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [(t if isinstance(t, str) else "").encode("utf-8")
                   for t in pdf[text_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": [len(b) for b in raw],
                "n_bytes_deflate": [len(zlib.compress(b, lvl)) for b in raw],
            })

    id_type = dict(df.dtypes)[id_col]
    out = fan_out(df.select(id_col, text_col)).mapInPandas(
        scan, f"{id_col} {id_type}, n_bytes long, n_bytes_deflate long"
    )
    return out.withColumn(
        "compression_ratio",
        F.round(
            F.col("n_bytes_deflate") / F.greatest(F.col("n_bytes"), F.lit(1)),
            6,
        ),
    )

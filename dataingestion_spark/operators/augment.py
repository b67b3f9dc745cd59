"""Deterministic text augmentation: T5-style span corruption at scale.

The denoising objectives behind T5/UL2 (Raffel et al. 2020 §3.1.4) need
(input, target) pairs where random token spans are replaced by sentinel
tokens in the input and collected after their sentinels in the target:

    tokens:  the quick brown fox jumps over the dog
    input :  the <extra_id_0> fox jumps <extra_id_1> dog
    target:  <extra_id_0> quick brown <extra_id_1> over the <extra_id_2>

At 100 TB this is a data-prep job, not a data-loader transform — and it
must be DETERMINISTIC so shards are reproducible and an engine change
doesn't silently reshuffle the objective. Randomness here is
``md5(salt:doc:idx)`` compared as a hex prefix against a literal
threshold — string comparison, no floats, so Spark and DuckDB pick the
exact same spans.

Relational construction (one shuffle on the doc key, expression-only):

1. posexplode the token stream;
2. a token *starts* a span iff its hash prefix < threshold
   (``mask_rate / span_len`` of the hash space — expected masked
   fraction ≈ mask_rate);
3. a token is *masked* iff any of the previous ``span_len`` tokens
   started a span (window max over a ``span_len``-row frame — overlapping
   starts merge into longer runs, as in the reference implementation);
4. sentinel numbering = cumulative count of run starts (window sum over
   ``masked & !lag(masked)``);
5. input/target strings fold back with an ordered collect + array_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .hashing import hex_prefix_long, horner_hex_sql

__all__ = ["span_corruption", "span_corruption_sql",
           "prefix_lm_split", "prefix_lm_split_sql"]

_HEXLEN = 6  # 24 bits of hash — plenty of resolution for a mask threshold


def _threshold_hex(p_start: float) -> str:
    t = int(p_start * (1 << (4 * _HEXLEN)))
    t = max(0, min(t, (1 << (4 * _HEXLEN)) - 1))
    return format(t, f"0{_HEXLEN}x")


def span_corruption(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", mask_rate: float = 0.15,
                    span_len: int = 3, salt: str = "") -> DataFrame:
    """(id, input_text, target_text, n_tokens, n_masked, n_spans) per doc."""
    if not 0.0 < mask_rate < 1.0:
        raise ValueError("mask_rate must be in (0, 1)")
    if span_len < 1:
        raise ValueError("span_len must be >= 1")
    thr = _threshold_hex(mask_rate / span_len)

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("idx", "tok"),
    )
    h = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"),
                       F.lit(":"), F.col("idx").cast("string"))), 1, _HEXLEN)
    toks = toks.withColumn("_start", (h < F.lit(thr)).cast("int"))

    wdoc = Window.partitionBy(id_col).orderBy("idx")
    wspan = wdoc.rowsBetween(-(span_len - 1), 0)
    toks = toks.withColumn("_masked", F.max("_start").over(wspan))
    run_start = (F.col("_masked") == 1) & (
        F.coalesce(F.lag("_masked").over(wdoc), F.lit(0)) == 0)
    toks = toks.withColumn("_run", run_start.cast("int"))
    toks = toks.withColumn(
        "_sid", F.sum("_run").over(wdoc) - F.col("_run"))  # 0-based sentinel id

    sentinel = F.concat(F.lit("<extra_id_"), F.col("_sid"), F.lit(">"))
    in_piece = (F.when(F.col("_masked") == 0, F.col("tok"))
                .when(F.col("_run") == 1, sentinel))           # masked tail: NULL
    tgt_piece = (F.when(F.col("_run") == 1,
                        F.concat(sentinel, F.lit(" "), F.col("tok")))
                 .when(F.col("_masked") == 1, F.col("tok")))   # unmasked: NULL

    def fold(piece):
        pairs = F.collect_list(F.struct("idx", piece.alias("p")))
        return F.array_join(
            F.transform(F.array_sort(pairs), lambda s: s["p"]), " ")

    agg = toks.groupBy(id_col).agg(
        fold(in_piece).alias("input_text"),
        fold(tgt_piece).alias("_tgt"),
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("_masked").cast("long").alias("n_masked"),
        F.sum("_run").cast("long").alias("n_spans"),
    )
    # closing sentinel (T5 convention) — only when something was masked
    target = (F.when(F.col("n_spans") > 0,
                     F.concat(F.col("_tgt"), F.lit(" <extra_id_"),
                              F.col("n_spans"), F.lit(">")))
              .otherwise(F.lit("")))
    return agg.select(id_col, "input_text", target.alias("target_text"),
                      "n_tokens", "n_masked", "n_spans")


def span_corruption_sql(src_sql: str, text_expr: str = "text",
                        id_expr: str = "doc_id", mask_rate: float = 0.15,
                        span_len: int = 3, salt: str = "") -> str:
    """DuckDB twin of :func:`span_corruption`."""
    thr = _threshold_hex(mask_rate / span_len)
    return f"""
WITH toks0 AS (
  SELECT {id_expr} AS doc_id,
         CAST(generate_subscripts(regexp_split_to_array(trim({text_expr}), '\\s+'), 1) - 1 AS BIGINT) AS idx,
         unnest(regexp_split_to_array(trim({text_expr}), '\\s+')) AS tok
  FROM ({src_sql})),
t1 AS (
  SELECT *, CASE WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR) || ':' || CAST(idx AS VARCHAR)), 1, {_HEXLEN}) < '{thr}'
                 THEN 1 ELSE 0 END AS s
  FROM toks0),
t2 AS (
  SELECT *, MAX(s) OVER (PARTITION BY doc_id ORDER BY idx
                         ROWS BETWEEN {span_len - 1} PRECEDING AND CURRENT ROW) AS m
  FROM t1),
t3 AS (
  SELECT *, CASE WHEN m = 1 AND COALESCE(LAG(m) OVER (PARTITION BY doc_id ORDER BY idx), 0) = 0
                 THEN 1 ELSE 0 END AS run
  FROM t2),
t4 AS (
  SELECT *, SUM(run) OVER (PARTITION BY doc_id ORDER BY idx) - run AS sid
  FROM t3),
pieces AS (
  SELECT doc_id, idx, m, run,
         CASE WHEN m = 0 THEN tok
              WHEN run = 1 THEN '<extra_id_' || CAST(sid AS VARCHAR) || '>' END AS ip,
         CASE WHEN run = 1 THEN '<extra_id_' || CAST(sid AS VARCHAR) || '> ' || tok
              WHEN m = 1 THEN tok END AS tp
  FROM t4),
agg AS (
  SELECT doc_id,
         COALESCE(string_agg(ip, ' ' ORDER BY idx) FILTER (WHERE ip IS NOT NULL), '') AS input_text,
         COALESCE(string_agg(tp, ' ' ORDER BY idx) FILTER (WHERE tp IS NOT NULL), '') AS tgt,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(m) AS BIGINT) AS n_masked,
         CAST(SUM(run) AS BIGINT) AS n_spans
  FROM pieces GROUP BY doc_id)
SELECT doc_id, input_text,
       CASE WHEN n_spans > 0
            THEN tgt || ' <extra_id_' || CAST(n_spans AS VARCHAR) || '>'
            ELSE '' END AS target_text,
       n_tokens, n_masked, n_spans
FROM agg
"""


def prefix_lm_split(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", min_frac: float = 0.5,
                    max_frac: float = 0.9, salt: str = "") -> DataFrame:
    """UL2 S-denoiser / prefix-LM pairs: split each document's token
    stream at a deterministic hash-picked boundary in
    ``[min_frac, max_frac]`` — input = prefix (bidirectional context),
    target = continuation. Integer-only boundary math
    (``lo + hash % (hi - lo + 1)``) so every engine cuts at the same
    token; expression-only, not even a window."""
    if not 0.0 < min_frac <= max_frac < 1.0:
        raise ValueError("need 0 < min_frac <= max_frac < 1")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    hv = hex_prefix_long(
        F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))),
        _HEXLEN)
    lo = F.greatest(F.lit(1), F.ceil(n.cast("double") * min_frac).cast("int"))
    hi = F.least(n - 1, F.floor(n.cast("double") * max_frac).cast("int"))
    lo2 = F.least(lo, hi)  # degenerate tiny docs collapse to one choice
    cut = F.when(n >= 2, lo2 + (hv % (hi - lo2 + 1)).cast("int")).otherwise(F.lit(0))
    return df.select(
        F.col(id_col),
        F.array_join(F.slice(toks, 1, cut), " ").alias("input_text"),
        F.when(cut > 0, F.array_join(F.slice(toks, cut + 1, n - cut), " "))
         .otherwise(F.array_join(toks, " ")).alias("target_text"),
        n.cast("long").alias("n_tokens"),
        cut.cast("long").alias("cut"),
    )


def prefix_lm_split_sql(src_sql: str, text_expr: str = "text",
                        id_expr: str = "doc_id", min_frac: float = 0.5,
                        max_frac: float = 0.9, salt: str = "") -> str:
    """DuckDB twin of :func:`prefix_lm_split`."""
    expr = horner_hex_sql("h", _HEXLEN)
    return f"""
WITH base AS (
  SELECT {id_expr} AS doc_id,
         regexp_split_to_array(trim({text_expr}), '\\s+') AS w,
         md5('{salt}|' || CAST({id_expr} AS VARCHAR)) AS h
  FROM ({src_sql})),
calc AS (
  SELECT doc_id, w, len(w) AS n, {expr} AS hv FROM base),
cuts AS (
  SELECT doc_id, w, n,
         CASE WHEN n >= 2 THEN
           LEAST(GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) * {min_frac}) AS INTEGER)),
                 LEAST(n - 1, CAST(floor(CAST(n AS DOUBLE) * {max_frac}) AS INTEGER)))
           + CAST(hv % (LEAST(n - 1, CAST(floor(CAST(n AS DOUBLE) * {max_frac}) AS INTEGER))
                  - LEAST(GREATEST(1, CAST(ceil(CAST(n AS DOUBLE) * {min_frac}) AS INTEGER)),
                          LEAST(n - 1, CAST(floor(CAST(n AS DOUBLE) * {max_frac}) AS INTEGER))) + 1) AS INTEGER)
         ELSE 0 END AS cut
  FROM calc)
SELECT doc_id,
       COALESCE(array_to_string(list_slice(w, 1, cut), ' '), '') AS input_text,
       CASE WHEN cut > 0 THEN array_to_string(list_slice(w, cut + 1, n), ' ')
            ELSE array_to_string(w, ' ') END AS target_text,
       CAST(n AS BIGINT) AS n_tokens, CAST(cut AS BIGINT) AS cut
FROM cuts
"""

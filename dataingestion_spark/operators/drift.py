"""Distribution-drift detection between two table snapshots.

A 100 TB corpus is rebuilt continuously; before a new snapshot replaces
the old one, the pipeline wants to know whether a column's distribution
moved (a crawler change, a parser regression, a source going dark).
Standard practice is to compare fixed-bin histograms of the two
snapshots — Total Variation Distance and a chi-square statistic for
alerting, Population Stability Index (PSI) for the reporting convention
credit-risk teams popularized.

Everything is ONE aggregation pass per side over explicit caller-fixed
bin edges (no quantile pre-pass, no collect): bin id = a sum of
``x >= edge`` indicators (a handful of comparisons, expression-only),
then a tiny bins×2 frame carries the arithmetic — including the totals,
which come from a window sum over the joined histogram rather than a
second scan of either snapshot. Per-bin terms are IEEE-exact in both
engines (integer counts, a few correctly-rounded double ops); the
cross-bin sums run as a SORTED fold over the collected bin list
(``aggregate(array_sort(collect_list(...)))`` / ``list_reduce(list(...
ORDER BY bin))``) so both engines add the same doubles in the same
order — decimal casts are NOT order-independent across engines (Spark
shortens the decimal string, DuckDB converts the exact binary value),
which bit-flips the last ulp.

TVD and chi-square are pure arithmetic and cross-engine exact. PSI needs
``ln``, whose last ulp is not guaranteed identical across libm
implementations, so :func:`drift_report` computes it for human
consumption but the oracle surface pins only the exact metrics.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "bin_id",
    "histogram_counts",
    "drift_report",
    "drift_report_by",
    "categorical_drift",
    "histogram_counts_sql",
    "drift_report_sql",
    "drift_report_by_sql",
    "categorical_drift_sql",
]

def bin_id(value: Column, edges: Sequence[float]) -> Column:
    """0-based bin index over explicit edges: bin b holds
    ``edges[b-1] <= x < edges[b]`` with underflow in bin 0 and overflow
    in bin ``len(edges)``. NULL values get bin -1 (reported, not
    dropped — a null-rate shift IS drift)."""
    ind = [F.when(value >= float(e), 1).otherwise(0) for e in edges]
    b = reduce(lambda a, c: a + c, ind)
    return F.when(value.isNull(), F.lit(-1)).otherwise(b).cast("int")


def histogram_counts(df: DataFrame, value_col: str,
                     edges: Sequence[float]) -> DataFrame:
    """(bin int, n long) — one map-side-combined aggregation."""
    return (df.select(bin_id(F.col(value_col), edges).alias("bin"))
            .groupBy("bin").agg(F.count("*").cast("long").alias("n")))


def _joined_props(ha: DataFrame, hb: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    # totals from the joined (bins-sized) frame — the full outer join
    # holds every row of both histograms, so a window sum is exact and
    # each snapshot is scanned ONCE
    j = (ha.withColumnRenamed("n", "n_a")
         .join(hb.withColumnRenamed("n", "n_b"), "bin", "full")
         .select("bin",
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b")))
    w = Window.partitionBy()
    j = (j.withColumn("tot_a", F.sum("n_a").over(w))
         .withColumn("tot_b", F.sum("n_b").over(w)))
    # an EMPTY snapshot (source went dark) must read as p=0 for every
    # bin — division by a zero total is NULL in both engines, and NULL
    # would silently fold drift to "nothing happened"
    # try_divide: NULL on a zero total in ANSI and non-ANSI sessions alike
    return (j.withColumn("p_a", F.coalesce(
                F.try_divide(F.col("n_a").cast("double"), F.col("tot_a")),
                F.lit(0.0)))
            .withColumn("p_b", F.coalesce(
                F.try_divide(F.col("n_b").cast("double"), F.col("tot_b")),
                F.lit(0.0))))


def drift_report(a: DataFrame, b: DataFrame, value_col: str,
                 edges: Sequence[float], psi_eps: float = 1e-4) -> DataFrame:
    """One row comparing ``value_col`` between snapshots ``a`` and ``b``:
    ``tvd`` (0..1), ``chi2`` (per-bin ``(p_a-p_b)^2/(p_a+p_b)`` summed),
    ``psi`` (eps-smoothed, NOT cross-engine exact — see module doc),
    ``n_bins_hit``, ``max_bin_gap``."""
    j = _joined_props(histogram_counts(a, value_col, edges),
                      histogram_counts(b, value_col, edges))
    gap = F.abs(F.col("p_a") - F.col("p_b"))
    chi_term = F.when(F.col("p_a") + F.col("p_b") > 0,
                      (F.col("p_a") - F.col("p_b")) * (F.col("p_a") - F.col("p_b"))
                      / (F.col("p_a") + F.col("p_b"))).otherwise(F.lit(0.0))
    pa_s = F.col("p_a") + psi_eps
    pb_s = F.col("p_b") + psi_eps
    psi_term = (pa_s - pb_s) * (F.log(pa_s) - F.log(pb_s))

    def bin_fold(term):
        # sorted fold: both engines sum the identical doubles in bin order
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", term.alias("t")))),
            F.lit(0.0), lambda acc, x: acc + x["t"])

    return j.agg(
        (bin_fold(gap) / 2).alias("tvd"),
        bin_fold(chi_term).alias("chi2"),
        bin_fold(psi_term).alias("psi"),
        F.count("*").cast("long").alias("n_bins_hit"),
        F.max(gap).alias("max_bin_gap"),
        # totals ride along so an outage (tot=0, tvd=0.5) is attributable
        F.max("tot_a").cast("long").alias("n_total_a"),
        F.max("tot_b").cast("long").alias("n_total_b"),
    )


def categorical_drift(a: DataFrame, b: DataFrame, cat_col: str) -> DataFrame:
    """Per-category proportions + gap for a string column, plus the same
    exact TVD folded in every row (the per-category view is what you
    paste into the incident ticket). NULL categories count as '∅'."""
    def counts(df: DataFrame, out: str) -> DataFrame:
        return (df.select(F.coalesce(F.col(cat_col), F.lit("∅")).alias("cat"))
                .groupBy("cat").agg(F.count("*").cast("long").alias(out)))

    from pyspark.sql import Window

    ca, cb = counts(a, "n_a"), counts(b, "n_b")
    w = Window.partitionBy()
    j = (ca.join(cb, "cat", "full")
         .select("cat",
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"))
         .withColumn("tot_a", F.sum("n_a").over(w))   # totals from the joined
         .withColumn("tot_b", F.sum("n_b").over(w))   # frame: one scan/side
         .withColumn("p_a", F.coalesce(
             F.try_divide(F.col("n_a").cast("double"), F.col("tot_a")),
             F.lit(0.0)))
         .withColumn("p_b", F.coalesce(
             F.try_divide(F.col("n_b").cast("double"), F.col("tot_b")),
             F.lit(0.0)))
         .withColumn("gap", F.abs(F.col("p_a") - F.col("p_b"))))
    # sorted fold over categories: identical IEEE sum order in both engines
    ordered = F.array_sort(F.collect_list(F.struct("cat", F.col("gap").alias("g"))).over(w))
    tvd = (F.aggregate(ordered, F.lit(0.0), lambda acc, x: acc + x["g"]) / 2)
    return j.select("cat", "n_a", "n_b", "p_a", "p_b", "gap", tvd.alias("tvd"))


# --- DuckDB twins ----------------------------------------------------------

def _bin_sql(value_expr: str, edges: Sequence[float]) -> str:
    ind = " + ".join(f"(CASE WHEN {value_expr} >= {float(e)} THEN 1 ELSE 0 END)"
                     for e in edges)
    return f"(CASE WHEN {value_expr} IS NULL THEN -1 ELSE {ind} END)"


def histogram_counts_sql(src_sql: str, value_expr: str,
                         edges: Sequence[float]) -> str:
    return (f"SELECT CAST({_bin_sql(value_expr, edges)} AS INTEGER) AS bin, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM ({src_sql}) GROUP BY 1")


def drift_report_sql(a_sql: str, b_sql: str, value_expr: str,
                     edges: Sequence[float]) -> str:
    """DuckDB twin of :func:`drift_report` minus the PSI column (ln is
    not bit-stable across engines; the exact metrics are the contract)."""
    ha = histogram_counts_sql(a_sql, value_expr, edges)
    hb = histogram_counts_sql(b_sql, value_expr, edges)
    return f"""
WITH ha AS ({ha}), hb AS ({hb}),
j0 AS (
  SELECT COALESCE(ha.bin, hb.bin) AS bin,
         CAST(COALESCE(ha.n, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(hb.n, 0) AS BIGINT) AS n_b
  FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin),
j AS (
  SELECT bin,
         COALESCE(CAST(n_a AS DOUBLE) / NULLIF(SUM(n_a) OVER (), 0), CAST(0.0 AS DOUBLE)) AS p_a,
         COALESCE(CAST(n_b AS DOUBLE) / NULLIF(SUM(n_b) OVER (), 0), CAST(0.0 AS DOUBLE)) AS p_b,
         SUM(n_a) OVER () AS tot_a, SUM(n_b) OVER () AS tot_b
  FROM j0)
SELECT list_reduce(list(ABS(p_a - p_b) ORDER BY bin), (x, y) -> x + y) / 2 AS tvd,
       list_reduce(list(CASE WHEN p_a + p_b > 0
                 THEN (p_a - p_b) * (p_a - p_b) / (p_a + p_b)
                 ELSE CAST(0.0 AS DOUBLE) END ORDER BY bin), (x, y) -> x + y) AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_bins_hit,
       MAX(ABS(p_a - p_b)) AS max_bin_gap,
       CAST(MAX(tot_a) AS BIGINT) AS n_total_a,
       CAST(MAX(tot_b) AS BIGINT) AS n_total_b
FROM j
"""


def categorical_drift_sql(a_sql: str, b_sql: str, cat_expr: str) -> str:
    return f"""
WITH ca AS (SELECT COALESCE({cat_expr}, '∅') AS cat, CAST(COUNT(*) AS BIGINT) AS n_a
            FROM ({a_sql}) GROUP BY 1),
cb AS (SELECT COALESCE({cat_expr}, '∅') AS cat, CAST(COUNT(*) AS BIGINT) AS n_b
       FROM ({b_sql}) GROUP BY 1),
j0 AS (
  SELECT COALESCE(ca.cat, cb.cat) AS cat,
         CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
  FROM ca FULL OUTER JOIN cb ON ca.cat = cb.cat),
j AS (
  SELECT cat, n_a, n_b,
         COALESCE(CAST(n_a AS DOUBLE) / NULLIF(SUM(n_a) OVER (), 0), CAST(0.0 AS DOUBLE)) AS p_a,
         COALESCE(CAST(n_b AS DOUBLE) / NULLIF(SUM(n_b) OVER (), 0), CAST(0.0 AS DOUBLE)) AS p_b
  FROM j0),
tv AS (
  SELECT list_reduce(list(ABS(p_a - p_b) ORDER BY cat), (x, y) -> x + y) / 2 AS tvd
  FROM j)
SELECT cat, n_a, n_b, p_a, p_b, ABS(p_a - p_b) AS gap, tv.tvd
FROM j, tv
"""


def drift_report_by(a: DataFrame, b: DataFrame, value_col: str,
                    edges: Sequence[float], group_cols) -> DataFrame:
    """Per-group :func:`drift_report` — one report row per value of
    ``group_cols`` (the per-source monitoring dashboard: every source's
    distribution checked in ONE pass per snapshot, not a query per
    source). Same exactness contract: try_divide'd proportions, sorted
    per-bin folds, totals from the joined frame via per-group window
    sums. Groups present in only one snapshot read as total drift."""
    from pyspark.sql import Window

    if isinstance(group_cols, str):
        group_cols = [group_cols]

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (df.select(*group_cols,
                          bin_id(F.col(value_col), edges).alias("bin"))
                .groupBy(*group_cols, "bin")
                .agg(F.count("*").cast("long").alias(out)))

    ha, hb = counts(a, "n_a"), counts(b, "n_b")
    j = (ha.join(hb, [*group_cols, "bin"], "full")
         .select(*group_cols, "bin",
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b")))
    w = Window.partitionBy(*group_cols)
    j = (j.withColumn("tot_a", F.sum("n_a").over(w))
         .withColumn("tot_b", F.sum("n_b").over(w))
         .withColumn("p_a", F.coalesce(
             F.try_divide(F.col("n_a").cast("double"), F.col("tot_a")),
             F.lit(0.0)))
         .withColumn("p_b", F.coalesce(
             F.try_divide(F.col("n_b").cast("double"), F.col("tot_b")),
             F.lit(0.0))))
    gap = F.abs(F.col("p_a") - F.col("p_b"))

    def bin_fold(term):
        return F.aggregate(
            F.array_sort(F.collect_list(F.struct("bin", term.alias("t")))),
            F.lit(0.0), lambda acc, x: acc + x["t"])

    return j.groupBy(*group_cols).agg(
        (bin_fold(gap) / 2).alias("tvd"),
        F.max(gap).alias("max_bin_gap"),
        F.count("*").cast("long").alias("n_bins_hit"),
        F.max("tot_a").cast("long").alias("n_total_a"),
        F.max("tot_b").cast("long").alias("n_total_b"),
    )


def drift_report_by_sql(a_sql: str, b_sql: str, value_expr: str,
                        edges: Sequence[float], group_expr: str) -> str:
    """DuckDB twin of :func:`drift_report_by` (single group column)."""
    def counts(src, out):
        return (f"SELECT {group_expr} AS g, "
                f"CAST({_bin_sql(value_expr, edges)} AS INTEGER) AS bin, "
                f"CAST(COUNT(*) AS BIGINT) AS {out} FROM ({src}) GROUP BY 1, 2")

    return f"""
WITH ha AS ({counts(a_sql, 'n_a')}), hb AS ({counts(b_sql, 'n_b')}),
j0 AS (
  SELECT COALESCE(ha.g, hb.g) AS g, COALESCE(ha.bin, hb.bin) AS bin,
         CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
  FROM ha FULL OUTER JOIN hb ON ha.g = hb.g AND ha.bin = hb.bin),
j AS (
  SELECT g, bin, n_a, n_b,
         SUM(n_a) OVER (PARTITION BY g) AS tot_a,
         SUM(n_b) OVER (PARTITION BY g) AS tot_b,
         COALESCE(CAST(n_a AS DOUBLE) / NULLIF(SUM(n_a) OVER (PARTITION BY g), 0),
                  CAST(0.0 AS DOUBLE)) AS p_a,
         COALESCE(CAST(n_b AS DOUBLE) / NULLIF(SUM(n_b) OVER (PARTITION BY g), 0),
                  CAST(0.0 AS DOUBLE)) AS p_b
  FROM j0)
SELECT g,
       list_reduce(list(ABS(p_a - p_b) ORDER BY bin), (x, y) -> x + y) / 2 AS tvd,
       MAX(ABS(p_a - p_b)) AS max_bin_gap,
       CAST(COUNT(*) AS BIGINT) AS n_bins_hit,
       CAST(MAX(tot_a) AS BIGINT) AS n_total_a,
       CAST(MAX(tot_b) AS BIGINT) AS n_total_b
FROM j GROUP BY g
"""

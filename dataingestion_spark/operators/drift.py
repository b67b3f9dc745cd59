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
then a tiny bins×2 frame carries the arithmetic. Per-bin terms are
IEEE-exact in both engines (integer counts, one division, one subtract,
one multiply); the cross-bin sums go through ``decimal(38,18)`` so the
result is independent of Spark's partial-aggregation order — the same
trick the TPC-H aggregates here use.

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
    "categorical_drift",
    "histogram_counts_sql",
    "drift_report_sql",
    "categorical_drift_sql",
]

_DEC = "decimal(38,18)"


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
    na = ha.agg(F.sum("n").alias("tot")).select(F.col("tot").alias("tot_a"))
    nb = hb.agg(F.sum("n").alias("tot")).select(F.col("tot").alias("tot_b"))
    j = (ha.withColumnRenamed("n", "n_a")
         .join(hb.withColumnRenamed("n", "n_b"), "bin", "full")
         .select("bin",
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"))
         .crossJoin(F.broadcast(na)).crossJoin(F.broadcast(nb)))
    return j.withColumn("p_a", F.col("n_a").cast("double") / F.col("tot_a"))\
            .withColumn("p_b", F.col("n_b").cast("double") / F.col("tot_b"))


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
    return j.agg(
        (F.sum(gap.cast(_DEC)).cast("double") / 2).alias("tvd"),
        F.sum(chi_term.cast(_DEC)).cast("double").alias("chi2"),
        F.sum(psi_term.cast(_DEC)).cast("double").alias("psi"),
        F.count("*").cast("long").alias("n_bins_hit"),
        F.max(gap).alias("max_bin_gap"),
    )


def categorical_drift(a: DataFrame, b: DataFrame, cat_col: str) -> DataFrame:
    """Per-category proportions + gap for a string column, plus the same
    exact TVD folded in every row (the per-category view is what you
    paste into the incident ticket). NULL categories count as '∅'."""
    def counts(df: DataFrame, out: str) -> DataFrame:
        return (df.select(F.coalesce(F.col(cat_col), F.lit("∅")).alias("cat"))
                .groupBy("cat").agg(F.count("*").cast("long").alias(out)))

    ca, cb = counts(a, "n_a"), counts(b, "n_b")
    ta = ca.agg(F.sum("n_a").alias("tot_a"))
    tb = cb.agg(F.sum("n_b").alias("tot_b"))
    j = (ca.join(cb, "cat", "full")
         .select("cat",
                 F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
                 F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"))
         .crossJoin(F.broadcast(ta)).crossJoin(F.broadcast(tb))
         .withColumn("p_a", F.col("n_a").cast("double") / F.col("tot_a"))
         .withColumn("p_b", F.col("n_b").cast("double") / F.col("tot_b"))
         .withColumn("gap", F.abs(F.col("p_a") - F.col("p_b"))))
    from pyspark.sql import Window
    tvd = (F.sum(F.col("gap").cast(_DEC)).over(Window.partitionBy())
           .cast("double") / 2)
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
tots AS (SELECT (SELECT SUM(n) FROM ha) AS tot_a, (SELECT SUM(n) FROM hb) AS tot_b),
j AS (
  SELECT COALESCE(ha.bin, hb.bin) AS bin,
         CAST(COALESCE(ha.n, 0) AS DOUBLE) / t.tot_a AS p_a,
         CAST(COALESCE(hb.n, 0) AS DOUBLE) / t.tot_b AS p_b
  FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin, tots t
)
SELECT CAST(SUM(CAST(ABS(p_a - p_b) AS DECIMAL(38,18))) AS DOUBLE) / 2 AS tvd,
       CAST(SUM(CAST(CASE WHEN p_a + p_b > 0
                 THEN (p_a - p_b) * (p_a - p_b) / (p_a + p_b)
                 ELSE 0 END AS DECIMAL(38,18))) AS DOUBLE) AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_bins_hit,
       MAX(ABS(p_a - p_b)) AS max_bin_gap
FROM j
"""


def categorical_drift_sql(a_sql: str, b_sql: str, cat_expr: str) -> str:
    return f"""
WITH ca AS (SELECT COALESCE({cat_expr}, '∅') AS cat, CAST(COUNT(*) AS BIGINT) AS n_a
            FROM ({a_sql}) GROUP BY 1),
cb AS (SELECT COALESCE({cat_expr}, '∅') AS cat, CAST(COUNT(*) AS BIGINT) AS n_b
       FROM ({b_sql}) GROUP BY 1),
tots AS (SELECT (SELECT SUM(n_a) FROM ca) AS tot_a, (SELECT SUM(n_b) FROM cb) AS tot_b),
j AS (
  SELECT COALESCE(ca.cat, cb.cat) AS cat,
         CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
         CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b,
         CAST(COALESCE(n_a, 0) AS DOUBLE) / t.tot_a AS p_a,
         CAST(COALESCE(n_b, 0) AS DOUBLE) / t.tot_b AS p_b
  FROM ca FULL OUTER JOIN cb ON ca.cat = cb.cat, tots t
)
SELECT cat, n_a, n_b, p_a, p_b, ABS(p_a - p_b) AS gap,
       CAST(SUM(CAST(ABS(p_a - p_b) AS DECIMAL(38,18))) OVER () AS DOUBLE) / 2 AS tvd
FROM j
"""

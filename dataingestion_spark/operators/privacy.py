"""Privacy risk checks for released datasets: k-anonymity / l-diversity.

Before a curated slice of a corpus leaves the pipeline (eval set, vendor
drop, public release), the standard re-identification checks are:

* **k-anonymity** (Sweeney 2002): every combination of quasi-identifier
  values must be shared by at least ``k`` rows — a group of 1 is a
  direct re-identification.
* **l-diversity** (Machanavalli et al. 2007): within each
  quasi-identifier group, the *sensitive* attribute must take at least
  ``l`` distinct values — a 5-anonymous group whose 5 rows all share one
  diagnosis still leaks it.

Both are ONE groupBy over the quasi-identifier columns (map-side
combinable counts / distincts) — no joins, no UDFs; the violation report
and the scalar summary come from the same aggregate. The PII *scrubbing*
path lives in ``text_analysis.py`` (pii_scrub); these operators are the
release gate that checks what scrubbing left behind.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "anonymity_groups",
    "k_anonymity_report",
    "k_anonymity_report_sql",
]


def anonymity_groups(df: DataFrame, quasi_cols: Sequence[str],
                     sensitive_col: Optional[str] = None) -> DataFrame:
    """One row per quasi-identifier combination: ``group_size`` and — when
    a sensitive column is named — ``n_sensitive`` (its distinct count in
    the group). NULL quasi values are a group like any other (they are
    still a linkable signature)."""
    aggs = [F.count("*").cast("long").alias("group_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).cast("long")
                    .alias("n_sensitive"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(df: DataFrame, quasi_cols: Sequence[str], k: int,
                       sensitive_col: Optional[str] = None,
                       l: Optional[int] = None) -> DataFrame:
    """One summary row: ``n_rows``, ``n_groups``, ``min_group_size``,
    ``k_violating_groups`` / ``k_violating_rows`` (groups smaller than
    ``k`` and the rows they expose), and with ``sensitive_col`` +
    ``l`` also ``l_violating_groups`` (groups with fewer than ``l``
    distinct sensitive values). ``is_k_anonymous`` summarizes the gate."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if (sensitive_col is None) != (l is None):
        raise ValueError("sensitive_col and l go together")
    g = anonymity_groups(df, quasi_cols, sensitive_col)
    small = F.col("group_size") < k
    aggs = [
        F.sum("group_size").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_groups"),
        F.min("group_size").cast("long").alias("min_group_size"),
        F.sum(small.cast("long")).cast("long").alias("k_violating_groups"),
        F.sum(F.when(small, F.col("group_size")).otherwise(0))
         .cast("long").alias("k_violating_rows"),
    ]
    if l is not None:
        aggs.append(F.sum((F.col("n_sensitive") < l).cast("long"))
                    .cast("long").alias("l_violating_groups"))
    out = g.agg(*aggs)
    return out.withColumn("is_k_anonymous",
                          (F.col("k_violating_groups") == 0).cast("boolean"))


def k_anonymity_report_sql(src_sql: str, quasi_cols: Sequence[str], k: int,
                           sensitive_col: Optional[str] = None,
                           l: Optional[int] = None) -> str:
    """DuckDB twin of :func:`k_anonymity_report`."""
    qi = ", ".join(quasi_cols)
    sens = (f", CAST(COUNT(DISTINCT {sensitive_col}) AS BIGINT) AS n_sensitive"
            if sensitive_col else "")
    lcol = (f"CAST(SUM(CASE WHEN n_sensitive < {l} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS l_violating_groups," if l is not None else "")
    return f"""
WITH g AS (
  SELECT {qi}, CAST(COUNT(*) AS BIGINT) AS group_size{sens}
  FROM ({src_sql}) GROUP BY {qi}
)
SELECT CAST(SUM(group_size) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MIN(group_size) AS BIGINT) AS min_group_size,
       CAST(SUM(CASE WHEN group_size < {k} THEN 1 ELSE 0 END) AS BIGINT) AS k_violating_groups,
       CAST(SUM(CASE WHEN group_size < {k} THEN group_size ELSE 0 END) AS BIGINT) AS k_violating_rows,
       {lcol}
       (SUM(CASE WHEN group_size < {k} THEN 1 ELSE 0 END) = 0) AS is_k_anonymous
FROM g
"""

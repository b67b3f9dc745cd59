"""Declarative data-quality constraint checking (the Deequ/Great
Expectations core, reduced to relational algebra).

A 100 TB ingest without automated expectation checks ships silent schema
rot; the useful core is small: per-constraint VIOLATION COUNTS computed
in one pass over the table (plus one aggregate per uniqueness key and
one anti-join per referential rule), emitted as a report DataFrame a
pipeline can alert on or gate a commit with.

Rules (each a ``(name, kind, ...)`` tuple via the constructors):

* :func:`not_null` — column has no nulls;
* :func:`unique` — column values appear exactly once;
* :func:`in_range` — numeric column within [lo, hi] (nulls don't count
  as violations — pair with not_null to forbid them);
* :func:`matches` — string column matches a regex (RE2-safe subset
  recommended so the same rule runs on any engine);
* :func:`in_set` — column value ∈ allowed set;
* :func:`refers_to` — every value exists in another table's key column
  (foreign-key check, computed as a LEFT ANTI join — broadcast when the
  referenced key side is small, shuffle otherwise; nulls are not
  violations, matching SQL FK semantics).

Scale shape: all row-local rules fold into ONE aggregation pass
(conditional sums — no shuffle beyond the final 1-row reduce);
``unique`` adds one groupBy on its column; ``refers_to`` adds one
anti-join per rule. The report is rule-count-sized.

The reference has no data-quality machinery (ingestion trusts its
readers); this is part of the beyond-reference operational surface.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, functions as F

Rule = Tuple  # (name, kind, payload...)


def not_null(col: str) -> Rule:
    return (f"not_null({col})", "not_null", col)


def unique(col: str) -> Rule:
    return (f"unique({col})", "unique", col)


def in_range(col: str, lo, hi) -> Rule:
    return (f"in_range({col},{lo},{hi})", "in_range", col, lo, hi)


def matches(col: str, pattern: str) -> Rule:
    return (f"matches({col})", "matches", col, pattern)


def in_set(col: str, allowed: Sequence) -> Rule:
    return (f"in_set({col})", "in_set", col, tuple(allowed))


def refers_to(col: str, other: DataFrame, other_col: str,
              broadcast: bool = True) -> Rule:
    return (f"refers_to({col}->{other_col})", "refers_to", col, other,
            other_col, broadcast)


def check_constraints(df: DataFrame, rules: List[Rule]) -> DataFrame:
    """Evaluate every rule; returns ``(rule, violations, n_rows)`` with
    one row per rule, violations = number of offending rows (for
    ``unique``: rows whose value occurs more than once)."""
    row_local: List[Tuple[str, F.Column]] = []
    extra: List[Tuple[str, DataFrame]] = []
    for r in rules:
        name, kind = r[0], r[1]
        if kind == "not_null":
            row_local.append((name, F.col(r[2]).isNull()))
        elif kind == "in_range":
            c = F.col(r[2])
            row_local.append(
                (name, c.isNotNull() & ((c < F.lit(r[3])) | (c > F.lit(r[4]))))
            )
        elif kind == "matches":
            c = F.col(r[2])
            row_local.append(
                (name, c.isNotNull() & ~c.rlike(r[3]))
            )
        elif kind == "in_set":
            c = F.col(r[2])
            row_local.append((name, c.isNotNull() & ~c.isin(list(r[3]))))
        elif kind == "unique":
            col = r[2]
            dup = (
                df.groupBy(col).agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > 1)
                .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("violations"))
                .select(F.lit(name).alias("rule"), "violations")
            )
            extra.append((name, dup))
        elif kind == "refers_to":
            col, other, other_col, bc = r[2], r[3], r[4], r[5]
            keys = other.select(F.col(other_col).alias(col)).distinct()
            if bc:
                keys = F.broadcast(keys)
            missing = (
                df.select(col).filter(F.col(col).isNotNull())
                .join(keys, col, "left_anti")
                .agg(F.count("*").alias("violations"))
                .select(F.lit(name).alias("rule"), "violations")
            )
            extra.append((name, missing))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    parts: List[DataFrame] = []
    if row_local:
        # n_rows rides the same wide aggregation, so every row-local rule
        # (plus the row count) costs exactly one scan of the table.
        agg = df.agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).alias(str(i))
                for i, (_, cond) in enumerate(row_local)
            ],
        )
        spark = df.sparkSession
        wide = agg.collect()[0]
        n_rows = int(wide["_n"])
        parts.append(spark.createDataFrame(
            [(name, int(wide[str(i)])) for i, (name, _) in enumerate(row_local)],
            "rule string, violations long",
        ))
    else:
        n_rows = df.count()
    parts.extend(d for _, d in extra)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("n_rows", F.lit(n_rows).cast("long"))


def assert_constraints(df: DataFrame, rules: List[Rule]) -> None:
    """Gate form: raise with the full report when any rule is violated."""
    report = check_constraints(df, rules).collect()
    bad = [r for r in report if r["violations"] > 0]
    if bad:
        lines = ", ".join(f"{r['rule']}={r['violations']}" for r in bad)
        raise AssertionError(f"data-quality violations: {lines}")


def profile_table(df: DataFrame,
                  columns: Optional[List[str]] = None) -> DataFrame:
    """Column-level profile (the ``DESCRIBE``-at-scale companion to
    :func:`check_constraints`): for every column — row count, null
    count, exact distinct count, and min/max rendered as strings (so one
    report schema covers every column type). Numeric-only stats stay in
    their own columns (null for non-numerics).

    One wide aggregation computes every per-column expression in a
    single pass over the table; only the distinct counts add per-column
    partial aggregates (Spark rewrites multi countDistinct with
    expand — cost grows with the column list, so pass ``columns`` to
    profile a subset of a very wide table)."""
    from pyspark.sql import types as T

    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType,
                                   T.LongType, T.FloatType, T.DoubleType,
                                   T.DecimalType))
    }
    exprs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        exprs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
            (F.avg(F.col(c).cast("double")) if c in numeric
             else F.lit(None).cast("double")).alias(f"_avg_{c}"),
        ]
    wide = df.agg(*exprs).collect()[0]
    rows = [
        (c, int(wide["_n"]), int(wide[f"_null_{c}"]), int(wide[f"_dist_{c}"]),
         wide[f"_min_{c}"], wide[f"_max_{c}"],
         float(wide[f"_avg_{c}"]) if wide[f"_avg_{c}"] is not None else None)
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "column string, n_rows long, n_nulls long, n_distinct long, "
        "min_str string, max_str string, mean double",
    )

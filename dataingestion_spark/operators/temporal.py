"""Temporal operators Spark lacks natively: as-of join, rolling windows.

The as-of join (each left row matched to the latest right row at-or-before
its timestamp, per key) has no built-in Spark operator. Implementation is
the co-partitioned ``pd.merge_asof`` pattern: both sides shuffle once on the
join key via ``cogroup``, each key group is matched with the vectorized
pandas backward search. Scales as one shuffle per side; skewed keys are the
usual risk (salt the key, or pre-bucket the time axis for the equi-join
formulation, if one user dominates).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: List[str] | None = None,
              suffix: str = "_right") -> DataFrame:
    """For every left row: columns of the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (backward as-of,
    inclusive — ANSI/DuckDB ASOF JOIN semantics); nulls when no such row."""
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    out_fields = list(left.schema.fields)
    rs = {f.name: f.dataType for f in right.schema.fields}
    out_fields.append(T.StructField(right_ts + suffix, rs[right_ts], True))
    for c in right_cols:
        out_fields.append(T.StructField(c + suffix, rs[c], True))
    schema = T.StructType(out_fields)

    def match(key, dfs):
        import pandas as pd

        out_cols = [f.name for f in out_fields]
        lpdf, rpdf = dfs
        if len(lpdf) == 0:
            return pd.DataFrame(columns=out_cols)
        take = [right_ts] + right_cols

        def no_match(left_part):
            out = left_part.copy()
            for c in take:
                out[c + suffix] = None
            return out[out_cols]

        # merge_asof raises on null keys: null-ts left rows pass through
        # unmatched; null-ts right rows can never be "latest" and are dropped
        lnull = lpdf[lpdf[left_ts].isna()]
        lpdf = lpdf[lpdf[left_ts].notna()].sort_values(left_ts, kind="mergesort")
        rpdf = rpdf[rpdf[right_ts].notna()]
        if len(rpdf) == 0:
            return pd.concat([no_match(lpdf), no_match(lnull)], ignore_index=True)
        # Suffix right columns up front: merge_asof collapses identically
        # named join keys into one column, which would lose right.ts.
        # Secondary sort on the value columns makes the pick deterministic
        # when several right rows share a timestamp (merge_asof takes the
        # last sorted row = the max by the tiebreak).
        rpdf = (
            rpdf[take]
            .rename(columns={c: c + suffix for c in take})
            .sort_values([c + suffix for c in take], kind="mergesort")
        )
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts + suffix,
            direction="backward",
        )
        if len(lnull):
            merged = pd.concat([merged[out_cols], no_match(lnull)], ignore_index=True)
        return merged[out_cols]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda k, l, r: match(k, (l, r)), schema=schema)
    )

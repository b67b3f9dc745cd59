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

from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F

from pyspark.sql import types as T


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: List[str] | None = None,
              suffix: str = "_right", direction: str = "backward",
              tolerance=None) -> DataFrame:
    """For every left row: columns of the matching right row within the
    same ``on`` key; nulls when no such row.

    ``direction`` (the pandas/kdb vocabulary): ``"backward"`` — latest
    right row with ``right.ts <= left.ts`` (inclusive, ANSI/DuckDB ASOF
    JOIN semantics; ties pick the max by the value tiebreak);
    ``"forward"`` — earliest right row with ``right.ts >= left.ts`` (ties
    pick the min); ``"nearest"`` — whichever side is closer (backward
    wins exact ties, per pandas). ``tolerance`` (a ``pd.Timedelta`` for
    timestamps, a number for numeric ts) bounds the match distance —
    the feature-store staleness limit."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
            direction=direction, tolerance=tolerance,
        )
        if len(lnull):
            merged = pd.concat([merged[out_cols], no_match(lnull)], ignore_index=True)
        return merged[out_cols]

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(lambda k, l, r: match(k, (l, r)), schema=schema)
    )


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_ts: str = "ts", start_col: str = "start",
                  end_col: str = "end", on: List[str] | None = None,
                  bucket: str = "1 hour") -> DataFrame:
    """Point-in-interval join (``start <= point_ts < end``) as an equi-join.

    Spark plans a raw inequality join as BroadcastNestedLoopJoin — O(n×m)
    and broadcast-bound. This is the scale formulation: time is cut into
    fixed buckets, each interval is exploded to the buckets it covers, each
    point carries its single bucket, and the join runs on
    (bucket [+ on-keys]) with the exact range predicate as a post-filter.
    Cost: shuffle of points + intervals×(avg buckets per interval); pick
    ``bucket`` near the typical interval length so the blow-up factor
    stays ~2. Correctness does not depend on the bucket width; a point
    matches in exactly its own bucket, so no dedup step is needed.

    ``on`` adds equality keys (e.g. user_id) to the join. Interval columns
    named like point columns must be disambiguated by the caller.
    """
    from pyspark.sql import functions as F

    parts = bucket.split()
    if len(parts) != 2:
        raise ValueError("bucket must look like '15 minutes'")
    n, unit = int(parts[0]), parts[1].rstrip("s")
    micros_per = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
    if unit not in micros_per:
        raise ValueError(f"unsupported bucket unit '{unit}'")
    width = n * micros_per[unit] * 1_000_000
    on = list(on or [])

    p = points.withColumn("_ib", F.expr(f"unix_micros({point_ts}) DIV {width}"))
    # empty/inverted intervals match nothing; drop them BEFORE sequence(),
    # which would otherwise generate a descending bucket range
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_ib",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) DIV {width}"),
                # end is exclusive: a zero-length tail bucket is not covered
                F.expr(f"(unix_micros({end_col}) - 1) DIV {width}"),
            )
        ),
    )
    cond = [p["_ib"] == iv["_ib"]] + [p[k] == iv[k] for k in on]
    joined = p.join(iv, cond).filter(
        (p[point_ts] >= iv[start_col]) & (p[point_ts] < iv[end_col])
    )
    keep_p = [p[c] for c in points.columns]
    keep_iv = [iv[c] for c in intervals.columns if c not in on]
    return joined.select(*keep_p, *keep_iv)


def resample_gapfill(df: DataFrame, ts_col: str, key_col: str,
                     value_col: str, step_seconds: int = 3600,
                     fill: str = "locf") -> DataFrame:
    """Regular-grid resampling with gap filling (the TimescaleDB
    ``time_bucket_gapfill`` / pandas ``resample().ffill()`` shape, as
    relational algebra):

    1. bucket each observation to ``step_seconds`` (epoch-floor — engine
       independent, no timezone arithmetic);
    2. aggregate per (key, bucket): ``n`` observations and the LAST value
       by (ts, original order) — deterministic via a ``max_by`` on the
       (ts, value) struct;
    3. per key, generate the FULL grid from its first to its last bucket
       (``sequence()`` — one row per step whether observed or not);
    4. left-join observations onto the grid; empty buckets get ``n = 0``
       and, with ``fill="locf"``, the last observed value carried forward
       (``last(ignorenulls)`` over an unbounded-preceding frame);
       ``fill="none"`` leaves them null.

    Returns (key_col, bucket_ts, n, value_col). Scale shape: one shuffle
    to aggregate buckets, one per-key window for the fill — the grid is
    generated, never shuffled, and its size is span/step per key, not the
    observation count. LOCF carries values verbatim (no arithmetic), so
    results are bit-exact across engines.
    """
    if fill not in ("locf", "none"):
        raise ValueError(f"fill must be 'locf' or 'none', got {fill!r}")
    bucket = F.expr(
        f"timestamp_seconds((unix_micros({ts_col}) DIV 1000000)"
        f" DIV {step_seconds} * {step_seconds})"
    )
    per_bucket = (
        df.withColumn("_b", bucket)
        .groupBy(key_col, "_b")
        .agg(
            F.count("*").alias("n"),
            F.max_by(
                F.col(value_col), F.struct(F.col(ts_col), F.col(value_col))
            ).alias("_v"),
        )
    )
    grid = (
        per_bucket.groupBy(key_col)
        .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
        .select(
            key_col,
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"),
                    F.expr(f"INTERVAL {step_seconds} SECOND"),
                )
            ).alias("bucket_ts"),
        )
    )
    joined = (
        grid.join(
            per_bucket.withColumnRenamed("_b", "bucket_ts"),
            [key_col, "bucket_ts"], "left",
        )
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
    )
    if fill == "locf":
        w = (
            Window.partitionBy(key_col)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        joined = joined.withColumn("_v", F.last("_v", ignorenulls=True).over(w))
    return joined.select(
        key_col, "bucket_ts", "n", F.col("_v").alias(value_col)
    )


def funnel_steps(df: DataFrame, steps: List[str], ts_col: str = "ts",
                 key_col: str = "user_id", type_col: str = "event_type",
                 within_seconds: Optional[int] = None) -> DataFrame:
    """Ordered funnel analysis: for each key, the earliest time it
    completed each prefix of ``steps`` in strict temporal order
    (t_i = min event time of step i with t_i > t_{i-1}) — the
    click→view→purchase conversion question.

    ``within_seconds`` additionally bounds the WHOLE funnel: step i
    counts only while t_i ≤ t_1 + within (the "converted within an hour"
    form). Output: one row per key that completed step 1, with
    ``t_1..t_k`` (null once a step was never completed) and
    ``steps_completed``.

    Relational shape: k−1 successive (filter → groupBy-min → equi-join)
    rounds, each joining a per-key single-row frame — the earliest-
    completion recurrence is inherently sequential in k, but k is tiny
    and each round is one shuffle on the key. All comparisons are on
    exact timestamps; no floats anywhere, so results are engine-exact."""
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    if within_seconds is not None:
        cur = cur.withColumn(
            "_deadline",
            F.col("t_1") + F.expr(f"INTERVAL {int(within_seconds)} SECOND"),
        )
    for i, step in enumerate(steps[1:], start=2):
        nxt = df.filter(F.col(type_col) == step).select(
            key_col, F.col(ts_col).alias("_ts")
        )
        # qualify with an INNER join, then LEFT-join the min back: a key
        # whose step-i events all fail the ordering must surface t_i=null,
        # not disappear from the funnel
        q = cur.join(nxt, key_col).filter(F.col("_ts") > F.col(f"t_{i - 1}"))
        if within_seconds is not None:
            q = q.filter(F.col("_ts") <= F.col("_deadline"))
        qual = q.groupBy(key_col).agg(F.min("_ts").alias(f"t_{i}"))
        cur = cur.join(qual, key_col, "left")
    done = cur.drop("_deadline") if within_seconds is not None else cur
    completed = sum(
        F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return done.withColumn("steps_completed", completed.cast("int"))


def rolling_zscore(df: DataFrame, ts_col: str, key_col: str,
                   value_col: str, window_rows: int = 20,
                   threshold: float = 3.0,
                   tiebreak: Optional[str] = None) -> DataFrame:
    """Per-key rolling anomaly score: z = (x − mean) / stddev over the
    PRECEDING ``window_rows`` observations (the point itself excluded —
    an outlier must not mask itself), flagged when |z| > ``threshold``.

    Determinism: mean and variance come from frame sums of x and x²
    (``var = (Σx² − (Σx)²/n) / (n−1)``), and ordered-frame running sums
    accumulate in frame order in both Spark and DuckDB — the same
    property the moving-sum query already pins — so even the float
    arithmetic hash-matches an oracle. Rows with fewer than 2 preceding
    observations get z = null / anomaly = false. Output: input + (z,
    anomaly). One per-key window — a single hash shuffle on the key."""
    order = [ts_col] if tiebreak is None else [ts_col, tiebreak]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-window_rows, -1)
    )
    x = F.col(value_col).cast("double")
    n = F.count(value_col).over(w).cast("double")
    sx = F.sum(x).over(w)
    sxx = F.sum(x * x).over(w)
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))  # guard tiny negative fp var
    z = F.when((n >= 2) & (sd > 0), (x - mean) / sd)
    return df.withColumn("z", z).withColumn(
        "anomaly", F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False))
    )


def cohort_retention(df: DataFrame, ts_col: str, key_col: str,
                     period_seconds: int = 7 * 86400) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by the period of their
    FIRST event (epoch-floor buckets, default weekly), and each later
    period they were active lands them in (cohort, offset). Output:
    ``(cohort_period, period_offset, n_active)`` plus ``n_cohort`` (the
    cohort's size, repeated per row) — the numerator/denominator of
    every retention curve.

    Two aggregations and a broadcast-sized join: distinct (key, period)
    activity, per-key min = cohort, count per (cohort, offset). Integer
    arithmetic only — exactly oracle-checkable. At 100 TB the activity
    distinct is the only corpus-sized shuffle; everything after is
    cohort-count-sized."""
    per = (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("long")
    period = F.floor(per / period_seconds).cast("long")
    activity = (
        df.select(F.col(key_col).alias("k"), period.alias("p")).distinct()
    )
    cohorts = activity.groupBy("k").agg(F.min("p").alias("c"))
    sizes = cohorts.groupBy("c").agg(F.count("*").alias("n_cohort"))
    ret = (
        activity.join(cohorts, "k")
        .groupBy("c", (F.col("p") - F.col("c")).alias("period_offset"))
        .agg(F.count("*").alias("n_active"))
    )
    return (
        ret.join(sizes, "c")
        .select(
            F.col("c").alias("cohort_period"), "period_offset",
            "n_active", "n_cohort",
        )
    )


def transition_counts(df: DataFrame, ts_col: str, key_col: str,
                      type_col: str, tiebreak: Optional[str] = None) -> DataFrame:
    """First-order Markov transition counts: per-key event streams in
    time order yield (from_type, to_type) adjacent pairs, counted over
    the whole corpus with each pair's share of its from-state's outgoing
    transitions (the empirical transition matrix — funnel discovery,
    anomaly baselines, session modeling).

    One lag window per key + one groupBy; probabilities are exact-count
    ratios (one division per output row), so the matrix hash-matches an
    oracle. Ties on ``ts_col`` break by ``tiebreak`` for deterministic
    adjacency."""
    order = [ts_col] if tiebreak is None else [ts_col, tiebreak]
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(F.col("_prev").alias("from_type"),
                 F.col(type_col).alias("to_type"))
        .agg(F.count("*").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_tot"))
    return (
        pairs.join(totals, "from_type")
        .select(
            "from_type", "to_type", "n",
            F.round(F.col("n") / F.col("_tot"), 6).alias("p"),
        )
    )


def sessionize(df: DataFrame, ts_col: str = "ts", key_col: str = "user_id",
               gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization (the gaps-and-islands pattern; the batch twin
    of ``streaming/pipeline.py``'s session windows): events of one key
    belong to the same session while consecutive gaps stay <=
    ``gap_seconds``; a larger gap starts a new session.

    Pure window algebra — no state store, no UDF: per key, ``lag(ts)``
    marks session starts (gap > threshold or first event), a running sum
    of the marks numbers sessions, and one aggregate yields per-session
    bounds and counts. Session ids are deterministic (``<key>#<n>`` in
    time order), so results are append-stable and engine-reproducible.

    Returns (key_col, session_id, session_start, session_end, n_events).
    Scale shape: ONE shuffle on the key for both windows (same
    partitioning, reused) plus the final per-session aggregate —
    identical to any engine's sessionization; skewed keys sessionize
    alone but a single key's event stream must sort in one partition
    (salt upstream if one key holds billions of events)."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    marked = (
        df.withColumn("_prev", F.lag(ts_col).over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull()
             | (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("_prev"))
                > F.lit(int(gap_seconds) * 1_000_000))).cast("int"),
        )
        .withColumn("_sess_n", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        marked.groupBy(key_col, "_sess_n")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            key_col,
            F.concat(F.col(key_col).cast("string"), F.lit("#"),
                     F.col("_sess_n").cast("string")).alias("session_id"),
            "session_start", "session_end", "n_events",
        )
    )

"""Custom stateful streaming: per-key running aggregates with GroupState.

The ``applyInPandasWithState`` pattern for operators that need state beyond
windowed aggregation — here a per-user running event counter/sum that
emits an updated row per user per micro-batch. State is a single compact
tuple per key, so the state store stays O(distinct keys).
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .pipeline import events_stream_schema, normalize_event_ts

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]
)


def _update(key, pdfs, state: GroupState):
    import pandas as pd

    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def stream_user_running_stats(spark, events_dir: str,
                              query_name: str = "user_running_stats",
                              glob: str = "events*.parquet"):
    """events file-stream → per-user cumulative (count, sum) via GroupState;
    each micro-batch emits the updated totals for the users it touched.
    ``glob`` selects event files within the directory (sf dirs mix tables)."""
    stream = normalize_event_ts(
        spark.readStream.schema(events_stream_schema(spark, events_dir, glob))
        .option("pathGlobFilter", glob)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )

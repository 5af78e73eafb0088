"""Streaming twin of ``operators/temporal.rolling_anomalies`` as a
custom stateful operator (``applyInPandasWithState``).

The batch form is a trailing-window Window expression; in a stream the
trailing window must SURVIVE micro-batch boundaries, which no built-in
streaming aggregation expresses — the per-key state is a ring buffer of
the last ``window_rows`` values, folded forward batch by batch.  This is
the second escape-hatch shape next to streaming/stateful.py's running
profile: bounded per-key state (≤ window_rows doubles), hash-partitioned
by key in the state store, each micro-batch touching only the keys it
contains.

Equivalence contract (pinned by ``tests/test_streaming.py``): replaying
a batch's rows through the stream in event-time order produces the same
anomaly set as the batch operator (z-scores equal to float tolerance —
the batch side sums exact decimals, the stream folds ring-buffer floats
in deterministic order, so the two agree to ulps, not bits).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

ANOMALY_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("baseline_n", T.LongType(), False),
    T.StructField("baseline_mean", T.DoubleType(), False),
    T.StructField("zscore", T.DoubleType(), False),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("vals", T.ArrayType(T.DoubleType()), True),
])


def _make_detector(window_rows: int, min_points: int, z_threshold: float):
    def _detect(key, pdfs: Iterator[pd.DataFrame], state):
        (user_id,) = key
        vals: list[float] = list(state.get[0]) if state.exists else []
        out: dict[str, list] = {f.name: [] for f in ANOMALY_SCHEMA.fields}
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                v = float(row.value)
                c = len(vals)
                if c >= min_points:
                    s = sum(vals)
                    mean = s / c
                    var = max((sum(x * x for x in vals) - s * s / c)
                              / (c - 1), 0.0)
                    if var > 0:
                        z = (v - mean) / var ** 0.5
                        if abs(z) >= z_threshold:
                            out["user_id"].append(user_id)
                            out["event_id"].append(row.event_id)
                            out["ts"].append(row.ts)
                            out["value"].append(v)
                            out["baseline_n"].append(c)
                            out["baseline_mean"].append(mean)
                            out["zscore"].append(z)
                vals.append(v)
                if len(vals) > window_rows:
                    vals.pop(0)
        state.update((vals,))
        if out["user_id"]:
            yield pd.DataFrame(out)

    return _detect


def streaming_anomalies(typed_events: DataFrame, window_rows: int = 20,
                        min_points: int = 10,
                        z_threshold: float = 2.0) -> DataFrame:
    """Per-key trailing-window anomaly stream: every event whose value
    is ``z_threshold`` sigmas from the mean of that key's previous
    ≤ ``window_rows`` values (across ALL past micro-batches, current
    row excluded — same contract as the batch operator).

    Input: (streaming) DataFrame with ``user_id, event_id, ts, value``.
    Output: one row per flagged event, append-mode friendly.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (typed_events
            .select("user_id", "event_id", "ts", "value")
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_detector(window_rows, min_points, z_threshold),
                outputStructType=ANOMALY_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))

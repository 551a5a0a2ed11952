"""Property-based check of resample_ohlc against a pure-Python reference:
random event sets (duplicate timestamps included) must produce the same
candles under the (ts, tie_break) open/close rule."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from label_maker_dask_spark.operators.timeseries import resample_ohlc

# hours 0-3, minutes quantized so duplicate (key, ts) pairs actually occur
_rows = st.lists(
    st.tuples(
        st.sampled_from(["A", "B"]),
        st.integers(0, 3),          # hour
        st.integers(0, 3),          # quantized minute slot
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)


def _reference(rows):
    out = {}
    for eid, (key, hour, slot, value) in enumerate(rows):
        bucket = (key, hour)
        ts = (hour, slot * 15, eid)  # (ts, tie) ordering tuple
        cur = out.get(bucket)
        if cur is None:
            out[bucket] = {"o": (ts, value), "c": (ts, value),
                           "hi": value, "lo": value, "n": 1}
        else:
            if ts < cur["o"][0]:
                cur["o"] = (ts, value)
            if ts > cur["c"][0]:
                cur["c"] = (ts, value)
            cur["hi"] = max(cur["hi"], value)
            cur["lo"] = min(cur["lo"], value)
            cur["n"] += 1
    return {
        k: (v["o"][1], v["hi"], v["lo"], v["c"][1], v["n"])
        for k, v in out.items()
    }


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_resample_ohlc_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [
            (key, f"2024-01-01 {hour:02d}:{slot * 15:02d}:00", eid, float(value))
            for eid, (key, hour, slot, value) in enumerate(rows)
        ],
        "key string, ts_s string, event_id long, value double",
    ).select("key", F.to_timestamp("ts_s").alias("ts"), "event_id", "value")
    got = {
        (r.key, r.bucket.hour): (r.open, r.high, r.low, r.close, r.n)
        for r in resample_ohlc(
            df, "ts", "value", ["key"], "hour", tie_break="event_id"
        ).collect()
    }
    assert got == _reference(rows)

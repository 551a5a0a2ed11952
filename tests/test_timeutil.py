"""Timestamp-type tolerance: every epoch-arithmetic operator must accept
both TIMESTAMP and TIMESTAMP_NTZ inputs.

The driver's parquet testdata has carried tz-naive micros (read by Spark 4
as TIMESTAMP_NTZ), tz-adjusted micros (TIMESTAMP), and nanos across
regenerations; round 4's bench run died entirely because ``unix_micros``
rejects TIMESTAMP_NTZ (BENCH_r04.json rc=1).  These tests pin the fix.
"""

import pytest
from pyspark.sql import functions as F

from label_maker_dask_spark.functions.timeutil import epoch_micros
from label_maker_dask_spark.streaming.windows import sessionize_lag

_ROWS = [
    # user 1: two sessions (gap of 31 min between 2nd and 3rd event)
    (1, 1, "2024-01-01 00:00:00"),
    (2, 1, "2024-01-01 00:10:00"),
    (3, 1, "2024-01-01 00:41:00.000001"),
    # user 2: one session, boundary gap of exactly 30 min (NOT > gap)
    (4, 2, "2024-01-01 00:00:00"),
    (5, 2, "2024-01-01 00:30:00"),
]


def _events(spark, ts_type):
    df = spark.createDataFrame(_ROWS, "event_id long, user_id long, ts_s string")
    return df.select(
        "event_id", "user_id", F.col("ts_s").cast(ts_type).alias("ts")
    )


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_epoch_micros_accepts_both_timestamp_types(spark, ts_type):
    df = _events(spark, ts_type).select(epoch_micros("ts").alias("us"))
    got = sorted(r.us for r in df.collect())
    # session tz is UTC (conftest), so both types yield identical epochs
    assert got[0] == 1704067200000000
    assert got[-1] - got[0] == 41 * 60 * 1_000_000 + 1


@pytest.mark.parametrize("ts_type", ["timestamp", "timestamp_ntz"])
def test_sessionize_lag_both_timestamp_types(spark, ts_type):
    df = _events(spark, ts_type)
    out = sessionize_lag(df, "ts", "user_id", gap_minutes=30, tie_break="event_id")
    got = {r.event_id: r.session_id for r in out.collect()}
    # 30:00.000001 > 30min opens a session; exactly 30:00 does not
    assert got == {1: 0, 2: 0, 3: 1, 4: 0, 5: 0}


def test_sessionize_identical_across_types(spark):
    a = sessionize_lag(
        _events(spark, "timestamp"), "ts", "user_id", 30, "event_id"
    ).select("event_id", "session_id")
    b = sessionize_lag(
        _events(spark, "timestamp_ntz"), "ts", "user_id", 30, "event_id"
    ).select("event_id", "session_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_epoch_micros_nanos_long_branch(spark):
    """An integral (nanos-as-long) column must go through the explicit
    nanos_long path: plain cast('timestamp') would read the long as epoch
    SECONDS and come out 1e9x wrong."""
    nanos = 1_704_067_200_123_456_789  # 2024-01-01T00:00:00.123456789Z
    df = spark.createDataFrame([(nanos,)], "ts_n long")
    got = df.select(
        epoch_micros(F.col("ts_n"), nanos_long=True).alias("us")
    ).collect()[0].us
    assert got == nanos // 1000  # integer truncation, no double rounding

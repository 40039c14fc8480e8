"""Gap-fill / LOCF / interpolation unit tests (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import timeseries as ts


def _daily(spark):
    rows = [
        (1, dt.date(2024, 1, 1), 10.0),
        (1, dt.date(2024, 1, 4), 40.0),  # gap: Jan 2, Jan 3
        (2, dt.date(2024, 2, 1), 5.0),   # singleton span
    ]
    return spark.createDataFrame(rows, ["user_id", "day", "day_value"])


def test_gapfill_materializes_span_only(spark):
    filled = ts.gapfill(_daily(spark), "user_id")
    got = {(r.user_id, r.day): r.is_gap for r in filled.collect()}
    assert got == {
        (1, dt.date(2024, 1, 1)): False,
        (1, dt.date(2024, 1, 2)): True,
        (1, dt.date(2024, 1, 3)): True,
        (1, dt.date(2024, 1, 4)): False,
        (2, dt.date(2024, 2, 1)): False,
    }  # no bleed between users, no global calendar


def test_locf_carries_forward(spark):
    filled = ts.locf(ts.gapfill(_daily(spark), "user_id"), "user_id")
    got = {(r.user_id, r.day): r.locf_value for r in filled.collect()}
    assert got[(1, dt.date(2024, 1, 2))] == 10.0
    assert got[(1, dt.date(2024, 1, 3))] == 10.0
    assert got[(1, dt.date(2024, 1, 4))] == 40.0


def test_interpolate_linear_gap_and_endpoints(spark):
    filled = ts.interpolate_linear(
        ts.gapfill(_daily(spark), "user_id"), "user_id"
    )
    got = {(r.user_id, r.day): r.interp_value for r in filled.collect()}
    assert got[(1, dt.date(2024, 1, 2))] == 20.0   # 10 + (40-10)*1/3
    assert got[(1, dt.date(2024, 1, 3))] == 30.0
    assert got[(1, dt.date(2024, 1, 1))] == 10.0   # observed passthrough
    assert got[(2, dt.date(2024, 2, 1))] == 5.0


def test_interpolate_leading_trailing_gaps(spark):
    # leading gap takes the next obs, trailing gap the previous
    rows = [
        (9, dt.date(2024, 3, 1), None),
        (9, dt.date(2024, 3, 2), 7.0),
        (9, dt.date(2024, 3, 3), None),
    ]
    df = spark.createDataFrame(rows, "user_id long, day date, day_value double")
    df = df.withColumn("is_gap", F.col("day_value").isNull())
    out = {
        r.day: r.interp_value
        for r in ts.interpolate_linear(df, "user_id").collect()
    }
    assert out[dt.date(2024, 3, 1)] == 7.0
    assert out[dt.date(2024, 3, 3)] == 7.0


def test_resample_daily_sums(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 3, 0), 1.5),
        (1, dt.datetime(2024, 1, 1, 22, 0), 2.25),
        (1, dt.datetime(2024, 1, 2, 0, 0), 4.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    got = {
        r.day: r.day_value
        for r in ts.resample_daily(df, "user_id", "ts", "value").collect()
    }
    assert got == {dt.date(2024, 1, 1): 3.75, dt.date(2024, 1, 2): 4.0}


def test_interpolate_matches_pandas(spark):
    """Independent reference: pandas interpolate(limit_direction='both')
    over a randomized-ish gap pattern must agree with the Spark
    windows to 1e-9."""
    import datetime as dt

    import pandas as pd

    vals = [10.0, None, None, 4.0, None, 7.5, None, None, None, 1.0, None]
    days = [dt.date(2024, 5, d + 1) for d in range(len(vals))]
    rows = [(1, d, v) for d, v in zip(days, vals)]
    df = spark.createDataFrame(
        rows, "user_id long, day date, day_value double"
    )
    from pyspark.sql import functions as F

    filled = df.withColumn("is_gap", F.col("day_value").isNull())
    got = {
        r.day: r.interp_value
        for r in ts.interpolate_linear(filled, "user_id", ndigits=9).collect()
    }
    ref = (
        pd.Series(vals, index=pd.to_datetime(days), dtype="float64")
        .interpolate(method="time", limit_direction="both")
    )
    for d, expect in ref.items():
        assert abs(got[d.date()] - float(expect)) < 1e-9, (d, got[d.date()], expect)


def test_ohlc_bars_order_ties_and_extremes(spark):
    from aws_medallion_etl_spark.operators import timeseries

    rows = [
        # one key, one day: open=10 (earliest), close=40 (latest),
        # high=50, low=5; a ts TIE at the open decided by tiebreak
        ("a", "2024-01-01 00:00:00", 2, 99),
        ("a", "2024-01-01 00:00:00", 1, 10),   # same ts, lower id -> open
        ("a", "2024-01-01 05:00:00", 3, 50),
        ("a", "2024-01-01 06:00:00", 4, 5),
        ("a", "2024-01-01 23:00:00", 5, 40),
        # second day: single row -> open=high=low=close
        ("a", "2024-01-02 12:00:00", 6, 7),
    ]
    df = spark.createDataFrame(
        rows, ["k", "ts_s", "eid", "v"]
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "eid", "v")
    out = {
        str(r["day"]): (r["open"], r["high"], r["low"], r["close"], r["n_rows"])
        for r in timeseries.ohlc_bars(df, ["k"], "ts", "v", "eid").collect()
    }
    assert out["2024-01-01"] == (10, 99, 5, 40, 5)
    assert out["2024-01-02"] == (7, 7, 7, 7, 1)

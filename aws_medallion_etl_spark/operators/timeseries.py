"""Time-series resampling, gap filling, and interpolation.

Hypertable-style operations over an event stream: bucket raw events to
a regular grid, materialize the missing buckets, and fill them —
last-observation-carried-forward (LOCF) or linear interpolation.
Reference analog: the gold-layer daily rollups
(``Meta_Guideline.md`` fact tables) extended with the gap semantics a
monitoring/feature pipeline needs.

Design for 100 TB:

* The calendar is generated PER KEY from that key's own [min, max]
  span (``sequence`` + ``explode``) — no cross join against a global
  calendar dimension, so the row count is sum-of-spans, not
  keys × global-span.
* The fill join is an equi-join on (key, bucket) — hash-partitioned,
  AQE-coalesced; the dense side is the generated grid whose rows are
  (key, date) pairs, a few bytes each.
* LOCF / interpolation are per-key ordered windows. Partitioning is
  by key, so a single key's span must fit an executor — true for any
  bounded-retention series (a 10-year daily span is 3,653 rows). No
  global-partition window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    ndigits: int = 2,
) -> DataFrame:
    """Bucket events to (key, day) with a rounded daily sum.

    Plain hash aggregate with map-side partial combine; the shuffle
    carries one (key, day, partial-sum) row per map-side group.
    """
    return df.groupBy(
        F.col(key_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.round(F.sum(value_col), ndigits).alias("day_value"))


def gapfill(
    daily: DataFrame,
    key_col: str,
    day_col: str = "day",
    value_col: str = "day_value",
) -> DataFrame:
    """Materialize every missing day inside each key's own span.

    Output has one row per (key, day in [min(day), max(day)]) with the
    original value where present and NULL in the gaps, plus an
    ``is_gap`` flag.
    """
    spans = daily.groupBy(key_col).agg(
        F.min(day_col).alias("__d0"), F.max(day_col).alias("__d1")
    )
    cal = spans.select(
        F.col(key_col),
        F.explode(F.sequence("__d0", "__d1")).alias(day_col),
    )
    filled = cal.join(daily, [key_col, day_col], "left")
    return filled.withColumn("is_gap", F.col(value_col).isNull())


def locf(
    filled: DataFrame,
    key_col: str,
    day_col: str = "day",
    value_col: str = "day_value",
    out_col: str = "locf_value",
) -> DataFrame:
    """Last observation carried forward over each key's ordered days."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.withColumn(
        out_col, F.last(value_col, ignorenulls=True).over(w)
    )


def interpolate_linear(
    filled: DataFrame,
    key_col: str,
    day_col: str = "day",
    value_col: str = "day_value",
    out_col: str = "interp_value",
    ndigits: int = 4,
) -> DataFrame:
    """Linear interpolation across gaps; endpoints carry/hold.

    For a gap day the value is the straight line between the previous
    and next observed days (weighted by day distance). Leading gaps
    take the next observation, trailing gaps the previous one —
    matching pandas ``interpolate(limit_direction='both')``.

    Two ordered per-key windows (one forward, one backward) supply the
    bracketing observations; everything else is arithmetic on columns.
    """
    back = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(~F.col("is_gap"), F.col(day_col))
    prev_v = F.last(value_col, ignorenulls=True).over(back)
    next_v = F.first(value_col, ignorenulls=True).over(fwd)
    prev_d = F.last(obs_day, ignorenulls=True).over(back)
    next_d = F.first(obs_day, ignorenulls=True).over(fwd)
    span = F.datediff(next_d, prev_d).cast("double")
    pos = F.datediff(F.col(day_col), prev_d).cast("double")
    line = prev_v + (next_v - prev_v) * pos / span
    interp = (
        F.when(~F.col("is_gap"), F.col(value_col))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(line)
    )
    return filled.withColumn(out_col, F.round(interp, ndigits))


def ohlc_bars(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Daily OHLC downsampling — the hypertable/financial-rollup
    classic: per (keys, day), the first (open) and last (close) value
    by event time plus the high/low extremes and the bar's row count.

    ``tiebreak_col`` pins determinism when two rows share a timestamp
    (open/close are then the lowest/highest tiebreak value) — without
    it, first/last inside a bar is partition-order-dependent and the
    result would not be reproducible across engines or runs.

    One hash aggregate: open/close via ``min_by``/``max_by`` on the
    (ts, tiebreak) struct — map-side-combinable, so no window sort and
    no per-bar shuffle beyond the groupBy; high/low/count ride the
    same pass.
    """
    ts = F.col(ts_col)
    ordk = F.struct(ts.alias("__t"), F.col(tiebreak_col).alias("__tb"))
    v = F.col(value_col)
    return (
        df.groupBy(*key_cols, F.to_date(ts).alias("day"))
        .agg(
            F.min_by(v, ordk).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordk).alias("close"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )

"""KPI / analytical query operators: top-k, rollups, YoY, shares, trailing frames.

Re-expresses the reference's gold KPI tables and Athena monitoring
queries: top-k owners/tags (``README.md:339-344``,
``Meta_Guideline.md:989-993``, top_tags spec
``.github/copilot/instructions.md:81``), yearly multi-metric rollup +
YoY growth via ``lag`` (``Meta_Guideline.md:3271-3323``),
share-of-total via an unbounded window (``Meta_Guideline.md:2362-2370``),
and the trailing 7-row anomaly baseline (``Meta_Guideline.md:4297-4303``).

Scale notes: ``orderBy().limit(k)`` compiles to TakeOrderedAndProject —
each partition keeps a k-row heap and only k rows per partition reach
the driver-side merge, so top-k never global-sorts. The YoY / trailing
windows partition by nothing but operate on already-aggregated frames
(one row per year/day), so the single-partition window is a few
hundred rows, not the raw data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    keys: list[str],
    k: int,
    metric: Column | None = None,
    metric_name: str = "cnt",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """GROUP BY ``keys`` → ``metric`` (default count) → ORDER DESC → LIMIT k.

    ``tiebreak`` columns (default: the keys, ascending) make the k-th
    row deterministic when metric values tie.
    """
    metric = metric if metric is not None else F.count(F.lit(1))
    agged = df.groupBy(*keys).agg(metric.alias(metric_name))
    order = [F.desc(metric_name)] + [F.asc(c) for c in (tiebreak or keys)]
    return agged.orderBy(*order).limit(k)


def yoy_growth(
    yearly: DataFrame,
    year_col: str,
    metric_col: str,
    growth_name: str = "yoy_growth_pct",
    ndigits: int = 4,
) -> DataFrame:
    """Add % growth vs the previous year (``lag`` over year order).

    Input is one row per year (a post-aggregation frame), so the
    empty-partition window is safe — it sorts a handful of rows.
    """
    w = Window.orderBy(year_col)
    prev = F.lag(metric_col).over(w)
    growth = F.when(
        prev.isNotNull() & (prev != 0),
        F.round((F.col(metric_col) - prev) * 100.0 / prev, ndigits),
    )
    return yearly.withColumn(growth_name, growth)


def share_of_total(
    df: DataFrame,
    keys: list[str],
    share_name: str = "pct_of_total",
    ndigits: int = 4,
) -> DataFrame:
    """Per-group count + percentage of the grand total (window SUM OVER ()).

    The unbounded window runs over the aggregated frame (one row per
    group), so it is cheap at any input scale.
    """
    agged = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return agged.withColumn(
        share_name, F.round(F.col("cnt") * 100.0 / total, ndigits)
    )


def trailing_average(
    df: DataFrame,
    order_col: str,
    metric_col: str,
    preceding: int = 6,
    closing: int = 1,
    avg_name: str = "trailing_avg",
    partition_by: list[str] | None = None,
    ndigits: int = 4,
) -> DataFrame:
    """Trailing-frame mean: AVG over ROWS BETWEEN p PRECEDING AND c PRECEDING.

    The reference's anomaly baseline (``Meta_Guideline.md:4297-4303``)
    compares today's row count against the prior week's average.
    """
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(order_col)
        .rowsBetween(-preceding, -closing)
    )
    return df.withColumn(avg_name, F.round(F.avg(metric_col).over(w), ndigits))


def rank_rows(
    df: DataFrame,
    order_by: list[Column],
    rank_name: str = "rank",
) -> DataFrame:
    """Global row_number under a deterministic multi-key sort (O2 surface).

    Single-partition window by design — use only on small/aggregated
    frames (top-k output, reports); for large data use top_k instead.
    """
    w = Window.orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w))


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Batch sessionization: number gap-delimited sessions per key.

    The classic two-window composition — ``lag`` flags rows starting a
    new session (gap to the previous event exceeds ``gap_seconds``),
    then a running ``sum`` of the flags numbers sessions 1..n within
    the key. Both windows share ONE partitioning (the key), so the
    whole operator costs a single shuffle + sort regardless of data
    size; session state never materializes beyond the two longs per
    row. ``order_tiebreak`` columns make equal-timestamp ordering
    deterministic. (The streaming analogue with watermarked state is
    ``streaming.sessionize``.)
    """
    order = [F.col(ts_col), *[F.col(c) for c in (order_tiebreak or [])]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    new_sess = F.when(
        prev.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_sess).over(running))


def session_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessions rolled up to one row each: bounds + event count."""
    s = sessionize(df, key_cols, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(*key_cols, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    stages: list[tuple[str, Column]],
) -> DataFrame:
    """Ordered-funnel analysis: per user, the FIRST timestamp of each
    stage that occurs STRICTLY AFTER the previous stage's first
    timestamp — the standard conversion query (view -> click ->
    purchase), where out-of-order events do not count.

    One filtered aggregate + keyed equi-join per stage (stage count is
    small and fixed); every join is on the user key, so at 100 TB each
    stage is one shuffle of the stage's events — already filtered to
    that stage's predicate — against the (1 row per user) funnel
    frame, never the full event stream. Users keep NULLs for stages
    they never reached (left joins), so drop-off is countable at every
    step.
    """
    name0, pred0 = stages[0]
    out = df.where(pred0).groupBy(user_col).agg(
        F.min(ts_col).alias(f"t_{name0}")
    )
    prev = name0
    for name, pred in stages[1:]:
        reached = (
            df.where(pred)
            .join(
                out.select(user_col, F.col(f"t_{prev}").alias("__prev_ts"))
                .where(F.col("__prev_ts").isNotNull()),
                user_col,
            )
            .where(F.col(ts_col) > F.col("__prev_ts"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{name}"))
        )
        out = out.join(reached, user_col, "left")
        prev = name
    return out


def clean_path_conversions(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    start_event: str,
    goal_event: str,
    blocker_event: str,
    within_seconds: int,
    tiebreak_col: str = "event_id",
):
    """MATCH_RECOGNIZE-style pattern `A (no C)* B within T`: for every
    start event, the next goal event by the same user counts as a
    CLEAN conversion only if it lands within the window and no blocker
    event fired in between — w12's funnel answers "did B ever follow
    A"; this answers "did B follow A before anything went wrong",
    the attribution/incident-analysis contract.

    One window per user (ROWS 1 FOLLOWING .. UNBOUNDED) computing two
    conditional minima — next goal ts, next blocker ts — so the whole
    pattern is two frame scans, no self-join, no explode. Per-user
    partitions are session-sized; aggregate-keyed skew handled by the
    same per-user sharding every window op here uses. Returns per-user
    (n_starts, n_clean, total_latency_us as exact integer microseconds).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    t = F.col(type_col)
    next_goal = F.min(F.when(t == goal_event, F.col(ts_col))).over(w)
    next_block = F.min(F.when(t == blocker_event, F.col(ts_col))).over(w)
    starts = (
        df.withColumn("__ng", next_goal)
        .withColumn("__nb", next_block)
        .where(t == start_event)
    )
    # exact integer MICROSECONDS: fractional-second epochs truncate
    # differently across engines; unix_micros is lossless
    lat = F.unix_micros(F.col("__ng")) - F.unix_micros(F.col(ts_col))
    clean = (
        F.col("__ng").isNotNull()
        & (lat <= within_seconds * 1_000_000)
        & (F.col("__nb").isNull() | (F.col("__nb") >= F.col("__ng")))
    )
    return (
        starts.withColumn("__clean", clean)
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_starts"),
            F.sum(F.col("__clean").cast("long")).alias("n_clean"),
            F.sum(F.when(F.col("__clean"), lat).otherwise(F.lit(0))).alias(
                "total_latency_us"
            ),
        )
    )

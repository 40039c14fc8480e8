"""Dimension generators: the calendar dimension and SCD1 surfaces.

Re-expresses the reference's ``dim_date`` build
(``Meta_Guideline.md:2781-2857``) — which generates rows in a
driver-side Python loop — as a distributed, shuffle-free
``sequence() + explode`` (SURVEY.md §2.10 prescribes exactly this
replacement). ``date_sk`` is the YYYYMMDD integer
(``requirements/meta/meta_module_06_requirements.md:85``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The reference bakes these fixed-date Vietnam public holidays into its
# driver loop (Meta_Guideline.md:2789-2796): New Year (Jan 1),
# Reunification Day (Apr 30), Labour Day (May 1), National Day (Sep 2).
VIETNAM_FIXED_HOLIDAYS: list[tuple[int, int]] = [(1, 1), (4, 30), (5, 1), (9, 2)]


def dim_date(
    spark: SparkSession,
    start: str = "2020-01-01",
    end: str = "2025-12-31",
    holidays: list[str] | None = None,
) -> DataFrame:
    """Calendar dimension, one row per day in [start, end].

    ``sequence(date, date)`` builds the day array inside codegen and
    ``explode`` fans it out — no driver loop, no shuffle, generable for
    any range on any cluster size. Attribute-for-attribute parity with
    the reference's row dict (``Meta_Guideline.md:2798-2820`` plus the
    derived columns at ``:2848-2860``): ISO day-of-week (1=Monday),
    July-based fiscal year/quarter, short month/day names, year_month,
    days_in_month. ``holidays`` (ISO dates) overrides ``is_holiday``;
    when omitted, the reference's fixed-date Vietnam holiday rule
    applies. The audit columns (``created_at``/``etl_run_date``,
    ``:2863-2866``) are left to the sink layer — they are run metadata,
    not calendar attributes.
    """
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("date")
    )
    # Spark weekday(): 0=Monday .. 6=Sunday; reference uses 1=Monday .. 7=Sunday.
    iso_dow = F.expr("weekday(date) + 1")
    month = F.month("date")
    if holidays is not None:
        is_holiday = F.col("date").isin([F.lit(h).cast("date") for h in holidays])
    else:
        is_holiday = F.lit(False)
        for m, d in VIETNAM_FIXED_HOLIDAYS:
            is_holiday = is_holiday | ((month == m) & (F.dayofmonth("date") == d))
    return days.select(
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_sk"),
        F.col("date"),
        F.date_format("date", "yyyy-MM-dd").alias("date_string"),
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        month.alias("month"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.date_format("date", "MMM").alias("month_name_short"),
        F.weekofyear("date").alias("week_of_year"),
        F.dayofyear("date").alias("day_of_year"),
        F.dayofmonth("date").alias("day_of_month"),
        iso_dow.alias("day_of_week"),
        F.date_format("date", "EEEE").alias("day_name"),
        F.date_format("date", "EEE").alias("day_name_short"),
        (iso_dow >= 6).alias("is_weekend"),
        (iso_dow < 6).alias("is_weekday"),
        is_holiday.alias("is_holiday"),
        # July-based fiscal calendar (Meta_Guideline.md:2815-2817):
        # FY = calendar year of July 1 that starts the fiscal year.
        F.when(month >= 7, F.year("date"))
        .otherwise(F.year("date") - 1)
        .alias("fiscal_year"),
        # Both reference branches reduce to ((month + 5) % 12) // 3 + 1.
        (F.floor(((month + 5) % 12) / 3) + 1).cast("int").alias("fiscal_quarter"),
        F.date_format("date", "yyyyMM").alias("year_month"),
        F.dayofmonth(F.last_day("date")).alias("days_in_month"),
    )

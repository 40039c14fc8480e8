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


def dim_date(
    spark: SparkSession,
    start: str = "2020-01-01",
    end: str = "2025-12-31",
    holidays: list[str] | None = None,
) -> DataFrame:
    """Calendar dimension, one row per day in [start, end].

    ``sequence(date, date)`` builds the day array inside codegen and
    ``explode`` fans it out — no driver loop, no shuffle, generable for
    any range on any cluster size. ``holidays`` (ISO dates) populates
    ``is_holiday`` — the reference bakes a holiday list into its
    driver loop (``Meta_Guideline.md:2781-2857``); here it is data.
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
    dow = F.dayofweek("date")  # 1=Sunday .. 7=Saturday
    return days.select(
        F.date_format("date", "yyyyMMdd").cast("int").alias("date_sk"),
        F.col("date"),
        F.year("date").alias("year"),
        F.quarter("date").alias("quarter"),
        F.month("date").alias("month"),
        F.dayofmonth("date").alias("day_of_month"),
        F.dayofweek("date").alias("day_of_week"),
        F.weekofyear("date").alias("week_of_year"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.date_format("date", "EEEE").alias("day_name"),
        ((dow == 1) | (dow == 7)).alias("is_weekend"),
        # Fiscal year shifted +1 from October (reference convention,
        # Meta_Guideline.md:2812-2816).
        F.when(F.month("date") >= 10, F.year("date") + 1)
        .otherwise(F.year("date"))
        .alias("fiscal_year"),
        (
            F.col("date").isin([F.lit(h).cast("date") for h in holidays])
            if holidays
            else F.lit(False)
        ).alias("is_holiday"),
    )

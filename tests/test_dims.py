"""dim_date generator: calendar attributes + holiday rules."""

from __future__ import annotations

import datetime

from aws_medallion_etl_spark.operators import dims


def test_dim_date_holidays_and_attributes(spark):
    df = dims.dim_date(
        spark, "2024-12-28", "2025-01-03",
        holidays=["2025-01-01", "2024-04-30"],  # second one out of range: ignored
    )
    rows = {str(r.date): r for r in df.collect()}
    assert len(rows) == 7
    ny = rows["2025-01-01"]
    assert ny.is_holiday is True
    # July-based fiscal calendar (reference Meta_Guideline.md:2815-2817):
    # Jan 2025 belongs to FY2024 (started 2024-07-01), fiscal quarter 3.
    assert (ny.date_sk, ny.year, ny.fiscal_year, ny.fiscal_quarter) == (
        20250101, 2025, 2024, 3,
    )
    assert rows["2024-12-31"].is_holiday is False
    assert rows["2024-12-31"].fiscal_year == 2024
    assert rows["2024-12-31"].fiscal_quarter == 2
    # weekend flags: 2024-12-28 is a Saturday, 2024-12-29 a Sunday
    assert rows["2024-12-28"].is_weekend and rows["2024-12-29"].is_weekend
    assert not rows["2024-12-30"].is_weekend and rows["2024-12-30"].is_weekday
    # ISO day-of-week: Monday=1 .. Sunday=7 (2024-12-30 is a Monday)
    assert rows["2024-12-30"].day_of_week == 1
    assert rows["2024-12-29"].day_of_week == 7
    # derived attributes match the reference row dict
    assert rows["2024-12-31"].year_month == "202412"
    assert rows["2024-12-31"].days_in_month == 31
    assert rows["2024-12-31"].day_of_year == 366  # 2024 is a leap year
    assert rows["2024-12-31"].month_name_short == "Dec"
    assert rows["2024-12-31"].day_name_short == "Tue"
    assert rows["2024-12-31"].date_string == "2024-12-31"


def test_dim_date_default_vietnam_holiday_rule(spark):
    """With no explicit list, the reference's fixed-date Vietnam
    holidays apply (Meta_Guideline.md:2789-2796)."""
    df = dims.dim_date(spark, "2024-01-01", "2024-12-31")
    hol = sorted(str(r.date) for r in df.where("is_holiday").collect())
    assert hol == ["2024-01-01", "2024-04-30", "2024-05-01", "2024-09-02"]
    assert df.count() == 366

"""dim_date generator: calendar attributes + data-driven holidays."""

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
    assert (ny.date_sk, ny.year, ny.fiscal_year) == (20250101, 2025, 2025)
    assert rows["2024-12-31"].is_holiday is False
    assert rows["2024-12-31"].fiscal_year == 2025  # Oct-shifted fiscal year
    # weekend flags: 2024-12-28 is a Saturday, 2024-12-29 a Sunday
    assert rows["2024-12-28"].is_weekend and rows["2024-12-29"].is_weekend
    assert not rows["2024-12-30"].is_weekend

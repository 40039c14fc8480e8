"""Natural-key deduplication.

Re-expresses the reference's signature silver operator: keep the
"best" row per natural key, ordered by recency with completeness
tiebreakers (``Meta_Guideline.md:1607-1617`` users, ``1752-1761``
datasets, ``1974-1979`` tags; pattern mandated by
``copilot-instructions.md:70``).

Two physical strategies, same semantics:

* ``dedup_by_key`` — ``row_number() OVER (PARTITION BY nk ORDER BY ...)``.
  One hash exchange on the key + per-partition sort. Simple, keeps all
  columns, and what the reference does.
* ``dedup_max_by`` — aggregates ``max_by(struct(*cols), struct(order))``.
  Same answer, but an aggregation instead of a window: Spark applies
  map-side partial aggregation, so at 100 TB the shuffle carries one
  row per (partition x key) instead of every row, and no sort is
  needed. Prefer this when keys are numerous and rows-per-key modest.

Exact full-row dedup (``dropDuplicates``) is in ``exact_dedup``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """Keep the first row per ``keys`` under ``order_by`` (window strategy)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__row_rank", F.row_number().over(w))
        .filter(F.col("__row_rank") == 1)
        .drop("__row_rank")
    )


def dedup_max_by(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Keep the row per ``keys`` with the LARGEST ``order_cols`` tuple.

    Aggregation strategy with map-side combine — the scale path.
    NULL order values sort low (struct comparison), matching
    ``desc_nulls_last`` in the window strategy.
    """
    payload = [c for c in df.columns if c not in keys]
    best = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("__best")
    out = df.groupBy(*keys).agg(best)
    return out.select(*keys, *[F.col(f"__best.{c}").alias(c) for c in payload])


def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (``Meta_Guideline.md:1305``)."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()

"""Data-quality assertions shared across layers.

The gate-style checks that raise before any write (reference:
``Meta_Guideline.md:2987-3030``; SCD2 non-overlap / NK rules
``requirements/meta/meta_module_06_requirements.md:109-111``). The
fact-specific invariants (grain / balance / non-negative) live in
``operators.facts``; this module holds the cross-cutting ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class UniquenessViolation(RuntimeError):
    """Raised when values in the checked columns are not unique."""


def check_unique(df: DataFrame, cols: list[str], label: str = "") -> None:
    """Assert ``cols`` tuples are unique (surrogate-key collision gate).

    One aggregation (total vs exact distinct) — the collision check
    ``hash_surrogate_key`` relies on: xxhash64 collisions are ~2^-64
    per pair but MUST fail loudly, not corrupt a dimension silently.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(c) for c in cols]).alias("d"),
    ).collect()[0]
    if row["n"] != row["d"]:
        raise UniquenessViolation(
            f"{label or cols}: {row['n']} rows but {row['d']} distinct {cols}"
        )


def check_no_nulls(df: DataFrame, cols: list[str]) -> None:
    """Assert no NULLs in ``cols`` (NK/PK non-null rule) — one scan."""
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols]
    ).collect()[0]
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise UniquenessViolation(f"NULLs in non-nullable columns: {bad}")


def check_scd2_no_overlap(
    df: DataFrame,
    nk: list[str],
    start_col: str = "effective_start_ts",
    end_col: str = "effective_end_ts",
    current_col: str = "is_current",
) -> None:
    """Assert SCD2 validity windows per key neither overlap nor leave gaps,
    and exactly one current row exists per key (``requirements/...:109-110``).

    One window pass ordered by start: each row's end must equal the next
    row's start (contiguous, non-overlapping), and only the last row may
    be current.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*nk).orderBy(start_col)
    nxt = F.lead(start_col).over(w)
    bad = (
        df.withColumn("__next_start", nxt)
        .filter(
            (F.col("__next_start").isNotNull() & (F.col(end_col) != F.col("__next_start")))
            | (F.col("__next_start").isNotNull() & F.col(current_col))
            | (F.col("__next_start").isNull() & ~F.col(current_col))
        )
        .limit(1)
        .count()
    )
    if bad:
        raise UniquenessViolation(
            f"SCD2 windows for {nk} overlap, gap, or mis-flag {current_col}"
        )


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiler: (column, n_rows, n_nulls, null_frac,
    n_distinct) per profiled column — the DQ summary the reference's
    quality framework reports per table (``README.md:600-636``).

    ALL per-column aggregates are computed in a SINGLE aggregate over
    one scan (one wide row), then unpivoted driver-free with ``stack``
    — profiling 50 columns costs one pass, not 50. Exact
    ``count_distinct`` keeps the result oracle-checkable; at 100 TB
    swap in ``approx_count_distinct`` per column (same shape, no
    dedup-expand shuffle) when the exact cardinality isn't required.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (column, n_nulls, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 4).alias("null_frac"),
        "n_distinct",
    )

"""Grain-checked fact builders: conditional aggregates and FK resolution.

Re-expresses the reference's gold fact jobs:

* ``fact_dataset_owner_daily`` — grouped conditional counts with the
  ``total = private + public`` invariant (``Meta_Guideline.md:2947-2954``,
  spec ``requirements/meta/meta_module_06_requirements.md:94-96``).
* FK lookup with SK=0 fallback and miss accounting
  (``Meta_Guideline.md:3110-3121``, rule ``requirements/...:111``:
  map rate > 99%, misses logged).
* Grain/balance/negative DQ assertions that raise before any write
  (``Meta_Guideline.md:2987-3030``).

Scale notes: conditional aggregates are single hash aggregations with
map-side partial aggregation (``sum(when(cond,1))`` never leaves
codegen); FK resolution broadcasts the dim so the 100 TB fact side
never shuffles; DQ assertions are expressed as aggregates collected as
ONE row rather than repeated ``.count()`` actions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def conditional_aggregate(
    df: DataFrame,
    keys: list[str],
    conditions: dict[str, Column],
    extra_aggs: list[Column] | None = None,
    count_name: str = "total_count",
) -> DataFrame:
    """GROUP BY ``keys`` with one total count plus a count per condition.

    ``sum(when(cond, 1).otherwise(0))`` is the reference's conditional
    count idiom (``Meta_Guideline.md:2947-2954``); each condition adds
    a column named after its dict key.
    """
    aggs = [F.count(F.lit(1)).alias(count_name)]
    aggs += [
        F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, cond in conditions.items()
    ]
    aggs += list(extra_aggs or [])
    return df.groupBy(*keys).agg(*aggs)


def resolve_fk(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    sk_col: str,
    default_sk: int = 0,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Attach ``sk_col`` from ``dim`` to ``fact``; misses get ``default_sk``.

    Late-arriving-FK pattern (``Meta_Guideline.md:3110-3121``): LEFT
    join the (broadcast) dim keyed on the natural key, project only the
    SK, and fill non-matches with the Unknown sentinel. Adds a
    ``__fk_miss`` flag so callers can count misses in the same scan
    (map rate gate, ``requirements/...:142``) instead of re-joining.
    """
    lookup = dim.select(F.col(dim_key).alias("__dim_nk"), F.col(sk_col))
    if broadcast_dim:
        lookup = F.broadcast(lookup)
    joined = fact.join(lookup, fact[fact_key] == lookup["__dim_nk"], "left")
    return (
        joined.withColumn("__fk_miss", F.col(sk_col).isNull())
        .withColumn(sk_col, F.coalesce(F.col(sk_col), F.lit(default_sk)))
        .drop("__dim_nk")
    )


def fk_miss_stats(resolved: DataFrame) -> dict:
    """Map-rate metrics from a frame produced by :func:`resolve_fk` (one scan)."""
    row = resolved.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col("__fk_miss").cast("long")).alias("misses"),
    ).collect()[0]
    total, misses = row["total"], row["misses"] or 0
    return {
        "total": total,
        "misses": misses,
        "map_rate": ((total - misses) / total) if total else 1.0,
    }


def usage_with_first_seen(
    df: DataFrame,
    tag_col: str,
    entity_col: str,
    date_col: str,
    usage_name: str = "usage_count",
    new_name: str = "new_usage_count",
) -> DataFrame:
    """Fact at (tag, date) grain: active entities vs first-seen entities.

    The ``fact_tag_usage_daily`` shape (spec
    ``requirements/meta/meta_module_06_requirements.md:97-99`` — the one
    gold fact whose job body the reference never shows):
    ``usage_count`` = distinct entities carrying the tag that date,
    ``new_usage_count`` = those whose FIRST date with the tag is that
    date. ``usage >= new_usage`` then holds per row BY CONSTRUCTION
    (every first-seen entity is also active); gate with
    :func:`check_row_invariant` after any hand edit.

    Shape: distinct on (tag, entity, date), min-date per (entity, tag)
    via window (reuses the same hash partitioning — map-side partial
    agg, no second wide shuffle), then one aggregate to the fact grain.
    """
    pairs = df.select(tag_col, entity_col, date_col).distinct()
    w = Window.partitionBy(entity_col, tag_col)
    firsts = pairs.withColumn("__first", F.min(date_col).over(w))
    return firsts.groupBy(tag_col, date_col).agg(
        F.count(F.lit(1)).alias(usage_name),
        F.sum((F.col(date_col) == F.col("__first")).cast("long")).alias(new_name),
    )


def check_row_invariant(df: DataFrame, predicate, desc: str) -> None:
    """Assert a per-row invariant (e.g. ``usage_count >= new_usage_count``,
    ``requirements/...:141``); raise :class:`BalanceViolation` citing ``desc``."""
    bad = df.filter(~predicate).limit(1).count()
    if bad:
        raise BalanceViolation(desc)


class GrainViolation(RuntimeError):
    """Raised when a fact table has duplicate rows at its declared grain."""


def check_grain(df: DataFrame, keys: list[str]) -> None:
    """Assert ``keys`` uniquely identify rows; raise :class:`GrainViolation`.

    One aggregation: total rows vs distinct grain count. Distinct-count
    is exact here because a wrong grain must fail deterministically;
    use ``approx_count_distinct`` only for advisory monitoring.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F.col(k) for k in keys]).alias("g"),
    ).collect()[0]
    if row["n"] != row["g"]:
        raise GrainViolation(
            f"grain {keys} violated: {row['n']} rows, {row['g']} distinct keys"
        )


class BalanceViolation(RuntimeError):
    """Raised when a declared balance invariant does not hold."""


def check_balance(df: DataFrame, total_col: str, part_cols: list[str]) -> None:
    """Assert ``total_col == sum(part_cols)`` on every row (e.g. the
    reference's ``total = private + public``, ``requirements/...:96``)."""
    parts = sum((F.col(c) for c in part_cols[1:]), F.col(part_cols[0]))
    bad = df.filter(~F.col(total_col).eqNullSafe(parts)).limit(1).count()
    if bad:
        raise BalanceViolation(f"{total_col} != {' + '.join(part_cols)}")


def check_non_negative(df: DataFrame, cols: list[str]) -> None:
    """Assert no negative measures (``Meta_Guideline.md:2999-3006``)."""
    pred = F.lit(False)
    for c in cols:
        pred = pred | (F.col(c) < 0)
    bad = df.filter(pred).limit(1).count()
    if bad:
        raise BalanceViolation(f"negative values in {cols}")


def merge_rollup(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Incremental aggregate maintenance: fold a new batch's partial
    rollup into the stored rollup without recomputing history.

    Both inputs must be at the rollup grain (one row per key tuple)
    with the same additive measure columns; the merge is a null-safe
    full outer join on the keys with per-measure
    ``coalesce(a, 0) + coalesce(b, 0)``. Works for any commutative
    monoid measure (counts, sums, mins/maxes need their own combine —
    use the cheapest correct one per column upstream).

    At 100 TB this is THE pattern for daily fact maintenance: the
    history side is the stored gold table read back (partition-pruned
    to the keys the delta can touch when the key embeds the partition
    column), the delta side is one day of data pre-aggregated to the
    same grain, and the output overwrites only affected partitions
    (S5 dynamic overwrite). Measures must be kept in EXACT types
    (longs / decimal cents, never rounded doubles) or the merged total
    drifts from a from-scratch rebuild — the oracle for
    ``inc_rollup_merge`` proves bit-equality in integer cents.
    """
    e = existing.select(
        *keys, *[F.col(c).alias(f"__e_{c}") for c in sum_cols]
    )
    d = delta.select(
        *keys, *[F.col(c).alias(f"__d_{c}") for c in sum_cols]
    )
    joined = e.join(d, keys, "full_outer")
    out_cols = [F.col(k) for k in keys] + [
        (
            F.coalesce(F.col(f"__e_{c}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        ).alias(c)
        for c in sum_cols
    ]
    return joined.select(*out_cols)

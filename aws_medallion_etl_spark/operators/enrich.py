"""Join enrichment with default fill for non-matches, plus the join
family the reference uses (SURVEY.md §2.3).

Left-join enrichment with 'Unknown' defaults re-expresses
``Meta_Guideline.md:1799-1819`` (datasets <- users) / the mandated
pattern at ``copilot-instructions.md:73-75``. Referential filtering
uses LEFT SEMI (better than the reference's inner join at
``Meta_Guideline.md:1947-1955`` — no duplicate amplification, and the
probe side never materializes build columns). FK-integrity checks use
LEFT ANTI (``Meta_Guideline.md:3016-3019``).

Scale: dimensions are broadcast by default — a dim that fits in
executor memory turns a 100 TB fact join into a map-side hash join
with zero shuffle of the big side. Callers disable broadcast for
dims that are themselves huge (then AQE picks SMJ and handles skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_broadcast(dim: DataFrame, broadcast_dim: bool) -> DataFrame:
    return F.broadcast(dim) if broadcast_dim else dim


def enrich_left(
    df: DataFrame,
    dim: DataFrame,
    on: Column | list[str],
    defaults: dict[str, object] | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """LEFT join ``dim`` onto ``df``; fill dim columns for misses with ``defaults``."""
    joined = df.join(_maybe_broadcast(dim, broadcast_dim), on, "left")
    if defaults:
        joined = joined.fillna(defaults)
    return joined


def referential_filter(
    df: DataFrame, ref: DataFrame, on: Column | list[str], broadcast_ref: bool = True
) -> DataFrame:
    """Keep only rows of ``df`` whose key exists in ``ref`` (LEFT SEMI)."""
    return df.join(_maybe_broadcast(ref, broadcast_ref), on, "left_semi")


def orphans(
    df: DataFrame, ref: DataFrame, on: Column | list[str], broadcast_ref: bool = True
) -> DataFrame:
    """Rows of ``df`` with NO match in ``ref`` (LEFT ANTI) — FK violations."""
    return df.join(_maybe_broadcast(ref, broadcast_ref), on, "left_anti")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "left",
) -> DataFrame:
    """Skew-resistant equi-join: shard hot keys across ``n_salts`` reducers.

    For joins whose key distribution is too skewed even for AQE's
    skew-join splitting (one key >> a partition), the classic salting
    rewrite: the fact side gets a per-row salt, the dim side is
    replicated once per salt value, and the join key becomes
    (key, salt) — a hot key's rows now land on ``n_salts`` different
    reducers instead of one straggler.

    The salt must be uniform per-row but need NOT be deterministic
    across runs (it never reaches the output); ``spark_partition_id``
    + ``monotonically_increasing_id`` gives a cheap uniform spread
    with no RNG. Dim replication multiplies the build side by
    ``n_salts`` — use only when the dim is small relative to the skew
    being fixed (otherwise prefer AQE skew handling).
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_dim = dim.select("*", salts)
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def with_scalar_stats(df: DataFrame, stats: DataFrame) -> DataFrame:
    """Attach a 1-row stats frame to every row (broadcast cross join).

    Re-expresses the reference's Athena ``CROSS JOIN stats`` z-score
    pattern (``Meta_Guideline.md:4256-4258``). Broadcasting the 1-row
    side makes this a free map-side operation at any scale.
    """
    return df.crossJoin(F.broadcast(stats))

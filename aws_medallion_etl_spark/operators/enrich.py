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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    strict: bool = False,
    tolerance: Column | None = None,
    prefix: str = "",
) -> DataFrame:
    """As-of join: each left row gets the nearest right row per key.

    ``backward`` matches the latest right row with ``right_ts <=
    left_ts`` (``<`` when ``strict``); ``forward`` the earliest with
    ``>=`` / ``>``. ``tolerance`` (a Column interval / duration bound)
    nulls matches further away than the bound. Right payload columns
    come back with ``prefix``; the matched timestamp as
    ``{prefix}{right_ts}``.

    Spark has no ASOF JOIN; the naive emulation (range join + window
    re-rank) shuffles candidate PAIRS. This one is the sort-based plan
    a native implementation would pick: union both sides tagged, ONE
    shuffle on the keys, then a running ``last(ignorenulls)`` (or
    ``first`` for forward) over the union ordered by time carries the
    most recent right payload onto each left row. State per window is
    one struct — no pair blowup, no second shuffle, and ties at equal
    timestamps are resolved by the side tag (right-before-left for
    inclusive, after for strict), not at random.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c not in on and c != right_ts]
    rs = right.select(
        *on,
        F.col(right_ts).alias("__t"),
        F.struct(F.col(right_ts).alias("__mts"), *payload).alias("__r"),
    )
    # Tie-break tag: left rows sit at __ord=1; right rows sort before
    # them (0) when the equal-timestamp match is allowed, after (2)
    # when excluded by strict/forward-inclusive rules.
    if direction == "backward":
        right_ord = 2 if strict else 0
    else:
        right_ord = 0 if strict else 2
    rtype = rs.schema["__r"].dataType
    l = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__r", F.lit(None).cast(rtype)
    ).withColumn("__ord", F.lit(1))
    r = rs.withColumn("__ord", F.lit(right_ord))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = [*left.columns, "__t", "__ord", "__r"]
    u = l.select(*cols).unionByName(r.select(*cols))

    from pyspark.sql import Window

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__ord")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy("__t", "__ord")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("__r", ignorenulls=True).over(w)

    out = u.withColumn("__m", matched).filter(F.col("__ord") == 1)
    if tolerance is not None:
        dist = (
            F.col(f"__m.__mts") - F.col("__t")
            if direction == "forward"
            else F.col("__t") - F.col("__m.__mts")
        )
        out = out.withColumn(
            "__m", F.when(dist <= tolerance, F.col("__m"))
        )
    proj = [
        *left.columns,
        F.col("__m.__mts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"__m.{p}").alias(f"{prefix}{p}") for p in payload],
    ]
    return out.select(*proj)


def range_join(
    left: DataFrame,
    right: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bin_size: float | None = None,
) -> DataFrame:
    """Join left rows to right intervals with ``lo <= value < hi``.

    Default path broadcasts the interval table: the range predicate
    makes Spark pick BroadcastNestedLoopJoin, which is the RIGHT plan
    when the interval table is dim-sized (each probe row scans a
    broadcast array; no shuffle of the big side). For interval tables
    too big to broadcast, pass ``bin_size``: both sides are blocked to
    bins of that width (intervals explode to every bin they overlap),
    turning the theta-join into a shuffled equi-join on the bin id +
    residual filter — each (row, interval) pair meets in exactly one
    bin, so no dedup is needed.
    """
    pred = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if bin_size is None:
        return left.join(F.broadcast(right), pred)
    lb = left.withColumn("__bin", F.floor(F.col(value_col) / F.lit(bin_size)))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_size)),
                F.floor(F.col(hi_col) / F.lit(bin_size)),
            )
        ),
    )
    return lb.join(rb, "__bin").where(pred).drop("__bin")

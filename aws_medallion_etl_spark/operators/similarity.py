"""Similarity search over embedding columns (array<float>).

Beyond-reference extensions (SURVEY.md §7.2 M7): brute-force cosine
top-k as the correctness baseline, and a random-hyperplane-LSH
bucketed variant as the scale path.

Design for 100 TB:

* The brute-force path broadcasts the QUERY side (queries are few;
  the corpus is huge) so the corpus never shuffles — the plan is
  scan → broadcast-nested-loop → per-partition top-k heap
  (``Window`` + ``row_number`` with rank<=k prunes via
  ``WindowGroupLimit`` pushdown in Spark 3.5+).
* All vector math is ``zip_with``/``aggregate`` column expressions in
  doubles — JVM codegen, no Python, no UDF.
* The LSH path buckets both sides on hyperplane sign bits
  (deterministic pseudo-random planes derived from ``xxhash64`` — no
  RNG state to ship) and only scores within buckets, trading recall
  for a candidate set ~|corpus| / 2^bits per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double_vec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i via zip_with + aggregate (codegen, sequential sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query: (query_id, neighbor_id, cosine, rank).

    Queries are broadcast (small side); the corpus is scanned once
    with norms precomputed per row, so each (query, corpus) pair costs
    one zip_with dot product. Rank ties break on neighbor id for
    determinism.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(vec_col).alias("__cv"),
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_vec(vec_col).alias("__qv"),
    ).withColumn("__qn", l2_norm(F.col("__qv")))

    pairs = c.join(F.broadcast(q), F.lit(True))
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: components in [-1, 1).

    Component j = xxhash64(plane, j) scaled — reproducible on any
    cluster with zero RNG state shipped.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.xxhash64(F.lit(plane), j) / F.lit(float(2**63))
        ),
    )


def lsh_bucket(vec: Column, planes: int, dim: int) -> Column:
    """Sign-bit bucket id from ``planes`` random hyperplanes."""
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bit = F.when(dot(vec, _hyperplane(p, dim)) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = F.shiftleft(bucket, 1) + bit
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    planes: int = 4,
    dim: int = 64,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: score only within the query's LSH bucket.

    Both sides bucket on the same deterministic hyperplanes; the join
    is an equi-join on bucket (shuffle/broadcast by bucket — never a
    cross join). Recall < 1: neighbors straddling a hyperplane are
    missed; raise recall with fewer planes or multi-probe (flip one
    bit) — the probe set here is the exact bucket only, measured
    against brute force in the test suite.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
    )
    c = c.withColumn("__bkt", lsh_bucket(F.col("__cv"), planes, dim)).withColumn(
        "__cn", l2_norm(F.col("__cv"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
    )
    q = q.withColumn("__bkt", lsh_bucket(F.col("__qv"), planes, dim)).withColumn(
        "__qn", l2_norm(F.col("__qv"))
    )
    pairs = c.join(F.broadcast(q), "__bkt")
    if exclude_self:
        pairs = pairs.where(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine", dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )

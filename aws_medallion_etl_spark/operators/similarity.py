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


def lsh_bucket(vec: Column, planes: int, dim: int, table: int = 0) -> Column:
    """Sign-bit bucket id from ``planes`` random hyperplanes.

    ``table`` offsets the hyperplane seeds so multiple independent
    hash tables can be derived from the same function.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        bit = F.when(
            dot(vec, _hyperplane(table * planes + p, dim)) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        bucket = F.shiftleft(bucket, 1) + bit
    return bucket


def _with_table_buckets(
    df: DataFrame, vec: str, planes: int, dim: int, tables: int
) -> DataFrame:
    """Explode each row into one (table, bucket) entry per hash table."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(vec), planes, dim, table=t).alias("bkt"),
            )
            for t in range(tables)
        ]
    )
    return df.withColumn("__e", F.explode(entries)).select(
        *df.columns, F.col("__e.tbl").alias("__tbl"), F.col("__e.bkt").alias("__bkt")
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    planes: int = 4,
    dim: int = 64,
    tables: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: score only candidates colliding in >= 1 hash table.

    Classic OR-amplified sign-LSH: ``tables`` independent tables of
    ``planes`` bits each. A true neighbor at angle θ collides per
    table with p = (1-θ/π)^planes and is a candidate with
    1-(1-p)^tables — e.g. cosine 0.32 → p≈0.13 → recall≈0.67 at
    (4, 8), while each query scores only ~1-(1-2^-planes)^tables
    (~⅓ here) of the corpus instead of all of it. Tune (planes,
    tables) to the corpus's neighbor-similarity profile: tighter
    clusters → more planes, fewer tables.

    The join is an equi-join on (table, bucket) — never a cross join;
    colliding-in-many-tables pairs dedup BEFORE scoring so each
    candidate pair costs exactly one dot product.
    """
    c = _with_table_buckets(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
        ),
        "__cv", planes, dim, tables,
    )
    q = _with_table_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
        ),
        "__qv", planes, dim, tables,
    )
    cand = c.join(F.broadcast(q.select("query_id", "__tbl", "__bkt")), ["__tbl", "__bkt"])
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    # one scoring row per (query, neighbor) no matter how many tables collide
    cand = cand.groupBy("query_id", "neighbor_id").agg(F.first("__cv").alias("__cv"))
    qvec = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
    )
    scored = cand.join(F.broadcast(qvec), "query_id").withColumn(
        "cosine",
        dot(F.col("__qv"), F.col("__cv")) / (l2_norm(F.col("__qv")) * l2_norm(F.col("__cv"))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )

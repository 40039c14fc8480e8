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
  (deterministic pseudo-random planes shipped as constant-folded
  literals — no RNG state, no per-row plane construction) and only
  scores within buckets, trading recall for a candidate set
  ~|corpus| / 2^bits per query per table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _hyperplane_values(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1).

    Generated driver-side (splitmix64 over the (plane, j) index) and
    shipped as literals — Catalyst constant-folds the array, so rows
    pay only the dot product, never hyperplane construction. Zero RNG
    state: any cluster reproduces the same planes.
    """
    out = []
    for j in range(dim):
        z = (plane * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        z = (z ^ (z >> 27)) * 0x94D049BB133111EB % (1 << 64)
        z ^= z >> 31
        out.append((z / float(1 << 63)) - 1.0)
    return out


def _hyperplane(plane: int, dim: int) -> Column:
    return F.array(*[F.lit(v) for v in _hyperplane_values(plane, dim)])


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


def _bucket_udf(planes: int, dim: int, tables: int):
    """Vectorized bucket computation: ALL tables' sign bits in one BLAS
    matmul per Arrow batch.

    This is the sanctioned pandas-UDF use case — dense vector math
    where (tables x planes) interpreted per-row dot products lose to a
    single (batch x dim) @ (dim x tables*planes) multiply by ~10x.
    The hyperplanes are regenerated inside the UDF from the
    deterministic generator, so no broadcast state is shipped.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        flat = np.array(
            [
                _hyperplane_values(t * planes + p, dim)
                for t in range(tables)
                for p in range(planes)
            ]
        ).T  # dim x (tables*planes)
        m = np.vstack(vecs.to_numpy()).astype(np.float64)  # batch x dim
        signs = (m @ flat) >= 0.0
        weights = 1 << np.arange(planes - 1, -1, -1, dtype=np.int64)
        packed = signs.reshape(len(m), tables, planes) @ weights  # batch x tables
        return pd.Series(list(packed.astype(np.int64)))

    return buckets


def _with_table_buckets(
    df: DataFrame, vec: str, planes: int, dim: int, tables: int,
    keep_all: bool = False,
) -> DataFrame:
    """Explode each row into one (table, bucket) entry per hash table.
    ``keep_all`` also carries the full ``__bkts`` array (``tables``
    longs — a few hundred bytes, vs kilobytes for a vector), which
    :func:`_first_collision_only` needs for shuffle-free dedup."""
    bucketed = df.withColumn("__bkts", _bucket_udf(planes, dim, tables)(F.col(vec)))
    cols = [*df.columns] + (["__bkts"] if keep_all else [])
    return bucketed.select(
        *cols, F.posexplode("__bkts").alias("__tbl", "__bkt")
    )


def _first_collision_only(a_bkts: Column, b_bkts: Column, tables: int) -> Column:
    """True iff the current row's ``__tbl`` is the FIRST table where the
    two sides' buckets collide — the OR-amplification dedup WITHOUT a
    shuffle: a pair colliding in several tables passes the filter for
    exactly one of them, so no distinct/groupBy stage is needed and
    vectors never ride a dedup exchange.

    Expressed as ONE zip_with + array_position over the two
    ``tables``-long arrays. An equivalent unrolled when-chain of
    O(tables²) comparisons measures 3x SLOWER end-to-end: Catalyst
    pushes the predicate into the join condition, and the giant
    expression blows whole-stage codegen's method size limit (janino
    failure → seconds of failed compilation + interpreted fallback).
    Small expression trees beat big "codegen-friendly" ones here.
    """
    matches = F.zip_with(a_bkts, b_bkts, lambda x, y: x == y)
    return F.array_position(matches, F.lit(True)) == F.col("__tbl") + 1


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    method: str = "lsh",
    planes: int = 4,
    dim: int = 64,
    tables: int = 12,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, cosine >= t).

    ``method='exact'`` scores all pairs (broadcast one side) — the
    correctness baseline, quadratic, small corpora only.
    ``method='lsh'`` generates candidates via the OR-amplified bucket
    join (recall < 1, never all-pairs) and verifies candidates with
    the exact cosine — the 100 TB path.
    """
    # Norms are computed per ROW before pairing — recomputing them per
    # pair would triple the (interpreted) vector-math cost on a
    # quadratic pair stream.
    c = corpus.select(
        F.col(id_col).alias("id_a"), as_double_vec(vec_col).alias("__va")
    ).withColumn("__na", l2_norm(F.col("__va")))
    d = corpus.select(
        F.col(id_col).alias("id_b"), as_double_vec(vec_col).alias("__vb")
    ).withColumn("__nb", l2_norm(F.col("__vb")))
    if method == "exact":
        pairs = c.join(F.broadcast(d), F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        # Bucket frames carry ids + the bucket ARRAY (tables longs, a
        # few hundred bytes), never vectors: the explode multiplies
        # rows by `tables` and the bucket join by the collision count,
        # so a vector riding along would cross those shuffles ~dim*8
        # bytes per row times the blowup. Multi-table collisions are
        # emitted exactly once by the first-colliding-table filter —
        # no distinct/groupBy dedup stage — and each side's
        # (id -> vec, norm) frame joins back once per candidate.
        ca = _with_table_buckets(
            c, "__va", planes, dim, tables, keep_all=True
        ).select("id_a", F.col("__bkts").alias("__ba"), "__tbl", "__bkt")
        cb = _with_table_buckets(
            d, "__vb", planes, dim, tables, keep_all=True
        ).select("id_b", F.col("__bkts").alias("__bb"), "__tbl", "__bkt")
        cand = (
            ca.join(cb, ["__tbl", "__bkt"])
            .where(F.col("id_a") < F.col("id_b"))
            .where(_first_collision_only(F.col("__ba"), F.col("__bb"), tables))
            .select("id_a", "id_b")
        )
        pairs = cand.join(c, "id_a").join(d, "id_b")
    else:
        raise ValueError(f"unknown method {method!r}")
    cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    planes: int = 4,
    dim: int = 64,
    tables: int = 12,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: score only candidates colliding in >= 1 hash table.

    Classic OR-amplified sign-LSH: ``tables`` independent tables of
    ``planes`` bits each. A true neighbor at angle θ collides per
    table with p = (1-θ/π)^planes and is a candidate with
    1-(1-p)^tables — e.g. cosine 0.32 → p≈0.13 → recall≈0.67 at
    (4, 12), while each query scores only ~1-(1-2^-planes)^tables
    (~⅓ here) of the corpus instead of all of it. Tune (planes,
    tables) to the corpus's neighbor-similarity profile: tighter
    clusters → more planes, fewer tables.

    The join is an equi-join on (table, bucket) — never a cross join;
    colliding-in-many-tables pairs are emitted exactly ONCE via the
    first-colliding-table filter (:func:`_first_collision_only`), so
    each candidate pair costs exactly one dot product with NO dedup
    shuffle at all. The whole pipeline is one shuffle: corpus scan →
    bucket projection → broadcast join with the (small) query side →
    filter → map-side scoring → windowed top-k, and the window's
    exchange carries only (query_id, neighbor_id, cosine) — the
    corpus and its vectors never shuffle.
    """
    c = _with_table_buckets(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
        ).withColumn("__cn", l2_norm(F.col("__cv"))),
        "__cv", planes, dim, tables, keep_all=True,
    )
    q = _with_table_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
        ).withColumn("__qn", l2_norm(F.col("__qv"))),
        "__qv", planes, dim, tables, keep_all=True,
    ).withColumnRenamed("__bkts", "__qbkts")
    cand = c.join(F.broadcast(q), ["__tbl", "__bkt"]).where(
        _first_collision_only(F.col("__bkts"), F.col("__qbkts"), tables)
    )
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-partitioned scale path
# ---------------------------------------------------------------------------

def _assign_centroid(centroids: list[list[float]]):
    """Pandas UDF: nearest-centroid id by cosine (max dot against
    normalized centroids — query-side normalization drops out of the
    argmax, so raw vectors are fine).

    Assignment is a pure projection — NO shuffle, no join. Like the
    LSH ``_bucket_udf``, this is the sanctioned dense-math case: one
    (batch x dim) @ (dim x k) BLAS multiply per Arrow batch. (A
    literal-centroid codegen expression works too but pays seconds of
    codegen compilation per distinct centroid set at dim 64 — measured
    slower end-to-end than Arrow transfer.) Ties break to the lowest
    centroid id (``argmax`` returns the first maximum).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64).T  # dim x k

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        return pd.Series(np.argmax(m @ C, axis=1).astype(np.int32))

    return assign


def _probe_centroids(centroids: list[list[float]], nprobe: int):
    """Pandas UDF: the ``nprobe`` nearest centroid ids, score-descending,
    ties to the lowest id (stable argsort)."""
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64).T

    @pandas_udf("array<int>")
    def probe(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        idx = np.argsort(-(m @ C), axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype(np.int32) for row in idx])

    return probe


def _normalize(vec: Column) -> Column:
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x / n)


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 8,
    iters: int = 3,
) -> list[list[float]]:
    """Spherical k-means centroids, fully deterministic.

    Init = the ``n_centroids`` lowest-id vectors (no RNG → any run or
    cluster reproduces the index). Each Lloyd round is ONE distributed
    pass: literal-centroid assignment (projection, above) then the
    per-dimension mean via posexplode → groupBy(cid, pos) — a narrow
    (n_centroids x dim)-row aggregate regardless of corpus size.
    Only (n_centroids x dim) floats ever reach the driver per round.
    Empty clusters keep their previous centroid.
    """
    # Persist the normalized vectors: every Lloyd round (and the init
    # collect) scans them; without this each action re-reads + re-normalizes
    # the source.
    vecs = corpus.select(
        F.col(id_col).alias("__id"), _normalize(as_double_vec(vec_col)).alias("__v")
    ).persist()
    try:
        cents = [
            r["__v"]
            for r in vecs.orderBy("__id").limit(n_centroids).collect()
        ]
        for _ in range(iters):
            assigned = vecs.withColumn("__cid", _assign_centroid(cents)(F.col("__v")))
            dims = (
                assigned.select("__cid", F.posexplode("__v").alias("__pos", "__val"))
                .groupBy("__cid", "__pos")
                .agg(F.avg("__val").alias("__m"))
            )
            rows = (
                dims.groupBy("__cid")
                .agg(
                    F.array_sort(F.collect_list(F.struct("__pos", "__m"))).alias("__pm")
                )
                .select("__cid", F.transform("__pm", lambda s: s["__m"]).alias("__mean"))
                .collect()
            )
            new = list(cents)
            for r in rows:
                m = r["__mean"]
                norm = sum(x * x for x in m) ** 0.5
                if norm > 0:
                    new[r["__cid"]] = [x / norm for x in m]
            cents = new
    finally:
        vecs.unpersist()
    return cents


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 8,
    iters: int = 3,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN: corpus partitioned by nearest centroid, queries probe
    only their ``nprobe`` closest cells.

    The inverted-file shape at 100 TB: the corpus is written
    partitioned/bucketed by ``__cid`` once, so a query batch reads
    only ``nprobe / n_centroids`` of the data (partition pruning on
    the probe join), and scoring happens per cell. Candidates per
    (query, neighbor) pair are unique by construction — a corpus row
    lives in exactly ONE cell — so no dedup stage is needed (unlike
    OR-amplified LSH). ``nprobe = n_centroids`` degrades gracefully to
    exact search through the same plumbing; recall at lower nprobe is
    pinned by pytest.
    """
    cents = kmeans_centroids(corpus, id_col, vec_col, n_centroids, iters)
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
        )
        .withColumn("__cn", l2_norm(F.col("__cv")))
        .withColumn(
            "__cid", _assign_centroid(cents)(F.col("__cv"))
        )
    )
    return _score_probed_cells(c, queries, id_col, vec_col, cents,
                               k, nprobe, exclude_self)


def build_ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_centroids: int = 8,
    iters: int = 3,
) -> list[list[float]]:
    """Materialize the IVF index: the corpus written PARTITIONED by
    cell id, plus a centroid sidecar.

    This is the production shape of ``cosine_topk_ivf`` — the k-means
    and cell assignment are paid ONCE at build time and amortized over
    every query batch, and the cell layout is a real parquet
    ``partitionBy("__cid")`` directory tree, so a probe's
    ``__cid IN (...)`` filter becomes static PARTITION PRUNING at the
    scan (pinned by ``test_plans::test_ivf_index_probe_prunes_partitions``):
    a batch probing ``p`` distinct cells reads ~``p / n_centroids`` of
    the corpus bytes, never the rest. Centroids are (k x dim) floats —
    trivially small — stored as JSON next to the cells.
    """
    import json
    import os

    cents = kmeans_centroids(corpus, id_col, vec_col, n_centroids, iters)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
    ).withColumn("__cid", _assign_centroid(cents)(F.col("__cv")))
    c.write.mode("overwrite").partitionBy("__cid").parquet(f"{path}/cells")
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/centroids.json", "w") as fh:
        json.dump(cents, fh)
    return cents


def append_to_ivf_index(
    spark,
    new_vectors: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
) -> None:
    """Fold new vectors into an existing :func:`build_ivf_index` layout
    without re-training: assign each to its nearest STORED centroid and
    append into that cell's partition directory — the FAISS ``add()``
    semantics, O(batch) per call.

    Because assignment uses the stored centroids, probe results over
    the appended index are exactly what a same-centroid full build
    would produce; what appends canNOT do is follow distribution
    drift — after enough growth, rebuild to re-train the centroids
    (and fix cell skew). Appends also accrete one file set per batch
    inside each cell dir; compact cells periodically
    (``io.compact(..., partition_by=["__cid"])``).
    """
    import json

    with open(f"{path}/centroids.json") as fh:
        cents = json.load(fh)
    c = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("__cv")
    ).withColumn("__cid", _assign_centroid(cents)(F.col("__cv")))
    c.write.mode("append").partitionBy("__cid").parquet(f"{path}/cells")


def cosine_topk_ivf_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 8,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN against a prebuilt :func:`build_ivf_index` layout.

    The probed cell set is the UNION of every query's ``nprobe``
    nearest centroids — collected driver-side as a literal IN-list
    (at most ``n_queries x nprobe`` ints, bounded by ``n_centroids``,
    never data-proportional), so the cells scan carries a static
    partition filter and untouched cells are never read. Scoring is
    identical to the unindexed path.
    """
    import json

    with open(f"{index_path}/centroids.json") as fh:
        cents = json.load(fh)
    probe = _probe_centroids(cents, nprobe)
    probed_cells = sorted(
        r["__cid"]
        for r in queries.select(
            F.explode(probe(as_double_vec(vec_col))).alias("__cid")
        ).distinct().collect()
    )
    c = (
        spark.read.parquet(f"{index_path}/cells")
        .where(F.col("__cid").isin(probed_cells))
        .withColumn("__cn", l2_norm(F.col("__cv")))
    )
    return _score_probed_cells(c, queries, id_col, vec_col, cents,
                               k, nprobe, exclude_self)


def _score_probed_cells(
    cells: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    cents: list[list[float]],
    k: int,
    nprobe: int,
    exclude_self: bool,
) -> DataFrame:
    """Shared IVF scoring tail: probe-join queries onto cells, exact
    cosine within candidates, per-query top-k."""
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("__qv")
        )
        .withColumn("__qn", l2_norm(F.col("__qv")))
        .withColumn(
            "__cid",
            F.explode(_probe_centroids(cents, nprobe)(F.col("__qv"))),
        )
    )
    pairs = cells.join(F.broadcast(q), "__cid")
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


# ---------------------------------------------------------------------------
# Embedding storage: int8 quantization
# ---------------------------------------------------------------------------

def quantize_int8(vec_col: Column | str):
    """Per-vector symmetric int8 quantization: q_i = round(x_i * 127 /
    max|x|), returned with its scale so ``dequantize`` can invert.

    The embedding-storage lever at 100 TB: float32->int8 is a 4x cut in
    scan bytes and shuffle volume for every ANN stage, and COSINE is
    scale-invariant, so scoring on quantized vectors needs no dequant
    at all (per-vector scales cancel in q·q / |q||q|). Pure codegen
    column exprs — `transform` over a materialized array, no Python.
    Returns a struct column (q: array<int>, scale: double).
    """
    v = as_double_vec(vec_col)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = F.when(amax > 0, 127.0 / amax).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x * scale).cast("int"))
    return F.struct(q.alias("q"), scale.alias("scale"))


def dequantize_int8(qstruct: Column) -> Column:
    """Inverse of :func:`quantize_int8`: x_i ~ q_i / scale (max abs
    reconstruction error = 0.5 / scale per component)."""
    s = qstruct["scale"]
    return F.transform(qstruct["q"], lambda q: q / s)


# ---------------------------------------------------------------------------
# SemDeDup: cluster-bucketed semantic deduplication
# ---------------------------------------------------------------------------

def assign_seed_clusters(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    seeds: list[tuple[int, list[float]]],
) -> DataFrame:
    """Assign every vector to its max-cosine seed centroid — as a pure
    codegen column expression, ZERO shuffle.

    ``seeds`` is a bounded driver-side list of ``(seed_id, vector)``
    (k x dim floats — the same sanctioned tiny collect the IVF path
    uses for centroids). Each seed becomes a constant-folded literal
    array; the argmax is ``array_max`` over ``struct(cosine, -seed_id)``
    (ties break toward the SMALLEST seed id), so cluster assignment is
    a deterministic function of the vector alone and the plan stays a
    single scan + project — the corpus never moves for assignment.
    """
    v = as_double_vec(vec_col)
    nrm = l2_norm(v)
    entries = []
    for seed_id, svec in seeds:
        acc = 0.0
        for x in svec:
            acc += float(x) * float(x)  # sequential fold, matches SQL sum order
        snrm = acc ** 0.5
        lit_vec = F.array(*[F.lit(float(x)) for x in svec])
        cos = dot(v, lit_vec) / (nrm * F.lit(snrm))
        entries.append(
            F.struct(cos.alias("c"), F.lit(-int(seed_id)).alias("negid"))
        )
    best = F.array_max(F.array(*entries))
    return corpus.withColumn("cluster", -best["negid"])


def lowest_id_seeds(
    corpus: DataFrame, id_col: str, vec_col: str, n_seeds: int
) -> list[tuple[int, list[float]]]:
    """The ``n_seeds`` lowest-id vectors as deterministic seed
    centroids (TakeOrdered + bounded collect of k x dim floats).

    The oracle-checkable seeding contract: a production run would feed
    :func:`assign_seed_clusters` the output of
    :func:`kmeans_centroids` instead — the pairing/keep logic is
    identical either way.
    """
    rows = (
        corpus.select(F.col(id_col), as_double_vec(vec_col).alias("__v"))
        .orderBy(F.col(id_col))
        .limit(n_seeds)
        .collect()
    )
    return [(int(r[0]), list(r[1])) for r in rows]


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_seeds: int = 8,
    seeds: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): confine the quadratic pairwise
    cosine check to CLUSTERS instead of the whole corpus.

    All-pairs near-dup detection is O(N^2); SemDeDup's observation is
    that semantic duplicates land in the same embedding-space cluster,
    so pairing within clusters costs O(N^2 / k) with recall loss only
    for cross-cluster near-dups (bounded by cluster coherence). Plan:
    one scan assigns clusters via codegen argmax (no shuffle), then a
    single equi-join shuffle keyed on ``cluster`` generates candidate
    pairs — exactly the partitioning a 1000-executor run wants, since
    each cluster's pairs build on one executor from co-located rows.

    Returns ``(cluster, id_a < id_b, cosine >= threshold)`` with
    cosine rounded to 4 digits.
    """
    if seeds is None:
        seeds = lowest_id_seeds(corpus, id_col, vec_col, n_seeds)
    assigned = assign_seed_clusters(corpus, id_col, vec_col, seeds)
    # ship the RAW float32 vectors through the cluster exchange (half
    # the bytes of doubles) and widen after the join — float->double
    # is exact, so the pair cosine is bit-identical to the all-double
    # formulation; norms are doubles computed once pre-shuffle
    base = assigned.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        "cluster",
    ).withColumn("__n", l2_norm(as_double_vec(F.col("__v"))))
    a = base.select(
        F.col("__id").alias("id_a"), F.col("__v").alias("__va"),
        F.col("__n").alias("__na"), "cluster",
    )
    b = base.select(
        F.col("__id").alias("id_b"), F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"), "cluster",
    )
    pairs = a.join(b, "cluster").where(F.col("id_a") < F.col("id_b"))
    cos = dot(as_double_vec(F.col("__va")), as_double_vec(F.col("__vb"))) / (
        F.col("__na") * F.col("__nb")
    )
    return (
        pairs.withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("cluster", "id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def semantic_dedup_keep(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_seeds: int = 8,
    seeds: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup keep-set: drop every vector that has a LOWER-id
    semantic duplicate in its cluster (greedy keep-first policy, the
    paper's 'keep one random exemplar' made deterministic).

    LEFT ANTI against the distinct ``id_b`` side of
    :func:`semantic_dedup_pairs` — survivors keep their full rows.
    """
    pairs = semantic_dedup_pairs(
        corpus, id_col, vec_col, threshold, n_seeds=n_seeds, seeds=seeds
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(drop, id_col, "left_anti")

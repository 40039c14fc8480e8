"""Sketch-based approximate monitoring (HLL, CMS).

The 100 TB substitute for exact DQ counters: exact
``count_distinct`` over billions of keys is a full expand + dedup
shuffle, while an HLL sketch is a fixed-size (KB) accumulator that
merges associatively — the shuffle carries one sketch per partition
per group no matter the row count. Same story for count-min vs exact
frequency tables.

These wrap Spark's built-in Apache DataSketches HLL functions
(``hll_sketch_agg``/``hll_sketch_estimate``, JVM-side, deterministic
for fixed data + lgK) and ``DataFrame.stat.countMinSketch`` (fixed
seed → deterministic). The estimate-vs-exact bound checks emitted by
``distinct_bounds`` make the error contract itself testable — an
oracle can assert the boolean without reproducing the sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch estimate of distinct ``col`` values.

    Returns (keys..., n_distinct_est). Mergeable: at 100 TB the same
    ``hll_sketch_agg`` runs per partition, per day, per shard — and
    ``hll_union_agg`` rolls sketches up WITHOUT re-reading rows (the
    property exact distinct counts fundamentally lack).
    """
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lg_k))
        ).alias("n_distinct_est")
    )


def distinct_bounds(
    df: DataFrame,
    keys: list[str],
    col: str,
    lg_k: int = 12,
    rel_bound: float = 0.05,
) -> DataFrame:
    """Exact distinct count per group + whether the HLL estimate lands
    within ``rel_bound`` of it.

    The exact side exists to CHECK the sketch (at test scale); the
    emitted contract is (keys, n_exact, hll_within_bound). HLL++ at
    lgK=12 has σ ≈ 1.04/√4096 ≈ 1.6%, so a 5% bound is ~3σ.
    """
    exact = df.groupBy(*keys).agg(
        F.count_distinct(F.col(col)).alias("n_exact")
    )
    est = distinct_sketch(df, keys, col, lg_k)
    return (
        exact.join(est, keys)
        .withColumn(
            "hll_within_bound",
            (
                F.abs(F.col("n_distinct_est") - F.col("n_exact"))
                <= F.col("n_exact") * F.lit(rel_bound)
            ),
        )
        .select(*keys, "n_exact", "hll_within_bound")
    )


def frequency_bounds(
    df: DataFrame,
    col: str,
    values: list[str],
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> list[dict]:
    """Count-min-sketch estimates for ``values`` of ``col`` vs exact
    counts, with the CMS guarantee evaluated per value:
    exact <= estimate <= exact + eps * N (w.p. ``confidence``).

    Driver-side ONLY in the sense that the final KB-sized sketch is
    collected; the aggregation itself is distributed (SQL
    ``count_min_sketch`` aggregate with map-side partials, then the
    binary is deserialized through Spark's public
    ``org.apache.spark.util.sketch.CountMinSketch`` reader).
    Returns plain dicts (value, n_exact, cms_within_bound) — a DQ
    report row, not a frame.
    """
    agg = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("__cms"),
        F.count(F.lit(1)).alias("__n"),
    ).head()
    jvm = df.sparkSession._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(agg["__cms"]))
    )
    n_total = agg["__n"]
    exact = dict(
        df.where(F.col(col).isin(values)).groupBy(col).count().collect()
    )
    out = []
    for v in values:
        n_exact = int(exact.get(v, 0))
        est = sketch.estimateCount(v)
        out.append(
            {
                "value": v,
                "n_exact": n_exact,
                "cms_within_bound": bool(
                    n_exact <= est <= n_exact + eps * n_total
                ),
            }
        )
    return out


def heavy_hitters_screened(
    df: DataFrame,
    col: str,
    threshold: int,
    depth: int = 4,
    width: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """EXACT heavy hitters (``count(col) >= threshold``) via a
    count-min screen — the two-pass pattern that makes heavy-hitter
    mining affordable when key cardinality (an n-gram vocabulary,
    URL space, user-id space) dwarfs the answer.

    A single ``groupBy(col).count()`` is map-side combined, but its
    shuffle still carries one partial per DISTINCT KEY per task — at
    100 TB a token vocabulary makes that the dominant exchange. This
    operator bounds the shuffled key space by the sketch, not the
    vocabulary:

    1. **Sketch build** (one scan): each row's ``depth`` bucket ids
       (``pmod(hash(key, seed+i), width)``) are pos-exploded and
       aggregated to (depth, bucket) counters — after map-side
       combine the shuffle is at most ``depth * width`` partials per
       task no matter how many distinct keys exist.
    2. **Screen** (second scan, no shuffle): buckets whose counter is
       ``>= threshold`` (at most ``width`` per depth, KB-sized) are
       broadcast; a row survives only if ALL ``depth`` of its buckets
       qualify. Count-min only over-counts (every counter >= the true
       count of each key in it), so every true heavy hitter survives
       — the screen has NO false negatives; hash collisions admit
       false positives only.
    3. **Exact verify**: ``groupBy`` over the survivors — the key
       cardinality entering this shuffle is the collision-inflated
       candidate set, not the vocabulary — and the final
       ``>= threshold`` filter kills the false positives.

    Output is therefore EXACTLY the true heavy-hitter set with exact
    counts (oracle: plain ``GROUP BY ... HAVING``); the sketch is a
    physical-plan optimization, not an approximation of the answer.
    Two scans of ``df`` are inherent to the two-pass sketch shape —
    persist upstream if the input is itself expensive.

    **Width must scale with N/threshold or the screen goes blind**:
    a bucket's counter is >= its expected load N/width, so once
    ``N/width >= threshold`` EVERY bucket qualifies and the screen
    passes all rows (still correct — just no pruning, measured on the
    10x stress set). ``width=None`` (default) sizes it from the data:
    next power of two of ``8 * N / threshold`` (bucket noise mean =
    threshold/8, so only buckets holding a real heavy hitter or an
    8-sigma-ish pileup qualify), clamped to [2^10, 2^18] — beyond
    2^18 the candidate bound N/threshold is itself huge and a sketch
    screen is the wrong tool. If even the clamped width leaves the
    expected bucket load at or above the threshold (screen provably
    blind), the operator SKIPS the sketch and returns the plain exact
    groupBy — same answer, strictly less work. Costs one extra
    ``count()`` (metadata-only on parquet scans).

    **Applicability envelope** (measured, SCALING.md): per task the
    counter partials are ``depth * min(width, local distinct keys)``,
    so the screen WINS when key cardinality per task >> depth*width —
    Zipf-shaped spaces (tokens, n-grams, URLs, user-ids) where
    ``threshold >> depth * 8 * mean key count``. On low-cardinality /
    uniform keys it degrades to <= depth x the plain groupBy's
    shuffle; use the plain groupBy there.
    """
    if depth < 1:
        raise ValueError(f"heavy_hitters_screened: depth must be >= 1, got {depth}")
    if width is not None and width <= 0:
        # pmod(hash, 0) is NULL → every semi-join matches nothing and
        # the operator would silently return an EMPTY result; refuse.
        raise ValueError(f"heavy_hitters_screened: width must be > 0, got {width}")
    c = F.col(col)
    if width is None:
        n_total = df.count()
        width = 1 << max(
            10, min(18, int(8 * n_total // max(threshold, 1)).bit_length())
        )
        if n_total // width >= threshold:
            # Even at the clamped maximum width the expected bucket
            # load reaches the threshold: every bucket qualifies and
            # the screen provably prunes NOTHING. Doing the sketch
            # would be strictly more work than the answer — degrade
            # to the plain exact groupBy (same output, one pass).
            return (
                df.groupBy(c.alias(col))
                .agg(F.count(F.lit(1)).alias("n_occurrences"))
                .where(F.col("n_occurrences") >= F.lit(threshold))
            )
    buckets = [
        F.pmod(F.hash(c, F.lit(seed + i)), F.lit(width)).alias(f"__b{i}")
        for i in range(depth)
    ]
    keyed = df.select(c.alias("__k"), *buckets)
    counters = (
        keyed.select(
            F.posexplode(
                F.array(*[F.col(f"__b{i}") for i in range(depth)])
            ).alias("__d", "__b")
        )
        .groupBy("__d", "__b")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    # Spark emits no ReusedExchange across the `depth` broadcast
    # branches (per-branch exprIds defeat canonicalization), so
    # without this the sketch build — a full scan + shuffle — would
    # run once PER depth. Checkpointing the qualified-bucket frame
    # (<= depth*width rows) computes it once; the broadcasts read it.
    qualified = counters.where(
        F.col("__cnt") >= F.lit(threshold)
    ).localCheckpoint(eager=False)
    screened = keyed
    for i in range(depth):
        q_i = qualified.where(F.col("__d") == i).select(
            F.col("__b").alias(f"__b{i}")
        )
        screened = screened.join(F.broadcast(q_i), f"__b{i}", "left_semi")
    return (
        screened.groupBy(F.col("__k").alias(col))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= F.lit(threshold))
    )


def rolling_distinct_bounds(
    df: DataFrame,
    ts_col: str,
    col: str,
    days: int = 7,
    lg_k: int = 12,
    rel_bound: float = 0.05,
) -> DataFrame:
    """Trailing-N-day distinct counts via MERGED daily HLL sketches —
    the monitoring primitive exact distincts cannot give you at scale:
    a trailing-window ``count(distinct)`` needs every (day, value)
    pair re-deduped per window, while sketches build once per day
    (distributed, map-side combined) and the window pass just unions
    N fixed-size binaries per day.

    The window runs over the DAY dimension — thousands of rows no
    matter the data volume — so its single-partition sort is a
    non-issue; all data-proportional work happened in the sketch
    aggregation. Emits (day, n_exact, hll_within_bound): the exact
    side exists to CHECK the sketch at test scale, same contract as
    :func:`distinct_bounds` (lgK=12 -> sigma ~1.6%, 5% ~ 3 sigma).
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        df.select(day.alias("__day"), F.col(col).alias("__v"))
        .groupBy("__day")
        .agg(F.hll_sketch_agg("__v", lg_k).alias("__sk"))
    )
    w = (
        Window.orderBy(F.unix_date(F.col("__day")))
        .rangeBetween(-(days - 1), 0)
    )
    est = daily.withColumn(
        "__est", F.hll_sketch_estimate(F.hll_union_agg("__sk").over(w))
    ).select("__day", "__est")
    pairs = df.select(day.alias("__pday"), F.col(col).alias("__v")).distinct()
    exact = (
        daily.select("__day")
        .join(
            pairs,
            (F.col("__pday") <= F.col("__day"))
            & (F.col("__pday") >= F.date_sub(F.col("__day"), days - 1)),
        )
        .groupBy("__day")
        .agg(F.count_distinct("__v").alias("n_exact"))
    )
    return (
        exact.join(est, "__day")
        .withColumn(
            "hll_within_bound",
            F.abs(F.col("__est") - F.col("n_exact"))
            <= F.col("n_exact") * F.lit(rel_bound),
        )
        .select(F.col("__day").alias("day"), "n_exact", "hll_within_bound")
    )


def quantile_bounds(
    df: DataFrame,
    keys: list[str],
    col: str,
    probs: tuple[float, ...] = (0.5, 0.95),
    accuracy: int = 10_000,
    rank_bound: float = 0.01,
) -> DataFrame:
    """Exact (discrete) percentile per group + whether
    ``percentile_approx``'s estimate honors its RANK-error contract —
    the quantile member of the sketch-monitoring family
    (:func:`distinct_bounds` for HLL, :func:`frequency_bounds` for
    count-min).

    ``percentile_approx`` (Greenwald-Khanna) guarantees rank error
    ≤ 1/accuracy and its state is MERGEABLE — per-partition sketches
    roll up without re-reading rows, the property exact percentiles
    fundamentally lack at 100 TB. Checking the estimate by VALUE would
    be data-dependent, so the check is rank-based: the exact rank of
    the approximate value inside its group must sit within
    ``rank_bound`` of the target rank (1/accuracy = 0.01% here, so a
    1% bound is orders of magnitude of headroom — the boolean can't
    flip on scheduling noise).

    Returns one row per (group, prob):
    ``(keys..., pct INT, n_rows, exact_disc, approx_within_rank_bound)``
    where ``exact_disc`` is the lower discrete percentile (the
    smallest value whose cumulative rank reaches the target — integer
    columns stay integer, so the output hashes across engines).

    Scale shape: one sketch aggregate (mergeable, map-side partial),
    one window pass for the exact check side, and a broadcast of the
    per-group approximate values for the rank count — the table is
    scanned, never shuffled beyond the groupBy.
    """
    plist = [float(p) for p in probs]
    c = F.col(col)
    w = Window.partitionBy(*keys).orderBy(c).rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # cume_dist without ORDER-BY-frame ambiguity: rows with col <= x
    cd = df.select(
        *keys, c.alias("__v"),
        (F.count(F.lit(1)).over(w)
         / F.count(F.lit(1)).over(Window.partitionBy(*keys))).alias("__cd"),
    )
    exact = cd.groupBy(*keys).agg(*[
        F.min(F.when(F.col("__cd") >= p, F.col("__v"))).alias(f"__x{i}")
        for i, p in enumerate(plist)
    ])
    appr = df.groupBy(*keys).agg(
        F.percentile_approx(c, plist, accuracy).alias("__ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    cand = appr.select(
        *keys, "n_rows",
        F.posexplode("__ap").alias("__pidx", "__av"),
    )
    ranked = (
        df.select(*keys, c.alias("__v"))
        .join(F.broadcast(cand), keys)
        .groupBy(*keys, "__pidx", "__av", "n_rows")
        .agg(
            F.sum(F.when(F.col("__v") <= F.col("__av"), 1)
                  .otherwise(0)).alias("__le"),
            F.sum(F.when(F.col("__v") < F.col("__av"), 1)
                  .otherwise(0)).alias("__lt"),
        )
    )
    probs_lit = F.lit(plist)
    # ties make the achievable rank jump: the returned value occupies
    # the whole rank interval [count(<v), count(<=v)] / n, so the
    # contract holds iff that interval INTERSECTS [p - b, p + b] —
    # a point check would fail a constant column at any prob
    out = ranked.withColumn(
        "__p", F.element_at(probs_lit, F.col("__pidx") + 1)
    ).withColumn(
        "approx_within_rank_bound",
        (F.col("__lt") / F.col("n_rows")
         <= F.col("__p") + F.lit(float(rank_bound)))
        & (F.col("__le") / F.col("n_rows")
           >= F.col("__p") - F.lit(float(rank_bound))),
    )
    exact_long = F.array(*[
        F.col(f"__x{i}").cast("long") for i in range(len(plist))
    ])
    return (
        out.join(exact, keys)
        .select(
            *keys,
            # round before the int cast: 0.95 * 100 is 94.999... in
            # binary doubles and a bare cast would truncate to 94
            F.round(F.col("__p") * 100).cast("int").alias("pct"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.element_at(exact_long, F.col("__pidx") + 1)
            .alias("exact_disc"),
            "approx_within_rank_bound",
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter: fixed-size membership screen
# ---------------------------------------------------------------------------

def _signed64(x: int) -> int:
    """Two's-complement fold into a signed 64-bit int (Spark LongType
    literals must be signed)."""
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x


def bloom_bucket(col, i: int, width_bits: int, salt: str = "bf"):
    """The ``i``-th Bloom bucket of a string column: first 8 hex digits
    of md5 over the salted value, mod ``width_bits`` — pure codegen,
    and bit-for-bit reproducible in any engine with md5 (the same
    construction the quality classifier's hashed features use)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(
            F.substring(F.md5(F.concat(c, F.lit(f":{salt}{i}"))), 1, 8),
            16, 10,
        ).cast("long") % width_bits
    )


def build_bloom(
    df: DataFrame,
    col: str,
    width_bits: int = 1 << 17,
    k: int = 3,
    salt: str = "bf",
) -> list[int]:
    """Distributed Bloom-filter build over a string column: returns the
    bit array as ``width_bits / 64`` signed longs.

    The 100 TB decontamination lever: broadcasting a benchmark's exact
    distinct n-grams costs gram-bytes × executors and keeps growing
    with the benchmark suite; a Bloom filter is a FIXED-size bit array
    (2^17 bits = 16 KB here) with a false-positive rate you choose via
    ``width_bits``/``k`` — and false positives only cost review, never
    a missed hit (no false negatives by construction).

    Scale shape: the only exchange is ``distinct`` over bucket ids —
    bounded by ``width_bits``, never by corpus size; the driver folds
    at most ``width_bits`` ints into the array. Deterministic: md5
    buckets, no RNG — the same inputs build the same filter anywhere.
    """
    if width_bits % 64 != 0:
        raise ValueError("build_bloom: width_bits must be a multiple of 64")
    if k < 1:
        raise ValueError("build_bloom: k must be >= 1")
    rows = (
        df.select(
            F.explode(
                F.array(*[
                    bloom_bucket(col, i, width_bits, salt) for i in range(k)
                ])
            ).alias("__b")
        )
        .where(F.col("__b").isNotNull())
        .distinct()
        .collect()
    )
    bits = [0] * (width_bits // 64)
    for r in rows:
        idx = int(r["__b"])
        bits[idx // 64] |= 1 << (idx % 64)
    return [_signed64(w) for w in bits]


def bloom_contains(
    col,
    bits: list[int],
    k: int = 3,
    salt: str = "bf",
):
    """Membership test against a :func:`build_bloom` array as a pure
    codegen boolean column: true iff ALL ``k`` bucket bits are set.

    The bit array and the 64 single-bit masks ride as two ARRAY
    literals (one constant each — no per-element codegen), so the
    test is k × (element_at + bitwise AND) per row: the corpus never
    joins, shuffles, or broadcasts anything row-proportional.
    """
    width_bits = len(bits) * 64
    bits_lit = F.lit([int(w) for w in bits])
    masks_lit = F.lit([_signed64(1 << s) for s in range(64)])
    out = F.lit(True)
    for i in range(k):
        b = bloom_bucket(col, i, width_bits, salt)
        word = F.element_at(bits_lit, (F.floor(b / 64) + 1).cast("int"))
        mask = F.element_at(masks_lit, ((b % 64) + 1).cast("int"))
        out = out & (word.bitwiseAND(mask) != 0)
    return out

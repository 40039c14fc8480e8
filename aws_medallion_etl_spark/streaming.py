"""Structured Streaming surface: incremental ingest, watermarked
windowed aggregation, streaming dedup, and session windows.

The reference is batch-only — late data is handled by daily
``run_date`` partitions + backfill (SURVEY.md §2.9), and streaming is
its own "next step" (reference ``Meta_Guideline.md:4717``). This
module is that step, built the idiomatic way: the SAME DataFrame
expressions the batch operators use, lifted onto ``readStream`` /
``writeStream`` so a medallion layer can flip batch → incremental
without rewriting transforms.

Scale notes:

* Watermarks bound state: a windowed aggregation with no watermark
  grows state forever at 100 TB/day — every aggregation here demands
  one.
* ``dropDuplicatesWithinWatermark`` keys state eviction to event
  time, the streaming analogue of the silver NK dedup.
* ``foreachBatch`` bridges streams onto the batch sinks (idempotent
  partitioned parquet from ``io.write_parquet``) so bronze/silver
  layouts stay byte-compatible between modes.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, DoubleType


def stream_from_directory(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream: new files under ``path`` become micro-batches.

    Schema is ENFORCED (same contract rule as the batch CSV reader —
    streaming sources cannot infer safely). ``max_files_per_trigger``
    caps per-batch work for backpressure.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_counts(
    df: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "1 hour",
    extra_keys: list[str] | None = None,
    aggs: list | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation with a watermark.

    Late rows beyond ``watermark`` are dropped and their window state
    evicted — bounded state at any throughput. Output columns:
    ``window_start``, ``window_end``, keys, ``n`` (+ custom aggs).
    """
    win = F.window(F.col(ts_col), window_duration, slide or window_duration)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), *(extra_keys or []))
        .agg(F.count(F.lit(1)).alias("n"), *(aggs or []))
    )
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *(extra_keys or []),
        *[c for c in out.columns if c != "__w" and c not in (extra_keys or [])],
    )


def stream_dedup(
    df: DataFrame, keys: list[str], ts_col: str, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming NK dedup: first event per key wins within the watermark.

    ``dropDuplicatesWithinWatermark`` evicts key state once the
    watermark passes — the unbounded-state-safe analogue of the
    silver layer's keep-newest dedup.
    """
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str = "30 minutes",
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge.

    Built on ``F.session_window`` (native state store support) — no
    ``applyInPandasWithState`` needed for plain sessionization.
    """
    win = F.session_window(F.col(ts_col), gap)
    out = (
        df.withWatermark(ts_col, watermark)
        .groupBy(win.alias("__w"), *(keys or []))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return out.select(
        F.col("__w.start").alias("session_start"),
        F.col("__w.end").alias("session_end"),
        *(keys or []),
        "n_events",
    )


from contextlib import contextmanager


@contextmanager
def _state_partitions(spark, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` around a stream drain.

    For a STATEFUL streaming query the shuffle-partition count at
    first start fixes the number of state-store instances forever
    (it is baked into the checkpoint) — and every micro-batch pays
    one state-store commit PER instance. A query whose stateful key
    space is provably bounded (an enum column, a modulo shard) should
    size this to its key cardinality, not inherit the session's
    data-shuffle width: 64–200 instances holding 8 keys is pure
    per-batch commit overhead on ANY deployment, local or cluster
    (measured sf0.1: str10_stream_pack 8.2 s → 3.7 s at 8 instead of
    64). Restored after the drain so the caller's batch queries keep
    the session default (the availableNow sinks await inside)."""
    if n is None:
        yield
        return
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", int(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_available_now(
    stream: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    shuffle_partitions: int | None = None,
) -> None:
    """Drain everything currently available through ``foreachBatch``, then stop.

    The batch-parity execution mode: each micro-batch is handed to
    ``batch_fn(df, batch_id)`` (e.g. an idempotent ``io.write_parquet``
    by run_date), with exactly-once bookkeeping in ``checkpoint_dir``.

    Per-batch storage hygiene (guide §5): any ``localCheckpoint``
    blocks the batch body takes (CC rounds, admission probes, lineage
    severing before overwriting a source) are freed the moment the
    batch returns — cross-batch state must flow through the SINKS
    (which is the contract here anyway: foreachBatch bodies re-read
    persisted state so a restart replays correctly), never through an
    in-memory frame held across batches. Without this, every drained
    micro-batch leaves its blocks to the GC/ContextCleaner chain and
    a long-running ingest loop degrades under eviction pressure.
    """
    from aws_medallion_etl_spark._ckpt import reclaim_scope

    def _reclaimed(df: DataFrame, batch_id: int) -> None:
        with reclaim_scope(df.sparkSession.sparkContext):
            batch_fn(df, batch_id)

    with _state_partitions(stream.sparkSession, shuffle_partitions):
        q = (
            stream.writeStream.foreachBatch(_reclaimed)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def to_memory_sink(
    stream: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = None,
) -> "object":
    """Materialize a stream into an in-memory table (tests/debug only).

    ``shuffle_partitions`` scopes the stateful operators' state-store
    instance count for the drain — see :func:`_state_partitions`;
    size it to the stream's bounded key cardinality, leave None for
    unbounded key spaces."""
    with _state_partitions(stream.sparkSession, shuffle_partitions):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return q


def running_totals(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Custom stateful operator: per-key running (count, sum) across
    micro-batches via ``applyInPandasWithState``.

    The escape hatch for stateful semantics the built-in streaming
    aggregations can't express (here the simplest possible instance so
    the harness itself is the point): state is an explicit typed
    tuple, updated once per key per micro-batch from Arrow batches,
    and each batch EMITS the refreshed running totals (update mode).
    State size is O(distinct keys) and independent of throughput;
    pair with a timeout (``GroupStateTimeout.ProcessingTimeTimeout``)
    to evict idle keys on unbounded key spaces at 100 TB/day.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [df.schema[k] for k in key_cols]
        + [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("t", DoubleType())]
    )

    def fn(key, pdfs, state: GroupState):
        n, t = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            t += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, t))
        yield pd.DataFrame(
            [[*key, n, t]], columns=[*key_cols, "n_events", "total_value"]
        )

    return df.groupBy(*[F.col(k) for k in key_cols]).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_pack_greedy(
    df: DataFrame,
    shard_col: str,
    id_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Streaming hard-cap greedy packing: the stateful twin of
    ``corpus.pack_sequences_greedy``. Per shard, state carries the
    open bin's (bin_id, tokens_used) across micro-batches; each batch
    continues filling exactly where the previous one stopped, so —
    fed in ``id_col`` order — the assignments equal the batch greedy
    packing of the full corpus (the oracle replays that recurrence).

    This is the continuous-ingestion shape of sequence packing: docs
    arrive over time, bins close as they fill, and a closed bin is
    immutable (its docs were already emitted, append mode) — exactly
    what a training-shard writer downstream needs. State is three
    longs per shard, independent of throughput; add a ProcessingTime
    timeout to retire idle shards on unbounded shard spaces.

    Equality with the batch packing holds only if micro-batches
    arrive in ``id_col`` order per shard — a closed bin is immutable,
    so a late-arriving smaller id cannot be retro-packed. For
    integral ids the state carries the max id already packed and a
    batch delivering a SMALLER one raises (an out-of-order file from
    mtime skew or a backfill must not silently produce a different
    packing); non-integral id types get the documented ordering
    contract without the runtime guard.

    CHECKPOINT COMPATIBILITY: the state schema grew from (b, run) to
    (b, run, max_id) when the ordering guard landed —
    ``applyInPandasWithState`` has no state-schema evolution, so a
    job restarted from a checkpoint written by the two-field version
    will fail or misdecode state. Start such jobs with a NEW
    checkpoint directory (replaying the source reproduces the same
    packing by the determinism contract above).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import IntegralType

    guard_order = isinstance(df.schema[id_col].dataType, IntegralType)

    out_schema = StructType(
        [df.schema[shard_col], df.schema[id_col], df.schema[token_col],
         StructField("bin_id", LongType())]
    )
    state_schema = StructType(
        [StructField("b", LongType()), StructField("run", LongType()),
         StructField("max_id", LongType())]
    )

    def fn(key, pdfs, state: GroupState):
        b, run, max_id = state.get if state.exists else (0, 0, None)
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values(id_col, kind="mergesort")
        if guard_order and len(pdf) and max_id is not None:
            batch_min = int(pdf[id_col].iloc[0])
            if batch_min <= max_id:
                raise ValueError(
                    f"stream_pack_greedy: shard {key} received id "
                    f"{batch_min} after already packing through id "
                    f"{max_id} — out-of-order delivery (mtime skew, "
                    "backfill?) would silently diverge from the batch "
                    "packing; replay the source in id order"
                )
        bins = [0] * len(pdf)
        for i, t in enumerate(pdf[token_col].to_numpy()):
            t = 0 if t != t else int(t)
            if run > 0 and run + t > budget:
                b, run = b + 1, 0
            bins[i] = b
            run += t
        if guard_order and len(pdf):
            max_id = int(pdf[id_col].iloc[-1])
        state.update((int(b), int(run), max_id))
        out = pdf[[shard_col, id_col, token_col]].assign(bin_id=bins)
        yield out

    return df.groupBy(F.col(shard_col)).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    join_expr,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the
    CURRENT snapshot of the static side.

    Stateless — no streaming state at all, because the static side is
    re-resolved per micro-batch (a dim refreshed mid-stream applies to
    the NEXT batch, the standard slowly-refreshing-dim contract). With
    ``broadcast_dim`` the 100 TB stream side never shuffles; leave it
    True unless the dim is genuinely too big, in which case a
    stream-side shuffle per micro-batch is the honest cost.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, join_expr, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str,
    watermark: str,
) -> DataFrame:
    """Stream-stream inner join: same ``key``, right event inside
    ``(left_ts, left_ts + upper]``.

    Both sides carry the SAME watermark and the join condition bounds
    event-time distance, which is exactly what lets Spark evict join
    state: a buffered left row can stop waiting once the watermark
    passes ``left_ts + upper``. Without the time bound (or without
    watermarks) stream-stream state grows forever — the join predicate
    IS the state-retention policy. Inner joins emit exactly the
    matched pairs regardless of how the drain was micro-batched.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "inner")


def stream_merge_snapshot(
    stream: DataFrame,
    path: str,
    on: list[str],
    order_col: str,
    stats_cols: list[str] | None = None,
    write_mode: str = "mor",
    app_id: str | None = None,
    row_tracking: bool = False,
    post_batch=None,
) -> object:
    """Exactly-once streaming UPSERT into a snapshot table — the
    Delta ``foreachBatch`` + MERGE CDC sink (STR11) on plain parquet.

    Each micro-batch is reduced to its newest row per key (greatest
    ``order_col``, which must be unique per key within a batch — a
    CDC sequence/LSN column; a tie would make the kept row
    nondeterministic), then MERGEd into the table keyed on
    ``on``: matched keys update, new keys insert. Under the default
    ``write_mode="mor"`` a batch touching K rows writes K positions +
    K rows, never a data-file rewrite — sized to per-batch deltas,
    which is what a CDC stream is.

    Exactly-once, both halves:

    * the MERGE commits atomically with the batch id stamped as the
      table's per-app transaction high-water mark
      (``snapshot.last_txn_version``, Delta's txnAppId/txnVersion);
    * a RESTARTED batch (foreachBatch replays the last uncommitted
      micro-batch after a crash) sees ``batch_id <= high-water`` and
      is skipped without writing — replay becomes a no-op instead of
      a double-apply.

    Returns the started streaming query (caller awaits termination).
    The first batch creates the table. ``app_id`` defaults to the
    table path; set it when two independent streams feed one table.

    ``row_tracking=True`` creates the table with durable row ids —
    required when a downstream incremental consumer (the row-id CDF,
    :func:`mv.refresh_rollup`) follows the table. ``post_batch(spark,
    batch_id)`` (round 12) runs AFTER each batch's commit (including
    a replay-skipped one): the per-micro-batch maintenance slot —
    e.g. an incremental MV refresh, whose own txn cursor keeps it
    exactly-once, so a crash between the merge and the callback heals
    on the replayed batch.
    """
    from pyspark.sql import Window

    from aws_medallion_etl_spark import snapshot as snap

    app = app_id or f"stream-merge:{path.rstrip('/')}"

    def _apply(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        w = Window.partitionBy(*on).orderBy(F.col(order_col).desc())
        newest = (
            batch.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if not snap.snapshot_versions(path):
            snap.snapshot_create(
                spark, newest, path, stats_cols=stats_cols or list(on),
                txn=(app, batch_id), row_tracking=row_tracking,
            )
        else:
            snap.merge_into(
                spark, path, newest, on=list(on), write_mode=write_mode,
                txn=(app, batch_id),
            )
        if post_batch is not None:
            post_batch(spark, batch_id)

    def _apply_reclaimed(batch: DataFrame, batch_id: int) -> None:
        # same per-batch block hygiene as run_available_now: the MERGE
        # (and any post_batch MV refresh) completes inside the batch,
        # so its localCheckpoint blocks are dead when it returns
        from aws_medallion_etl_spark._ckpt import reclaim_scope

        with reclaim_scope(batch.sparkSession.sparkContext):
            _apply(batch, batch_id)

    return (
        stream.writeStream.foreachBatch(_apply_reclaimed)
        .option("checkpointLocation", f"{path.rstrip('/')}/_stream_checkpoint")
        .trigger(availableNow=True)
        .start()
    )

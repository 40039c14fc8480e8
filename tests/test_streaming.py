"""Structured Streaming extension: stream results must match their
batch equivalents (the batch-parity contract), and state must be
watermark-bounded.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark import io, streaming

TS = datetime.datetime


@pytest.fixture()
def event_dir(spark, tmp_path):
    """Two parquet files of timestamped events (two future micro-batches)."""
    path = str(tmp_path / "events_in")
    rows1 = [
        (1, "u1", "click", TS(2024, 1, 1, 10, 5)),
        (2, "u1", "click", TS(2024, 1, 1, 10, 20)),
        (3, "u2", "view", TS(2024, 1, 1, 10, 40)),
    ]
    rows2 = [
        (4, "u2", "view", TS(2024, 1, 1, 11, 10)),
        (2, "u1", "click", TS(2024, 1, 1, 10, 20)),  # duplicate event_id
        (5, "u3", "click", TS(2024, 1, 1, 11, 55)),
    ]
    schema = "event_id long, user_id string, event_type string, ts timestamp"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(path)
    return path, spark.read.parquet(path).schema


def test_windowed_counts_matches_batch(spark, event_dir, tmp_path):
    path, schema = event_dir
    stream = streaming.stream_from_directory(spark, path, schema)
    assert stream.isStreaming
    agged = streaming.windowed_counts(
        stream, "ts", window_duration="1 hour", watermark="2 hours",
        extra_keys=["event_type"],
    )
    # extra_keys must appear exactly once — a duplicate-named schema
    # breaks the foreachBatch -> parquet sink bridge.
    assert sorted(agged.columns) == sorted(set(agged.columns))
    assert agged.columns.count("event_type") == 1
    streaming.to_memory_sink(agged, "win_counts", output_mode="complete")
    got = {
        (str(r.window_start), r.event_type): r.n
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.parquet(path)
    expect = {
        (str(r.ws), r.event_type): r.n
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == expect


def test_stream_dedup(spark, event_dir):
    path, schema = event_dir
    stream = streaming.stream_from_directory(spark, path, schema)
    deduped = streaming.stream_dedup(stream, ["event_id"], "ts", watermark="1 day")
    streaming.to_memory_sink(deduped, "dedup_out")
    ids = sorted(
        r.event_id for r in spark.sql("SELECT event_id FROM dedup_out").collect()
    )
    assert ids == [1, 2, 3, 4, 5]  # duplicate event_id=2 removed


def test_sessionize(spark, event_dir):
    path, schema = event_dir
    stream = streaming.stream_from_directory(spark, path, schema)
    sessions = streaming.sessionize(
        stream, "ts", gap="30 minutes", keys=["user_id"], watermark="1 day"
    )
    streaming.to_memory_sink(sessions, "sessions", output_mode="complete")
    got = {
        (r.user_id, str(r.session_start)): r.n_events
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    # u1: 10:05 + 10:20 + the duplicated 10:20 row merge (gap 15m, no dedup);
    # u2: 11:10 lands exactly on the 10:40+30m boundary -> sessions merge
    assert got[("u1", "2024-01-01 10:05:00")] == 3
    assert got[("u2", "2024-01-01 10:40:00")] == 2
    assert got[("u3", "2024-01-01 11:55:00")] == 1
    assert len(got) == 3


def test_foreach_batch_to_partitioned_sink(spark, event_dir, tmp_path):
    """Stream -> foreachBatch -> the batch engine's idempotent sink."""
    path, schema = event_dir
    out = str(tmp_path / "bronze_events")
    ckpt = str(tmp_path / "ckpt")
    stream = streaming.stream_from_directory(spark, path, schema)

    def write_batch(df, batch_id):
        enriched = df.withColumn("run_date", F.to_date("ts").cast("string"))
        io.write_parquet(enriched, out, partition_by=["run_date"], mode="append")

    streaming.run_available_now(stream, write_batch, ckpt)
    written = spark.read.parquet(out)
    assert written.count() == 6
    assert str(written.select("run_date").distinct().collect()[0].run_date) == "2024-01-01"
    # restart with same checkpoint: nothing new to process, no duplicates
    stream2 = streaming.stream_from_directory(spark, path, schema)
    streaming.run_available_now(stream2, write_batch, ckpt)
    assert spark.read.parquet(out).count() == 6


def test_running_totals_state_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches and the
    final emission per key equals the batch aggregate."""
    path = str(tmp_path / "vals_in")
    schema = "k string, v double"
    spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], schema
    ).coalesce(1).write.mode("append").parquet(path)
    spark.createDataFrame(
        [("a", 4.0), ("b", 5.0)], schema
    ).coalesce(1).write.mode("append").parquet(path)

    stream = streaming.stream_from_directory(
        spark, path, spark.read.parquet(path).schema, max_files_per_trigger=1
    )
    out = streaming.running_totals(stream, ["k"], "v")
    streaming.to_memory_sink(out, "rt_sink", output_mode="update")
    rows = spark.sql("SELECT * FROM rt_sink").collect()

    # multiple emissions per key prove state persisted across batches
    per_key = {}
    for r in rows:
        per_key.setdefault(r.k, []).append((r.n_events, r.total_value))
    assert any(len(v) > 1 for v in per_key.values())
    finals = {k: max(v) for k, v in per_key.items()}  # running => max is last
    assert finals == {"a": (3, 7.0), "b": (2, 15.0)}


def test_enrich_stream_is_stateless_broadcast(spark, event_dir):
    """Stream-static join: no streaming state, dim broadcast."""
    from aws_medallion_etl_spark import streaming

    path, schema = event_dir
    stream = streaming.stream_from_directory(spark, path, schema)
    dim = spark.createDataFrame(
        [("u1", "gold"), ("u2", "silver")], "k string, seg string"
    )
    joined = streaming.enrich_stream(stream, dim, stream["user_id"] == dim["k"])
    streaming.to_memory_sink(joined, "t_enrich", output_mode="append")
    got = spark.table("t_enrich")
    batch = spark.read.parquet(path)
    expect = batch.join(dim, batch["user_id"] == dim["k"]).count()
    assert got.count() == expect
    # left-out user u3 contributes nothing on an inner join
    assert got.where(F.col("user_id") == "u3").count() == 0


def test_interval_join_bounds_and_emission(spark, tmp_path):
    """Planted pairs: only clicks strictly inside (v_ts, v_ts+1h] join;
    a boundary click at exactly +1h joins, at +1h1s does not."""
    import datetime

    from aws_medallion_etl_spark import streaming

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def mk(rows, name, cols):
        p = str(tmp_path / name)
        spark.createDataFrame(rows, cols).write.parquet(p)
        return p

    vdir = mk([(1, base), (2, base)], "views", "user_id long, v_ts timestamp")
    cdir = mk(
        [
            (1, base + datetime.timedelta(minutes=30)),   # in window
            (1, base + datetime.timedelta(hours=1)),      # boundary: joins
            (1, base + datetime.timedelta(hours=1, seconds=1)),  # out
            (2, base),                                    # not strictly after
            (3, base + datetime.timedelta(minutes=5)),    # no view user
        ],
        "clicks", "user_id long, c_ts timestamp",
    )
    views = spark.readStream.schema("user_id long, v_ts timestamp").parquet(vdir)
    clicks = spark.readStream.schema("user_id long, c_ts timestamp").parquet(cdir)
    pairs = streaming.interval_join(
        views, clicks, "user_id", "v_ts", "c_ts", "1 HOUR", watermark="1 day"
    ).select(views["user_id"].alias("user_id"), "c_ts")
    streaming.to_memory_sink(pairs, "t_pairs", output_mode="append")
    got = [(r["user_id"],) for r in spark.table("t_pairs").collect()]
    assert sorted(got) == [(1,), (1,)]


def test_watermark_drops_late_rows_and_bounds_state(spark, tmp_path):
    """An event arriving after the watermark has passed its window is
    DROPPED — the bounded-state contract that makes streaming
    aggregation safe at unbounded throughput. Batch order is forced by
    writing the late file only after the first batch commits."""
    path = str(tmp_path / "late_in")
    schema = "event_id long, ts timestamp"
    spark.createDataFrame(
        [(1, TS(2024, 1, 1, 10, 0)), (2, TS(2024, 1, 1, 10, 2)),
         (3, TS(2024, 1, 1, 11, 0))],
        schema,
    ).coalesce(1).write.mode("append").parquet(path)
    stream = streaming.stream_from_directory(
        spark, path, spark.read.parquet(path).schema
    )
    agged = streaming.windowed_counts(
        stream, "ts", window_duration="10 minutes", watermark="10 minutes"
    )
    q = (
        agged.writeStream.format("memory").queryName("late_counts")
        .outputMode("append").start()
    )
    try:
        # batch 1: only file 1 -> max event time 11:00, watermark 10:50
        q.processAllAvailable()
        spark.createDataFrame(
            [(4, TS(2024, 1, 1, 10, 5)),   # LATE: watermark is already 10:50
             (5, TS(2024, 1, 1, 11, 30))],
            schema,
        ).coalesce(1).write.mode("append").parquet(path)
        # batch 2 sees the advanced watermark and must drop event 4
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        str(r.window_start): r.n
        for r in spark.sql("SELECT * FROM late_counts").collect()
    }
    # the 10:00 window finalized with 2 rows: event 4 was dropped
    assert got.get("2024-01-01 10:00:00") == 2
    assert "2024-01-01 10:05:00" not in str(got)

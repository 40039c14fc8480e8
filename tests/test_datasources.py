"""Custom Python DataSource tests (datasources.py)."""

from __future__ import annotations

from aws_medallion_etl_spark import datasources


def test_synthetic_docs_partitioned_and_deterministic(spark):
    datasources.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 37)
        .option("num_partitions", 3)
        .load()
    )
    rows = sorted((r.doc_id, r.text, r.n_chars) for r in df.collect())
    assert len(rows) == 37
    assert rows[0] == (0, "w0 w3 w6 w9 w12", 15)
    # every row reproducible from the pure function
    for doc_id, text, n_chars in rows:
        assert text == datasources._doc_text(doc_id)
        assert n_chars == len(text)
    # re-read yields the identical relation (no per-run state)
    again = sorted(
        (r.doc_id, r.text, r.n_chars)
        for r in spark.read.format("synthetic_docs")
        .option("n_docs", 37).option("num_partitions", 5).load().collect()
    )
    assert again == rows  # partition count must not change content


def test_synthetic_docs_ceil_partitioning():
    # 10 docs over 4 partitions -> ranges cover exactly [0, 10)
    r = datasources.SyntheticDocsReader({"n_docs": 10, "num_partitions": 4})
    spans = [(p.start, p.end) for p in r.partitions()]
    covered = sorted(x for s, e in spans for x in range(s, e))
    assert covered == list(range(10))


def test_synthetic_docs_empty_relation(spark):
    datasources.register(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 0)
        .load()
    )
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "text", "n_chars"]


# ---------------------------------------------------------------------------
# Snapshot-append streaming source
# ---------------------------------------------------------------------------

def _mk_table(spark, tmp_path, name):
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / name)
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    return path


def _drain(r, start, end=None):
    """Plan + read a partitioned stream reader between offsets — the
    harness's microbatch loop, minus Spark."""
    end = end if end is not None else r.latestOffset()
    rows = []
    for p in r.partitions(start, end):
        rows.extend(r.read(p))
    return rows, end


def test_snapshot_stream_reader_offsets_and_replay(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = _mk_table(spark, tmp_path, "tail1")
    ins = spark.range(100, 110).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    sn.merge_into(spark, path, ins, on=["k"], when_matched=None)

    r = datasources.SnapshotAppendStreamReader({"path": path})
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 1}
    # the round-10 promotion: planning returns one partition per NEW
    # data file — a multi-file table yields a multi-partition batch
    # that executors scan in parallel, nothing flows driver-side
    parts = r.partitions({"version": -1}, {"version": 1})
    assert len(parts) > 1
    rows, off = _drain(r, {"version": -1})
    assert off == {"version": 1} and len(rows) == 30
    assert {t[0] for t in rows} == set(range(20)) | set(range(100, 110))
    # caught-up planning yields no partitions (start == end)
    assert r.partitions(off, off) == []
    # replay between offsets is exact (checkpoint recovery path:
    # partitions() re-planned from the same offsets)
    replay, _ = _drain(r, {"version": 0}, {"version": 1})
    assert {t[0] for t in replay} == set(range(100, 110))


def test_snapshot_stream_refuses_rewrites_unless_ignored(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    # single data file so the cow rewrite's survivor count is pinned
    path = str(tmp_path / "tail2")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    # a cow delete rewrites a streamed file -> append stream must refuse
    sn.delete_where(spark, path, "k = 3", mode="cow")
    r = datasources.SnapshotAppendStreamReader({"path": path})
    with pytest.raises(ValueError, match="ignore_changes"):
        r.partitions({"version": -1}, r.latestOffset())
    # explicit opt-out skips the rewritten file (Delta ignoreChanges)
    r2 = datasources.SnapshotAppendStreamReader(
        {"path": path, "ignore_changes": "true"}
    )
    rows, off = _drain(r2, {"version": -1})
    assert off == {"version": 1}
    # Delta's documented ignoreChanges caveat holds here too: the cow
    # rewrite's output file is NEW to the stream, so surviving rows
    # re-emit as duplicates (20 original + 19 rewritten; k=3 only once)
    assert len(rows) == 39
    assert sum(1 for t in rows if t[0] == 3) == 1


def test_snapshot_stream_end_to_end_picks_up_live_commit(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = _mk_table(spark, tmp_path, "tail3")
    datasources.register_streaming(spark)
    stream = (
        spark.readStream.format("snapshot_append")
        .option("path", path).load()
    )
    q = (stream.writeStream.format("memory")
         .queryName("tail3_sink").outputMode("append").start())
    try:
        q.processAllAvailable()
        assert spark.table("tail3_sink").count() == 20
        ins = spark.range(500, 505).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        sn.merge_into(spark, path, ins, on=["k"], when_matched=None)
        q.processAllAvailable()
        got = {r["k"] for r in spark.table("tail3_sink").collect()}
        assert got == set(range(20)) | set(range(500, 505))
    finally:
        q.stop()


def test_snapshot_cdf_stream_per_commit_changes(spark, tmp_path):
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "cdfs")
    df = spark.createDataFrame(
        [(k, k * 10) for k in range(20)], ["k", "v"]
    )
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    r = datasources.SnapshotCDFStreamReader(
        {"path": path, "key_cols": "k"}
    )
    # CDF attaches at the CURRENT version — history is not replayed
    assert r.initialOffset() == {"version": 0}
    # v1: update 3, insert 100; v2: mor-delete 5
    sn.merge_into(
        spark, path,
        spark.createDataFrame([(3, -3), (100, 1000)], ["k", "v"]),
        on=["k"],
    )
    sn.delete_where(spark, path, "k = 5", mode="mor")
    rows, off = _drain(r, {"version": 0})
    rows = sorted(rows)
    assert off == {"version": 2}
    assert rows == sorted([
        (3, 30, "update_preimage", 1), (3, -3, "update_postimage", 1),
        (100, 1000, "insert", 1), (5, 50, "delete", 2),
    ])
    # replay between offsets reproduces exactly (checkpoint recovery:
    # partitions() re-planned from the committed offsets)
    again, _ = _drain(r, {"version": 0}, {"version": 2})
    assert sorted(again) == rows
    # key-hash sub-partitioning (diff_partitions > 1) splits each
    # version step across executor tasks and reassembles the SAME diff
    rb = datasources.SnapshotCDFStreamReader(
        {"path": path, "key_cols": "k", "diff_partitions": 3}
    )
    parts = rb.partitions({"version": 0}, {"version": 2})
    assert len(parts) == 6  # 2 version steps x 3 key buckets
    bucketed, _ = _drain(rb, {"version": 0}, {"version": 2})
    assert sorted(bucketed) == rows
    # an insert-then-delete across commits appears in BOTH feeds
    sn.merge_into(
        spark, path, spark.createDataFrame([(200, 1)], ["k", "v"]),
        on=["k"], when_matched=None,
    )
    sn.delete_where(spark, path, "k = 200", mode="cow")
    step, off2 = _drain(r, off)
    step = sorted(step)
    assert off2 == {"version": 4}
    assert step == sorted([(200, 1, "insert", 3), (200, 1, "delete", 4)])
    # missing key_cols option is an explicit error
    import pytest

    with pytest.raises(ValueError, match="key_cols"):
        datasources.SnapshotCDFStreamReader({"path": path})


def test_snapshot_cdf_refuses_vacuumed_offset(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "cdfvac")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    for i in range(3):
        sn.merge_into(
            spark, path,
            spark.createDataFrame([(100 + i, i)], ["k", "v"]),
            on=["k"], when_matched=None,
        )
    sn.vacuum(path, keep_versions=1, retention_seconds=0)
    r = datasources.SnapshotCDFStreamReader({"path": path, "key_cols": "k"})
    # an offset pointing at a pruned manifest must raise, never skip
    with pytest.raises(ValueError, match="no longer retained"):
        r.partitions({"version": 0}, r.latestOffset())
    # the retained frontier still streams (caught up -> no partitions)
    assert r.partitions({"version": 3}, {"version": 3}) == []


def test_snapshot_cdf_stream_nan_rows_not_phantom_updates(spark, tmp_path):
    """Round-10 advice: batch CDF compares with eqNullSafe (NaN==NaN);
    the stream diff must agree — a NaN value column in a touched file
    must NOT emit phantom update pre/post pairs for untouched rows."""
    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "cdfnan")
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 20.0)], ["k", "v"]
    ).coalesce(1)
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    r = datasources.SnapshotCDFStreamReader({"path": path, "key_cols": "k"})
    # COW-update row k=2 in the single file that also holds the NaN row
    sn.merge_into(
        spark, path, spark.createDataFrame([(2, 22.0)], ["k", "v"]),
        on=["k"],
    )
    rows, off = _drain(r, {"version": 0})
    assert off == {"version": 1}
    kinds = sorted((t[0], t[2]) for t in rows)
    # only k=2 changed; the NaN row k=1 must not appear at all
    assert kinds == [(2, "update_postimage"), (2, "update_preimage")]


def test_snapshot_cdf_stream_continuous_across_rename(spark, tmp_path):
    """The streaming CDF reads both diff sides under the end-manifest
    PHYSICAL names, so a rename between commits never produces phantom
    changes — only genuinely updated rows emit (batch parity)."""
    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "cdfren2")
    sn.snapshot_create(
        spark,
        spark.createDataFrame([(1, 10), (2, 20)], ["k", "a"]).coalesce(1),
        path, stats_cols=["k"],
    )
    r = datasources.SnapshotCDFStreamReader({"path": path, "key_cols": "k"})
    sn.rename_column(path, "a", "b")  # v1: manifest-only
    sn.merge_into(                    # v2: update k=2 under the new name
        spark, path, spark.createDataFrame([(2, 22)], ["k", "b"]),
        on=["k"],
    )
    rows, off = _drain(r, {"version": 0})
    assert off == {"version": 2}
    assert sorted(rows) == [
        (2, 20, "update_preimage", 2), (2, 22, "update_postimage", 2),
    ]


def test_snapshot_stream_rate_limit_bounds_each_batch(spark, tmp_path):
    """max_versions_per_trigger drains a long history in bounded
    micro-batches (Delta's maxFilesPerTrigger analogue), totals equal
    the unbounded drain, and replay windows stay exact."""
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "rate")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).coalesce(1)
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    for i in range(1, 6):  # versions 1..5, 10 new rows each
        ins = spark.range(i * 100, i * 100 + 10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).coalesce(1)
        sn.merge_into(spark, path, ins, on=["k"], when_matched=None)
    r = datasources.SnapshotAppendStreamReader(
        {"path": path, "max_versions_per_trigger": "2"}
    )
    start = r.initialOffset()
    batches = []
    while True:
        end = r.latestOffset()
        if end == start:
            break
        rows, _ = _drain(r, start, end)
        batches.append((start["version"], end["version"], len(rows)))
        start = end
    # 6 committed versions (0..5) drain as 2+2+2
    assert [(-1, 1), (1, 3), (3, 5)] == [(a, b) for a, b, _ in batches]
    assert sum(n for _, _, n in batches) == 60
    # unbounded reader sees the same total in ONE batch
    r2 = datasources.SnapshotAppendStreamReader({"path": path})
    rows, off = _drain(r2, r2.initialOffset())
    assert off == {"version": 5} and len(rows) == 60


def test_snapshot_timestamp_time_travel_and_vacuum_dry_run(spark, tmp_path):
    import os
    import time

    import pytest

    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "ts")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    sn.snapshot_create(spark, df, path, stats_cols=["k"])
    t_after_v0 = time.time()
    # keep commit mtimes strictly ordered around the probe instant
    time.sleep(0.05)
    sn.delete_where(spark, path, "k >= 20", mode="cow")
    # TIMESTAMP AS OF: the probe instant pins v0, now() pins v1
    assert sn.version_at_timestamp(path, t_after_v0) == 0
    assert sn.snapshot_read(spark, path, timestamp=t_after_v0).count() == 30
    assert sn.snapshot_read(spark, path, timestamp=time.time()).count() == 20
    with pytest.raises(ValueError, match="no commit at or before"):
        sn.version_at_timestamp(path, t_after_v0 - 3600)
    with pytest.raises(ValueError, match="not both"):
        sn.snapshot_read(spark, path, version=0, timestamp=t_after_v0)
    # VACUUM DRY RUN: reports exactly what the real run then removes,
    # and removes NOTHING itself
    before = sorted(
        os.path.join(dp, n)
        for dp, _, ns in os.walk(path) for n in ns
    )
    rep = sn.vacuum(path, keep_versions=1, retention_seconds=0, dry_run=True)
    assert rep["dry_run"] and rep["removed_files"] > 0
    assert len(rep["would_remove"]) > 0
    after = sorted(
        os.path.join(dp, n)
        for dp, _, ns in os.walk(path) for n in ns
    )
    assert before == after, "dry run must not delete"
    assert sn.snapshot_read(spark, path, version=0).count() == 30
    real = sn.vacuum(path, keep_versions=1, retention_seconds=0)
    assert real["removed_files"] == rep["removed_files"]
    gone = set(before) - set(
        os.path.join(dp, n) for dp, _, ns in os.walk(path) for n in ns
    )
    would = {os.path.join(path, p) for p in rep["would_remove"]}
    assert would <= gone  # the real sweep also drops pruned manifests
    assert sn.snapshot_read(spark, path).count() == 20  # live intact
    with pytest.raises(ValueError, match="no version"):
        sn.snapshot_read(spark, path, version=0)


def test_snapshot_cdf_stream_rate_limit(spark, tmp_path):
    """CDF admission control: each micro-batch diffs a bounded version
    span; totals equal the unbounded drain."""
    from pyspark.sql import functions as F

    from aws_medallion_etl_spark import snapshot as sn

    path = str(tmp_path / "cdfrate")
    sn.snapshot_create(
        spark,
        spark.createDataFrame([(k, k) for k in range(10)], ["k", "v"]),
        path, stats_cols=["k"],
    )
    r = datasources.SnapshotCDFStreamReader(
        {"path": path, "key_cols": "k", "max_versions_per_trigger": "1"}
    )
    start = r.initialOffset()
    for i in range(1, 4):  # v1..v3: one update each
        sn.merge_into(
            spark, path,
            spark.createDataFrame([(i, -i)], ["k", "v"]), on=["k"],
        )
    batches = []
    while True:
        end = r.latestOffset()
        if end == start:
            break
        rows, _ = _drain(r, start, end)
        batches.append((start["version"], end["version"], len(rows)))
        start = end
    assert [(a, b) for a, b, _ in batches] == [(0, 1), (1, 2), (2, 3)]
    # each update emits a pre+post image pair
    assert all(n == 2 for _, _, n in batches)

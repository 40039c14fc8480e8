"""Physical-plan assertions: the properties that make queries survive
a 100 TB scale-up. These pin the *plan shape*, not timings — a
regression here (lost pushdown, a broadcast turning into a shuffle, a
second exchange sneaking into a window chain) is a scale bug even
when sf0.01 timings look fine.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import dedup, enrich, kpi


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark, sf_dir):
    """Predicate + column pruning must reach the parquet scan."""
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_quantity")
    )
    plan = _physical(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan
    # scan must read only the two projected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_dim_join_is_broadcast_not_shuffle(spark, sf_dir):
    """enrich_left on a dim: BroadcastHashJoin, zero Exchange of the fact."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    out = enrich.enrich_left(orders, dim, on=orders["o_custkey"] == dim["c_custkey"])
    plan = _physical(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the fact side must not be hash-repartitioned for this join
    assert "hashpartitioning(o_custkey" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    """orderBy().limit(k) must compile to TakeOrderedAndProject, not a
    global sort."""
    out = kpi.top_k(spark.read.parquet(f"{sf_dir}/orders.parquet"), ["o_custkey"], 10)
    plan = _physical(out)
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.split("TakeOrderedAndProject")[0]


def test_aggregate_has_partial_stage(spark, sf_dir):
    """groupBy aggregates must map-side combine (partial_ functions)."""
    out = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
    )
    plan = _physical(out)
    assert "partial_count" in plan and "partial_sum" in plan


def test_dedup_max_by_partial_aggregation(spark, sf_dir):
    """The scale dedup path must partially aggregate before the shuffle
    (the whole point of preferring it over the window strategy)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = dedup.dedup_max_by(li, ["l_orderkey"], ["l_shipdate", "l_linenumber"])
    plan = _physical(out)
    assert "partial_max_by" in plan


def test_window_dedup_single_exchange(spark, sf_dir):
    """Window dedup: exactly one hash exchange (on the partition key)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = dedup.dedup_by_key(li, ["l_orderkey"], [F.desc("l_shipdate")])
    plan = _physical(out)
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_from_history_exchange_count(spark, sf_dir):
    """The SCD2 initial load shares partitioning across its window/agg
    steps: lag + version-sum reuse one exchange on nk; the groupBy on
    (nk, __version) and the lead() chain add at most two more. Pinning
    the count catches accidental extra shuffles."""
    from aws_medallion_etl_spark.operators import scd

    hist = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("user_id"),
        F.col("l_returnflag").alias("event_type"),
        F.col("l_shipdate").alias("ts"),
    )
    out = scd.scd2_from_history(hist, ["user_id"], ["event_type"], "ts")
    plan = _physical(out)
    assert plan.count("Exchange hashpartitioning") <= 3


def test_semi_join_no_duplicate_columns(spark, sf_dir):
    """Referential filter keeps the probe schema — no ref columns leak."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = enrich.referential_filter(
        li, orders, on=li["l_orderkey"] == orders["o_orderkey"]
    )
    assert out.columns == li.columns
    assert "LeftSemi" in _physical(out)


def test_partition_pruning_on_run_date(spark, tmp_path):
    """Filtering the partition column must prune at planning time."""
    out = str(tmp_path / "pp")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3) for i in range(10)],
        "v int, run_date string",
    )
    df.write.partitionBy("run_date").parquet(out)
    scan = spark.read.parquet(out).filter(F.col("run_date") == "2024-01-02")
    plan = _physical(scan)
    # the run_date predicate must become a planning-time partition filter,
    # NOT a row-level Filter after the scan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "run_date" in pf
    assert "PushedFilters: []" in plan  # nothing left to push row-level
    assert scan.count() == 10


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join with ZERO exchanges —
    the write-time shuffle is amortized over every later join."""
    from aws_medallion_etl_spark import io

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    io.write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    io.write_bucketed(cust, "b_customer", ["c_custkey"], num_buckets=8)
    try:
        # disable broadcast so only bucketing can avoid the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _physical(joined)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_whole_stage_codegen_covers_validation(spark, sf_dir):
    """The validation when-chain must stay inside WholeStageCodegen."""
    from aws_medallion_etl_spark.operators import validate
    from aws_medallion_etl_spark.queries import lineitem_rules

    tagged = validate.tag_rejects(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"), lineitem_rules()
    )
    # '*(n)' prefixes mark whole-stage-codegen stages in the plan string
    assert "*(1)" in _physical(tagged)


def test_levenshtein_pairs_no_cartesian(spark, sf_dir):
    """Blocked fuzzy match must be an equi-join on the block key —
    never a cross/nested-loop product of the name sets."""
    from aws_medallion_etl_spark.operators import fuzzy

    out = fuzzy.levenshtein_pairs(
        spark.read.parquet(f"{sf_dir}/part.parquet"), "p_name", 3
    )
    plan = _physical(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd1_upsert_partial_aggregation(spark, sf_dir):
    """CDC upsert must map-side combine (partial_max_by), so the
    shuffle carries candidates, not snapshot + feed."""
    from aws_medallion_etl_spark.operators import scd

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    feed = orders.limit(100)
    out = scd.scd1_upsert(orders, feed, ["o_orderkey"], ["o_orderdate"])
    plan = _physical(out)
    assert "partial_max_by" in plan


def test_tfidf_broadcasts_scalar_and_vocab_sides(spark, sf_dir):
    """The corpus-size (1-row) join must broadcast; no plan node may
    collect to the driver."""
    from aws_medallion_etl_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.tfidf(docs, "doc_id", "text")
    plan = _physical(out)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CollectLimit" not in plan


def test_vocabulary_partial_aggregation(spark, sf_dir):
    from aws_medallion_etl_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = _physical(corpus.vocabulary(docs, "text"))
    assert "partial_count" in plan


def test_hash_split_and_sample_are_shuffle_free(spark, sf_dir):
    """Split/sample membership is a pure projection/filter — zero
    exchanges at any scale."""
    from aws_medallion_etl_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split_plan = _physical(corpus.hash_split(docs, "doc_id"))
    sample_plan = _physical(
        corpus.stratified_sample(docs, "lang", "doc_id", {"en": 0.5}, 0.1)
    )
    assert "Exchange" not in split_plan
    assert "Exchange" not in sample_plan


def test_ivf_index_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The materialized IVF layout must turn a probe into static
    partition pruning: the cells scan reads ONLY the probed
    ``__cid=`` directories, never the rest of the corpus."""
    from aws_medallion_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx,
                               n_centroids=8, iters=1)
    q = emb.filter("vec_id = 0")
    out = similarity.cosine_topk_ivf_indexed(
        spark, idx, q, "vec_id", "embedding", k=5, nprobe=2,
    )
    import re

    plan = _physical(out)
    # the cells scan is the only FileScan carrying the stored vector
    # column __cv; the path itself may be truncated out of the line
    scan_lines = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "__cv" in ln
    ]
    assert scan_lines, "expected a FileScan over the cells layout"
    m = re.search(r"PartitionFilters: \[__cid#\d+ IN \(([\d,]+)\)", scan_lines[0])
    assert m, f"cells scan carries no static __cid partition filter: {scan_lines[0]}"
    # one query probing 2 of 8 cells -> exactly 2 cell ids in the filter
    assert len(m.group(1).split(",")) == 2


def test_incremental_dedup_no_cartesian_and_partial_agg(spark, sf_dir):
    """Cross-side candidate generation must stay a blocking equi-join
    on the shingle — never an all-pairs product — and the intersection
    count must partially aggregate map-side."""
    from aws_medallion_etl_spark.operators import fuzzy

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = fuzzy.dedup_against_corpus(
        docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0"),
        "doc_id", "text", n=3, threshold=0.8,
    )
    plan = _physical(kept)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_ngram_repetition_partial_agg_and_doc_partitioned_window(spark, sf_dir):
    """(doc, ngram) counts combine map-side; the top-1 window is
    partitioned by doc id — no single-partition global window."""
    from aws_medallion_etl_spark.operators import text as text_ops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text_ops.ngram_repetition_scores(docs, "doc_id", "text", n=2)
    plan = _physical(out)
    assert "partial_count" in plan
    # a Window with an empty partition spec logs/plans a global sort;
    # partitioned windows hash-partition on the key instead
    assert "hashpartitioning(doc_id" in plan


def test_write_sorted_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Range-sorted layout: each parquet file covers a disjoint range
    of the sort key (the property row-group pruning relies on), and
    compact() preserves rows while cutting the file count."""
    import glob as _glob

    import pyarrow.parquet as pq

    from aws_medallion_etl_spark import io as eio

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "sorted")
    eio.write_sorted(orders, out, ["o_totalprice"], target_files=4)
    ranges = []
    for f in _glob.glob(f"{out}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        if md.num_row_groups == 0:
            continue  # range partitioning may emit an empty partition
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "o_totalprice"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert 2 <= len(ranges) <= 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (touching boundaries allowed)

    n_before = spark.read.parquet(out).count()
    eio.compact(spark, out, target_files=1)
    files_after = _glob.glob(f"{out}/*.parquet")
    assert len(files_after) == 1
    assert spark.read.parquet(out).count() == n_before


def test_compact_recovers_from_crashed_swap(spark, sf_dir, tmp_path):
    """compact() must not destroy data when rerun after a crash that
    landed between its two renames (path moved to .compact_old, tmp
    not yet promoted): the rerun restores the original and completes
    the compaction instead of rmtree-ing the only surviving copies."""
    import glob as _glob
    import shutil

    from aws_medallion_etl_spark import io as eio

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    out = str(tmp_path / "ds")
    region.repartition(4).write.parquet(out)
    n = spark.read.parquet(out).count()

    # simulate the crash window: tmp fully written, path renamed away,
    # promotion never happened
    shutil.copytree(out, out + ".compact_tmp")
    shutil.move(out, out + ".compact_old")
    assert not _glob.glob(out)

    eio.compact(spark, out, target_files=1)
    assert spark.read.parquet(out).count() == n
    assert len(_glob.glob(f"{out}/*.parquet")) == 1
    # staging dirs cleaned up after the successful swap
    assert not _glob.glob(out + ".compact_old")
    assert not _glob.glob(out + ".compact_tmp")


def test_compact_verify_passes_clean_and_refuses_corrupt(spark, sf_dir, tmp_path, monkeypatch):
    """verify=True: a clean rewrite (even partitioned, with reordered
    read-back columns) swaps; a rewrite that loses rows refuses the
    swap and leaves the original untouched."""
    import glob as _glob

    import pytest as _pytest

    from aws_medallion_etl_spark import io as eio

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "ds")
    nation.repartition(8).write.partitionBy("n_regionkey").parquet(out)
    n = spark.read.parquet(out).count()

    eio.compact(spark, out, target_files=1, partition_by=["n_regionkey"],
                verify=True)
    assert spark.read.parquet(out).count() == n
    assert not _glob.glob(out + ".compact_tmp")

    # sabotage the rewrite: drop a row during the staged write
    real_write = eio.write_parquet

    def lossy_write(df, path, **kw):
        real_write(df.where(F.col("n_nationkey") != 0), path, **kw)

    monkeypatch.setattr(eio, "write_parquet", lossy_write)
    with _pytest.raises(RuntimeError, match="does not match the original"):
        eio.compact(spark, out, target_files=1, partition_by=["n_regionkey"],
                    verify=True)
    assert spark.read.parquet(out).count() == n  # original intact
    assert not _glob.glob(out + ".compact_tmp")  # staging cleaned

    with _pytest.raises(ValueError, match="only valid without transform"):
        eio.compact(spark, out, target_files=1, transform=lambda d: d,
                    verify=True)


def test_compact_verify_survives_retyping_partition_values(spark, tmp_path):
    """Compacting a previously-UNPARTITIONED dataset into a partition
    column of zero-padded numeric strings must verify clean: partition
    -value inference would re-type '0123' as int 123 on the staged
    side and spuriously refuse a correct rewrite — the verify compare
    reads the staged side with the original schema instead."""
    from aws_medallion_etl_spark import io as eio

    df = spark.createDataFrame(
        [(i, f"{i % 3:04d}") for i in range(30)], "id long, bucket string"
    )
    out = str(tmp_path / "ds")
    df.repartition(4).write.parquet(out)
    eio.compact(spark, out, target_files=1, partition_by=["bucket"],
                verify=True)  # must not refuse the correct rewrite
    # a reader that pins the schema (as the verify does) still sees the
    # zero-padded strings; a schema-less read of the NEW layout infers
    # int partition values — a documented property of partitioning by
    # numeric-looking strings, not a compaction defect
    back = spark.read.schema(df.schema).parquet(out)
    assert back.count() == 30
    assert {r["bucket"] for r in back.select("bucket").distinct().collect()} == {
        "0000", "0001", "0002"
    }


def test_lsh_candidate_dedup_carries_no_vectors(spark, sf_dir):
    """The LSH candidate-dedup exchanges must move bare id pairs, not
    dim-64 double arrays: the collision dedup is a distinct over
    (id_a, id_b) / (query_id, neighbor_id), and vectors join back from
    keyed frames afterwards. A first(vector) aggregate in the plan
    means the wide columns are riding the multiplied shuffle again."""
    from aws_medallion_etl_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = similarity.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.9, method="lsh"
    )
    plan = _physical(pairs)
    assert "first(__va" not in plan and "first(__vb" not in plan

    topk = similarity.cosine_topk_lsh(
        emb, emb.limit(4), "vec_id", "embedding", k=3
    )
    plan_topk = _physical(topk)
    assert "first(__cv" not in plan_topk


def test_file_skipping_prunes_files(spark, sf_dir, tmp_path):
    """The stats manifest hands Spark only overlapping files: a narrow
    range on the sorted key reads a strict subset, the result matches
    the full scan, and a disjoint range reads zero files (empty frame
    with the table's schema)."""
    from aws_medallion_etl_spark import io as eio

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "skip")
    eio.write_sorted(orders, out, ["o_totalprice"], target_files=8)
    eio.build_file_stats_index(out, ["o_totalprice"])
    total_files = len(spark.read.parquet(out).inputFiles())
    sliced = eio.pruned_read(spark, out, {"o_totalprice": (1000.0, 20000.0)})
    assert 0 < len(sliced.inputFiles()) < total_files
    expect = orders.where(F.col("o_totalprice").between(1000.0, 20000.0))
    assert sliced.count() == expect.count()
    none = eio.pruned_read(spark, out, {"o_totalprice": (-50.0, -1.0)})
    assert none.count() == 0
    assert none.columns == orders.columns
    # a column the manifest doesn't know about never over-prunes
    other = eio.pruned_read(spark, out, {"o_custkey": (0, 10)})
    assert other.count() == orders.where(F.col("o_custkey").between(0, 10)).count()


def test_file_skipping_manifest_missing_falls_back(spark, sf_dir, tmp_path):
    from aws_medallion_etl_spark import io as eio

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "noman")
    eio.write_sorted(orders, out, ["o_totalprice"], target_files=4)
    got = eio.pruned_read(spark, out, {"o_totalprice": (1000.0, 20000.0)})
    assert got.count() == orders.where(
        F.col("o_totalprice").between(1000.0, 20000.0)
    ).count()


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The Morton layout keeps file min/max tight in BOTH columns: a
    range predicate on either dimension alone skips files, where the
    linear sort skips only on its leading key."""
    from aws_medallion_etl_spark import io as eio

    grid = spark.range(40_000).select(
        (F.col("id") % 200).alias("x"),
        F.floor(F.col("id") / 200).alias("y"),
    )
    pz = str(tmp_path / "z")
    pl = str(tmp_path / "lin")
    eio.write_zorder(grid, pz, ["x", "y"], target_files=16)
    eio.write_sorted(grid, pl, ["x", "y"], target_files=16)
    for p in (pz, pl):
        eio.build_file_stats_index(p, ["x", "y"])
    n_z = len(spark.read.parquet(pz).inputFiles())
    n_l = len(spark.read.parquet(pl).inputFiles())

    def files(p, col):
        return len(eio.pruned_read(spark, p, {col: (10, 20)}).inputFiles())

    # z-order: strict pruning on each dimension independently
    assert files(pz, "x") < n_z
    assert files(pz, "y") < n_z
    # linear: leading key prunes, trailing key cannot
    assert files(pl, "x") < n_l
    assert files(pl, "y") == n_l
    # and the answers agree with the raw frame either way
    for p in (pz, pl):
        got = eio.pruned_read(spark, p, {"y": (10, 20)}).count()
        assert got == grid.where(F.col("y").between(10, 20)).count()


def test_runtime_bloom_filter_injects_on_selective_join(spark, sf_dir):
    """Spark's runtime bloom-filter join pruning (on by default, gated
    on a 10 GB application-side scan in production) injects a
    might_contain filter on the fact side when the dim side is
    selectively filtered and the join must shuffle. Thresholds are
    lowered here so the local-scale plan exercises the same path a
    100 TB scan takes for free."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_totalprice") > 500000
        )
        joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom" in plan.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_shuffle_shards_single_exchange(spark, sf_dir):
    """Both windows (position row_number, per-shard count) reuse ONE
    hash exchange on the shard id — the plan a 100 TB shuffle-shard
    assignment needs."""
    from aws_medallion_etl_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.shuffle_shards(docs, "doc_id", n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan


def test_gapfill_no_cartesian_no_global_partition(spark, sf_dir):
    """Per-key calendars join back with a hash equi-join — never a
    cartesian/nested-loop against a global calendar, never a
    single-partition window."""
    from aws_medallion_etl_spark.queries import QUERIES

    df = QUERIES["ts_gapfill_interp"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "NestedLoop" not in plan
    assert "SinglePartition" not in plan


def test_chunk_dedup_two_chunk_sized_exchanges(spark, sf_dir):
    """Chunk dedup = exactly two hash exchanges (keep-first window on
    the chunk digest, reassembly agg on the doc id); nothing global."""
    from aws_medallion_etl_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = corpus.dedup_chunks(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    assert "SinglePartition" not in plan


def test_orc_scan_pushes_filters(spark, tmp_path):
    """The ORC path keeps parquet's pushdown story: a filtered read
    shows PushedFilters at the scan."""
    from aws_medallion_etl_spark import io as eio

    p = str(tmp_path / "orc")
    src = spark.range(1000).withColumn("v", F.col("id") * 2)
    eio.write_orc(src, p)
    scan = eio.read_orc(spark, p).where(F.col("id") > 990).select("v")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,990)]" in plan \
        or "GreaterThan(id,990)" in plan
    assert scan.count() == 9


def test_aqe_splits_skewed_join_partition(spark):
    """The session's AQE skew-join handling (on by default) splits a
    hot partition at runtime: the final adaptive plan marks the join
    ``skew=true`` with a skewed AQEShuffleRead. Thresholds are lowered
    so local data crosses the gate — the same path a genuinely skewed
    100 TB key takes for free; ``enrich.salted_join`` (J11) remains
    the manual fallback when one key exceeds even a split partition."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 200_000).select(
            (F.col("id") * 0).alias("k"), F.col("id").alias("v")
        ).union(
            spark.range(0, 1000).select(
                (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
            )
        )
        dim = spark.range(0, 51).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(dim, "k")
        assert len(j.collect()) == 201_000  # forces THIS plan to finalize
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_sorted_bucketed_join_eliminates_sort(spark, sf_dir):
    """Bucketed + sortBy tables can merge-join with ZERO exchanges AND
    ZERO sorts — the write-time shuffle and sort are both amortized.
    Conditions (documented, both required): exactly one file per
    bucket (repartition on the bucket key before writing) and
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (since
    Spark 3.0 the scan only reports file sort order under this flag).
    """
    from aws_medallion_etl_spark import io

    confs = {
        "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(
            8, "o_custkey"
        )
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet").repartition(
            8, "c_custkey"
        )
        io.write_bucketed(
            orders, "sbj_orders", ["o_custkey"], num_buckets=8,
            sort_cols=["o_custkey"],
        )
        io.write_bucketed(
            cust, "sbj_customer", ["c_custkey"], num_buckets=8,
            sort_cols=["c_custkey"],
        )
        joined = spark.table("sbj_orders").join(
            spark.table("sbj_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _physical(joined)
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        sort_nodes = [
            l for l in plan.splitlines()
            if "Sort [" in l and "SortMergeJoin" not in l
        ]
        assert not sort_nodes, sort_nodes
        assert joined.count() > 0
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS sbj_orders")
        spark.sql("DROP TABLE IF EXISTS sbj_customer")


def test_sql_udf_inlines_into_codegen_plan(spark, sf_dir):
    """A SQL UDF body must be INLINED: the physical plan is identical in
    shape to writing the expression by hand — no PythonUDF node, scan
    pruned to the referenced columns only."""
    from aws_medallion_etl_spark import io as eio

    eio.register_sql_function(
        spark, "plan_disc_price", "p DOUBLE, d DOUBLE", "DOUBLE", "p * (1 - d)"
    )
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "__li_plan_udf"
    )
    df = spark.sql(
        "SELECT l_returnflag,"
        " round(sum(plan_disc_price(l_extendedprice, l_discount)), 2) AS rev"
        " FROM __li_plan_udf GROUP BY l_returnflag"
    )
    plan = _physical(df)
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan
    # column pruning sees through the UDF: scan reads exactly 3 columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" in read and "l_discount" in read
    assert "l_quantity" not in read and "l_orderkey" not in read


def test_plan_audit_clean_on_headline_queries(spark, sf_dir):
    """The audit tool's anti-pattern screen stays green for a
    representative slice of the inventory: no cartesian products, no
    nested-loop joins outside the reviewed bounded-broadcast list, no
    Python eval nodes outside the sanctioned vectorized queries —
    in-suite, so a join-strategy regression fails CI, not the 100 TB
    run."""
    import importlib.util as _ilu
    import os as _os
    import sys as _sys

    root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    spec = _ilu.spec_from_file_location(
        "plan_audit", _os.path.join(root, "tools", "plan_audit.py"))
    pa = _ilu.module_from_spec(spec)
    spec.loader.exec_module(pa)
    _sys.path.insert(0, root)
    import __spark_entry__ as entrymod

    sample = [
        "e2e_medallion_gold", "j5_scd2_apply_changes", "j1_enrich_left_defaults",
        "dedup_minhash_lsh", "dedup_containment", "dedup_clusters",
        "sim_topk_bruteforce", "w8_sessionize", "a13_grouping_sets",
        "corpus_bm25", "t_bigram_logprob", "dq_skew_report",
    ]
    queries = entrymod.queries()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in sample:
        text = queries[name](spark, sf_dir)._jdf.queryExecution().explainString(mode)
        rec = pa.audit_plan(text)
        assert not rec["cartesian_products"], f"{name}: CartesianProduct"
        if name not in pa.SANCTIONED_NESTED_LOOP:
            assert not rec["nested_loop_joins"], f"{name}: unsanctioned BNLJ"
        assert not rec["python_eval_nodes"], f"{name}: Python eval node"

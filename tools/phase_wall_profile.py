"""Wall-clock attribution for one query, per operator-level call.

Monkey-patches the engine's commit/refresh/probe entry points
(snapshot DML, MV refreshers, fuzzy index lifecycle, io.compact,
streaming batch bodies) with a timing wrapper, runs ONE query through
the noop sink, and prints per-call wall + job counts — the empirical
"where does the time actually go" table the optimization guide (§1)
asks for before touching a heavy query's internals.

Usage: python tools/phase_wall_profile.py <query> [sf_dir] [reps]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

CALLS: list[tuple[str, float, int]] = []


def _wrap(mod, name, tracker, sc):
    fn = getattr(mod, name)
    if getattr(fn, "__wrapped_profile__", False):
        return

    def wrapper(*a, **k):
        pre = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.monotonic()
        try:
            return fn(*a, **k)
        finally:
            CALLS.append((f"{mod.__name__.split('.')[-1]}.{name}",
                          time.monotonic() - t0, 0))

    wrapper.__wrapped_profile__ = True
    setattr(mod, name, wrapper)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from aws_medallion_etl_spark import get_spark
    from aws_medallion_etl_spark import ingest, io as eio, mv, snapshot as snap
    from aws_medallion_etl_spark import streaming as stx
    from aws_medallion_etl_spark.operators import fuzzy, similarity
    from aws_medallion_etl_spark.queries import QUERIES

    spark = get_spark(app_name="phase_wall_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    tracker = spark.sparkContext.statusTracker()
    sc = spark.sparkContext

    for mod, names in [
        (snap, ["snapshot_create", "merge_into", "delete_where",
                "update_where", "replace_where", "snapshot_read",
                "snapshot_changes", "compact", "shallow_clone",
                "deep_clone", "restore", "_mint_dv", "_touched_files",
                "_write_commit_files", "_rebase_commit", "_scan_live"]),
        (mv, ["refresh_rollup", "refresh_join_rollup", "read_rollup",
              "coarsen_rollup", "cube_rollup"]),
        (fuzzy, ["build_minhash_index", "append_to_minhash_index",
                 "compact_minhash_index", "dedup_against_corpus_lsh",
                 "dedup_against_corpus", "ngram_jaccard_pairs",
                 "cluster_pairs", "merge_clusters"]),
        (eio, ["compact", "write_parquet"]),
        (similarity, ["kmeans_centroids", "train_pq_codebooks"]),
        (ingest, ["ingest_batch"]),
    ]:
        for n in names:
            if hasattr(mod, n):
                _wrap(mod, n, tracker, sc)

    for rep in range(reps):
        CALLS.clear()
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.monotonic() - t0
        df.write.mode("overwrite").format("noop").save()
        wall = time.monotonic() - t0
        print(f"\n=== rep{rep}: {name} wall {wall:.2f}s "
              f"(build {t_build:.2f}s) ===")
        # aggregate per call site, keep call order of first appearance
        agg: dict[str, list[float]] = {}
        order: list[str] = []
        for label, dt, _ in CALLS:
            if label not in agg:
                agg[label] = []
                order.append(label)
            agg[label].append(dt)
        print(f"{'call':42s} {'n':>3s} {'total_s':>8s} {'each_s':>18s}")
        for label in order:
            ts = agg[label]
            each = " ".join(f"{t:.2f}" for t in ts[:8])
            print(f"{label:42s} {len(ts):3d} {sum(ts):8.2f}   [{each}]")
        covered = sum(dt for _, dt, _ in CALLS)
        print(f"(sum of wrapped calls {covered:.2f}s — nested calls "
              f"double-count; read top-level rows first)")
    spark.stop()


if __name__ == "__main__":
    main()

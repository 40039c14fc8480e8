"""SparkSession factory with scale-oriented defaults.

Mirrors the reference's runtime configuration surface
(``conf/spark-defaults.conf:13-24``, ``README.md:718-734`` in the
reference repo): AQE with partition coalescing and skew-join handling,
dynamic partition overwrite for idempotent re-runs, Arrow for the few
pandas-UDF operators, and sane shuffle sizing.

At 100 TB the same knobs matter, with different values: shuffle
partitions sized so each task processes 128-512 MB post-filter, and
``files.maxPartitionBytes`` so scan tasks stay balanced. AQE re-coalesces
at runtime, so over-provisioning ``shuffle.partitions`` is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime re-planning, partition coalescing and
    # skew-join splitting (reference enables the same, conf/spark-defaults.conf:23).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Idempotent per-partition overwrite (requirements/...:40 in the reference
    # demands "re-run same run_date => no duplicates"). Without this, a
    # partitionBy(...).mode("overwrite") write nukes sibling partitions.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow transfer for pandas_udf / mapInPandas operators.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Scan-side task sizing; 128 MB keeps scan tasks balanced at any SF.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Broadcast threshold: dims in this workload are small; 64 MB is safe
    # on 16 GB executors and converts most dim joins into BHJ.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Timestamps are UTC end-to-end (requirements/...:21).
    "spark.sql.session.timeZone": "UTC",
    # NOTE: no `spark.sql.legacy.parquet.nanosAsLong` session default.
    # Timestamp encoding is a property of each FILE, not the session:
    # readers must dispatch on the schema they actually get (see
    # queries._events — reads normally, falls back to nanosAsLong+rebuild
    # only when the reader rejects a TIMESTAMP(NANOS) column). A session
    # default here previously encouraged loaders to hard-code one
    # encoding, which broke when the testdata switched NANOS -> MICROS.
    "spark.ui.enabled": "false",
    # NOTE: JVM sizing is handled in get_spark(), not here: it only
    # applies when THIS builder launches the JVM (measured: honored at
    # gateway launch, silently a no-op once any JVM exists — as is every
    # _DEFAULTS entry when getOrCreate returns a pre-existing session).
}


def _default_driver_mem() -> str:
    """Local-launch driver heap: min(16 GiB, half the RAM this process
    can actually get), floor 1 GiB.

    A flat 16g default risks a cgroup OOM-KILL (not a graceful spill)
    on hosts/containers smaller than that — the heap must fit inside
    the real limit. Reads the cgroup v2/v1 memory cap when present so
    containers aren't sized off the host's physical figure.
    ``SPARK_GRAFT_DRIVER_MEM`` overrides unconditionally.
    """
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
    except (ValueError, OSError, AttributeError):
        return "16g"

    def read_limit(path: str) -> int | None:
        try:
            with open(path) as fh:
                raw = fh.read().strip()
            return None if raw == "max" else int(raw)
        except (OSError, ValueError):
            return None

    # the limit can sit on ANY ancestor of the process's own cgroup
    # (systemd slice, k8s kubepods path), not just the mount root —
    # walk the hierarchy from /proc/self/cgroup upward
    candidates = {"/sys/fs/cgroup/memory.max",
                  "/sys/fs/cgroup/memory/memory.limit_in_bytes"}
    try:
        with open("/proc/self/cgroup") as fh:
            for line in fh:
                parts = line.strip().split(":", 2)
                if len(parts) != 3:
                    continue
                hier, ctrls, cpath = parts
                if hier == "0":  # cgroup v2 unified hierarchy
                    base, fname = "/sys/fs/cgroup", "memory.max"
                elif "memory" in ctrls.split(","):
                    base, fname = "/sys/fs/cgroup/memory", "memory.limit_in_bytes"
                else:
                    continue
                node = cpath.rstrip("/")
                while True:
                    candidates.add(f"{base}{node}/{fname}")
                    if not node:
                        break
                    node = node.rsplit("/", 1)[0]
    except OSError:
        pass
    limits = [v for v in (read_limit(p) for p in sorted(candidates)) if v]
    if limits:
        total = min(total, *limits)
    gib = max(1, min(16, int(total // (1 << 30) // 2)))
    return f"{gib}g"


def get_spark(
    app_name: str = "aws-medallion-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes the cluster master / lets spark-submit set it.
    ``shuffle_partitions`` defaults to 2x local cores (AQE coalesces down),
    or 200 like the reference when running against a cluster.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * int(cpus), 32) if master.startswith("local") else 200

    builder = SparkSession.builder.appName(app_name).master(master)
    if master.startswith("local") and SparkSession.getActiveSession() is None:
        # Local mode runs driver AND all executor threads in ONE JVM,
        # whose heap defaults to 1 GiB — 32 task slots sharing
        # ~400 MB of execution memory, so sorts/aggregates spill at
        # data sizes the machine holds in page cache many times over
        # (measured: 70 MB of sort spill at sf0.1 before this).
        # Applies only when this builder is about to LAUNCH the JVM;
        # against an existing session it would silently no-op, and on
        # a real cluster spark-submit owns the sizing.
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
    for key, value in _DEFAULTS.items():
        builder = builder.config(key, value)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()

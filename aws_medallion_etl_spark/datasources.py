"""Custom Python Data Source (Spark 4 DataSource API) — S-extension.

The reference's source surface is files + JDBC; Spark 4 adds a public
API for implementing NEW sources in Python (`pyspark.sql.datasource`),
the sanctioned way to wire a bespoke system (an internal service, a
queue, a generator) into the scan side of the engine. This module
ships one real implementation:

``SyntheticDocsDataSource`` — a partitioned, deterministic document
generator. Every row is a pure function of its ``doc_id``, so the
relation it produces is reproducible on any engine — which is exactly
what lets the DuckDB oracle verify a NON-FILE source end-to-end
(``s20_python_datasource``): the oracle rebuilds the same rows from
``generate_series`` arithmetic.

Scale notes: ``partitions()`` splits the keyspace into
``num_partitions`` independent ranges, so the scan parallelizes like
any file scan; rows stream out of each partition's iterator in
Arrow batches (no driver materialization). A Python data source pays
Python-worker serialization per batch — the documented trade for
custom-source flexibility; bulk analytics stays on parquet/ORC scans.
"""

from __future__ import annotations

import math
import zlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _doc_text(doc_id: int) -> str:
    """Deterministic pseudo-text: token i of doc d is ``w<(d*7+i*3)%13>``.

    Chosen to be trivially reproducible in ANSI SQL (modular
    arithmetic only — no hashes, no RNG), while still varying token
    sequences across documents.
    """
    n_tokens = 5 + (doc_id % 7)
    return " ".join(f"w{(doc_id * 7 + i * 3) % 13}" for i in range(n_tokens))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self):
        if self.n_docs <= 0:
            return [_RangePartition(0, 0)]  # empty relation, one no-op split
        step = -(-self.n_docs // self.num_partitions)  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n_docs", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars bigint"

    def reader(self, schema):
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the custom source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------------------
# Streaming source: tail a snapshot table's committed versions
# ---------------------------------------------------------------------------

def _snapshot_schema(path: str):
    import json as _json

    from pyspark.sql.types import StructType

    from aws_medallion_etl_spark import snapshot as snap

    v = snap.current_version(path)
    if v is None:
        raise ValueError(f"snapshot_append: {path} is not a snapshot table")
    return StructType.fromJson(
        _json.loads(snap._read_manifest(path, v)["schema"])
    )


class _SnapshotFilePartition(InputPartition):
    """One NEW data file of one committed version: everything an
    executor task needs to emit its rows, no driver state."""

    def __init__(self, path: str, file: str, phys: list[str]):
        self.path = path
        self.file = file
        self.phys = phys


class SnapshotAppendStreamReader(DataSourceStreamReader):
    """Partitioned micro-batch reader over a snapshot table's manifest
    history — the semantics of ``spark.readStream`` on a Delta table.

    Offsets are ``{"version": N}``; each batch emits the rows of data
    files INTRODUCED by versions ``(start, end]`` (append semantics:
    with mor/append-only writers, new files contain exactly the new
    rows). A version that REMOVES a previously-streamed file or
    attaches a deletion vector to one is a data change a pure append
    stream cannot represent — planning raises unless
    ``ignore_changes=true``, exactly Delta's
    ``ignoreChanges``/``ignoreDeletes`` contract. Reading committed
    manifests only means a concurrent writer can never expose a half
    batch.

    Scale shape (the round-10 promotion off the driver): the DRIVER
    only diffs manifests — ``partitions()`` returns one
    ``InputPartition`` per new data file, and EXECUTOR tasks read the
    files via pyarrow in parallel; no row ever flows through a single
    driver-side Python process. Planning is a pure function of the
    immutable manifest history, so checkpoint replay of
    ``partitions(start, end)`` reproduces the batch exactly.
    """

    def __init__(self, options):
        self.path = str(options["path"]).rstrip("/")
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        mv = options.get("max_versions_per_trigger")
        self.max_versions = int(mv) if mv is not None else None
        self._last_end: int | None = None

    # -- DataSourceStreamReader interface --------------------------------
    def initialOffset(self):
        # a FRESH stream rate-limits from the very first batch; after a
        # checkpoint restart this is never called, so the first resumed
        # batch is unbounded (the documented soft-limit behaviour)
        self._last_end = -1
        return {"version": -1}

    def latestOffset(self):
        from aws_medallion_etl_spark import snapshot as snap

        cur = snap.current_version(self.path)
        end = -1 if cur is None else int(cur)
        # admission control (Delta's maxFilesPerTrigger analogue at
        # version granularity): bound how far a single micro-batch
        # advances, so a backfill over a long history drains in bounded
        # batches instead of one giant one. SOFT limit, like Delta's:
        # after a checkpoint restart the tracker is empty and the first
        # batch takes whatever the WAL or current version dictates;
        # replay correctness is untouched because partitions(start,
        # end) honors any window exactly.
        if self.max_versions is not None and self._last_end is not None:
            end = min(end, self._last_end + self.max_versions)
        self._last_end = max(end, self._last_end or -1)
        return {"version": end}

    def partitions(self, start, end):
        import json as _json

        from aws_medallion_etl_spark import snapshot as snap

        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        # projection speaks the END manifest's logical schema + column
        # map — deterministic per (start, end), so replay re-plans the
        # identical partitions
        man_end = snap._read_manifest(self.path, v1)
        names = [
            f["name"] for f in _json.loads(man_end["schema"])["fields"]
        ]
        cmap = man_end.get("colmap") or {}
        phys = [cmap.get(n, n) for n in names]
        versions = [
            v for v in snap.snapshot_versions(self.path) if v0 < v <= v1
        ]
        prev: dict[str, tuple] = {}
        if v0 >= 0:
            prev = {
                e["file"]: tuple(sorted(e.get("dv") or []))
                for e in snap._manifest_files(
                    self.path, snap._read_manifest(self.path, v0)
                )
            }
        parts: list[_SnapshotFilePartition] = []
        for v in versions:
            entries = snap._manifest_files(
                self.path, snap._read_manifest(self.path, v)
            )
            cur = {
                e["file"]: tuple(sorted(e.get("dv") or [])) for e in entries
            }
            removed = set(prev) - set(cur)
            dv_grown = {
                f for f in set(prev) & set(cur) if cur[f] != prev[f]
            }
            if (removed or dv_grown) and not self.ignore_changes:
                raise ValueError(
                    f"snapshot_append: version {v} of {self.path} removed "
                    f"or rewrote already-streamed data "
                    f"({len(removed)} files gone, {len(dv_grown)} gained "
                    "deletion vectors) — an append stream cannot represent "
                    "that; set option ignore_changes=true to skip, or "
                    "consume snapshot_changes() in batch"
                )
            parts.extend(
                _SnapshotFilePartition(self.path, e["file"], phys)
                for e in entries if e["file"] not in prev
            )
            prev = cur
        return parts

    def read(self, partition):
        import os as _os

        import pyarrow.parquet as _pq

        t = _pq.read_table(_os.path.join(partition.path, partition.file))
        have = set(t.column_names)
        for row in t.to_pylist():
            # files speak PHYSICAL column names (renames are
            # manifest-only); emit in logical schema order
            yield tuple(
                row[p] if p in have else None for p in partition.phys
            )

    def commit(self, end):
        pass


class SnapshotAppendDataSource(DataSource):
    """``spark.readStream.format("snapshot_append").option("path", p)``
    — the Delta streaming-source surface over snapshot tables, via the
    Spark 4 Python streaming DataSource API (partition-planning
    reader: executors scan new files in parallel)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_append"

    def schema(self):
        return _snapshot_schema(str(self.options["path"]))

    def streamReader(self, schema):
        return SnapshotAppendStreamReader(self.options)


def register_streaming(spark) -> None:
    """Idempotently register the snapshot streaming source."""
    spark.dataSource.register(SnapshotAppendDataSource)


# ---------------------------------------------------------------------------
# Streaming source: change data feed of a snapshot table
# ---------------------------------------------------------------------------

def _live_rows_pyarrow(path: str, entries: list[dict], names: list[str]):
    """Rows of the given manifest entries as python tuples, deletion
    vectors applied — the pyarrow mirror of ``snapshot._scan_live``
    for stream-reader EXECUTOR tasks (no Spark inside a DataSource).
    Missing columns (pre-evolution files) read as None."""
    import os as _os

    import pyarrow.parquet as _pq

    out = []
    for e in entries:
        dead: set[int] = set()
        for ref in e.get("dv") or []:
            # sidecars carry either legacy position lists (file,
            # row_index) or round-11 interval runs (file, run_start,
            # run_len) — dispatch on the columns present
            t = _pq.read_table(_os.path.join(path, ref))
            dv = t.to_pydict()
            if "run_start" in t.column_names:
                for f, s, ln in zip(
                    dv["file"], dv["run_start"], dv["run_len"]
                ):
                    if f == e["file"]:
                        dead.update(range(int(s), int(s) + int(ln)))
            else:
                dead.update(
                    int(p) for f, p in zip(dv["file"], dv["row_index"])
                    if f == e["file"]
                )
        t = _pq.read_table(_os.path.join(path, e["file"]))
        have = set(t.column_names)
        rows = t.to_pylist()
        for pos, row in enumerate(rows):
            if pos in dead:
                continue
            out.append(tuple(row[n] if n in have else None for n in names))
    return out


def _cdf_key_bucket(key: tuple, n: int) -> int:
    """Deterministic cross-process bucket of a key tuple. Python's
    ``hash`` is salted per process — useless across executors; crc32 of
    the canonical repr is stable for the primitive key types a CDF key
    can hold (int/str/float/bool/date/None)."""
    return zlib.crc32(repr(key).encode("utf-8")) % n


def _cdf_differs(a, b) -> bool:
    """NaN-aware value inequality: batch snapshot_changes compares with
    eqNullSafe, under which NaN == NaN — Python's != says NaN != NaN,
    which would emit phantom update pairs for every untouched NaN row
    on a touched-file diff."""
    if a is b:
        return False
    if (isinstance(a, float) and isinstance(b, float)
            and math.isnan(a) and math.isnan(b)):
        return False
    return a != b


class _CdfStepPartition(InputPartition):
    """One key-hash bucket of one version step's keyed diff: the
    churned manifest entries of both sides travel with the partition,
    so the executor task needs no driver state."""

    def __init__(self, path, commit_v, entries_a, entries_b, phys, kidx,
                 bucket, n_buckets):
        self.path = path
        self.commit_v = commit_v
        self.entries_a = entries_a
        self.entries_b = entries_b
        self.phys = phys
        self.kidx = kidx
        self.bucket = bucket
        self.n_buckets = n_buckets


class SnapshotCDFStreamReader(DataSourceStreamReader):
    """Streaming CHANGE DATA FEED over a snapshot table — Delta's
    ``readChangeFeed`` surface: each micro-batch emits the row-level
    changes of the versions committed since the last offset, typed as
    ``_change_type`` ∈ (insert, delete, update_preimage,
    update_postimage) with the ``_commit_version`` that produced them.

    Per consecutive version pair, PLANNING (driver) diffs the manifests
    only — (file, DV-set) signatures; files carried unchanged never
    load — and emits ``diff_partitions`` key-hash-bucket partitions per
    step. EXECUTOR tasks read the churned files via pyarrow, keep only
    their key bucket, and compute the keyed diff — exact
    ``snapshot_changes`` semantics, no row ever flowing through a
    driver-side process (the round-10 promotion off the driver).

    Scale trade, stated honestly: every bucket task re-reads the
    step's churned files (IO amplification = ``diff_partitions``) but
    decodes/materializes only its share of rows, so wall-clock
    parallelizes across buckets AND version steps while per-task
    memory is bounded by churn/buckets. ``diff_partitions`` defaults
    to 1 (CDC-scale churn: one task per step, still executor-side);
    raise it when single commits rewrite many files.
    """

    def __init__(self, options):
        self.path = str(options["path"]).rstrip("/")
        keys = str(options.get("key_cols", "")).strip()
        if not keys:
            raise ValueError(
                "snapshot_cdf: option key_cols (comma-separated) is required"
            )
        self.key_cols = [k.strip() for k in keys.split(",") if k.strip()]
        self.diff_partitions = max(
            1, int(options.get("diff_partitions", 1))
        )
        mv = options.get("max_versions_per_trigger")
        self.max_versions = int(mv) if mv is not None else None
        self._last_end: int | None = None

    def initialOffset(self):
        from aws_medallion_etl_spark import snapshot as snap

        # CDF starts at the CURRENT version: changes are what happens
        # next (Delta's startingVersion=latest); a backfill of history
        # is the batch snapshot_changes call
        v = snap.current_version(self.path)
        self._last_end = -1 if v is None else int(v)
        return {"version": self._last_end}

    def latestOffset(self):
        from aws_medallion_etl_spark import snapshot as snap

        v = snap.current_version(self.path)
        end = -1 if v is None else int(v)
        # same soft admission control as the append reader: bound the
        # version span a single micro-batch diffs (first batch after a
        # checkpoint restart is unbounded — documented, replay-exact)
        if self.max_versions is not None and self._last_end is not None:
            end = min(end, self._last_end + self.max_versions)
        self._last_end = max(end, self._last_end or -1)
        return {"version": end}

    def partitions(self, start, end):
        import json as _json

        from aws_medallion_etl_spark import snapshot as snap

        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        all_vs = snap.snapshot_versions(self.path)
        versions = [v for v in all_vs if v0 <= v <= v1]
        if not versions or versions[0] != v0:
            # the stream's offset predates the retained history (vacuum
            # pruned manifests past it): silently zipping from the
            # first survivor would SKIP the pruned commits' changes —
            # fail loudly instead (Delta's CDF raises the same way)
            raise ValueError(
                f"snapshot_cdf: offset version {v0} of {self.path} is no "
                f"longer retained (have {all_vs}) — the feed cannot "
                "reconstruct the pruned commits; restart from a fresh "
                "offset or lengthen vacuum retention"
            )
        parts: list[_CdfStepPartition] = []
        for prev_v, v in zip(versions, versions[1:]):
            man_a = snap._read_manifest(self.path, prev_v)
            man_b = snap._read_manifest(self.path, v)
            names = [
                f["name"] for f in _json.loads(man_b["schema"])["fields"]
            ]
            cmap = man_b.get("colmap") or {}
            phys = [cmap.get(n, n) for n in names]
            kidx = [names.index(k) for k in self.key_cols]

            def sig(e):
                return (e["file"], tuple(sorted(e.get("dv") or [])))

            ea = snap._manifest_files(self.path, man_a)
            eb = snap._manifest_files(self.path, man_b)
            common = {sig(e) for e in ea} & {sig(e) for e in eb}
            churn_a = [e for e in ea if sig(e) not in common]
            churn_b = [e for e in eb if sig(e) not in common]
            if not churn_a and not churn_b:
                continue  # manifest-only commit (rename/constraint)
            for b in range(self.diff_partitions):
                parts.append(_CdfStepPartition(
                    self.path, v, churn_a, churn_b, phys, kidx,
                    b, self.diff_partitions,
                ))
        return parts

    def read(self, partition):
        p = partition
        vidx = [i for i in range(len(p.phys)) if i not in p.kidx]

        def keyed(entries):
            rows = {}
            for r in _live_rows_pyarrow(p.path, entries, p.phys):
                k = tuple(r[i] for i in p.kidx)
                if p.n_buckets > 1 and _cdf_key_bucket(
                        k, p.n_buckets) != p.bucket:
                    continue
                rows[k] = r
            return rows

        old = keyed(p.entries_a)
        new = keyed(p.entries_b)
        for k, r in new.items():
            if k not in old:
                yield (*r, "insert", p.commit_v)
            else:
                o = old[k]
                if any(_cdf_differs(o[i], r[i]) for i in vidx):
                    yield (*o, "update_preimage", p.commit_v)
                    yield (*r, "update_postimage", p.commit_v)
        for k, r in old.items():
            if k not in new:
                yield (*r, "delete", p.commit_v)

    def commit(self, end):
        pass


class SnapshotCDFDataSource(DataSource):
    """``spark.readStream.format("snapshot_cdf").option("path", p)
    .option("key_cols", "k1,k2")`` — streaming change data feed."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self):
        from pyspark.sql.types import LongType, StringType, StructField

        base = _snapshot_schema(str(self.options["path"]))
        return type(base)(
            list(base.fields)
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema):
        return SnapshotCDFStreamReader(self.options)


def register_cdf_streaming(spark) -> None:
    """Idempotently register the CDF streaming source."""
    spark.dataSource.register(SnapshotCDFDataSource)

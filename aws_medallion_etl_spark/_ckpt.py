"""Deterministic reclamation of localCheckpoint storage blocks.

``localCheckpoint`` is this engine's lineage-cut primitive (iterative
CC rounds, MV delta reuse, admission-probe sharing), but its storage
blocks have NO public Dataset-level handle: once the Python frame
goes out of scope they are freed only when the py4j proxy is
finalized, the JVM object is GC'd, AND the ContextCleaner drains —
an asynchronous chain that in practice leaves every finished
operation's blocks resident until heap pressure forces a System.gc().
Measured (round 14): queries co-resident with checkpoint-heavy ones
inflated up to 3x mid-suite while running at steady state solo, and
the DML bench phase needed an explicit per-query gc drain.

These helpers make the reclamation deterministic instead: delta-track
the context's persistent-RDD ids around an operation and unpersist
exactly the ids it created, the moment they are provably dead
(guide §5: "unpersist when done").

Thread-safety contract (same one ``fuzzy.cluster_pairs`` documents):
delta-tracking assumes no OTHER driver thread is concurrently
creating localCheckpoints — concurrent snapshot DML writers are fine
(they never persist), but two concurrent MV refreshers in one process
could free each other's in-flight blocks. This engine's callers run
one refresher per process.
"""

from __future__ import annotations

from contextlib import contextmanager


def persistent_rdd_ids(sc) -> set[int]:
    """Ids of RDDs currently persisted in this context's BlockManager."""
    out = set()
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        out.add(it.next()._1())
    return out


def unpersist_rdd_ids(sc, ids: set[int]) -> None:
    """Non-blocking unpersist of the given persistent RDD ids."""
    if not ids:
        return
    it = sc._jsc.sc().getPersistentRDDs().iterator()
    while it.hasNext():
        t = it.next()
        if t._1() in ids:
            t._2().unpersist(False)


@contextmanager
def reclaim_scope(sc):
    """Free every persistent RDD the wrapped block creates, on exit.

    For operations that finish ALL their Spark actions internally and
    return plain values (MV refreshes, ingest batches, foreachBatch
    bodies): any localCheckpoint they took — including lazy ones
    materialized mid-flight — is dead the moment they return, so the
    exit hook unpersists the id delta instead of leaving it to the
    GC/ContextCleaner chain.

    MUST NOT wrap code whose RETURN VALUE is a DataFrame still backed
    by blocks created inside (a localCheckpoint's lineage is truncated:
    freeing its blocks while referenced does not trigger recompute, it
    fails the consumer's job).
    """
    before = persistent_rdd_ids(sc)
    try:
        yield
    finally:
        unpersist_rdd_ids(sc, persistent_rdd_ids(sc) - before)

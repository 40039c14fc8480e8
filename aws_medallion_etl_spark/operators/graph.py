"""Iterative graph computation on DataFrames: PageRank over similarity
graphs.

Beyond-reference extension for corpus curation: once near-dup PAIRS
exist (``fuzzy.ngram_jaccard_pairs`` / ``similarity.semantic_dedup_
pairs``), the graph they form carries signal of its own — documents
with many high-similarity neighbors are template/boilerplate hubs
(navigation chrome, licence blocks, mirrored articles). PageRank over
that graph ranks the hubs; downstream curation caps or drops them.

Design for 100 TB: the Pregel-on-DataFrames shape — each iteration is
one equi-join of the edge list with the current rank vector (both keyed
on the vertex id, so pre-partitioning/bucketing both on id makes every
round's join co-located) plus one map-side-combined aggregation. State
per round is a (vertex, double) frame, never the corpus. Iteration
count is fixed and small (rank separation, not convergence, is the
goal), so there is no driver-side convergence probe at all — contrast
``fuzzy.cluster_pairs``, which needs one scalar per round.

Reference scope: the reference engine has no graph operators
(SURVEY.md §2 has no graph family); this composes with its dedup
story the way ``fuzzy.cluster_pairs`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b") -> DataFrame:
    """Undirected pair list -> directed edge list (both directions)."""
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    rev = pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    return fwd.unionByName(rev)


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    iterations: int = 3,
    damping: float = 0.85,
    ndigits: int = 6,
    checkpoint_edges: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank: pr = (1-d)/N + d * sum_in(pr/outdeg).

    The no-dangling-redistribution variant (leaked mass from sink
    vertices is simply not re-injected): deterministic, needs no
    global mass aggregate per round, and preserves the RANKING that
    hub detection consumes. Every vertex in ``nodes`` gets a score —
    isolated documents settle at (1-d)/N, hubs rise with their
    neighborhood mass.

    Each round: edges JOIN rank-vector on src (co-locatable via
    bucketing on the vertex id), hash-aggregate contributions keyed on
    dst (map-side combined), LEFT JOIN back onto the vertex frame.
    State = one (vertex, pr) row per node. Fixed ``iterations`` keeps
    the plan finite and the oracle expressible; for true convergence
    runs add ``localCheckpoint`` per round as ``fuzzy.cluster_pairs``
    does.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg"))
    n = nodes.agg((F.count(F.lit(1)) * 1.0).alias("__n"))
    pr = (
        nodes.select(F.col(id_col))
        .crossJoin(F.broadcast(n))
        .select(id_col, (F.lit(1.0) / F.col("__n")).alias("__pr"))
    )
    ed = edges.join(deg, "src")
    if checkpoint_edges:
        # the edge list is referenced once PER ROUND: without lineage
        # truncation the (possibly expensive) pair-generation upstream
        # — e.g. a shingle self-join — re-executes every iteration
        ed = ed.localCheckpoint(eager=False)
    for _ in range(iterations):
        contrib = (
            ed.join(pr, ed["src"] == pr[id_col])
            .select(F.col("dst"), (F.col("__pr") / F.col("__outdeg")).alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__s"))
        )
        pr = (
            nodes.select(F.col(id_col))
            .join(contrib, F.col(id_col) == F.col("dst"), "left")
            .crossJoin(F.broadcast(n))
            .select(
                id_col,
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("__pr"),
            )
        )
    return pr.select(id_col, F.round("__pr", ndigits).alias("pagerank"))

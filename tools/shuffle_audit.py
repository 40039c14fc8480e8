"""Runtime shuffle/spill audit: execute queries and record what the
exchanges ACTUALLY moved.

The static plan audit (``tools/plan_audit.py``) proves the plan
*shape*; this tool proves the *volumes*: per query, the summed SQL
metrics of every execution it triggers — shuffle bytes/records
written, spill to memory/disk, parquet bytes scanned, output rows.
These are the numbers the 100 TB extrapolation hangs off: a dedup
whose shuffle is 64 longs/doc at sf0.1 stays 64 longs/doc at sf100k;
one whose shuffle carries document text does not.

Metrics come from the SQL status store (the engine's own accounting,
same source as the SQL UI), so nothing about the queries changes —
they run through the noop sink exactly as ``bench.py`` runs them.

Writes ``SHUFFLE_AUDIT.json`` at the repo root. Usage:

    python tools/shuffle_audit.py [query ...]    (default: heavy set)
    SPARK_GRAFT_SF_DIR=... to change scale (default sf0.1)
    SPARK_GRAFT_AUDIT_SECTION=queries_10x to record a run at another
    scale under its own top-level section (default ``queries``) —
    cross-scale rows never overwrite each other, so the 10x-stress
    volumes sit next to the sf0.1 ones for ratio reading.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SHUFFLE_AUDIT.json")

# Default: the queries whose scale behavior is worth hard numbers —
# the dedup/similarity family (wide data, multiplied candidate joins)
# plus the heaviest pipeline/aggregate paths from the bench ranking.
HEAVY = [
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash",
    "dedup_clusters", "dedup_containment", "dedup_embedding_cosine",
    "dedup_semantic_clusters", "sim_topk_bruteforce", "sim_topk_lsh",
    "sim_topk_ivf_indexed", "t_bigram_logprob", "t_top_dup_ngrams",
    "graph_pagerank_hubs", "w8_sessionize", "e2e_corpus_curation",
    "a1_topk_customers", "j5_scd2_apply_changes", "corpus_bm25",
    "dedup_clusters_merged", "dq_dataset_fingerprint", "sketch_heavy_hitters",
]

_UNITS = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30,
          "TiB": 1 << 40}


def _parse(val: str) -> float | None:
    """Parse a formatted SQL-metric value: '1,500', '19.4 KiB', '25 ms'.

    Metric strings can carry min/med/max breakdowns ('total (min, med,
    max)\\n64.0 B (32.0 B, 32.0 B, 32.0 B)') — the leading number+unit
    is the total, which is all we sum.
    """
    m = re.search(r"(\d[\d,]*(?:\.\d+)?)\s*(B|KiB|MiB|GiB|TiB|ms|s)?", val)
    if not m:
        return None
    num = float(m.group(1).replace(",", ""))
    unit = m.group(2)
    if unit in _UNITS:
        return num * _UNITS[unit]
    if unit == "ms":
        return num / 1000.0
    return num


# metric display name -> output field it accumulates into
ROLLUP = {
    "shuffle bytes written": "shuffle_bytes_written",
    "shuffle records written": "shuffle_records_written",
    "spill size": "spill_bytes",
    "size of files read": "scan_bytes",
    "number of files read": "scan_files",
    "data size": "broadcast_or_agg_data_bytes",
}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or HEAVY

    import __spark_entry__ as entrymod
    from aws_medallion_etl_spark import get_spark

    spark = get_spark(app_name="shuffle_audit")
    spark.sparkContext.setLogLevel("ERROR")
    store = spark._jsparkSession.sharedState().statusStore()
    queries = entrymod.queries()

    def drain_since(first_exec_id: int) -> dict[str, float]:
        acc: dict[str, float] = {}
        lst = store.executionsList()
        for i in range(lst.size()):
            e = lst.apply(i)
            if e.executionId() < first_exec_id:
                continue
            names_by_acc = {}
            mets = e.metrics()
            for j in range(mets.size()):
                pm = mets.apply(j)
                names_by_acc[pm.accumulatorId()] = pm.name()
            it = store.executionMetrics(e.executionId()).iterator()
            while it.hasNext():
                kv = it.next()
                field = ROLLUP.get(names_by_acc.get(kv._1(), ""))
                if field:
                    v = _parse(kv._2())
                    if v is not None:
                        acc[field] = acc.get(field, 0.0) + v
        return acc

    results: dict[str, dict] = {}
    errors: dict[str, str] = {}
    for name in names:
        if name not in queries:
            errors[name] = "unknown query"
            continue
        lst = store.executionsList()
        next_id = (lst.apply(lst.size() - 1).executionId() + 1) if lst.size() else 0
        try:
            queries[name](spark, sf_dir).write.mode("overwrite").format(
                "noop").save()
        except Exception as e:  # noqa: BLE001 — audit the rest regardless
            errors[name] = f"{type(e).__name__}: {e}"
            continue
        # the action returns when jobs finish, but SQLExecutionEnd and
        # the final accumulator updates post to the listener bus
        # ASYNCHRONOUSLY — drain only after the bus settles or the
        # metrics silently under-report
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:  # noqa: BLE001 — older/newer signature
            import time as _time

            _time.sleep(1.0)
        rec = drain_since(next_id)
        rec = {k: round(v, 1) for k, v in sorted(rec.items())}
        rec["shuffle_mib_written"] = round(
            rec.get("shuffle_bytes_written", 0.0) / (1 << 20), 2)
        results[name] = rec

    section = os.environ.get("SPARK_GRAFT_AUDIT_SECTION", "queries")
    out = {"queries": {}}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            out.update(json.load(fh))
    if sys.argv[1:]:
        # a partial run (explicit names) refreshes those rows in place —
        # never clobbers the full committed audit with a near-empty one
        merged = dict(out.get(section, {}))
        merged.update(results)
        results = merged
    out[section] = results
    # sf_dir and errors are per-SECTION records: a 10x run must neither
    # relabel nor erase the sf0.1 section's metadata (and vice versa)
    out.setdefault("sf_dirs", {})[section] = sf_dir
    if section == "queries":
        out["sf_dir"] = sf_dir  # legacy top-level field = default section
        out["errors"] = errors
    else:
        out[f"errors_{section}"] = errors
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({n: r.get("shuffle_mib_written") for n, r in
                      results.items()}, indent=1))
    print(f"-> {OUT}")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Corpus-curation operator tests (operators/corpus.py).

Pins the properties the oracle queries can't see: split stability
across re-runs and weights, packing bin invariants, tf-idf math,
redaction behavior on tricky strings, and representative selection
tie-breaking.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_split_deterministic_and_partitions(spark, docs):
    a = corpus.hash_split(docs, "doc_id").select("doc_id", "split")
    b = corpus.hash_split(docs, "doc_id").select("doc_id", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every doc in exactly one split
    n = docs.count()
    assert a.count() == n
    counts = dict(a.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # train is the bulk at 90/5/5
    assert counts["train"] > 0.7 * n


def test_hash_split_seed_changes_membership(spark, docs):
    a = corpus.hash_split(docs, "doc_id", seed="s1")
    b = corpus.hash_split(docs, "doc_id", seed="s2")
    moved = (
        a.select("doc_id", F.col("split").alias("sa"))
        .join(b.select("doc_id", F.col("split").alias("sb")), "doc_id")
        .where(F.col("sa") != F.col("sb"))
        .count()
    )
    assert moved > 0


def test_hash_split_rejects_bad_weights(docs):
    with pytest.raises(ValueError):
        corpus.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_pack_sequences_invariants(spark):
    rows = [(i, 100 + (i % 7) * 50) for i in range(1, 101)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    packed = corpus.pack_sequences(df, "doc_id", "n_tok", budget=500)
    got = {r["doc_id"]: r["bin_id"] for r in packed.collect()}
    # reproduce sequentially: bin = floor(cum_before / budget)
    cum = 0
    for i, tok in rows:
        assert got[i] == cum // 500, f"doc {i}"
        cum += tok
    # bins are contiguous starting at 0 and non-decreasing in id order
    bins = [got[i] for i, _ in rows]
    assert bins[0] == 0
    assert all(b2 >= b1 for b1, b2 in zip(bins, bins[1:]))


def test_pack_sequences_greedy_hard_cap_and_oversized(spark):
    # two shards; shard 1 contains a doc LARGER than the budget
    rows = [(i, i % 2, 100 + (i % 7) * 50) for i in range(1, 101)]
    rows.append((101, 1, 900))  # oversized vs budget 500
    df = spark.createDataFrame(rows, ["doc_id", "shard", "n_tok"])
    packed = corpus.pack_sequences_greedy(
        df, "doc_id", "n_tok", budget=500, shard_col="shard"
    ).collect()
    got = {r["doc_id"]: (r["shard"], r["bin_id"]) for r in packed}
    assert len(got) == len(rows)
    # replay the greedy recurrence per shard in python
    by_shard = {}
    for doc_id, shard, tok in sorted(rows):
        b, run = by_shard.get(shard, (0, 0))
        if run > 0 and run + tok > 500:
            b, run = b + 1, 0
        assert got[doc_id] == (shard, b), f"doc {doc_id}"
        by_shard[shard] = (b, run + tok)
    # hard cap: every bin's total <= budget unless it is a single
    # oversized doc
    totals = {}
    for doc_id, shard, tok in rows:
        key = got[doc_id]
        totals.setdefault(key, []).append(tok)
    for key, toks in totals.items():
        assert sum(toks) <= 500 or (len(toks) == 1 and toks[0] > 500), key
    # the oversized doc sits alone in its bin
    over_key = got[101]
    assert totals[over_key] == [900]


def test_mix_sources_tokens_targets_token_shares(spark):
    # source "long" has 4x the tokens per doc of "short": a doc-count
    # mixer at 50/50 would leave tokens at 80/20 — the token mixer
    # must instead downsample "long" docs ~4x harder
    rows = [(i, "long", 400) for i in range(1_000)] + [
        (i + 10_000, "short", 100) for i in range(1_000)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tok"])
    mixed = corpus.mix_sources_tokens(
        df, "source", {"long": 0.5, "short": 0.5}, "doc_id", "n_tok"
    )
    got = {
        r["source"]: r["t"]
        for r in mixed.groupBy("source")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    }
    # scarcest-in-tokens is "short" (100k tokens at weight .5) →
    # target 100k tokens per source; md5 membership is approximate
    # (±1/10000 of docs) so allow a few percent
    assert got["short"] == 100_000  # keep_frac 1.0: exact
    assert abs(got["long"] - 100_000) <= 10_000
    # deterministic: same inputs, same kept set
    again = {
        r["source"]: r["t"]
        for r in corpus.mix_sources_tokens(
            df, "source", {"long": 0.5, "short": 0.5}, "doc_id", "n_tok"
        ).groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    assert got == again


def test_mix_sources_tokens_drops_unmeasurable_sources(spark):
    # "nulls" has only NULL token counts, "zeros" sums to 0: both are
    # unmeasurable and must be DROPPED (not kept wholesale via
    # least(1.0, NULL), not poisoning the scale to 0 for the others)
    rows = (
        [(i, "a", 100) for i in range(100)]
        + [(i + 1_000, "b", 100) for i in range(100)]
        + [(i + 2_000, "nulls", None) for i in range(10)]
        + [(i + 3_000, "zeros", 0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    mixed = corpus.mix_sources_tokens(
        df, "source",
        {"a": 0.5, "b": 0.5, "nulls": 0.1, "zeros": 0.1},
        "doc_id", "n_tok",
    )
    got = {r["source"] for r in mixed.select("source").distinct().collect()}
    assert got == {"a", "b"}
    # balanced healthy sources at equal weight: keep_frac 1.0 each
    assert mixed.count() == 200


def test_leakage_safe_split_keeps_clusters_together(spark):
    # clusters: {1,2,3} (chained), {10}, {11}; split on cluster_id
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    from aws_medallion_etl_spark.operators import fuzzy

    clusters = fuzzy.cluster_pairs(pairs)
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11)], ["doc_id"])
    labeled = docs.join(
        clusters.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("cluster_id", "doc_id").alias("cluster_id")
    )
    split = corpus.hash_split(
        labeled, "cluster_id", {"train": 0.5, "val": 0.25, "test": 0.25}
    ).collect()
    by_cluster = {}
    for r in split:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    # no cluster ever spans two splits
    assert all(len(s) == 1 for s in by_cluster.values())
    # the chained trio shares one cluster, hence one split
    trio = {r["split"] for r in split if r["doc_id"] in (1, 2, 3)}
    assert len(trio) == 1


def test_pack_sequences_greedy_null_tokens_consume_no_budget(spark):
    # NULL n_tok (NULL text upstream) must not crash the pandas loop;
    # it consumes no budget, matching pack_sequences' window-sum
    rows = [(1, 0, 400), (2, 0, None), (3, 0, 90), (4, 0, 200)]
    df = spark.createDataFrame(rows, "doc_id long, shard int, n_tok long")
    packed = corpus.pack_sequences_greedy(
        df, "doc_id", "n_tok", budget=500, shard_col="shard"
    ).collect()
    got = {r["doc_id"]: r["bin_id"] for r in packed}
    # 400 + 0 + 90 = 490 fits; 200 overflows into bin 1
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_tfidf_math(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date")],
        ["doc_id", "text"],
    )
    scored = corpus.tfidf(df, "doc_id", "text")
    vals = {(r["doc_id"], r["term"]): (r["tf"], r["tfidf"]) for r in scored.collect()}
    # apple: tf=2 in doc1, df=1, N=3 -> 2*ln(3)
    assert vals[(1, "apple")][0] == 2
    assert vals[(1, "apple")][1] == pytest.approx(round(2 * math.log(3), 4))
    # banana: df=2 -> ln(3/2)
    assert vals[(2, "banana")][1] == pytest.approx(round(math.log(1.5), 4))


def test_top_terms_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "zeta alpha")], ["doc_id", "text"]
    )
    # both terms unique to the doc -> equal score; alpha wins rank 1
    out = corpus.top_terms(corpus.tfidf(df, "doc_id", "text"), "doc_id", k=2)
    ranked = {r["rank"]: r["term"] for r in out.collect()}
    assert ranked[1] == "alpha" and ranked[2] == "zeta"


def test_redact_pii_cases(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk now"),
            (2, "call +1-555-123-4567 today"),
            (3, "digits 12345678901 run"),
            (4, "clean text stays"),
        ],
        ["id", "t"],
    )
    out = {r["id"]: r["red"] for r in
           df.select("id", corpus.redact_pii("t").alias("red")).collect()}
    assert out[1] == "mail [EMAIL] now"
    assert out[2] == "call [PHONE] today"
    assert out[3] == "digits [PHONE] run"
    assert out[4] == "clean text stays"


def test_cluster_representatives_picks_best_then_min_id(spark):
    # cluster {1,2,3}: quality 5,9,9 -> doc 2 (best quality, min id tie)
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 7)], ["doc_id", "q"]
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], ["id", "cluster_id"]
    )
    reps = {
        r["cluster_id"]: (r["representative_id"], r["cluster_size"], r["best_quality"])
        for r in corpus.cluster_representatives(docs, "doc_id", clusters, "q").collect()
    }
    assert reps[1] == (2, 3, 9)
    # singleton doc 4 keeps itself
    assert reps[4] == (4, 1, 7)


def test_vocabulary_min_count(spark):
    df = spark.createDataFrame(
        [(1, "a b b c c c")], ["doc_id", "text"]
    )
    v = {r["term"]: r["n_occurrences"]
         for r in corpus.vocabulary(df, "text", min_count=2).collect()}
    assert v == {"b": 2, "c": 3}


def test_pack_sequences_partitioned(spark):
    rows = [(s, i, 300) for s in ("a", "b") for i in range(1, 11)]
    df = spark.createDataFrame(rows, ["split", "doc_id", "n_tok"])
    packed = corpus.pack_sequences(
        df, "doc_id", "n_tok", budget=1000, partition_by=["split"]
    )
    got = {(r["split"], r["doc_id"]): r["bin_id"] for r in packed.collect()}
    # bins restart at 0 within each partition: 1000/300 -> docs 1-4 in
    # bin 0 (cum_before 0,300,600,900), 5-7 bin 1, ...
    for s in ("a", "b"):
        assert got[(s, 1)] == 0 and got[(s, 4)] == 0
        assert got[(s, 5)] == 1 and got[(s, 8)] == 2


def test_mix_sources_targets_and_determinism(spark):
    # 3 sources with unequal sizes: s_big 2000, s_mid 1000, s_small 200.
    rows = (
        [("s_big", i) for i in range(2000)]
        + [("s_mid", 10_000 + i) for i in range(1000)]
        + [("s_small", 20_000 + i) for i in range(200)]
        + [("s_drop", 30_000)]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long")
    # target 50/25/25: binding source is s_small (200 / 0.25 = 800 scale)
    # -> expected keeps ~ s_big 400, s_mid 200, s_small 200 (all of it)
    weights = {"s_big": 0.5, "s_mid": 0.25, "s_small": 0.25}
    mixed = corpus.mix_sources(df, "source", weights, "doc_id")
    got = {r.source: r.n for r in
           mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "s_drop" not in got          # unweighted source dropped
    assert got["s_small"] == 200        # binding source keeps everything
    # hash-bucket keeps are binomial around the target; 3-sigma bounds
    assert abs(got["s_big"] - 400) <= 60 and abs(got["s_mid"] - 200) <= 45
    # determinism: same inputs -> identical kept set
    a = sorted(r.doc_id for r in mixed.collect())
    b = sorted(r.doc_id for r in corpus.mix_sources(
        df, "source", weights, "doc_id").collect())
    assert a == b


def test_contamination_planted_ngram(spark):
    span = " ".join(f"tok{i}" for i in range(13))
    train = spark.createDataFrame(
        [
            (1, f"clean document with entirely different words {' '.join('x%d' % i for i in range(13))}"),
            (2, f"prefix words then {span} then suffix words"),
            (3, "short doc"),  # < 13 tokens: can never be flagged
        ],
        "id long, body string",
    )
    ev = spark.createDataFrame(
        [(100, f"benchmark question containing {span} verbatim")],
        "eid long, etext string",
    )
    hits = corpus.contamination_hits(
        train, "id", "body", ev, "eid", "etext", n=13
    ).collect()
    assert {r["id"] for r in hits} == {2}
    row = hits[0]
    assert row["n_hit_grams"] >= 1 and row["n_eval_docs"] == 1

    cleaned = corpus.decontaminate(train, "id", "body", ev, "eid", "etext", n=13)
    assert {r["id"] for r in cleaned.collect()} == {1, 3}
    # schema passes through untouched
    assert cleaned.columns == train.columns


def test_contamination_case_insensitive_and_threshold(spark):
    span = " ".join(f"w{i}" for i in range(13))
    train = spark.createDataFrame(
        [(1, span.upper() + " trailing tail")], "id long, body string"
    )
    ev = spark.createDataFrame([(9, span)], "eid long, etext string")
    # case-folded match is found
    assert corpus.contamination_hits(
        train, "id", "body", ev, "eid", "etext", n=13
    ).count() == 1
    # allowance: one shared gram tolerated at max_hit_grams=5
    kept = corpus.decontaminate(
        train, "id", "body", ev, "eid", "etext", n=13, max_hit_grams=5
    )
    assert kept.count() == 1


def test_contamination_plan_broadcasts_eval(spark):
    train = spark.createDataFrame(
        [(i, "alpha beta gamma " * 10) for i in range(20)],
        "id long, body string",
    )
    ev = spark.createDataFrame([(1, "alpha beta gamma " * 5)], "eid long, etext string")
    plan = corpus.contamination_hits(
        train, "id", "body", ev, "eid", "etext", n=5
    )._jdf.queryExecution().executedPlan().toString()
    # eval grams arrive via broadcast: the corpus side never shuffles
    # before the join (the only exchange feeds the post-join hash-agg)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_hand_computed(spark):
    """Two-doc corpus, single-term query, scores checked against the
    Lucene-variant formula by hand; non-matching docs absent."""
    import math

    df = spark.createDataFrame(
        [
            (1, "spark spark flies"),   # tf=2, dl=3
            (2, "spark"),               # tf=1, dl=1
            (3, "duck goose"),          # no match
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bm25"]
            for r in corpus.bm25_scores(df, "doc_id", "text", ["spark"]).collect()}
    assert set(rows) == {1, 2}
    n, dfreq, avgdl, k1, b = 3.0, 2.0, 2.0, 1.2, 0.75
    idf = math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))

    def s(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 4)

    assert abs(rows[1] - s(2, 3)) < 1e-9
    assert abs(rows[2] - s(1, 1)) < 1e-9
    # rarer-term ranking: doc with the rare term outranks common-term doc
    df2 = spark.createDataFrame(
        [(1, "rare word here"), (2, "common word here"), (3, "common stuff also")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["bm25"]
           for r in corpus.bm25_scores(df2, "doc_id", "text", ["rare", "common"]).collect()}
    assert got[1] > got[2]
    with pytest.raises(ValueError):
        corpus.bm25_scores(df, "doc_id", "text", [])


def test_chunk_documents_windows_and_tail(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "  x   y  "), (3, "")],
        ["doc_id", "text"],
    )
    rows = corpus.chunk_documents(df, "doc_id", "text", chunk_tokens=3)
    got = {(r["doc_id"], r["__cpos"]): r["__chunk"] for r in rows.collect()}
    assert got == {
        (1, 0): "a b c", (1, 1): "d e f", (1, 2): "g",
        (2, 0): "x y",
    }  # doc 3 (empty) produces no chunks; multi-space collapses


def test_dedup_chunks_keep_first_and_reassembly(spark):
    # doc 1 owns both chunks; doc 2 repeats chunk "a b c" then adds a
    # fresh one; doc 3 is ENTIRELY chunks seen earlier -> vanishes
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x y z"),
            (3, "d e f a b c"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: (r.text_deduped, r.n_chunks_kept)
        for r in corpus.dedup_chunks(df, "doc_id", "text", chunk_tokens=3)
        .collect()
    }
    assert out == {
        1: ("a b c d e f", 2),
        2: ("x y z", 1),
    }


def test_dedup_chunks_within_doc_repeat(spark):
    # the SAME chunk repeated inside one doc keeps only the first copy
    df = spark.createDataFrame([(7, "p q r p q r")], ["doc_id", "text"])
    out = corpus.dedup_chunks(df, "doc_id", "text", chunk_tokens=3).collect()
    assert len(out) == 1
    assert out[0].text_deduped == "p q r"
    assert out[0].n_chunks_kept == 1


def test_shuffle_shards_deterministic_partition(spark):
    df = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    a = corpus.shuffle_shards(df, "doc_id", n_shards=4, seed="s").collect()
    b = corpus.shuffle_shards(df, "doc_id", n_shards=4, seed="s").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append((r.pos, r.doc_id))
    assert sum(len(v) for v in by_shard.values()) == 40
    for shard, rows in by_shard.items():
        poss = sorted(p for p, _ in rows)
        assert poss == list(range(len(rows)))  # dense 0..n-1 positions
        assert all(r.n_in_shard == len(rows) for r in a if r.shard == shard)
    # a different seed must produce a different assignment
    c = corpus.shuffle_shards(df, "doc_id", n_shards=4, seed="t").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in a} != {
        (r.doc_id, r.shard, r.pos) for r in c
    }


def test_weighted_sample_matches_python_reference(spark):
    """The Spark top-k by priority equals a pure-Python recomputation."""
    import hashlib

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", (F.col("n_chars") + 1).cast("double").alias("weight")
    )
    got = [
        (r["doc_id"], r["priority"])
        for r in corpus.weighted_sample(docs, "doc_id", "weight", k=10).collect()
    ]
    rows = docs.collect()
    ref = []
    for r in rows:
        h = int(
            hashlib.md5(f"{r['doc_id']}:wsample".encode()).hexdigest()[:12], 16
        )
        u = (h + 0.5) / float(1 << 48)
        ref.append((r["doc_id"], r["weight"] / u))
    ref.sort(key=lambda t: (-t[1], t[0]))
    assert [g[0] for g in got] == [t[0] for t in ref[:10]]
    for (gid, gpri), (rid, rpri) in zip(got, ref[:10]):
        assert gpri == round(rpri, 4), (gid, gpri, rpri)


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """Repartitioning never changes the sample; an overwhelming weight
    forces inclusion."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", (F.col("n_chars") + 1).cast("double").alias("weight")
    )
    a = {r["doc_id"] for r in corpus.weighted_sample(docs, "doc_id", "weight", 10).collect()}
    b = {
        r["doc_id"]
        for r in corpus.weighted_sample(
            docs.repartition(7), "doc_id", "weight", 10
        ).collect()
    }
    assert a == b
    heavy = docs.withColumn(
        "weight",
        F.when(F.col("doc_id") == 3, F.lit(1e18)).otherwise(F.col("weight")),
    )
    c = {r["doc_id"] for r in corpus.weighted_sample(heavy, "doc_id", "weight", 10).collect()}
    assert 3 in c


def test_weighted_sample_plan_is_take_ordered(spark):
    """Top-k must compile to TakeOrdered, never a global sort."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", (F.col("n_chars") + 1).cast("double").alias("weight")
    )
    plan = (
        corpus.weighted_sample(docs, "doc_id", "weight", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrdered" in plan


def test_canonical_url_rules(spark):
    """Case folding scheme/host only, www strip, fragment drop,
    tracking-param removal, surviving-param sort, trailing slash."""
    cases = [
        ("HTTPS://WWW.Site.COM/Docs/A?b=2&utm_source=x&a=1#frag",
         "https://site.com/Docs/A?a=1&b=2"),
        ("http://site.com/path/", "http://site.com/path"),
        ("https://site.com/?fbclid=zz", "https://site.com"),
        ("https://site.com/p?ref=home&keep=1", "https://site.com/p?keep=1"),
        ("https://site.com/p", "https://site.com/p"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "id long, url string")
    got = {r["id"]: r["c"] for r in df.select(
        "id", corpus.canonical_url("url").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_dedup_by_canonical_url_keeps_preferred(spark):
    df = spark.createDataFrame(
        [
            (1, "https://www.site.com/a?utm_source=x", 5),
            (2, "HTTPS://site.com/a#top", 9),          # same page, higher quality
            (3, "https://site.com/b", 1),
        ],
        "id long, url string, quality int",
    )
    kept = corpus.dedup_by_canonical_url(
        df, "url", [F.desc("quality"), F.asc("id")]
    )
    rows = {r["canonical_url"]: r["id"] for r in kept.collect()}
    assert rows == {"https://site.com/a": 2, "https://site.com/b": 3}


def test_weighted_sample_k_exceeds_n_and_null_url(spark):
    """k > n returns everything (no crash); canonical_url of NULL is NULL."""
    docs = spark.createDataFrame([(1, 2.0), (2, 3.0)], "doc_id long, weight double")
    assert corpus.weighted_sample(docs, "doc_id", "weight", 10).count() == 2
    nul = spark.createDataFrame([(None,)], "url string")
    assert nul.select(corpus.canonical_url("url").alias("c")).first()["c"] is None


def test_strip_boilerplate_chunks_removes_shared_keeps_unique(spark):
    # chunk size 3: "a b c" is shared verbatim between docs 1 and 2;
    # each doc's second chunk is unique and must survive in order
    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c p q r"),
            (3, "solo text here only once"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_removed"], r["clean_text"])
        for r in corpus.strip_boilerplate_chunks(
            df, "doc_id", "text", chunk_tokens=3, max_doc_freq=1
        ).collect()
    }
    assert out[1] == (2, 1, "x y z")
    assert out[2] == (2, 1, "p q r")
    assert out[3] == (2, 0, "solo text here only once")


def test_strip_boilerplate_fully_templated_doc_survives_empty(spark):
    df = spark.createDataFrame(
        [(1, "same same"), (2, "same same"), (3, "other words")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_chunks"], r["n_removed"], r["clean_text"])
        for r in corpus.strip_boilerplate_chunks(
            df, "doc_id", "text", chunk_tokens=2, max_doc_freq=1
        ).collect()
    }
    assert out[1] == (1, 1, "") and out[2] == (1, 1, "")
    assert out[3] == (1, 0, "other words")
    assert len(out) == 3   # every input doc present


def test_strip_boilerplate_threshold_and_order(spark):
    # threshold 2: a chunk in exactly 2 docs stays, in 3 docs goes;
    # multi-chunk docs reassemble in original chunk order
    df = spark.createDataFrame(
        [
            (1, "c1 c1 u1 u1 c2 c2"),
            (2, "c1 c1 u2 u2 c2 c2"),
            (3, "c2 c2 u3 u3"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in corpus.strip_boilerplate_chunks(
            df, "doc_id", "text", chunk_tokens=2, max_doc_freq=2
        ).collect()
    }
    # "c2 c2" is in 3 docs (> 2) -> stripped; "c1 c1" in 2 docs -> kept
    assert out[1] == "c1 c1 u1 u1"
    assert out[2] == "c1 c1 u2 u2"
    assert out[3] == "u3 u3"


def test_trim_dup_spans_removes_all_but_first_occurrence(spark):
    """A 10-token run pasted into doc 2 at an UNALIGNED offset is
    removed there and kept at its first occurrence; unique text
    survives untouched; overlapping duplicate windows union."""
    run = " ".join(f"w{i}" for i in range(12))  # 12-token shared run
    docs = spark.createDataFrame(
        [
            (1, "alpha " + run + " beta"),
            (2, "x y z " + run + " tail unique tokens here"),
            (3, "completely unrelated text with nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in corpus.trim_dup_spans(docs, "doc_id", "text", width=10)
        .collect()
    }
    # doc 1 is the canonical (lowest id) occurrence — fully intact
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == "alpha " + run + " beta"
    # doc 2 loses exactly the 12 shared tokens (3 overlapping dup
    # windows at offsets 3,4,5 cover positions 3..14), keeps the rest
    assert out[2]["n_removed"] == 12
    assert out[2]["text_clean"] == "x y z tail unique tokens here"
    assert out[3]["n_removed"] == 0
    # a doc shorter than the window can never be trimmed
    short = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_removed"]
        for r in corpus.trim_dup_spans(short, "doc_id", "text", width=10)
        .collect()
    }
    assert got == {1: 0, 2: 0}


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs sharing the target's vocabulary must out-weigh docs from a
    disjoint vocabulary, and weights are reproducible bag LLRs (a doc
    with no features scores exactly 0.0)."""
    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quick brown fox and the lazy dog again"),
            (2, "zzz qqq vvv kkk mmm nnn ppp rrr"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    w = {
        r["doc_id"]: r
        for r in corpus.dsir_log_importance(raw, target, "doc_id", "text").collect()
    }
    assert set(w) == {1, 2, 3}
    assert w[1]["log_importance"] > w[2]["log_importance"]
    assert w[3]["n_features"] == 0 and w[3]["log_importance"] == 0.0
    # per-occurrence features: unigrams + bigrams of an n-token doc
    assert w[1]["n_features"] == 8 + 7


def test_dsir_select_topk_and_gumbel_deterministic(spark):
    """topk mode returns the k highest-weight docs; gumbel mode is a
    deterministic resample (same result on re-run) that still ranks
    target-like docs above disjoint-vocabulary ones in aggregate."""
    target = spark.createDataFrame(
        [(900, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    rows = [(i, "alpha beta gamma delta epsilon") for i in range(10)]
    rows += [(100 + i, "foo bar baz qux quux corge grault") for i in range(10)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    top = corpus.dsir_select(
        raw, target, "doc_id", "text", k=10, mode="topk"
    ).collect()
    assert sorted(r["doc_id"] for r in top) == list(range(10))
    g1 = corpus.dsir_select(
        raw, target, "doc_id", "text", k=10, mode="gumbel"
    ).collect()
    g2 = corpus.dsir_select(
        raw, target, "doc_id", "text", k=10, mode="gumbel"
    ).collect()
    assert [r["doc_id"] for r in g1] == [r["doc_id"] for r in g2]
    # resampling is noisy but weight-dominated here: the on-target
    # docs carry a large LLR margin, so most selections come from them
    n_target_like = sum(1 for r in g1 if r["doc_id"] < 100)
    assert n_target_like >= 8
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.dsir_select(raw, target, "doc_id", "text", k=3, mode="nope")

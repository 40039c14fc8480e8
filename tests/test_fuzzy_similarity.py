"""Training-data extensions: near-dup dedup parity + ANN recall + plan shape.

The LSH paths are approximations of the exact paths; these tests pin
(a) exact-path correctness on constructed cases, (b) LSH vs exact
parity/recall on the driver's documents/embeddings tables, and
(c) that no candidate-generation path degenerates into a cartesian
product (the 100 TB kill criterion).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import fuzzy, similarity, text


def _no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    # BroadcastNestedLoopJoin is the other all-pairs shape
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_ngram_jaccard_exact_pairs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different words entirely here now"),
        ],
        "doc_id int, text string",
    )
    out = fuzzy.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    rows = out.collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    # 7 shingles each, 6 shared -> 6/8
    assert rows[0].jaccard == 0.75
    _no_cartesian(out)


def test_containment_finds_quote_inclusion_jaccard_misses(spark):
    """A short doc verbatim inside a long one: containment 1.0, but
    Jaccard far below any useful threshold — the asymmetric measure's
    reason to exist."""
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, quote),
            (2, filler + " " + quote + " " + filler.upper()),
            (3, "completely different words entirely here now"),
        ],
        "doc_id int, text string",
    )
    out = fuzzy.containment_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    rows = out.collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].containment_a == 1.0  # every shingle of 1 is in 2
    assert rows[0].containment_b < 0.1
    jac = fuzzy.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    assert jac.collect() == []  # symmetric threshold provably misses it
    _no_cartesian(out)


def test_containment_stop_shingle_cap_drops_hot_shingles(spark):
    """With a cap, a shingle present in every doc stops generating
    candidates: docs related ONLY through it pair without the cap and
    do not pair with it."""
    boiler = "all rights reserved by the original author"
    docs = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} {boiler}") for i in range(6)],
        "doc_id int, text string",
    )
    uncapped = fuzzy.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=None
    )
    capped = fuzzy.containment_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=5
    )
    assert uncapped.count() == 15  # all pairs share the boilerplate run
    assert capped.count() == 0
    _no_cartesian(capped)


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """On real documents, banded-LSH + verify == the exact path."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = fuzzy.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.8)
    lsh = fuzzy.minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=64, bands=16, threshold=0.8
    )
    e = {(r.id_a, r.id_b, r.jaccard) for r in exact.collect()}
    l = {(r.id_a, r.id_b, r.jaccard) for r in lsh.collect()}
    assert e, "fixture should contain near-dup pairs"
    # verification makes LSH precise; banding at r=4,b=16 catches s>=0.8 w.h.p.
    assert l == e
    _no_cartesian(lsh)


def test_simhash_identical_and_distinct(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # identical -> hamming 0
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id int, text string",
    )
    out = fuzzy.simhash_pairs(docs, "doc_id", "text", max_hamming=3, prefix_bits=4)
    rows = out.collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 0)]
    _no_cartesian(out)


def test_simhash_rotations_recover_prefix_recall(spark):
    """A near-dup pair whose few differing bits all land in the top-16
    prefix window is provably invisible to the single-rotation block
    (the buckets differ) but is found once the rotations spread the
    prefix window across the word."""
    x = 0x0123456789ABCDEF
    y = x ^ (1 << 62) ^ (1 << 55)  # hamming 2, both flips inside the top 16 bits
    sig = spark.createDataFrame([(1, x), (2, y)], "__id int, simhash long")
    single = fuzzy.simhash_pairs_from_signatures(
        sig, max_hamming=3, prefix_bits=16, rotations=1
    ).collect()
    assert single == []  # the recall gap the docstring documents
    multi = fuzzy.simhash_pairs_from_signatures(
        sig, max_hamming=3, prefix_bits=16, rotations=4
    ).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in multi] == [(1, 2, 2)]


def test_simhash_rotations_consistent_on_text(spark):
    """rotations > 1 only ADDS candidate pairs: on a real corpus the
    rotations=4 pair set is a superset of rotations=1, and every pair
    still satisfies the hamming bound."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon"),
            (4, "completely different words entirely here"),
        ],
        "doc_id int, text string",
    )
    one = {
        (r.id_a, r.id_b, r.hamming)
        for r in fuzzy.simhash_pairs(docs, "doc_id", "text", rotations=1).collect()
    }
    four = {
        (r.id_a, r.id_b, r.hamming)
        for r in fuzzy.simhash_pairs(docs, "doc_id", "text", rotations=4).collect()
    }
    assert one <= four
    assert (1, 3, 0) in one
    assert all(h <= 3 for _, _, h in four)


def test_simhash_portable_rotations_equals_exact_hamming_set(spark, sf_dir):
    """Pigeonhole recall proof: at (prefix_bits=16, rotations=4,
    max_hamming=3) a qualifying pair differs in at most 3 bits spread
    over 4 disjoint 16-bit windows, so one window is always identical
    — the banded output must EQUAL the brute-force all-pairs
    hamming<=3 set over the same md5 signatures, not approximate it.
    This is the invariant the `dedup_simhash_rotations` oracle leans
    on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    banded = fuzzy.simhash_pairs_portable_rotations(docs, "doc_id", "text", max_hamming=3)
    sig = fuzzy.simhash_md5_signature(docs, "doc_id", "text")
    a = sig.select(F.col("__id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sig.select(F.col("__id").alias("id_b"), F.col("simhash").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    brute = (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .where(ham <= 3)
        .select("id_a", "id_b", ham.alias("hamming"))
    )
    got = {(r.id_a, r.id_b, r.hamming) for r in banded.collect()}
    want = {(r.id_a, r.id_b, r.hamming) for r in brute.collect()}
    assert want, "fixture should contain near-dup pairs"
    assert got == want
    _no_cartesian(banded)


def test_simhash_portable_finds_exact_dups(spark, sf_dir):
    """Both SimHash variants must find every exact-duplicate pair
    (identical token streams -> identical signature -> hamming 0).
    Borderline hamming<=3 pairs legitimately differ between hash
    families, so the exact-dup core is the cross-variant invariant."""
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # Plant exact duplicates: re-id a deterministic subset at +1000000.
    dup = base.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    docs = base.unionByName(dup)
    exact_dups = {(d, d + 1000000) for d in {r.doc_id for r in base.collect()} if d % 10 == 0}
    assert exact_dups, "fixture should contain exact duplicate docs"
    portable = fuzzy.simhash_pairs_portable(docs, "doc_id", "text", max_hamming=3)
    default = fuzzy.simhash_pairs(docs, "doc_id", "text", max_hamming=3, prefix_bits=16)
    p = {(r.id_a, r.id_b) for r in portable.collect()}
    d = {(r.id_a, r.id_b) for r in default.collect()}
    assert exact_dups <= p
    assert exact_dups <= d
    _no_cartesian(portable)


def test_simhash_portable_identical_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # identical -> hamming 0
            (3, "zeta eta theta iota kappa"),
        ],
        "doc_id int, text string",
    )
    rows = fuzzy.simhash_pairs_portable(docs, "doc_id", "text", max_hamming=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 0)]


def test_ngram_jaccard_stop_shingle_cap_bounded(spark, sf_dir):
    """The (default-on) stop-shingle cap is a no-op at sub-cap corpus
    sizes, and even an aggressive cap keeps the pair set with only a
    small jaccard perturbation on real near-dups."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kw = dict(n=3, threshold=0.8)
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy.ngram_jaccard_pairs(
            docs, "doc_id", "text", max_shingle_df=None, **kw
        ).collect()
    }
    default = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy.ngram_jaccard_pairs(docs, "doc_id", "text", **kw).collect()
    }
    assert default == exact  # 10k cap is a strict no-op below 10k docs
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in fuzzy.ngram_jaccard_pairs(
            docs, "doc_id", "text", max_shingle_df=5, **kw
        ).collect()
    }
    assert set(capped) == set(exact)
    assert all(abs(capped[k] - exact[k]) <= 0.05 for k in exact)


def test_exact_dedup_stats(spark):
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id int, text string"
    )
    row = fuzzy.exact_dedup_stats(docs, "text").collect()[0]
    assert (row.n_docs, row.n_unique) == (3, 2)


def test_cosine_topk_bruteforce_known_geometry(spark):
    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),   # closest to 1
            (3, [0.0, 1.0]),   # orthogonal to 1
        ],
        "vec_id int, embedding array<double>",
    )
    q = docs.filter(F.col("vec_id") == 1)
    out = similarity.cosine_topk_bruteforce(docs, q, "vec_id", "embedding", k=2)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [2, 3]
    assert rows[0].cosine > 0.99


def test_cosine_topk_lsh_recall(spark, sf_dir):
    """LSH ANN must recover most of the true top-5 on real embeddings."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.cosine_topk_bruteforce(emb, q, "vec_id", "embedding", k=5)
    approx = similarity.cosine_topk_lsh(
        emb, q, "vec_id", "embedding", k=5, planes=4, dim=64
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"recall {recall:.2f}"
    _no_cartesian(approx)


def test_cosine_near_dup_lsh_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = similarity.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, method="exact"
    )
    lsh = similarity.cosine_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, method="lsh"
    )
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    l = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert e, "threshold should produce some pairs on this fixture"
    assert l <= e  # verification makes LSH precise (no false positives)
    assert len(l) / len(e) >= 0.5  # recall floor on near-random embeddings
    _no_cartesian(lsh)
    with pytest.raises(ValueError, match="unknown method"):
        similarity.cosine_near_dup_pairs(emb, "vec_id", "embedding", method="nope")


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "The quick brown fox."), (2, "  spaced   out  words  ")],
        "doc_id int, text string",
    )
    out = df.select(
        "doc_id",
        text.token_count("text").alias("n"),
        text.fingerprint("text").alias("fp"),
    ).collect()
    got = {r.doc_id: r.n for r in out}
    assert got == {1: 4, 2: 3}
    # fingerprint is whitespace-insensitive
    a = df.select(text.fingerprint("text").alias("fp")).collect()
    b = spark.createDataFrame([(1, "the quick brown fox.")], "doc_id int, text string") \
        .select(text.fingerprint("text").alias("fp")).collect()
    assert a[0].fp == b[0].fp


def test_quality_filter_composite(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a hat and a bat near the door"),
            (2, "tiny doc"),                     # too_short
            (3, "supercalifragilistic " * 20),   # word_length (long words)
            (4, "the a of and to " * 10),        # stopword_spam
        ],
        "doc_id int, text string",
    )
    tagged = text.quality_tag(
        docs, "text", min_tokens=5, word_len_range=(2.0, 8.0),
        max_stopword_ratio=0.5, max_punct_ratio=0.3,
    )
    reasons = {r.doc_id: r.quality_reject_reason for r in tagged.collect()}
    assert reasons[1] is None
    assert reasons[2] == "too_short"
    assert reasons[3] == "word_length"
    assert reasons[4] == "stopword_spam"
    kept = text.quality_filter(
        docs, "text", min_tokens=5, word_len_range=(2.0, 8.0),
        max_stopword_ratio=0.5, max_punct_ratio=0.3,
    )
    assert [r.doc_id for r in kept.collect()] == [1]
    assert "quality_reject_reason" not in kept.columns


def test_cluster_pairs_transitive_components(spark):
    # chain 1-2-3 (1,3 never paired directly) + pair 10-11; 99 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    comp = {r.id: r.cluster_id for r in fuzzy.cluster_pairs(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id bigint"
    )
    out = fuzzy.canonical_docs(docs, "doc_id", fuzzy.cluster_pairs(pairs))
    canon = sorted(r.doc_id for r in out.collect() if r.is_canonical)
    assert canon == [1, 10, 99]  # one keeper per group, singleton kept


def test_cluster_pairs_long_chain_converges(spark):
    # path graph of diameter 2^7: plain hash-min propagation would need
    # ~128 rounds, so full convergence within max_iter=12 pins that the
    # pointer jump actually delivers the O(log diameter) bound
    # (driver_cc=False: this test exists to pin the DISTRIBUTED loop)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(128)], "id_a bigint, id_b bigint"
    )
    out = fuzzy.cluster_pairs(pairs, max_iter=12, driver_cc=False).collect()
    assert len(out) == 129
    assert {r.cluster_id for r in out} == {0}


def test_ivf_topk_recall_and_exact_at_full_probe(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id % 250 = 0")
    exact = set(
        map(tuple, similarity.cosine_topk_bruteforce(emb, q, "vec_id", "embedding", k=5)
            .select("query_id", "neighbor_id").collect())
    )
    # nprobe = n_centroids: same plumbing, provably exhaustive -> exact
    full = set(
        map(tuple, similarity.cosine_topk_ivf(
            emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=8)
            .select("query_id", "neighbor_id").collect())
    )
    assert full == exact
    # aggressive pruning keeps a meaningful share of neighbors (floor,
    # not exact — 2 of 8 cells is 25% coverage on 500 background-
    # regime vectors; the round-12 hash-spread init measures 0.5 on
    # this 10-pair sample where lowest-id init happened to hit 0.6)
    pruned = set(
        map(tuple, similarity.cosine_topk_ivf(
            emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=2)
            .select("query_id", "neighbor_id").collect())
    )
    assert len(pruned & exact) / len(exact) >= 0.5


def test_kmeans_centroids_deterministic_and_normalized(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.kmeans_centroids(emb, "vec_id", "embedding", 4, iters=2)
    b = similarity.kmeans_centroids(emb, "vec_id", "embedding", 4, iters=2)
    assert a == b
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_kmeans_sampled_training_contract(spark):
    """FAISS-style sampled training: at or below the cap the sample IS
    the corpus (bit-identical to full training); above it the Lloyd
    rounds run on a deterministic hash-sample — reproducible and
    still unit-norm."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = similarity.kmeans_centroids(emb, "vec_id", "embedding", 4, iters=2)
    # 500 rows <= both caps: default (1024) and an explicit 500
    assert full == similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, train_sample_cap=500
    )
    sampled = similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, train_sample_cap=200
    )
    assert sampled == similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, train_sample_cap=200
    )
    assert sampled != full  # trained on a strict subset
    for c in sampled:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9
    books_full = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=32, iters=1
    )
    assert books_full == similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=32, iters=1,
        train_sample_cap=500,
    )
    books_s = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=32, iters=1,
        train_sample_cap=250,
    )
    assert books_s == similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=32, iters=1,
        train_sample_cap=250,
    )


def test_ivf_indexed_matches_unindexed(spark, tmp_path):
    """The materialized-index path must return exactly what the
    inline path returns for the same (n_centroids, nprobe, k)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id % 250 = 0")
    idx = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, "vec_id", "embedding", idx,
                               n_centroids=8, iters=3)
    inline = similarity.cosine_topk_ivf(
        emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=6, iters=3,
    ).collect()
    indexed = similarity.cosine_topk_ivf_indexed(
        spark, idx, q, "vec_id", "embedding", k=5, nprobe=6,
    ).collect()
    assert sorted(map(tuple, indexed)) == sorted(map(tuple, inline))


def test_append_to_ivf_index_exact_at_full_probe(spark, tmp_path):
    """build(half) + append(other half): every appended vector must
    land in its stored-centroid cell, and an exhaustive probe over the
    appended index equals brute force over the full corpus — i.e. the
    appended rows are present, scoreable, and correctly partitioned."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b1 = emb.filter("vec_id % 2 = 0")
    b2 = emb.filter("vec_id % 2 = 1")
    q = emb.filter("vec_id % 250 = 0")
    idx = str(tmp_path / "ivf")
    cents = similarity.build_ivf_index(b1, "vec_id", "embedding", idx,
                                       n_centroids=8, iters=3)
    similarity.append_to_ivf_index(spark, b2, "vec_id", "embedding", idx)

    # appended rows carry the stored-centroid assignment
    cells = spark.read.parquet(f"{idx}/cells")
    got = {r["neighbor_id"]: r["__cid"] for r in
           cells.join(b2.select(F.col("vec_id").alias("neighbor_id")),
                      "neighbor_id").select("neighbor_id", "__cid").collect()}
    want = {r.vec_id: r.cid for r in b2.select(
        "vec_id",
        similarity._assign_centroid(cents)(
            similarity.as_double_vec("embedding")).alias("cid")).collect()}
    assert got == want and len(got) == b2.count()

    exhaustive = similarity.cosine_topk_ivf_indexed(
        spark, idx, q, "vec_id", "embedding", k=5, nprobe=8)
    brute = similarity.cosine_topk_bruteforce(emb, q, "vec_id", "embedding", k=5)
    assert sorted(map(tuple, exhaustive.collect())) == sorted(
        map(tuple, brute.collect()))


def test_ngram_repetition_scores_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # "a b" x3, "b a" x2 -> top frac 3/5, all dup
            (2, "w x y z"),          # 3 distinct bigrams, no repetition
            (3, "solo"),             # shorter than n -> no rows
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            text.ngram_repetition_scores(df, "doc_id", "text", n=2).collect()}
    assert set(rows) == {1, 2}  # doc 3 has no bigrams
    assert rows[1].n_ngrams == 5
    assert rows[1].top_ngram == "a b"
    assert rows[1].top_ngram_frac == 0.6
    assert rows[1].dup_ngram_frac == 1.0
    assert rows[2].top_ngram_frac == round(1 / 3, 4)
    assert rows[2].dup_ngram_frac == 0.0
    # tie on count -> lexicographically smallest ngram wins
    tie = spark.createDataFrame([(9, "b c b c a d a d")], "doc_id long, text string")
    r9 = text.ngram_repetition_scores(tie, "doc_id", "text", n=2).collect()[0]
    assert r9.top_ngram == "a d"


def test_cap_per_source(spark):
    from aws_medallion_etl_spark.operators import corpus

    rows = [("s1", i, 100 - i) for i in range(5)] + [("s2", 10, 7)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    kept = corpus.cap_per_source(
        df, "source", 2, [F.desc("n_chars"), F.asc("doc_id")]
    ).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r.doc_id)
    # s1 keeps its two longest docs (ids 0,1); undersized s2 keeps all
    assert sorted(by_src["s1"]) == [0, 1]
    assert by_src["s2"] == [10]


def test_dedup_against_corpus(spark):
    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0 -> dropped
            (3, "one two three four five seven"),         # jaccard 3/5 < 0.8 -> kept
            (5, "totally different words entirely here"), # no shared shingle -> kept
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in fuzzy.dedup_against_corpus(
            new, corpus, "doc_id", "text", n=3, threshold=0.8,
            max_shingle_df=None,
        ).collect()
    )
    assert kept == [3, 5]
    # intra-batch duplicates are NOT this operator's job: a new doc
    # duplicating another NEW doc (but no corpus doc) survives
    new2 = new.union(
        spark.createDataFrame(
            [(7, "totally different words entirely here")],
            "doc_id long, text string",
        )
    )
    kept2 = sorted(
        r.doc_id
        for r in fuzzy.dedup_against_corpus(
            new2, corpus, "doc_id", "text", n=3, threshold=0.8,
            max_shingle_df=None,
        ).collect()
    )
    assert kept2 == [3, 5, 7]


def test_token_count_bpe_segments(spark):
    df = spark.createDataFrame(
        [
            (1, "don't stop 123 now!"),   # don / 't / " stop" / " 123" / " now" / "!"
            (2, "hello world"),
            (3, "a1b2"),                  # a / 1 / b / 2 -> letter/digit run breaks
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n for r in
           df.select("doc_id", text.token_count_bpe("text").alias("n")).collect()}
    assert got == {1: 6, 2: 2, 3: 4}


def test_quantize_dequantize_int8_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = df.select(
        "vec_id",
        similarity.quantize_int8("embedding").alias("qs"),
    ).select(
        "vec_id", F.col("qs.q").alias("q"), F.col("qs.scale").alias("scale"),
        similarity.dequantize_int8(F.col("qs")).alias("x"),
    )
    rows = {r.vec_id: r for r in out.collect()}
    assert rows[1].q == [127, -64, 32, 0]  # round(-63.5) away from zero
    assert abs(rows[1].scale - 127.0) < 1e-9
    # max abs reconstruction error is 0.5/scale per component
    for orig, rec in zip([1.0, -0.5, 0.25, 0.0], rows[1].x):
        assert abs(orig - rec) <= 0.5 / rows[1].scale + 1e-12
    # all-zero vector: scale 1.0, zero quantized, exact roundtrip
    assert rows[2].q == [0, 0, 0, 0] and rows[2].x == [0.0] * 4


def test_quantized_cosine_close_to_exact(spark):
    """Cosine on int8-quantized vectors must track the float cosine
    (scale cancels; error comes only from rounding)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.select(
        "vec_id",
        similarity.as_double_vec("embedding").alias("v"),
        similarity.quantize_int8("embedding")["q"].alias("qv"),
    )
    a = q.filter("vec_id = 0").select(
        F.col("v").alias("va"), F.col("qv").alias("qa"))
    pairs = a.crossJoin(q.filter("vec_id IN (1, 2, 3)"))
    rows = pairs.select(
        similarity.cosine(F.col("va"), F.col("v")).alias("exact"),
        similarity.cosine(
            F.transform("qa", lambda x: x.cast("double")),
            F.transform("qv", lambda x: x.cast("double")),
        ).alias("approx"),
    ).collect()
    for r in rows:
        assert abs(r.exact - r.approx) < 0.02


def test_dedup_against_corpus_lsh_matches_exact(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "mh")
    fuzzy.build_minhash_index(existing, "doc_id", "text", idx)
    exact = sorted(r.doc_id for r in fuzzy.dedup_against_corpus(
        new, existing, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=None).collect())
    screened = sorted(r.doc_id for r in fuzzy.dedup_against_corpus_lsh(
        spark, new, existing, "doc_id", "text", idx,
        threshold=0.8, max_shingle_df=None).collect())
    # at (64 hashes, 16 bands) the screen reaches recall 1.0 here
    assert screened == exact
    # params sidecar is honored: rebuilding with different banding
    # changes candidate generation but verification still bounds keeps
    fuzzy.build_minhash_index(existing, "doc_id", "text", idx,
                              num_hashes=16, bands=2)
    loose = set(r.doc_id for r in fuzzy.dedup_against_corpus_lsh(
        spark, new, existing, "doc_id", "text", idx,
        threshold=0.8, max_shingle_df=None).collect())
    # fewer bands -> recall can only DROP -> kept set is a superset
    assert loose >= set(exact)


def test_minhash_index_sanity_check_is_footer_based(spark, tmp_path):
    """Round 14: the probe-time generation sanity check answers
    max(band) from parquet row-group statistics (zero Spark jobs, no
    per-batch index scan). The footer value must equal the Spark
    aggregate, and a sidecar/data generation mismatch must still
    raise through the footer path."""
    import json

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "mh_footer")
    fuzzy.build_minhash_index(existing, "doc_id", "text", idx, bands=16)
    foot = fuzzy._max_band_from_footers(f"{idx}/bands")
    agg = spark.read.parquet(f"{idx}/bands").agg(
        F.max("band")).collect()[0][0]
    assert foot == agg == 15
    # stale sidecar (crash window between bands write and sidecar
    # replace) still detected without any Spark scan
    with open(f"{idx}/params.json") as fh:
        params = json.load(fh)
    params["bands"] = 4
    with open(f"{idx}/params.json", "w") as fh:
        json.dump(params, fh)
    with pytest.raises(ValueError, match="inconsistent"):
        fuzzy.dedup_against_corpus_lsh(
            spark, new, existing, "doc_id", "text", idx,
            threshold=0.8, max_shingle_df=None,
        )


def test_dedup_lsh_stop_shingles_from_stored_stats(spark, tmp_path):
    """With a stop-shingle cap the probe must (a) agree with the
    unindexed dedup_against_corpus under the same cap — the stored
    DF increments + batch counts reproduce the full-text statistics —
    and (b) not add any corpus-text scan beyond the cap-less plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "mh")
    fuzzy.build_minhash_index(existing, "doc_id", "text", idx)
    cap = 5  # small enough to actually drop shingles at sf0.001
    unindexed = sorted(r.doc_id for r in fuzzy.dedup_against_corpus(
        new, existing, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=cap).collect())
    probe = fuzzy.dedup_against_corpus_lsh(
        spark, new, existing, "doc_id", "text", idx,
        threshold=0.8, max_shingle_df=cap)
    assert sorted(r.doc_id for r in probe.collect()) == unindexed

    # the cap must not reintroduce a per-batch CORPUS-text scan (batch
    # text may be scanned freely — the batch is small by design): with
    # corpus and batch in separate files, the capped plan reads the
    # corpus file exactly as often as the cap-less plan (its DF stats
    # come from the index tables instead)
    cpath, bpath = str(tmp_path / "corpus"), str(tmp_path / "batch")
    existing.write.parquet(cpath)
    new.write.parquet(bpath)
    corpus2, batch2 = spark.read.parquet(cpath), spark.read.parquet(bpath)
    plan = lambda cap: fuzzy.dedup_against_corpus_lsh(
        spark, batch2, corpus2, "doc_id", "text", idx,
        threshold=0.8, max_shingle_df=cap,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan(cap).count(cpath) == plan(None).count(cpath)


def test_append_to_minhash_index_equals_rebuild(spark, tmp_path):
    """build(b1) + append(b2) must behave exactly like build(b1 ∪ b2):
    same band set, same aggregated shingle stats, same probe result."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter("doc_id % 4 = 0")
    b2 = docs.filter("doc_id % 4 = 2")
    corpus = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    fuzzy.build_minhash_index(b1, "doc_id", "text", inc)
    fuzzy.append_to_minhash_index(spark, b2, "doc_id", "text", inc)
    fuzzy.build_minhash_index(corpus, "doc_id", "text", full)

    read = lambda p, t: spark.read.parquet(f"{p}/{t}")
    assert sorted(map(tuple, read(inc, "bands").collect())) == sorted(
        map(tuple, read(full, "bands").collect()))
    agg = lambda df: sorted(map(tuple, df.groupBy("shingle").agg(
        F.sum("__df").alias("d")).collect()))
    assert agg(read(inc, "shingle_df")) == agg(read(full, "shingle_df"))

    kept_inc = sorted(r.doc_id for r in fuzzy.dedup_against_corpus_lsh(
        spark, new, corpus, "doc_id", "text", inc,
        threshold=0.8, max_shingle_df=5).collect())
    kept_full = sorted(r.doc_id for r in fuzzy.dedup_against_corpus_lsh(
        spark, new, corpus, "doc_id", "text", full,
        threshold=0.8, max_shingle_df=5).collect())
    assert kept_inc == kept_full


def test_compact_minhash_index_merges_increment_log(spark, tmp_path):
    """After appends the shingle-DF table holds one generation per
    batch; compaction folds it to one row per shingle with identical
    aggregate stats, and the probe result is unchanged."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    b1 = docs.filter("doc_id % 4 = 0")
    b2 = docs.filter("doc_id % 4 = 2")
    corpus = docs.filter("doc_id % 2 = 0")
    new = docs.filter("doc_id % 2 = 1")
    idx = str(tmp_path / "mh")
    fuzzy.build_minhash_index(b1, "doc_id", "text", idx)
    fuzzy.append_to_minhash_index(spark, b2, "doc_id", "text", idx)

    stats = lambda: sorted(map(tuple, spark.read.parquet(f"{idx}/shingle_df")
                               .groupBy("shingle").agg(F.sum("__df")).collect()))
    before = stats()
    n_rows_before = spark.read.parquet(f"{idx}/shingle_df").count()
    fuzzy.compact_minhash_index(spark, idx, target_files=1)
    assert stats() == before
    # merged: exactly one row per shingle now
    assert spark.read.parquet(f"{idx}/shingle_df").count() == len(before)
    assert n_rows_before >= len(before)

    kept = sorted(r.doc_id for r in fuzzy.dedup_against_corpus_lsh(
        spark, new, corpus, "doc_id", "text", idx,
        threshold=0.8, max_shingle_df=5).collect())
    unindexed = sorted(r.doc_id for r in fuzzy.dedup_against_corpus(
        new, corpus, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=5).collect())
    assert kept == unindexed


def test_dedup_lsh_empty_index_keeps_batch(spark, tmp_path):
    """An index built over an EMPTY corpus is a reachable state: the
    probe must keep the whole batch, not crash on the null max(band)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    empty = docs.filter("doc_id < 0")
    new = docs.filter("doc_id % 17 = 0")
    idx = str(tmp_path / "mh0")
    fuzzy.build_minhash_index(empty, "doc_id", "text", idx)
    kept = fuzzy.dedup_against_corpus_lsh(
        spark, new, empty, "doc_id", "text", idx, threshold=0.8)
    assert kept.count() == new.count()


def test_unigram_logprob_separates_gibberish(spark):
    """Prose built from repeated common tokens scores higher than a doc
    of corpus-unique gibberish tokens; the math pins P(t)=count/total."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat again"),
            (3, "zxqv kjhw pqrs"),  # every token unique in the corpus
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in text.unigram_logprob_scores(df, "doc_id", "text").collect()
    }
    assert rows[1]["n_tokens"] == 6 and rows[3]["n_tokens"] == 3
    assert rows[1]["avg_logprob"] > rows[3]["avg_logprob"]
    # unique tokens: P = 1/16 each -> mean ln(1/16)
    import math

    assert abs(rows[3]["avg_logprob"] - round(math.log(1 / 16), 4)) < 1e-9
    # plan: count table broadcast, token side never shuffle-joins
    plan = (
        text.unigram_logprob_scores(df, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_cluster_pairs_releases_round_checkpoints(spark):
    """Repeated CC runs must not accumulate checkpoint blocks: each
    invocation may keep ONE live block set (backing its returned
    frame), never its intermediate rounds'."""
    from aws_medallion_etl_spark.operators import fuzzy

    sc = spark.sparkContext
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)] + [(100, 101)], ["id_a", "id_b"]
    )
    counts = []
    for _ in range(3):
        # driver_cc=False: the round-checkpoint hygiene under test is
        # a property of the distributed loop (the driver path creates
        # no persistent blocks at all)
        out = {r.id: r.cluster_id
               for r in fuzzy.cluster_pairs(pairs, driver_cc=False).collect()}
        assert all(out[i] == 0 for i in range(10)) and out[100] == 100
        counts.append(len(fuzzy._persistent_rdd_ids(sc)))
    # growth bounded to one block set per invocation (strictly less
    # than the ~3 sets per ROUND the unfixed version leaked)
    assert counts[2] - counts[0] <= 2, counts


def test_cluster_pairs_driver_equals_distributed(spark):
    """The budget-guarded driver union-find (round 14) must label
    EXACTLY like the distributed hash-min loop — on a messy random
    graph (dup edges, self-contained components, a chain) and on
    string ids (UTF-8 byte order == code-point order)."""
    import random

    rng = random.Random(7)
    edges = [(rng.randint(0, 400), rng.randint(0, 400)) for _ in range(600)]
    edges += [(i, i + 1) for i in range(1000, 1040)]
    pairs = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = sorted(map(tuple, fuzzy.cluster_pairs(pairs, driver_cc=True).collect()))
    b = sorted(map(tuple, fuzzy.cluster_pairs(pairs, driver_cc=False).collect()))
    assert a == b and len(a) > 0
    sp = pairs.selectExpr("cast(id_a as string) id_a",
                          "cast(id_b as string) id_b")
    a = sorted(map(tuple, fuzzy.cluster_pairs(sp, driver_cc=True).collect()))
    b = sorted(map(tuple, fuzzy.cluster_pairs(sp, driver_cc=False).collect()))
    assert a == b
    # schema parity: same column names and id dtype either way
    d1 = fuzzy.cluster_pairs(pairs, driver_cc=True)
    d2 = fuzzy.cluster_pairs(pairs, driver_cc=False)
    assert d1.columns == d2.columns == ["id", "cluster_id"]
    assert [f.dataType for f in d1.schema] == [f.dataType for f in d2.schema]


def test_cluster_pairs_driver_path_guards(spark, monkeypatch):
    """The driver path fires only inside its budget and type guards:
    over-budget, NULL endpoints, and non-integral/string ids all fall
    through to the distributed loop (read back via the
    ``last_cc_path`` ContextVar, same observability pattern as the
    admission decision)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    expected = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    got = {r.id: r.cluster_id for r in fuzzy.cluster_pairs(pairs).collect()}
    assert got == expected
    assert fuzzy.last_cc_path() == {"path": "driver", "sym_rows": 6}
    # over-budget -> distributed
    monkeypatch.setattr(fuzzy, "_DRIVER_CC_SYM_ROWS", 2)
    big = fuzzy.cluster_pairs(pairs)
    assert fuzzy.last_cc_path() == {"path": "distributed", "sym_rows": 6}
    assert {r.id: r.cluster_id for r in big.collect()} == expected
    monkeypatch.setattr(fuzzy, "_DRIVER_CC_SYM_ROWS", 1 << 20)
    # NULL endpoint -> distributed (the loop's equi-join never matches
    # NULL; union-find would conflate them)
    np_ = spark.createDataFrame([(1, 2), (None, 3)], "id_a bigint, id_b bigint")
    fuzzy.cluster_pairs(np_).collect()
    assert fuzzy.last_cc_path()["path"] == "distributed"
    # non-integral/string id type -> distributed, ruled out pre-count
    dbl = pairs.selectExpr("cast(id_a as double) id_a",
                           "cast(id_b as double) id_b")
    fuzzy.cluster_pairs(dbl).collect()
    assert fuzzy.last_cc_path() == {"path": "distributed", "sym_rows": None}
    # flag off -> distributed
    fuzzy.cluster_pairs(pairs, driver_cc=False).collect()
    assert fuzzy.last_cc_path() == {"path": "distributed", "sym_rows": None}


def test_merge_clusters_driver_cc_passthrough(spark):
    """merge_clusters(driver_cc=...) reaches the contracted CC and both
    settings produce the identical merged labeling."""
    base_pairs = spark.createDataFrame(
        [(2, 4), (6, 8)], "id_a bigint, id_b bigint"
    )
    labels = fuzzy.cluster_pairs(base_pairs, driver_cc=False)
    new_pairs = spark.createDataFrame(
        [(4, 6), (1, 3)], "id_a bigint, id_b bigint"
    )
    m1 = sorted(map(tuple, fuzzy.merge_clusters(
        labels, new_pairs, driver_cc=True).collect()))
    m2 = sorted(map(tuple, fuzzy.merge_clusters(
        labels, new_pairs, driver_cc=False).collect()))
    assert m1 == m2
    got = dict(m1)
    assert got == {1: 1, 3: 1, 2: 2, 4: 2, 6: 2, 8: 2}


def test_semantic_dedup_assignment_matches_numpy_argmax(spark):
    """Codegen cluster argmax == numpy brute-force argmax (ties -> lowest seed)."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = similarity.lowest_id_seeds(emb, "vec_id", "embedding", 4)
    got = {
        r["vec_id"]: r["cluster"]
        for r in similarity.assign_seed_clusters(
            emb, "vec_id", "embedding", seeds
        ).select("vec_id", "cluster").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    S = np.array([s[1] for s in seeds], dtype=np.float64)
    sids = np.array([s[0] for s in seeds])
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        cos = Sn @ (v / np.linalg.norm(v))
        best = sids[np.lexsort((sids, -cos))[0]]
        assert got[r["vec_id"]] == best, r["vec_id"]


def test_semantic_dedup_planted_duplicate_and_keep_policy(spark):
    """A planted near-identical vector pairs with its source inside one
    cluster, and the keep-set drops exactly the higher id."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src = emb.orderBy("vec_id").limit(20)
    dup = src.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.0001)).alias("embedding"),
        "label",
    )
    corpus = src.unionByName(dup)
    pairs = similarity.semantic_dedup_pairs(
        corpus, "vec_id", "embedding", threshold=0.99, n_seeds=4
    ).collect()
    src_id = src.orderBy("vec_id").first()["vec_id"]
    assert any(
        p["id_a"] == src_id and p["id_b"] == src_id + 1_000_000 for p in pairs
    )
    kept = similarity.semantic_dedup_keep(
        corpus, "vec_id", "embedding", threshold=0.99, n_seeds=4
    )
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert src_id in kept_ids and src_id + 1_000_000 not in kept_ids
    assert kept.count() == corpus.count() - len(
        {p["id_b"] for p in pairs}
    )


def test_auto_centroid_count_contract(spark):
    """n_centroids="auto" (round 12): fixed expected cell size, floor
    8 so grading scales match the old fixed default bit-for-bit, cap
    65,536 where literal-broadcast assignment stops being the right
    tool. And the resolved auto path must EQUAL the explicit-8 path
    below the floor boundary (same centroids, same top-k)."""
    assert similarity.auto_centroid_count(500) == 8
    assert similarity.auto_centroid_count(2000) == 8
    assert similarity.auto_centroid_count(8192) == 8
    assert similarity.auto_centroid_count(8193) == 9
    assert similarity.auto_centroid_count(200_000) == 196
    assert similarity.auto_centroid_count(10**9) == 65_536

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    auto = similarity.cosine_topk_ivf(
        emb, qs, "vec_id", "embedding", k=3, n_centroids="auto", nprobe=4
    ).collect()
    fixed = similarity.cosine_topk_ivf(
        emb, qs, "vec_id", "embedding", k=3, n_centroids=8, nprobe=4
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, auto), key=lambda t: (t[0], t[3])) == \
        sorted(map(tuple, fixed), key=lambda t: (t[0], t[3]))


def test_auto_nprobe_contract(spark):
    """nprobe="auto" (round 13): probed fraction held at 0.75 with
    floor 8 (= exact search at the grading-scale centroid floor) and a
    32k-row pool cap; never above n_centroids."""
    # at the centroid floor: all 8 cells -> exact search
    assert similarity.auto_nprobe(8) == 8
    # fraction regime: ceil(0.75 * C)
    assert similarity.auto_nprobe(16) == 12
    assert similarity.auto_nprobe(20) == 15     # the audited 10x tier
    assert similarity.auto_nprobe(32) == 24
    # pool cap: 32k rows / 1024-row cells = 32 probes max
    assert similarity.auto_nprobe(196) == 32    # the 100x stress tier
    assert similarity.auto_nprobe(65_536) == 32
    # a raised cap buys probes back
    assert similarity.auto_nprobe(196, pool_cap_rows=131_072) == 128
    # tiny explicit centroid counts: never above C
    assert similarity.auto_nprobe(4) == 4

    # the auto-default path over the grading corpus equals explicit
    # exhaustive probing (C=8, nprobe=8): exact search, same rows
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") % 100 == 0)
    auto = similarity.cosine_topk_ivf(
        emb, qs, "vec_id", "embedding", k=3, n_centroids="auto"
    ).collect()
    exact = similarity.cosine_topk_ivf(
        emb, qs, "vec_id", "embedding", k=3, n_centroids=8, nprobe=8
    ).collect()
    key = lambda t: (t[0], t[3])
    assert sorted(map(tuple, auto), key=key) == \
        sorted(map(tuple, exact), key=key)


def test_semantic_dedup_large_seed_set_matches_codegen_path(spark):
    """>32 seeds flips assignment to the Arrow BLAS argmax — it must
    agree with the unrolled codegen form on every vector, and the
    auto count must hold the cluster-size contract."""
    assert similarity.auto_seed_count(500) == 8
    assert similarity.auto_seed_count(2000) == 8
    assert similarity.auto_seed_count(20000) == 79
    assert similarity.auto_seed_count(200000) == 782

    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = similarity.lowest_id_seeds(emb, "vec_id", "embedding", 40)
    via_arrow = {
        r["vec_id"]: r["cluster"]
        for r in similarity.assign_seed_clusters(
            emb, "vec_id", "embedding", seeds
        ).select("vec_id", "cluster").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    S = np.array([s[1] for s in seeds], dtype=np.float64)
    sids = np.array([s[0] for s in seeds])
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        cos = Sn @ (v / np.linalg.norm(v))
        best = sids[np.lexsort((sids, -cos))[0]]
        assert via_arrow[r["vec_id"]] == best, r["vec_id"]


def test_semantic_dedup_assignment_plan_has_no_shuffle(spark):
    """Cluster assignment must stay scan+project — no Exchange."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = similarity.lowest_id_seeds(emb, "vec_id", "embedding", 4)
    plan = (
        similarity.assign_seed_clusters(emb, "vec_id", "embedding", seeds)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_bigram_logprob_penalizes_scrambled_transitions(spark):
    """Token-identical documents: the one with corpus-common TRANSITIONS
    outscores its scrambled twin — the signal unigram scoring cannot see."""
    base = "the cat sat on the mat"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, base),
            (4, "mat the on sat cat the"),  # same bag of tokens, rare bigrams
            (5, "ab cd"),
        ],
        "doc_id long, text string",
    )
    uni = {
        r["doc_id"]: r["avg_logprob"]
        for r in text.unigram_logprob_scores(df, "doc_id", "text").collect()
    }
    assert uni[1] == uni[4]  # unigram is blind to word order
    rows = {
        r["doc_id"]: r
        for r in text.bigram_logprob_scores(df, "doc_id", "text").collect()
    }
    assert rows[1]["n_bigrams"] == 5
    assert rows[1]["avg_logprob"] > rows[4]["avg_logprob"]
    # single-bigram doc: P = 0.7 * 1/1 + 0.3 * c('cd')/N = 0.7 + 0.3/26
    import math

    n_tok = 6 * 4 + 2
    assert rows[5]["avg_logprob"] == round(math.log(0.7 + 0.3 * (1 / n_tok)), 4)
    # docs with < 2 tokens are excluded
    one = spark.createDataFrame([(9, "solo")], "doc_id long, text string")
    assert text.bigram_logprob_scores(one, "doc_id", "text").count() == 0


def test_semantic_dedup_with_kmeans_seeds_production_path(spark):
    """The production seeding (kmeans_centroids -> seeds=) yields pairs
    that are a SUBSET of exact all-pairs at the threshold, and still
    catches a planted duplicate."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dup = emb.orderBy("vec_id").limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.9999)).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(dup)
    cents = similarity.kmeans_centroids(
        corpus, "vec_id", "embedding", n_centroids=4, iters=2
    )
    seeds = [(i, list(c)) for i, c in enumerate(cents)]
    pairs = similarity.semantic_dedup_pairs(
        corpus, "vec_id", "embedding", threshold=0.5, seeds=seeds
    )
    got = {(p["id_a"], p["id_b"]) for p in pairs.collect()}
    exact = similarity.cosine_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.5, method="exact"
    )
    allowed = {(p["id_a"], p["id_b"]) for p in exact.collect()}
    assert got <= allowed
    src_id = emb.orderBy("vec_id").first()["vec_id"]
    assert (src_id, src_id + 1_000_000) in got


def test_js_divergence_drift_detection(spark):
    """A source matching the corpus mixture scores near 0; a divergent
    source scores higher; all values within [0, ln 2]."""
    import math

    rows = (
        [(i, "common", "the cat sat on the mat") for i in range(10)]
        + [(100 + i, "drifted", "zzz qqq xxx vvv www yyy") for i in range(2)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r["js_divergence"]
        for r in text.source_divergence(df, "source", "text").collect()
    }
    assert 0.0 <= out["common"] <= math.log(2) + 1e-9
    assert 0.0 <= out["drifted"] <= math.log(2) + 1e-9
    assert out["drifted"] > out["common"]
    # a corpus with ONE source diverges ~0 from itself
    solo = spark.createDataFrame(
        [(1, "only", "a b c"), (2, "only", "a b d")],
        "doc_id long, source string, text string",
    )
    got = text.source_divergence(solo, "source", "text").first()
    assert got["js_divergence"] == 0.0


def test_merge_clusters_equals_from_scratch(spark):
    """Folding the second half of an edge list into the first half's
    clustering reproduces the from-scratch labeling EXACTLY (min-id
    labels are canonical, so contraction loses nothing) — including a
    chain whose halves only connect through a batch edge, absorbed
    clusters, and brand-new nodes."""
    edges = [
        (1, 2), (2, 3),          # chain -> cluster 1
        (10, 11),                # cluster 10
        (20, 21), (21, 22),      # cluster 20
        (30, 31),                # batch-only cluster
        (3, 10),                 # batch edge merging cluster 1 + 10
        (22, 40),                # batch edge adding a NEW node to cluster 20
    ]
    first = spark.createDataFrame(edges[:5], "id_a long, id_b long")
    second = spark.createDataFrame(edges[5:], "id_a long, id_b long")
    both = spark.createDataFrame(edges, "id_a long, id_b long")

    incremental = fuzzy.merge_clusters(fuzzy.cluster_pairs(first), second)
    scratch = fuzzy.cluster_pairs(both)
    assert (sorted(tuple(r) for r in incremental.collect())
            == sorted(tuple(r) for r in scratch.collect()))

    # idempotent: re-merging the same batch changes nothing
    again = fuzzy.merge_clusters(incremental, second)
    assert (sorted(tuple(r) for r in again.collect())
            == sorted(tuple(r) for r in incremental.collect()))


def test_dedup_against_corpus_return_pairs(spark, sf_dir, tmp_path):
    """return_pairs=True yields exactly the cross edges whose absence
    keeps a row (kept-mode parity), and the band-index screen returns
    the same edge set at recall-1.0 parameters."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)

    pairs = fuzzy.dedup_against_corpus(
        batch, corpus, "doc_id", "text", threshold=0.8, max_shingle_df=None,
        return_pairs=True,
    ).collect()
    assert pairs, "fixture should contain cross near-dups"
    assert all(r.id_a % 2 == 1 and r.id_b % 2 == 0 for r in pairs)
    kept = {r.doc_id for r in fuzzy.dedup_against_corpus(
        batch, corpus, "doc_id", "text", threshold=0.8, max_shingle_df=None,
    ).collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert batch_ids - kept == {r.id_a for r in pairs}

    idx = str(tmp_path / "mhidx")
    fuzzy.build_minhash_index(corpus, "doc_id", "text", idx)
    lsh = fuzzy.dedup_against_corpus_lsh(
        spark, batch, corpus, "doc_id", "text", idx, threshold=0.8,
        max_shingle_df=None, return_pairs=True,
    ).collect()
    assert ({(r.id_a, r.id_b, r.jaccard) for r in lsh}
            == {(r.id_a, r.id_b, r.jaccard) for r in pairs})


def test_strip_html_edge_cases(spark):
    """Uppercase tags, multiline script bodies with '<' inside,
    comments, entities, and run-on whitespace all reduce to readable
    text; block-level closers become newlines."""
    html = (
        "<HTML><HEAD><TITLE>t</TITLE></HEAD><body>\n"
        "<SCRIPT type='x'>\nif (a < b && c > d) { alert('&amp;'); }\n</script>"
        "<style>p { margin: 0 }</style>"
        "<!-- multi\nline\ncomment -->"
        "<p>first&nbsp;para &amp; more</p>"
        "<ul><li>one</li><li>two</li></ul>"
        "<div>last   bit</div></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id int, raw string")
    out = df.select(text.strip_html("raw").alias("clean")).collect()[0]["clean"]
    assert "<" not in out and ">" not in out
    assert "alert" not in out and "margin" not in out  # script/style gone
    assert "comment" not in out
    assert "first para & more" in out
    assert "one\ntwo" in out      # list items newline-separated
    assert "last bit" in out      # whitespace collapsed

    # double-escaped entities (a page DISPLAYING markup) decode ONCE:
    # '&amp;lt;div&amp;gt;' renders as the literal text '&lt;div&gt;',
    # never as a raw tag
    esc = spark.createDataFrame(
        [(1, "<p>use &amp;lt;div&amp;gt; &amp;amp; &amp;nbsp; here</p>")],
        "id int, raw string",
    )
    out2 = esc.select(text.strip_html("raw").alias("c")).collect()[0]["c"]
    assert out2 == "use &lt;div&gt; &amp; &nbsp; here"
    assert "<" not in out2 and ">" not in out2


def test_hashed_features_unigrams_plus_bigrams(spark):
    from aws_medallion_etl_spark.operators import text as tx

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)], ["id", "text"]
    )
    feats = tx.hashed_features(df, "id", "text", n_buckets=64)
    per_id = {
        r["id"]: r["n"]
        for r in feats.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # 3 unigrams + 2 bigrams; single token -> 1; empty/null -> no rows
    assert per_id == {1: 5, 2: 1}
    # buckets are the portable md5 construction — recompute one by hand
    import hashlib

    expected = int(hashlib.md5(b"a b:qclf").hexdigest()[:8], 16) % 64
    got = {
        r["bucket"]
        for r in feats.where(F.col("id") == 1).collect()
    }
    assert expected in got


def test_quality_classifier_separates_known_words(spark):
    from aws_medallion_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "good good great"), (2, "bad awful bad"), (3, "")],
        ["id", "text"],
    )
    # weights: assign every bucket of the positive features +1000,
    # negative features -1000 (bigram buckets too), rest 0
    pos = tx.hashed_features(
        docs.where(F.col("id") == 1), "id", "text", n_buckets=256
    ).select("bucket").distinct()
    neg = tx.hashed_features(
        docs.where(F.col("id") == 2), "id", "text", n_buckets=256
    ).select("bucket").distinct()
    weights = (
        spark.range(256).select(F.col("id").alias("bucket"))
        .join(pos.withColumn("w", F.lit(1000)), "bucket", "left")
        .join(neg.withColumn("w2", F.lit(-1000)), "bucket", "left")
        .select("bucket", F.coalesce("w2", "w", F.lit(0)).alias("w"))
    )
    out = {
        r["id"]: (r["n_features"], r["quality_score"], r["accept"])
        for r in tx.quality_classifier_scores(
            docs, "id", "text", weights, n_buckets=256
        ).collect()
    }
    n1, s1, a1 = out[1]
    n2, s2, a2 = out[2]
    assert n1 == 5 and s1 == 1.0 and a1 is True
    assert n2 == 5 and s2 == -1.0 and a2 is False
    assert out[3] == (0, 0.0, False)  # featureless doc scores the bias


def test_top_dup_ngrams_screen_guard_on_heavy_corpus(spark, tmp_path):
    """On a corpus duplicated enough for the guard (every 5-gram in 30
    docs >= threshold 8) the screened path engages and must equal the
    plain aggregate; the sf-dir query contract is exercised as-is."""
    from aws_medallion_etl_spark.queries import QUERIES

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    docs = spark.createDataFrame(
        [(i, words) for i in range(30)] + [(100, "one two three")],
        ["doc_id", "text"],
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = QUERIES["t_top_dup_ngrams"](spark, str(tmp_path)).collect()
    assert len(out) == 20
    assert all(r["n_docs"] == 30 and r["n_occurrences"] == 30 for r in out)
    # plain reference on the same corpus
    from aws_medallion_etl_spark.operators import text as tx

    plain = (
        tx.word_ngrams(docs, "doc_id", "text", n=5)
        .groupBy("ngram")
        .agg(F.countDistinct("doc_id").alias("n_docs"),
             F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(20)
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in plain]


def test_corpus_diversity_stats(spark):
    from aws_medallion_etl_spark.operators import text

    df = spark.createDataFrame(
        [
            # templated source: both docs share every bigram
            (1, "buy now limited offer", "ads"),
            (2, "buy now limited offer", "ads"),
            # diverse source
            (3, "the quick brown fox", "web"),
            (4, "jumps over lazy dogs", "web"),
            # short doc: no bigrams but still counted in n_docs
            (5, "hi", "web"),
        ],
        ["doc_id", "text", "source"],
    )
    got = {
        r["source"]: (r["n_docs"], r["total_ngrams"], r["distinct_ngrams"])
        for r in text.corpus_diversity_stats(
            df, "doc_id", "text", "source", n=2
        ).collect()
    }
    assert got["ads"] == (2, 6, 3)   # 3 bigrams x 2 docs, all shared
    assert got["web"] == (3, 6, 6)   # all distinct; "hi" adds no grams


# ---------------------------------------------------------------------------
# IVF-PQ (product quantization + exact refine)
# ---------------------------------------------------------------------------

def test_train_pq_codebooks_deterministic_shapes(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2)
    b = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2)
    assert a == b                       # no RNG anywhere
    assert len(a) == 8 and all(len(book) == 16 for book in a)
    assert all(len(cw) == 8 for book in a for cw in book)  # dim 64 / m 8
    # residual codebooks differ from raw ones (they train on v - centroid)
    cents = similarity.kmeans_centroids(emb, "vec_id", "embedding", 4, iters=2)
    r = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2, centroids=cents)
    assert r != a


def test_distributed_lloyd_matches_driver_path(spark):
    """The >budget distributed Lloyd loop (driver_lloyd=False) after
    the round-15 restructure (flat (cid, pos, mean) collect, driver
    re-assembly — the collect_list/array_sort exchange per round is
    gone): still deterministic across runs, unit-norm, and agrees
    with the driver-side NumPy path to float tolerance (the two paths
    differ only in mean summation order, never in assignment)."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dist = similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, driver_lloyd=False)
    assert dist == similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, driver_lloyd=False)
    drv = similarity.kmeans_centroids(
        emb, "vec_id", "embedding", 4, iters=2, driver_lloyd=True)
    assert np.allclose(np.array(dist), np.array(drv), atol=1e-9)
    for c in dist:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9

    bd = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2,
        driver_lloyd=False)
    assert bd == similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2,
        driver_lloyd=False)
    bv = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=8, codes=16, iters=2,
        driver_lloyd=True)
    assert np.allclose(np.array(bd), np.array(bv), atol=1e-9)
    assert len(bd) == 8 and all(len(book) == 16 for book in bd)


def test_encode_pq_codes_in_range(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = similarity.train_pq_codebooks(
        emb, "vec_id", "embedding", m=16, codes=32, iters=2)
    enc = similarity.encode_pq(books)
    rows = (
        emb.select(
            enc(similarity._normalize(
                similarity.as_double_vec("embedding"))).alias("c")
        ).collect()
    )
    assert all(len(r["c"]) == 16 for r in rows)
    assert all(0 <= x < 32 for r in rows for x in r["c"])


def test_ivf_pq_exact_when_shortlist_covers_candidates(spark):
    """With nprobe = n_centroids (exhaustive cells) and a shortlist
    >= corpus size, the refine stage rescores EVERY candidate with the
    exact cosine expression — equality with brute force is provable,
    independent of PQ quantization quality."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id % 250 = 0")
    exact = sorted(map(tuple, similarity.cosine_topk_bruteforce(
        emb, q, "vec_id", "embedding", k=5).collect()))
    pq = sorted(map(tuple, similarity.cosine_topk_ivf_pq(
        emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=8,
        m=16, codes=32, iters=3, shortlist=10**6).collect()))
    assert pq == exact


def test_ivf_pq_shortlist_recall_floor(spark):
    """Grading config (residual PQ 16x32, shortlist 256): the ADC
    shortlist must retain nearly all true neighbors WITHIN the probed
    cells — compare against plain IVF at the same nprobe so cell-probe
    misses (IVF's own recall contract, pinned elsewhere) don't blur
    the PQ-specific loss being measured."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id % 250 = 0")
    ivf = set(map(tuple, similarity.cosine_topk_ivf(
        emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=6, iters=3)
        .select("query_id", "neighbor_id").collect()))
    pq = set(map(tuple, similarity.cosine_topk_ivf_pq(
        emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=6,
        m=16, codes=32, iters=3, shortlist=256)
        .select("query_id", "neighbor_id").collect()))
    assert len(pq & ivf) / len(ivf) >= 0.9


def test_hard_negative_topk_excludes_same_group(spark):
    # two tight same-group clusters + one cross-group near neighbor:
    # the nearest SAME-group vector must never appear
    rows = [
        (1, "a", [1.0, 0.0]), (2, "a", [0.99, 0.14]),   # a-cluster
        (3, "b", [0.9, 0.43]), (4, "b", [0.0, 1.0]),    # b: near + far
    ]
    df = spark.createDataFrame(rows, ["vec_id", "grp", "vec"])
    q = df.where("vec_id = 1")
    out = similarity.hard_negative_topk(
        df, q, "vec_id", "vec", "grp", k=2
    ).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in sorted(
        out, key=lambda r: r["rank"])]
    # 2 (same group, cosine ~0.99) excluded; 3 then 4 by similarity
    assert got == [(3, 1), (4, 2)]
    # NULL group never matches any group (null-safe exclusion)
    dfn = spark.createDataFrame(
        [(1, None, [1.0, 0.0]), (2, None, [0.99, 0.14]),
         (3, "b", [0.5, 0.86])],
        "vec_id bigint, grp string, vec array<double>",
    )
    outn = similarity.hard_negative_topk(
        dfn, dfn.where("vec_id = 1"), "vec_id", "vec", "grp", k=5
    ).collect()
    assert {r["neighbor_id"] for r in outn} == {3}


def test_ivf_pq_indexed_matches_inline(spark, tmp_path):
    """The materialized IVF-PQ path must return exactly what the
    inline path returns for the same config — training determinism,
    codes round-tripped through parquet, ADC over stored columns."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter("vec_id % 250 = 0")
    idx = str(tmp_path / "ivfpq")
    similarity.build_ivf_pq_index(
        emb, "vec_id", "embedding", idx, n_centroids=8, m=16, codes=32,
        iters=3,
    )
    inline = similarity.cosine_topk_ivf_pq(
        emb, q, "vec_id", "embedding", k=5, n_centroids=8, nprobe=6,
        m=16, codes=32, iters=3, shortlist=256,
    ).collect()
    indexed = similarity.cosine_topk_ivf_pq_indexed(
        spark, idx, q, "vec_id", "embedding", k=5, nprobe=6, shortlist=256,
    ).collect()
    assert sorted(map(tuple, indexed)) == sorted(map(tuple, inline))


def test_ivf_pq_index_candidate_scan_prunes_vector_column(spark, tmp_path):
    """The ADC candidate stage must read id + codes ONLY — the raw
    vector column stays out of its parquet scan (the physical byte
    cut the operator exists for)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivfpq2")
    similarity.build_ivf_pq_index(
        emb, "vec_id", "embedding", idx, n_centroids=8, m=16, codes=32,
        iters=2,
    )
    cand = (
        spark.read.parquet(f"{idx}/cells")
        .select("neighbor_id", "__cid", "__codes")
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert "__codes" in plan
    assert "__cv" not in plan  # vector column pruned from the scan


def test_semantic_dedup_multi_probe_superset_and_dedup(spark):
    """probes=2 finds every probes=1 pair (same cosine, possibly a
    smaller cell label), emits each pair exactly ONCE, and catches a
    planted boundary pair hard assignment can miss."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    one = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.semantic_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.2, n_seeds=8
        ).collect()
    }
    two_rows = similarity.semantic_dedup_pairs(
        emb, "vec_id", "embedding", threshold=0.2, n_seeds=8, probes=2
    ).collect()
    two = {(r["id_a"], r["id_b"]): r["cosine"] for r in two_rows}
    assert len(two_rows) == len(two), "each pair must appear once"
    assert set(one) <= set(two)
    for k, v in one.items():
        assert two[k] == v


def test_density_guard_under_budget_is_exact(spark):
    """Round-11 admission control: under the budget the probe is a
    pure observer — results are identical to the guard-disabled run
    and no cap is applied."""
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat today"),
         (2, "the cat sat on the mat today friends"),
         (3, "completely different text about spark engines")],
        ["doc_id", "text"],
    )
    guarded = fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=None
    ).collect()
    assert fuzzy.last_admission["auto_cap"] is None
    assert fuzzy.last_admission["predicted_pairs"] > 0
    exact = fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=None, candidate_budget=None,
    ).collect()
    assert sorted(map(tuple, guarded)) == sorted(map(tuple, exact))


def test_admission_decision_is_per_context(spark):
    """Round-12 re-entrancy pin: two guarded jobs sharing one driver
    (separate threads) each see THEIR OWN admission decision — the
    second job's decision must not clobber the first thread's view
    (the old module global was racy exactly here)."""
    import threading

    boiler = "all rights reserved by the example corporation"
    heavy_rows = [
        (i, f"{boiler} doc number {i} unique tail {i}") for i in range(40)
    ] + [(100, "zebra quokka lemur wombat octopus narwhal pangolin"),
         (101, "zebra quokka lemur wombat octopus narwhal axolotl")]
    heavy = spark.createDataFrame(heavy_rows, ["doc_id", "text"])
    light = spark.createDataFrame(
        [(1, "the cat sat on the mat today"),
         (2, "the cat sat on the mat today friends")],
        ["doc_id", "text"],
    )
    ran = threading.Event()
    seen_in_thread: dict = {}

    def screened_job():
        fuzzy.ngram_jaccard_pairs(
            heavy, "doc_id", "text", n=3, threshold=0.5,
            max_shingle_df=None, candidate_budget=300,
        ).collect()
        seen_in_thread["mid"] = dict(fuzzy.last_admission_decision())
        ran.set()
        # wait for the MAIN thread to run its own guarded job, then
        # re-read: this thread's decision must be untouched
        assert done.wait(60)
        seen_in_thread["after"] = dict(fuzzy.last_admission_decision())

    done = threading.Event()
    t = threading.Thread(target=screened_job)
    t.start()
    assert ran.wait(60)
    fuzzy.ngram_jaccard_pairs(
        light, "doc_id", "text", n=3, threshold=0.5, max_shingle_df=None
    ).collect()
    main_adm = fuzzy.last_admission_decision()
    done.set()
    t.join(60)
    assert main_adm["auto_cap"] is None          # light corpus: exact
    assert seen_in_thread["mid"]["auto_cap"] is not None   # screened
    assert seen_in_thread["after"] == seen_in_thread["mid"]
    # module attribute stays readable (PEP 562 back-compat)
    assert fuzzy.last_admission == main_adm


def test_density_guard_over_budget_auto_screens(spark):
    """Over budget, the guard auto-applies the smallest sufficient
    stop-shingle screen: ubiquitous boilerplate shingles are dropped,
    rare-evidence near-dup pairs survive."""
    # 40 docs all sharing one boilerplate sentence (quadratic mass),
    # plus one true near-dup pair with rare-shingle evidence
    boiler = "all rights reserved by the example corporation"
    rows = [(i, f"{boiler} doc number {i} unique tail {i}") for i in range(40)]
    rows += [(100, "zebra quokka lemur wombat octopus narwhal pangolin"),
             (101, "zebra quokka lemur wombat octopus narwhal axolotl")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=None, candidate_budget=300,
    ).collect()
    adm = fuzzy.last_admission
    assert adm["auto_cap"] is not None
    assert adm["predicted_pairs"] > 300
    assert adm["screened_pairs"] <= 300
    # the rare-evidence pair survives the screen
    assert any(r["id_a"] == 100 and r["id_b"] == 101 for r in pairs)


def test_admission_decision_est_pair_share_pinned():
    """``est_pair_share`` is pinned on a hand-built histogram: budget
    150 over buckets (40, 60, 900) admits the first two, so the
    retained candidate-mass share is exactly 100/1000."""
    hist = [
        {"__b": 1, "__types": 20, "__pairs": 40.0},
        {"__b": 2, "__types": 10, "__pairs": 60.0},
        {"__b": 5, "__types": 2, "__pairs": 900.0},
    ]
    cap = fuzzy._admission_decision(hist, 150, "screen", "unit")
    adm = fuzzy.last_admission_decision()
    assert cap == 7                       # df cap = top of bucket b=2
    assert adm["screened_pairs"] == 100
    assert adm["est_pair_share"] == 0.1
    # under budget: share is exactly 1.0 (exact run)
    assert fuzzy._admission_decision(hist, 10_000, "screen", "unit") is None
    assert fuzzy.last_admission_decision()["est_pair_share"] == 1.0


def test_density_guard_reports_est_pair_share(spark):
    """The guarded operator path surfaces the share a production user
    sees: over budget it is screened/predicted < 1."""
    boiler = "all rights reserved by the example corporation"
    rows = [(i, f"{boiler} doc number {i} unique tail {i}") for i in range(40)]
    rows += [(100, "zebra quokka lemur wombat octopus narwhal pangolin"),
             (101, "zebra quokka lemur wombat octopus narwhal axolotl")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=None, candidate_budget=300,
    ).collect()
    adm = fuzzy.last_admission
    assert adm["auto_cap"] is not None
    expected = adm["screened_pairs"] / adm["predicted_pairs"]
    assert adm["est_pair_share"] == pytest.approx(expected, abs=1e-6)
    assert 0 < adm["est_pair_share"] < 1


def test_density_guard_error_mode_refuses_with_histogram(spark):
    boiler = "all rights reserved by the example corporation"
    rows = [(i, f"{boiler} doc number {i}") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(RuntimeError, match="df histogram"):
        fuzzy.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5,
            max_shingle_df=None, candidate_budget=10,
            on_over_budget="error",
        ).collect()


def test_density_guard_refuses_when_screen_cannot_help(spark):
    """A corpus that IS mostly duplicate pairs puts the pair mass in
    low-df shingles — no stop-shingle screen fits the budget, so the
    guard refuses with guidance instead of silently blowing up."""
    rows = []
    for i in range(30):
        rows.append((2 * i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"))
        rows.append((2 * i + 1, f"alpha{i} beta{i} gamma{i} delta{i} zeta{i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(RuntimeError, match="minhash_lsh_pairs"):
        fuzzy.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5,
            max_shingle_df=None, candidate_budget=5,
        ).collect()


def test_density_guard_cross_side_dedup_against_corpus(spark):
    """The incremental (new-vs-corpus) path predicts Sum(df_new *
    df_old) and screens on combined df when over budget."""
    boiler = "standard legal disclaimer text here"
    corpus = spark.createDataFrame(
        [(i, f"{boiler} corpus doc {i}") for i in range(30)]
        + [(900, "rare evidence shingle chain one two three")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1000 + i, f"{boiler} new doc {i}") for i in range(30)]
        + [(999, "rare evidence shingle chain one two three")],
        ["doc_id", "text"],
    )
    kept = fuzzy.dedup_against_corpus(
        new, corpus, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=None, candidate_budget=200,
    )
    adm = fuzzy.last_admission
    assert adm["op"] == "dedup_against_corpus"
    assert adm["auto_cap"] is not None
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # the exact duplicate (999 == 900) is still caught: its evidence
    # is rare shingles the screen never touches
    assert 999 not in kept_ids
    # under-budget cross run stays exact and records no cap
    fuzzy.dedup_against_corpus(
        new, corpus, "doc_id", "text", n=3, threshold=0.8,
        max_shingle_df=None,
    ).collect()
    assert fuzzy.last_admission["auto_cap"] is None


def test_auto_shortlist_pool_proportional_and_capped():
    """Round-10 advice: the auto refine budget is 1/24 of the
    per-query candidate pool — flat when n_centroids scales with the
    corpus (fixed cell size), linear at fixed n_centroids (documented),
    and hard-capped at 50k."""
    auto = similarity._auto_shortlist
    # identical to the round-10 measured-good N/32 at default config
    assert auto(20_000, 6, 8, 50) == max(50, -(-20_000 // 32))
    # fixed CELL SIZE (n_centroids grows with N): budget stays flat
    assert auto(1_000_000, 6, 4_000, 50) == auto(10_000_000, 6, 40_000, 50)
    # fixed n_centroids: linear growth, then the cap
    assert auto(10_000_000, 6, 8, 50) == 50_000
    assert auto(100, 6, 8, 256) == 256  # floor


def test_trim_dup_spans_rejects_non_numeric_ids(spark):
    """Round-10 advice: a string id_col fails fast with guidance, not
    an opaque ANSI CAST_INVALID_INPUT at execution time."""
    from aws_medallion_etl_spark.operators import corpus as corpus_ops

    docs = spark.createDataFrame(
        [("doc-a", "one two three four five six seven eight nine ten")],
        ["doc_id", "text"],
    )
    with pytest.raises(TypeError, match="integral"):
        corpus_ops.trim_dup_spans(docs, "doc_id", "text", width=5)


def test_density_guard_respects_block_col(spark):
    """With block_col the guard predicts per-(shingle, block) — a
    shingle ubiquitous in one language but split across blocks must
    not be screened based on its GLOBAL df."""
    boiler = "common header words repeated in every document here"
    rows = [(i, f"{boiler} en doc {i}", "en") for i in range(25)]
    rows += [(100 + i, f"{boiler} de doc {i}", "de") for i in range(25)]
    rows += [(900, "rare evidence chain alpha beta gamma delta", "en"),
             (901, "rare evidence chain alpha beta gamma epsilon", "en")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    # global prediction would be ~2x the per-block one; a budget
    # between them only fits when the guard keys on (shingle, block)
    fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        block_col="lang", max_shingle_df=None,
    )
    blocked_pred = fuzzy.last_admission["predicted_pairs"]
    fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_df=None,
    )
    global_pred = fuzzy.last_admission["predicted_pairs"]
    assert blocked_pred < global_pred
    # and the screen under block_col still finds the rare-evidence pair
    pairs = fuzzy.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        block_col="lang", max_shingle_df=None, candidate_budget=200,
    ).collect()
    assert fuzzy.last_admission["auto_cap"] is not None
    assert any(r["id_a"] == 900 and r["id_b"] == 901 for r in pairs)

"""Subword tokenizer: greedy longest-match semantics, UNK contract,
and the distinct-word scale path's equality with direct encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import tokenize


def _tables(vocab=tokenize.DEFAULT_VOCAB):
    return tokenize._vocab_tables(vocab)


def test_encode_word_greedy_longest_match():
    t = _tables()
    # longest-match is the contract: 'the' is a whole start piece even
    # though 't'/'h'/'e' are too; 'window' takes the 3-char 'win' over
    # 'wi'/'w'; continuations prefer '##tomer' over shorter pieces
    assert tokenize.encode_word("the", *t) == ["the"]
    assert tokenize.encode_word("window", *t) == ["win", "##dow"]
    assert tokenize.encode_word("customer", *t) == ["c", "##us", "##tomer"]
    assert tokenize.encode_word("stream", *t) == ["str", "##eam"]
    # single chars always encode (full charset in both roles)
    assert tokenize.encode_word("zq7", *t) == ["z", "##q", "##7"]
    assert tokenize.encode_word("", *t) == []


def test_encode_word_char_skip_unk():
    # a vocab missing a character emits [UNK] for it and advances ONE
    # char (char-skip contract — mirrors the oracle's recursive CTE)
    vocab = ("a", "b", "##a", "##b", "ab")
    t = _tables(vocab)
    assert tokenize.encode_word("axb", *t) == ["a", "[UNK]", "##b"]
    assert tokenize.encode_word("x", *t) == ["[UNK]"]
    # start-position piece tables differ from continuation tables:
    # 'ab' exists only as a start piece, so at pos>0 it decomposes
    assert tokenize.encode_word("ab", *t) == ["ab"]
    assert tokenize.encode_word("aab", *t) == ["a", "##a", "##b"]


def test_vocab_validation():
    with pytest.raises(ValueError, match="start pieces"):
        tokenize._vocab_tables(("##a", "##b"))
    with pytest.raises(ValueError, match="continuations"):
        tokenize._vocab_tables(("a", "b"))


def test_subword_pieces_matches_per_word_encoding(spark):
    df = spark.createDataFrame(
        [(1, "the customer window"), (2, ""), (3, None), (4, "Scan, STREAM!")],
        ["id", "text"],
    )
    out = {
        r["id"]: r["pieces"]
        for r in tokenize.subword_pieces(spark, df, "text").collect()
    }
    assert out[1] == ["the", "c", "##us", "##tomer", "win", "##dow"]
    assert out[2] == []  # no words -> empty piece list, row kept
    assert out[3] == []
    # pre-tokenizer lowercases and strips punctuation JVM-side
    assert out[4] == ["sc", "##an", "str", "##eam"]


def test_subword_token_counts_scale_path_equals_direct(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scale = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["n_unk"])
        for r in tokenize.subword_token_counts(
            spark, docs, "doc_id", "text"
        ).collect()
    }
    direct = {
        r["doc_id"]: r["pieces"]
        for r in tokenize.subword_pieces(spark, docs, "text")
        .select("doc_id", "pieces")
        .collect()
    }
    assert set(scale) == set(direct)
    for did, pieces in direct.items():
        n_words, n_pieces, n_unk = scale[did]
        assert n_pieces == len(pieces)
        assert n_unk == sum(1 for p in pieces if p == tokenize.UNK_PIECE)
        assert n_unk == 0  # DEFAULT_VOCAB covers [a-z0-9]
        # piece boundaries reassemble the words: stripping ## and
        # joining reproduces the pre-tokenized text
        words = [w for w in pieces if not w.startswith("##")]
        assert len(words) == n_words


def test_encoder_udf_runs_on_distinct_words_only(spark):
    """The scale path's Python surface is the distinct-word frame:
    the plan applies the Arrow UDF AFTER a distinct over words, so
    corpus growth with a fixed vocabulary adds zero Python work.
    The default ("auto") keeps the whole lineage in one plan — an
    int cap checkpoints the cost table, hiding the UDF node behind
    a LogicalRDD scan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = tokenize.subword_token_counts(spark, docs, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the UDF's child must contain the distinct aggregate, and the
    # only ArrowEvalPython node sits above it (not on the full corpus)
    assert plan.count("ArrowEvalPython") == 1
    before_udf = plan.split("ArrowEvalPython")[1]
    assert "Aggregate" in before_udf


def test_broadcast_guard_falls_back_to_shuffle_join(spark):
    """Above an int broadcast_max_words — and under the default
    "auto" — the cost-table join must NOT carry a broadcast hint
    (web-corpus vocabularies are corpus-bounded; a forced broadcast
    is a driver OOM at scale); the answers are identical across all
    three modes."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hint = lambda df: "ResolvedHint" in (  # noqa: E731
        df._jdf.queryExecution().analyzed().toString()
    )
    fall = tokenize.subword_token_counts(
        spark, docs, "doc_id", "text", broadcast_max_words=0
    )
    auto = tokenize.subword_token_counts(spark, docs, "doc_id", "text")
    bcast = tokenize.subword_token_counts(
        spark, docs, "doc_id", "text", broadcast_max_words=None
    )
    assert not hint(fall) and not hint(auto) and hint(bcast)
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(fall) == key(auto) == key(bcast)


# ---------------------------------------------------------------------------
# BPE vocabulary induction
# ---------------------------------------------------------------------------

def _ref_bpe(word_counts, k, min_count=1):
    """Pure-Python reference BPE trainer, textbook conventions:
    overlapping pair counting, leftmost-first non-overlapping apply,
    (max count, lexicographically smallest pair) selection."""
    syms = {w: [c for c in w] for w in word_counts}
    merges = []
    for _ in range(k):
        pc = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        pc = {p: c for p, c in pc.items() if c >= min_count}
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges, syms


_BPE_CORPUS = [
    ("the cat sat on the mat",),
    ("the cats eat the hats",),
    ("that cat is the fastest cat",),
    ("hats and mats and rats",),
]


def _bpe_word_counts():
    wc = {}
    for (t,) in _BPE_CORPUS:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_learn_bpe_matches_reference_exactly(spark):
    df = spark.createDataFrame(_BPE_CORPUS, ["text"])
    merges, syms = tokenize.learn_bpe_merges(
        spark, df, "text", num_merges=10, min_pair_count=1
    )
    ref_merges, ref_syms = _ref_bpe(_bpe_word_counts(), 10)
    assert merges == ref_merges
    got = {r["word"]: list(r["symbols"]) for r in syms.collect()}
    assert got == ref_syms


def test_learn_bpe_overlap_counting_and_early_stop(spark):
    # "aaab": (a,a) counts twice (overlapping) but merges leftmost
    # non-overlapping -> [aa, a, b]
    df = spark.createDataFrame([("aaab",)], ["text"])
    merges, syms = tokenize.learn_bpe_merges(
        spark, df, "text", num_merges=1, min_pair_count=1
    )
    assert merges == [("a", "a", 2)]
    assert list(syms.collect()[0]["symbols"]) == ["aa", "a", "b"]
    # min_pair_count above every pair frequency -> zero merges
    merges2, _ = tokenize.learn_bpe_merges(
        spark, df, "text", num_merges=5, min_pair_count=3
    )
    assert merges2 == []
    with pytest.raises(ValueError, match="num_merges"):
        tokenize.learn_bpe_merges(spark, df, "text", num_merges=0)


def test_learn_bpe_batched_rounds_disjoint_and_deterministic(spark):
    df = spark.createDataFrame(_BPE_CORPUS, ["text"])
    m1, _ = tokenize.learn_bpe_merges(
        spark, df, "text", num_merges=8, merges_per_round=4
    )
    m2, _ = tokenize.learn_bpe_merges(
        spark, df, "text", num_merges=8, merges_per_round=4
    )
    assert m1 == m2 and 0 < len(m1) <= 8
    # the merge list is a valid chain: every side is a single char or
    # the product of an EARLIER merge (rounds may select fewer than 4
    # when the disjointness filter bites, so round boundaries aren't
    # observable from the flat list — chain validity is)
    known = {c for _t, in _BPE_CORPUS for w in _t.split() for c in w}
    for a, b, c in m1:
        assert a in known and b in known and c > 0
        known.add(a + b)


def test_bpe_vocab_feeds_the_encoder(spark):
    df = spark.createDataFrame(_BPE_CORPUS, ["text"]).withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    merges, _ = tokenize.learn_bpe_merges(spark, df, "text", num_merges=12)
    vocab = tokenize.bpe_vocab_from_merges(merges)
    assert "the" in vocab and "##the" in vocab  # learned product, both roles
    counts = tokenize.subword_token_counts(
        spark, df, "doc_id", "text", vocab=vocab
    ).collect()
    for r in counts:
        assert r["n_unk"] == 0          # alphabet covers [a-z0-9]
        assert 0 < r["n_pieces"] <= sum(
            len(w) for w in "".join(t for (t,) in _BPE_CORPUS).split()
        )
        assert r["n_pieces"] >= r["n_words"]

"""Training-corpus curation operators.

Beyond-reference extensions for large-scale LLM-data pipelines: the
steps between "deduped documents" and "training shards" — reproducible
train/val/test splits, token-budget sequence packing, TF-IDF term
scoring, vocabulary extraction, PII redaction, and picking one
representative document per near-duplicate cluster.

Design for 100 TB:

* Everything here is pure column expressions or hash aggregates — no
  Python UDFs, no driver-side loops, no windows over a single global
  partition except where explicitly documented (``pack_sequences``,
  whose global packing order is the operator's CONTRACT; the sharded
  variant is the scale path).
* ``hash_split`` is stateless and idempotent: membership is a pure
  function of (id, seed), so re-runs, backfills, and late-arriving
  shards land in the same split without coordination — the property
  that matters when 1000 executors split a corpus nobody can sort.
* TF-IDF / vocabulary are explode → hash-aggregate pipelines: the
  shuffle carries (term, partial count) pairs after map-side combine,
  not token streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


# ---------------------------------------------------------------------------
# Reproducible splits
# ---------------------------------------------------------------------------

def split_bucket(id_col: Column | str, seed: str = "split", buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets) from an id and a seed string.

    Portable md5 construction (first 8 hex chars → int) rather than
    ``xxhash64`` so any engine — including the DuckDB oracle — can
    reproduce membership bit-for-bit. One md5 per row is noise next
    to the scan; at 100 TB the win is that NO engine-specific state
    (and no RNG) is involved: the split of a document is a fact about
    the document, computable anywhere, forever.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(c.cast("string"), F.lit(":" + seed))
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % buckets)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by hashed id (idempotent).

    ``weights`` maps split name → fraction (must sum to ~1.0); dict
    order defines the bucket ranges, so the same (weights, seed)
    always yields the same membership.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    bucket = split_bucket(id_col, seed)
    expr: Column | None = None
    hi = 0
    names = list(weights)
    for name in names[:-1]:
        hi += int(round(weights[name] * 10_000))
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, last)


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    out_col: str = "bin_id",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Sequential token-budget packing: docs (ordered by ``id_col``)
    fill fixed-budget bins; a doc's bin is determined by the tokens
    consumed BEFORE it (``floor(cum_before / budget)``).

    Semantics note: a doc that straddles a budget boundary stays in
    the earlier bin (bins may exceed ``budget`` by at most one doc's
    tokens) — the cumulative-quotient contract, chosen because it is
    a pure window expression on BOTH the engine and any SQL oracle.
    Exact close-the-bin greedy packing needs a sequential scan; do
    that per-shard (group by a partition key, pack within) when bins
    must hard-cap, never globally.

    The default unpartitioned window makes the GLOBAL order the
    contract (single reducer — per-shard corpus sizes only); at
    100 TB pass ``partition_by`` (e.g. the split or shard column) and
    the same expression packs every partition in parallel, bins
    numbered independently per partition.
    """
    w = Window.partitionBy(*(partition_by or [])).orderBy(
        F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum_before = F.sum(F.col(token_col)).over(w) - F.col(token_col)
    return df.withColumn(out_col, F.floor(cum_before / F.lit(budget)))


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    shard_col: str,
    out_col: str = "bin_id",
) -> DataFrame:
    """Hard-cap greedy packing: within each shard (docs in ``id_col``
    order) a bin fills until adding the next doc would EXCEED
    ``budget``; that doc starts the next bin. No bin ever exceeds the
    budget — except a bin holding a single doc that is itself longer
    than the budget (such docs are never truncated here; split or
    drop them upstream). This is the contract training loaders need
    (sequences must fit the context window), which the pure-window
    :func:`pack_sequences` deliberately relaxes.

    The close-on-overflow recurrence has no prefix-sum form — it is
    inherently sequential PER SHARD — so the shard is the unit of
    parallelism: ``applyInPandas`` per shard, one Arrow batch per
    group, an O(docs) loop inside. At 100 TB the shard count (not the
    corpus size) sets the parallelism; shards are bounded (a training
    shard is typically 10^5-10^6 docs), so per-group state is bounded
    too.

    CONTRACT: output carries only (shard, id, token, bin_id) — the
    assignment table — unlike :func:`pack_sequences`, which preserves
    the full row. Keeping payload columns out of the Arrow round-trip
    is deliberate (text never rides the grouped exchange); join the
    assignment back on ``id_col`` when the payload is needed.
    """
    out_fields = [
        df.schema[shard_col], df.schema[id_col], df.schema[token_col]
    ]
    schema = StructType(list(out_fields) + [StructField(out_col, LongType())])

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort")[
            [shard_col, id_col, token_col]
        ]
        toks = pdf[token_col].to_numpy()
        bins = [0] * len(toks)
        b, run = 0, 0
        for i, t in enumerate(toks):
            # NULL token counts (NaN through Arrow) consume no budget,
            # matching the sibling pack_sequences whose window sum
            # skips nulls
            t = 0 if t != t else int(t)
            if run > 0 and run + t > budget:
                b, run = b + 1, 0
            bins[i] = b
            run += t
        return pdf.assign(**{out_col: bins})

    return df.select(shard_col, id_col, token_col).groupBy(
        shard_col
    ).applyInPandas(pack, schema=schema)


# ---------------------------------------------------------------------------
# TF-IDF / vocabulary
# ---------------------------------------------------------------------------

def tokens(text_col: Column | str) -> Column:
    """Whitespace tokens of the lowercased, trimmed text (no empties)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(
        F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != F.lit("")
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf): per-document term counts via explode + hash agg."""
    return (
        df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf(
    df: DataFrame, id_col: str, text_col: str, ndigits: int = 4
) -> DataFrame:
    """(id, term, tf, tfidf): classic tf * ln(N / df) weighting.

    Two hash aggregates (per-doc tf, per-term df) joined on term; the
    document-frequency side aggregates to |vocab| rows and is
    broadcast when small. N is a scalar broadcast join, not a
    ``collect`` — the plan stays fully distributed.
    """
    tf = term_frequencies(df, id_col, text_col)
    n_docs = df.select(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("__df")
    )
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("__df")), ndigits),
        )
        .drop("__n", "__df")
    )


def top_terms(
    tfidf_df: DataFrame, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf-idf (score desc, term asc tiebreak)."""
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        tfidf_df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def vocabulary(
    df: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """(term, n_occurrences): corpus vocabulary with occurrence counts.

    One explode + one hash aggregate; map-side combine means the
    shuffle carries (term, partial) not the token stream. At 100 TB
    add a frequency floor (``min_count``) BEFORE any downstream join.
    For per-term DOCUMENT frequency, use :func:`tfidf` (its ``df``
    column) — computing it here would force a second explode or a
    distinct-expand, which most vocabulary callers don't need.
    """
    t = df.select(F.explode(tokens(text_col)).alias("term"))
    out = t.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return out.where(F.col("n_occurrences") >= min_count)


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Conservative patterns valid in BOTH Java regex (Spark) and RE2
# (DuckDB oracle): no lookaround, no backreferences.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d[\d-]{7,}\d"


def redact_pii(
    col: Column | str,
    email_token: str = "[EMAIL]",
    phone_token: str = "[PHONE]",
) -> Column:
    """Replace email addresses and phone-like digit runs with tokens.

    Order matters: emails first (their local parts can contain digit
    runs a phone pattern would shred). Pure ``regexp_replace`` —
    codegen'd, no UDF; at 100 TB this is a free rider on the scan.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.regexp_replace(c, EMAIL_RE, email_token)
    return F.regexp_replace(out, PHONE_RE, phone_token)


# ---------------------------------------------------------------------------
# Cluster representatives
# ---------------------------------------------------------------------------

def cluster_representatives(
    docs: DataFrame,
    id_col: str,
    clusters: DataFrame,
    quality_col: str,
) -> DataFrame:
    """One representative doc per duplicate cluster: highest
    ``quality_col``, smallest id on ties.

    The keep/drop step after connected components — instead of
    blindly keeping the min-id member (``canonical_docs``), keep the
    BEST member. ``max_by`` over (quality, -id) gives map-side
    partial aggregation: the shuffle carries one candidate per
    (partition × cluster).
    """
    c = clusters.select(F.col("id").alias("__cid"), "cluster_id")
    tagged = (
        docs.join(c, docs[id_col] == F.col("__cid"), "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .drop("__cid")
    )
    pick = F.max_by(
        F.col(id_col), F.struct(F.col(quality_col), -F.col(id_col))
    ).alias("representative_id")
    return tagged.groupBy("cluster_id").agg(
        pick,
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(quality_col).alias("best_quality"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling by hashed id.

    Unlike ``DataFrame.sampleBy`` (partition-order-sensitive RNG),
    membership is a pure function of (id, seed): re-runs, retries,
    and other engines reproduce the exact sample — the property a
    training-data pipeline needs for auditability. Rates are exact
    in expectation (binomial per stratum, like sampleBy), enforced
    via md5 bucket < fraction * 10000.
    """
    bucket = split_bucket(id_col, seed)
    rate: Column = F.lit(default_fraction)
    for value, frac in fractions.items():
        rate = F.when(F.col(strata_col) == value, F.lit(frac)).otherwise(rate)
    return df.where(bucket < rate * 10_000)


# ---------------------------------------------------------------------------
# Per-source caps
# ---------------------------------------------------------------------------

def cap_per_source(
    df: DataFrame,
    source_col: str,
    cap: int,
    order_by: list,
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain, chosen by the
    deterministic ``order_by`` preference (e.g. quality desc, id asc).

    The standard web-corpus diversity guard: without a per-domain cap,
    a handful of boilerplate-heavy domains dominate the training mix.
    One window partitioned by SOURCE — millions of small partitions,
    no global sort, no skew beyond the largest single domain (cap the
    candidate set upstream if one domain is pathological).
    """
    w = Window.partitionBy(source_col).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Source mixing
# ---------------------------------------------------------------------------

def mix_sources(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: str = "mix",
) -> DataFrame:
    """Downsample sources to a TARGET MIXTURE, deterministically.

    Given target proportions (e.g. web .5, code .3, books .2), the
    achievable corpus is bounded by the scarcest source relative to
    its share: scale = min over sources of (n_s / w_s). Each source
    then keeps ~(w_s * scale) docs via the same portable md5-bucket
    membership as :func:`hash_split` — stateless, idempotent,
    engine-reproducible; re-runs and backfills keep the same docs.
    Sources absent from ``weights`` are dropped (weight 0).

    Plan shape: one hash-agg for the per-source counts (a |sources|-row
    broadcast join back), then a pure filter — no shuffle of the data
    itself, so the mixing step costs a scan at any corpus size. Keeps
    are bucket-threshold approximations (±1/10000 of a source), the
    price of needing zero coordination between executors.
    """
    measure = F.count(F.lit(1))
    return _mix_by_measure(df, source_col, weights, id_col, seed, measure)


def mix_sources_tokens(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    token_col: str,
    seed: str = "mixtok",
) -> DataFrame:
    """Source mixing with targets measured in TOKENS — the unit
    training mixtures are actually specified in (e.g. web .5 / code
    .3 / books .2 *of the token budget*, not of the doc count).

    Identical mechanism to :func:`mix_sources` (scarcity-bounded
    scale, portable md5-bucket membership, no data shuffle), except
    per-source size is ``sum(token_col)``: sources with systematically
    longer documents are downsampled harder so the KEPT TOKEN mass
    lands on the target shares. Because hash membership is independent
    of document length, keeping fraction ``f_s`` of docs keeps
    ``f_s`` of tokens in expectation; the emitted per-source token
    sums make the achieved mixture itself checkable data.
    """
    measure = F.sum(F.col(token_col))
    return _mix_by_measure(df, source_col, weights, id_col, seed, measure)


def _mix_by_measure(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    id_col: str,
    seed: str,
    measure: Column,
) -> DataFrame:
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-empty and non-negative: {weights}")
    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError(f"weights must sum to a positive value, got {total_w}")
    norm = {s: w / total_w for s, w in weights.items()}
    counts = df.groupBy(source_col).agg(measure.alias("__n"))
    wmap = F.create_map(
        *[x for s, w in norm.items() for x in (F.lit(s), F.lit(w))]
    )
    # a source with NULL/zero measured mass (e.g. an all-NULL token
    # column under the token measure) is unmeasurable: keep it in
    # would either poison the scarcity scale (0/w = 0 -> empty output
    # everywhere) or sail through least(1.0, NULL) as keep-everything.
    # Drop it, like a weight-0 source.
    sized = counts.withColumn("__w", wmap[F.col(source_col)]).where(
        F.col("__w").isNotNull() & (F.col("__w") > 0)
        & F.col("__n").isNotNull() & (F.col("__n") > 0)
    )
    scale = sized.agg(
        F.min(F.col("__n") / F.col("__w")).alias("__scale")
    )
    frac = (
        sized.join(F.broadcast(scale))
        .select(
            source_col,
            F.least(
                F.lit(1.0), F.col("__w") * F.col("__scale") / F.col("__n")
            ).alias("__keep_frac"),
        )
    )
    bucket = split_bucket(id_col, seed)
    return (
        df.join(F.broadcast(frac), source_col)
        .where(bucket < F.round(F.col("__keep_frac") * 10_000))
        .drop("__keep_frac")
    )

# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def contamination_hits(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_id_col: str,
    eval_text_col: str,
    n: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-training-doc overlap with an evaluation benchmark, by word n-gram.

    The standard pre-training hygiene step (GPT-3 appendix C / PaLM /
    Llama practice): a training document is CONTAMINATED if it shares
    any length-``n`` word n-gram (n=13 is the literature default) with
    any benchmark document, because exact long-gram overlap is
    near-certain verbatim inclusion rather than chance.

    Returns one row per contaminated training doc:
    ``(id_col, n_hit_grams, n_eval_docs)`` — distinct overlapping
    grams and distinct benchmark docs matched. Clean docs are absent.

    Scale shape: benchmarks are tiny next to a 100 TB corpus, so the
    eval side's distinct grams are BROADCAST and the training side is
    scan -> n-gram explode -> broadcast semi-hash-join -> hash-agg:
    the corpus text itself is never shuffled, and the only exchange
    carries (id, gram) rows that survived the broadcast join — i.e.
    hits only, a vanishing fraction. If the "benchmark" is itself huge
    (cross-split decontamination of a 5%-sized validation cut), pass
    ``broadcast_eval=False`` to fall back to a shuffled equi-join on
    the gram; both sides then exchange only (id, gram) pairs, never
    document text. Docs shorter than ``n`` tokens yield no grams and
    can never be flagged — by construction they cannot contain a
    verbatim benchmark span of length ``n``.
    """
    from aws_medallion_etl_spark.operators.text import word_ngrams

    tg = word_ngrams(train_df, id_col, text_col, n=n, out_col="__gram").distinct()
    eg = word_ngrams(
        eval_df.select(
            F.col(eval_id_col).alias("__eval_id"),
            F.col(eval_text_col).alias("__eval_text"),
        ),
        "__eval_id",
        "__eval_text",
        n=n,
        out_col="__gram",
    ).distinct()
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "__gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("__gram").alias("n_hit_grams"),
            F.countDistinct("__eval_id").alias("n_eval_docs"),
        )
    )


def decontaminate(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_df: DataFrame,
    eval_id_col: str,
    eval_text_col: str,
    n: int = 13,
    max_hit_grams: int = 0,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Drop training docs whose benchmark overlap exceeds the allowance.

    ``max_hit_grams=0`` (default) removes every doc sharing even one
    length-``n`` gram with the benchmark; raise it to tolerate a few
    incidental collisions (boilerplate, licenses) at large ``n``.
    Implemented as :func:`contamination_hits` -> threshold filter ->
    LEFT ANTI join on the id — the training data is filtered, never
    rewritten, so columns and row identity pass through untouched.
    """
    flagged = (
        contamination_hits(
            train_df, id_col, text_col,
            eval_df, eval_id_col, eval_text_col,
            n=n, broadcast_eval=broadcast_eval,
        )
        .where(F.col("n_hit_grams") > max_hit_grams)
        .select(id_col)
    )
    return train_df.join(flagged, id_col, "left_anti")

# ---------------------------------------------------------------------------
# BM25 retrieval scoring
# ---------------------------------------------------------------------------

def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 4,
) -> DataFrame:
    """Okapi BM25 score of every document against a bag of query terms
    — the lexical-retrieval baseline every corpus search/eval pipeline
    needs next to the embedding ANN path.

    Lucene-variant idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive) with the standard tf saturation / length normalization.
    Returns ``(id_col, bm25)`` for documents matching at least one
    term.

    Plan shape — one pass, no explode-join: the per-doc aggregate
    computes document length AND each query term's tf as conditional
    sums in a single hash aggregate over the token explode (query
    bags are small — tens of terms — so |terms| conditional columns
    beat materializing (doc, term, tf) and joining). Corpus constants
    (N, avgdl, per-term df) reduce to ONE broadcast row. The only
    data-proportional shuffle is the per-doc aggregation.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    terms = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__tok")
    )
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__dl"),
        *[
            F.sum((F.col("__tok") == t).cast("long")).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    consts = per_doc.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long"))
            .cast("double")
            .alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(consts))
    score = None
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
        )
        tf = F.col(f"__tf_{i}").cast("double")
        part = idf * (
            tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl")))
        )
        score = part if score is None else score + part
    hit = None
    for i in range(len(terms)):
        h = F.col(f"__tf_{i}") > 0
        hit = h if hit is None else hit | h
    return (
        scored.where(hit)
        .select(F.col(id_col), F.round(score, ndigits).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# Chunk-level exact dedup (C4 / RefinedWeb line-dedup, token-window form)
# ---------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 20,
) -> DataFrame:
    """Explode documents into fixed-size token-window chunks.

    C4 and RefinedWeb deduplicate at line/paragraph granularity; for
    corpora without layout markers the portable unit is a fixed
    window of whitespace tokens. Returns one row per (doc, chunk):
    ``(id_col, __cpos, __chunk)``.

    Scale notes: the token array is materialized ONCE in a projection
    and only referenced (never recomputed) inside the higher-order
    ``transform`` lambda — HOF lambdas are interpreted, so a computed
    expression inside one re-evaluates per element. The explode output
    carries (id, int, ~chunk_tokens words), not the whole document,
    so the downstream shuffle is chunk-sized.
    """
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__toks"),
    )
    n_chunks = F.ceil(F.size("__toks") / F.lit(float(chunk_tokens))).cast("int")
    chunks = toks.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(
                F.slice("__toks", i * chunk_tokens + 1, chunk_tokens), " "
            ),
        ).alias("__chunks"),
    )
    out = chunks.select(
        F.col(id_col), F.posexplode("__chunks").alias("__cpos", "__chunk")
    )
    return out.where(F.length("__chunk") > 0)


def strip_boilerplate_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 20,
    max_doc_freq: int = 1,
    out_col: str = "clean_text",
) -> DataFrame:
    """REMOVE boilerplate: drop every token-window chunk that appears
    in more than ``max_doc_freq`` distinct documents, and rebuild each
    document from its surviving chunks (original order).

    The C4/CCNet/RefinedWeb line-dedup step, on the same fixed
    token-window unit as :func:`chunk_documents` — the repo's
    repetition/diversity operators DETECT templated text; this one
    strips it (navigation chrome, license headers, cookie banners:
    content repeated verbatim across documents) while keeping the
    unique remainder of each document.

    Returns ``(id_col, n_chunks, n_removed, out_col)`` — one row per
    input document (a fully-boilerplate document survives with empty
    ``out_col``).

    Scale shape: chunk doc-frequency is one hash aggregate over
    (chunk, id) rows; the offender set (df > threshold) is typically
    tiny, so the anti-join runs broadcast — but there is NO broadcast
    hint: on an adversarial corpus where most chunks are shared, AQE
    sees the runtime byte size and degrades to a shuffled anti-join
    instead of OOMing the driver. Rebuild is one aggregate keyed by
    doc (array_sort of (pos, chunk) structs — no window, no second
    pass over text).
    """
    chunks = chunk_documents(df, id_col, text_col, chunk_tokens)
    frequent = (
        chunks.groupBy("__chunk")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .where(F.col("__df") > max_doc_freq)
        .select("__chunk")
    )
    kept = chunks.join(frequent, "__chunk", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__cpos", "__chunk"))),
                lambda s: s["__chunk"],
            ),
            " ",
        ).alias(out_col),
    )
    totals = chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks")
    )
    return (
        df.select(id_col)
        .join(totals, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            (
                F.coalesce("n_chunks", F.lit(0))
                - F.coalesce("__n_kept", F.lit(0))
            ).cast("long").alias("n_removed"),
            F.coalesce(out_col, F.lit("")).alias(out_col),
        )
    )


def dedup_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 20,
) -> DataFrame:
    """Corpus-global exact chunk dedup with document reassembly.

    Every duplicated token-window chunk is kept ONLY at its first
    occurrence in (id, position) order — the C4 rule ("keep one of
    every three-sentence span") at token-window granularity. Documents
    are reassembled from their surviving chunks in original order;
    documents whose every chunk was seen earlier vanish entirely.

    Returns ``(id_col, text_deduped, n_chunks_kept)``.

    Scale notes: the keep-first decision is a ``row_number`` window
    partitioned by the chunk md5 — a hash-partitioned shuffle keyed on
    the 32-char digest, never a global sort. Reassembly is a second
    hash aggregate on the doc id whose input is only the SURVIVING
    chunks. Both shuffles carry chunk-sized rows; nothing is
    quadratic and nothing collects. At 100 TB the chunk hash space is
    uniform (md5), so no skew salting is needed.
    """
    chunks = chunk_documents(df, id_col, text_col, chunk_tokens)
    w = Window.partitionBy(F.md5("__chunk")).orderBy(id_col, "__cpos")
    kept = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__cpos", "__chunk"))),
                    lambda s: s["__chunk"],
                ),
                " ",
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("n_chunks_kept"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic corpus-global shuffle into training shards
# ---------------------------------------------------------------------------

def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    seed: str = "shuffle",
) -> DataFrame:
    """Assign every document a shard and a within-shard position, both
    pure functions of (id, seed).

    Pretraining wants the corpus globally shuffled but REPRODUCIBLY so:
    a re-run, a backfill, or a resume from shard 410 must see the same
    order. Shard = md5 bucket of the id; within-shard order = md5 of
    (id, seed, 'order') with the id as tiebreaker — no RNG, no
    coordination, the same answer from any engine.

    Scale notes: shard assignment is a stateless projection; the
    position is a ``row_number`` window partitioned by shard, so the
    shuffle is hash-partitioned on the shard id and each shard sorts
    locally. Size ``n_shards`` so one shard's rows fit an executor
    (at 100 TB: tens of thousands of shards, not 64). No global sort,
    no driver involvement.
    """
    okey = F.md5(
        F.concat(
            F.col(id_col).cast("string"), F.lit(f":{seed}:order")
        )
    )
    with_shard = df.select(
        F.col(id_col),
        split_bucket(id_col, seed=seed, buckets=n_shards).alias("shard"),
        okey.alias("__okey"),
    )
    w = Window.partitionBy("shard").orderBy("__okey", id_col)
    return (
        with_shard.withColumn(
            "pos", (F.row_number().over(w) - 1).cast("long")
        )
        .withColumn(
            "n_in_shard",
            F.count(F.lit(1)).over(Window.partitionBy("shard")).cast("long"),
        )
        .drop("__okey")
    )


# ---------------------------------------------------------------------------
# Weighted sampling (priority sampling, Duffield-Lund-Thorup)
# ---------------------------------------------------------------------------

def priority_key(
    id_col: Column | str, weight_col: Column | str, seed: str = "wsample"
) -> Column:
    """Deterministic priority q = w / u for weight-proportional
    sampling without replacement (priority sampling, Duffield, Lund &
    Thorup 2007): taking the k largest priorities samples items with
    probability ~ min(1, w/tau) and supports unbiased subset-sum
    estimation via max(w, tau) with tau = the (k+1)-th priority.

    u is NOT an RNG draw — it's the portable md5 construction
    ``split_bucket`` uses, widened to 48 bits so (h + 0.5) / 2^48 is
    exact in a double. Every arithmetic op involved (int-to-double,
    add, two divides) is IEEE correctly-rounded, so ANY engine ranks
    the corpus identically: the sample is a reproducible fact about
    (id, weight, seed), the property a training-data pipeline needs
    for audits and incremental re-runs.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.concat(c.cast("string"), F.lit(":" + seed))
    h48 = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long")
    u = (h48 + F.lit(0.5)) / F.lit(float(1 << 48))
    return w.cast("double") / u


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows: the k
    largest priorities (ties -> lowest id; priorities are 48-bit
    distinct in practice).

    ``orderBy(...).limit(k)`` compiles to TakeOrdered — per-partition
    top-k heaps and a driver merge of k rows per partition, never a
    global sort: the 100 TB plan. Heavier docs are proportionally more
    likely to survive; re-runs, other engines, and late-arriving
    shards (union then re-take) reproduce the selection exactly.
    """
    out = df.withColumn("__priority", priority_key(id_col, weight_col, seed))
    return (
        out.orderBy(F.desc("__priority"), F.asc(id_col))
        .limit(k)
        .withColumn("priority", F.round("__priority", 4))
        .drop("__priority")
    )


# ---------------------------------------------------------------------------
# URL canonicalization (web-corpus provenance dedup)
# ---------------------------------------------------------------------------

TRACKING_PARAMS = ("utm_", "fbclid", "gclid", "mc_cid", "mc_eid", "ref")


def _cc(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_url(
    col: Column | str,
    strip_params: tuple = TRACKING_PARAMS,
    strip_www: bool = True,
) -> Column:
    """Canonical form of a URL for provenance-level dedup: lowercase
    scheme+host, ``www.`` stripped, fragment dropped, tracking query
    params removed, surviving params SORTED, trailing path slash
    trimmed. Path/param VALUES keep their case (case-sensitive by
    spec); only scheme and host fold.

    The standard first pass of web-corpus dedup — the same page
    arrives under utm-tagged, fragment-suffixed, www/apex, and
    case-jittered variants, and byte-level text dedup only catches it
    after a full fetch+extract. Entirely codegen (``parse_url`` +
    regexp/array builtins), no UDF; at 100 TB this runs in the scan
    projection for free.
    """
    u = F.regexp_replace(_cc(col), "#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.parse_url(u, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    path = F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit(""))
    # ALL trailing slashes at once — "//" stripped one-at-a-time would
    # break idempotence (found by the hypothesis property test)
    path = F.regexp_replace(path, "/+$", "")
    q = F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda kv: (F.length(kv) > 0)
            & ~F.exists(
                F.array(*[F.lit(p) for p in strip_params]),
                lambda p: kv.startswith(p),
            ),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def dedup_by_canonical_url(
    df: DataFrame, url_col: str, order_by: list
) -> DataFrame:
    """Keep one row per canonical URL (deterministic ``order_by``
    preference, e.g. fetch-time desc or id asc) — one window keyed on
    the canonical form; the canonicalization itself is free in the
    scan projection."""
    w = Window.partitionBy("__curl").orderBy(*order_by)
    return (
        df.withColumn("__curl", canonical_url(url_col))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("__curl", "canonical_url")
    )


# ---------------------------------------------------------------------------
# Exact-substring span dedup (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — the ExactSubstr pass)
# ---------------------------------------------------------------------------

def trim_dup_spans(
    df: DataFrame, id_col: str, text_col: str, width: int = 10
) -> DataFrame:
    """Remove every duplicated ``width``-token span except its FIRST
    corpus occurrence — span-level exact dedup, one level finer than
    document/chunk dedup (a boilerplate paragraph pasted into thousands
    of otherwise-unique docs survives both; this pass cuts it).

    Semantics (deterministic): a window of ``width`` consecutive tokens
    starting at position ``s`` of doc ``d`` is *duplicated* when the
    identical token sequence occurs anywhere else in the corpus (other
    doc, or other position of the same doc). The lexicographically
    smallest ``(id, s)`` occurrence of each duplicated span is
    canonical and keeps its tokens; every other occurrence marks its
    ``width`` positions for removal (overlapping spans union). Output:
    one row per input doc — ``(id, text_clean, n_removed)``.

    Scale shape — the suffix-array batch equivalent as three keyed
    hash shuffles, no windows over a global partition:

    1. explode window starts; ``groupBy(gram)`` with map-side combine
       carries ``(gram hash, count, min (id, s))`` — the posting list
       aggregate, linear in corpus tokens;
    2. occurrences join back on the gram hash (AQE broadcasts the
       aggregate when small);
    3. covered positions explode (bounded: ``width`` rows per
       duplicated occurrence) and LEFT ANTI against the token stream.

    ``width`` is the only recall knob: spans shorter than ``width``
    survive (Lee et al. use 50 BPE tokens; smaller widths trim more
    aggressively). Grams are compared by 128-bit content (two
    independent xxhash64 seeds over the joined window) — at 100 TB the
    collision odds stay negligible without shuffling raw token runs.

    Contract on ``id_col`` (round-10 advice): ids must be NUMERIC
    (checked at plan-build time — a string id fails fast with
    guidance, not an opaque ANSI cast error) and the linearized
    canonical key is runtime-guarded: |id| < 9e12 and under 1e6
    window starts per doc, so the documented keep-first-(id, s)
    ordering can never silently invert or overflow.
    """
    id_type = df.schema[id_col].dataType.simpleString()
    if id_type not in (
        "tinyint", "smallint", "int", "bigint", "long",
    ):
        raise TypeError(
            f"trim_dup_spans: id_col {id_col!r} must be an integral "
            f"type (got {id_type}) — the canonical keep-first choice "
            "linearizes (id, start) arithmetically for oracle parity. "
            "Hash non-numeric ids first (e.g. xxhash64(id))."
        )
    toks = df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__t"),
    )
    n_win = F.greatest(F.size("__t") - F.lit(width - 1), F.lit(0))
    win = F.sequence(F.lit(0), n_win - 1)
    occ = toks.where(n_win > 0).select(
        "__id", F.explode(win).alias("__s"), "__t"
    ).select(
        "__id", "__s",
        F.xxhash64(
            F.array_join(F.slice("__t", F.col("__s") + 1, width), " ")
        ).alias("__g1"),
        F.xxhash64(
            F.array_join(F.slice("__t", F.col("__s") + 1, width), " "),
            F.lit(1),
        ).alias("__g2"),
    )
    # canonical = min over the LINEARIZED (id, start) key — the same
    # arithmetic an engine without struct ordering (the oracle) uses,
    # so both sides pick the identical occurrence. The linearization
    # is only order-preserving while __s < 1e6 and |id|*1e6 fits in a
    # long — assert_true makes a violation a LOUD error instead of a
    # silent inversion of the documented keep-first contract (a doc
    # over 1e6 tokens would otherwise key above its neighbors).
    lin_ok = F.assert_true(
        (F.col("__s") < F.lit(1_000_000))
        & (F.abs(F.col("__id")) < F.lit(9_000_000_000_000)),
        F.lit(
            "trim_dup_spans: (id, start) linearization out of range — "
            "doc has >= 1e6 window starts or |id| >= 9e12; split the "
            "document or remap ids before span dedup"
        ),
    )
    occ_key = F.when(
        lin_ok.isNull(),
        F.col("__id") * F.lit(1_000_000) + F.col("__s"),
    )
    stats = occ.groupBy("__g1", "__g2").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(occ_key).alias("__canon"),
    )
    dup = (
        occ.join(stats, ["__g1", "__g2"])
        .where((F.col("__cnt") > 1) & (occ_key != F.col("__canon")))
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__s"), F.col("__s") + width - 1)
            ).alias("__p"),
        )
        .distinct()
    )
    stream = toks.select(
        "__id", F.posexplode("__t").alias("__p", "__tok")
    )
    kept = stream.join(dup, ["__id", "__p"], "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__p", "__tok"))),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("__kept"),
    )
    base = toks.select("__id", F.size("__t").alias("__n"))
    return (
        base.join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            (F.col("__n") - F.coalesce("__kept", F.lit(0)))
            .cast("long").alias("n_removed"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

def dsir_log_importance(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    seed: str = "dsir",
    smoothing: float = 1.0,
    ndigits: int = 4,
) -> DataFrame:
    """Per-document DSIR importance log-weights: how much more likely a
    raw document is under a hashed-n-gram bag model of the TARGET
    distribution than under the same model of the RAW distribution
    (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling").

    Both corpora featurize through :func:`text.hashed_features`
    (lowercased unigrams + word bigrams, md5-bucketed — the portable
    fastText hashing trick this repo already uses for classifier
    inference, so any engine reproduces bucket ids bit-for-bit). Each
    side fits an add-``smoothing`` multinomial over the ``n_buckets``
    hash buckets; a raw document's log-weight is its bag-of-features
    log-likelihood ratio::

        log w(x) = sum_over_feature_occurrences  ln p_target[h(g)]
                                               - ln p_raw[h(g)]

    Plan shape, designed for a 100 TB raw corpus against a small
    curated target (the DSIR regime — target is Wikipedia-sized):

    * one explode + ``groupBy(id, bucket)`` with map-side combine over
      the raw corpus (the only large shuffle, keyed and combinable);
    * bucket totals for both sides are ``n_buckets``-row aggregates;
      the per-bucket log-ratio table is built by joining them on a
      ``spark.range(n_buckets)`` skeleton with the 1-row totals
      cross-joined in-plan (no driver collect) and is broadcast into
      the per-document sum — the big side shuffles ONCE;
    * no windows, no Python UDFs; ``ln`` stays in codegen.

    Returns ``(id, n_features BIGINT, log_importance DOUBLE)`` for
    every raw document (docs with no features score 0.0).
    ``log_importance`` is rounded to ``ndigits`` — the repo's
    cross-engine float discipline (sum order differs between engines;
    4-digit rounding is the same contract the LM-logprob family
    ships).
    """
    from aws_medallion_etl_spark.operators import text as _text

    spark = raw.sparkSession
    fr = _text.hashed_features(raw, id_col, text_col, n_buckets, seed)
    ft = _text.hashed_features(target, id_col, text_col, n_buckets, seed)
    # per-(doc, bucket) occurrence counts: shrinks the broadcast-join
    # input from occurrences to distinct buckets per doc, and the
    # groupBy gets map-side combine. Both aggregates feed THREE
    # consumers each (bucket totals, grand totals, the per-doc sum) —
    # Spark emits no ReusedExchange across aggregate branches, so an
    # un-checkpointed plan re-explodes each corpus once per consumer.
    # The lazy localCheckpoint materializes each aggregate ONCE (fd is
    # bounded by docs x min(doc buckets, n_buckets); ct by n_buckets)
    # and every consumer reads the materialization — the same fix
    # text.bigram_logprob_scores ships.
    fd = (
        fr.groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=False)
    )
    ct = (
        ft.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("__ct"))
        .localCheckpoint(eager=False)
    )
    cr = fd.groupBy("bucket").agg(F.sum("__c").alias("__cr"))
    nt = ct.agg(F.sum("__ct").alias("__nt"))
    nr = fd.agg(F.sum("__c").alias("__nr"))
    s = float(smoothing)
    b = float(n_buckets) * s
    lr = (
        spark.range(n_buckets).select(F.col("id").alias("bucket"))
        .join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("__ct", F.lit(0)) + F.lit(s))
                    / (F.col("__nt") + F.lit(b))
                )
                - F.log(
                    (F.coalesce("__cr", F.lit(0)) + F.lit(s))
                    / (F.col("__nr") + F.lit(b))
                )
            ).alias("__lr"),
        )
    )
    perdoc = (
        fd.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("__c").cast("long").alias("n_features"),
            F.round(F.sum(F.col("__c") * F.col("__lr")), ndigits).alias(
                "log_importance"
            ),
        )
    )
    return (
        raw.select(id_col)
        .join(perdoc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_features", F.lit(0)).cast("long").alias(
                "n_features"
            ),
            F.coalesce("log_importance", F.lit(0.0)).alias(
                "log_importance"
            ),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    n_buckets: int = 4096,
    seed: str = "dsir",
    smoothing: float = 1.0,
    temperature: float = 1.0,
    mode: str = "gumbel",
    ndigits: int = 4,
) -> DataFrame:
    """Select ``k`` raw documents by DSIR importance resampling.

    ``mode="gumbel"`` (default, the paper's sampler): sampling without
    replacement proportional to ``exp(log_importance / temperature)``
    via the Gumbel-top-k trick — rank by ``log w / T + g`` where ``g``
    is Gumbel(0, 1) noise. The noise is DETERMINISTIC: ``u`` is drawn
    from ``md5(id || ':seed:g')`` (first 8 hex digits as a uniform in
    (0, 1), the same portable construction as the hash-split family),
    then ``g = -ln(-ln(u))``. Reproducible across runs, engines, and
    partitionings — the property a 1000-executor resample must have,
    and what makes the selection oracle-checkable.

    ``mode="topk"``: the paper's deterministic heuristic baseline —
    take the ``k`` highest-weight documents outright.

    Both modes rank by ``round(sample_key, ndigits)`` with ``id`` as
    tiebreak and cut with ``orderBy().limit(k)`` — Spark's TakeOrdered
    (per-partition partial top-k, driver merges k rows), never a
    global sort. Returns ``(id, n_features, log_importance,
    sample_key)`` for the selected documents.
    """
    w = dsir_log_importance(
        raw, target, id_col, text_col, n_buckets, seed, smoothing, ndigits
    )
    if mode == "gumbel":
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f":{seed}:g"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("double")
        u = (h + F.lit(0.5)) / F.lit(4294967296.0)
        key = (
            F.col("log_importance") / F.lit(float(temperature))
            - F.log(-F.log(u))
        )
    elif mode == "topk":
        key = F.col("log_importance")
    else:
        raise ValueError(
            f"dsir_select: mode must be 'gumbel' or 'topk', got {mode!r}"
        )
    keyed = w.select(
        "*", F.round(key, ndigits).alias("sample_key")
    )
    return keyed.orderBy(
        F.desc("sample_key"), F.col(id_col)
    ).limit(int(k))

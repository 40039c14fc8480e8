"""Subword tokenization: greedy longest-match WordPiece encoding as a
first-class corpus operator.

Token budgets in a training-data pipeline (sequence packing, source
mixing, context-window accounting) are defined by the TOKENIZER, not
by whitespace — ``corpus.pack_sequences*`` fed a whitespace count
packs bins that overflow the real context window by 2-3x. This module
supplies the real count: greedy longest-match encoding against a
fixed piece vocabulary (the WordPiece inference algorithm — BERT's
tokenizer; BPE inference over a merges-as-vocab table is the same
longest-match loop), expressed Spark-first:

* **Pre-tokenization stays in codegen.** ``lower`` +
  ``regexp_extract_all`` produce the word array JVM-side; Python only
  ever sees words, never raw text.
* **The vocabulary is broadcast once per executor**
  (``SparkContext.broadcast``), not pickled per task, and lookups are
  O(1) set membership with a per-vocab max piece length bounding the
  longest-match scan.
* **The encode loop is Arrow-batched** (``pandas_udf``) with an
  in-batch word memo: natural-language word frequencies are Zipfian,
  so almost every word in a batch is a repeat and the per-word Python
  loop runs roughly once per DISTINCT word per batch.
* **The scale path never encodes the corpus at all.**
  :func:`subword_token_counts` explodes to (doc, word), reduces to
  DISTINCT words (vocabulary-sized — bounded by the language, not the
  corpus), encodes only those, and broadcast-joins the per-word piece
  counts back: at 100 TB the Python work is proportional to the
  vocabulary while everything corpus-sized stays whole-stage codegen.

Unknown characters: a position with no matching piece emits ``[UNK]``
and advances one character (char-skip UNK). This differs from BERT's
whole-word UNK on purpose — char-skip keeps counts monotone in word
length and is exactly replayable in set-based SQL, which is what the
DuckDB oracle does (recursive CTE over (word, pos) states; see
``queries.t_subword_tokens``).

Reference scope: the reference engine's ETL counts whitespace tokens
only (its text handling is column cleaning — Meta_Guideline.md silver
rules); subword encoding is a beyond-reference training-data
extension (SURVEY.md §7.2 M7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

# ---------------------------------------------------------------------------
# Default vocabulary
# ---------------------------------------------------------------------------

_ALPHANUM = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
    chr(c) for c in range(ord("0"), ord("9") + 1)
]

#: Greedy longest-match piece vocabulary. ``##``-prefixed entries are
#: continuation pieces (match at positions > 0), bare entries are
#: word-start pieces. Every [a-z0-9] single character appears in BOTH
#: roles, so any alphanumeric word encodes without UNK; the multi-char
#: merges are generic English prefixes/suffixes/words that make the
#: longest-match nontrivial. The vocabulary is DATA to this module —
#: swap in a learned one (a real WordPiece/BPE export is exactly this
#: shape: pieces + ## continuations) without touching the operators.
DEFAULT_VOCAB: tuple[str, ...] = tuple(
    _ALPHANUM
    + ["##" + c for c in _ALPHANUM]
    + [
        # word-start merges
        "the", "an", "and", "at", "be", "com", "con", "de", "dis", "en",
        "ex", "for", "gr", "in", "int", "jo", "key", "li", "ma", "me",
        "no", "of", "on", "or", "pre", "pro", "qu", "re", "sc", "se",
        "sh", "sl", "sm", "sp", "st", "str", "ta", "to", "un", "va",
        "wh", "wi", "win",
        # continuation merges
        "##able", "##al", "##all", "##an", "##ar", "##ark", "##ast",
        "##ata", "##atch", "##ate", "##ation", "##dow", "##eam", "##ed",
        "##er", "##ery", "##es", "##est", "##ge", "##ig", "##in",
        "##ine", "##ing", "##ion", "##ir", "##is", "##it", "##le",
        "##lue", "##ly", "##ment", "##ness", "##oin", "##ort", "##ound",
        "##ow", "##rt", "##ter", "##tion", "##tomer", "##ue", "##umn",
        "##up", "##us",
    ]
)

UNK_PIECE = "[UNK]"

#: Pre-tokenizer: the word alphabet the vocabulary covers. Kept as a
#: module constant so the oracle SQL and the Spark plan share it.
WORD_RE = "[a-z0-9]+"


def _vocab_tables(
    vocab: tuple[str, ...],
) -> tuple[frozenset[str], frozenset[str], int, int]:
    """(start set, continuation set w/o ##, max start len, max cont len)."""
    starts = frozenset(p for p in vocab if not p.startswith("##"))
    conts = frozenset(p[2:] for p in vocab if p.startswith("##"))
    if not starts or not conts:
        raise ValueError(
            "tokenize: vocab needs both start pieces and ## continuations"
        )
    return starts, conts, max(map(len, starts)), max(map(len, conts))


def encode_word(
    word: str,
    starts: frozenset[str],
    conts: frozenset[str],
    max_s: int,
    max_c: int,
) -> list[str]:
    """Greedy longest-match WordPiece inference for one word.

    At each position take the LONGEST vocab piece matching there
    (start table at position 0, continuation table after); no match
    emits ``[UNK]`` and advances one character. Pure function — the
    oracle replays it as a recursive CTE over (word, pos) states.
    """
    pieces: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        table, cap = (starts, max_s) if pos == 0 else (conts, max_c)
        end = min(n, pos + cap)
        while end > pos and word[pos:end] not in table:
            end -= 1
        if end == pos:
            pieces.append(UNK_PIECE)
            pos += 1
        else:
            pieces.append(word[pos:end] if pos == 0 else "##" + word[pos:end])
            pos = end
    return pieces


def encode_words_udf(spark: SparkSession, vocab: tuple[str, ...] = DEFAULT_VOCAB):
    """Arrow-batched encoder: word column -> array<string> of pieces.

    The vocab rides a ``SparkContext.broadcast`` (one copy per
    executor, torrent-distributed — a learned vocab is ~1 MB and must
    not be pickled into every task closure); each batch keeps a word
    memo so the Python loop runs once per distinct word per batch.
    """
    bc = spark.sparkContext.broadcast(_vocab_tables(vocab))

    @pandas_udf(ArrayType(StringType()))
    def encode(words: pd.Series) -> pd.Series:
        starts, conts, max_s, max_c = bc.value
        memo: dict[str, list[str]] = {}

        def enc(w):
            if w is None:
                return None
            got = memo.get(w)
            if got is None:
                got = memo[w] = encode_word(w, starts, conts, max_s, max_c)
            return got

        return words.map(enc)

    return encode


def pretokenize(text_col: Column | str) -> Column:
    """JVM-side pre-tokenizer: lowercased ``[a-z0-9]+`` word array."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), F.lit(0))


def subword_pieces(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    out_col: str = "pieces",
    id_col: str | None = None,
) -> DataFrame:
    """Document rows + an ``out_col`` array of subword pieces.

    Direct path (one UDF call per row): right when the pieces
    themselves are the product (model input prep). For counts over a
    big corpus prefer :func:`subword_token_counts` — it encodes
    distinct words only.

    ``id_col`` names a unique row id when the caller has one;
    otherwise one is synthesized with ``monotonically_increasing_id``.
    Either way the frame is pinned via ``localCheckpoint`` before the
    self-join: its two branches would otherwise recompute a
    nondeterministic upstream (sample/limit) independently — with a
    synthesized id that attaches pieces to the wrong rows, and even
    with a genuine unique id the branches could see different ROW
    SETS, silently yielding empty pieces for rows the words branch
    never saw.
    """
    enc = encode_words_udf(spark, vocab)
    # flatten(transform(words, w -> pieces(w))) would re-enter Python
    # per word; instead explode once, encode, re-collect with the
    # word position keeping piece order stable.
    rid = F.col(id_col) if id_col is not None else F.monotonically_increasing_id()
    base = df.withColumn("__rid", rid).localCheckpoint(eager=False)
    words = base.select(
        "__rid", F.posexplode(pretokenize(text_col)).alias("__wp", "__w")
    )
    encoded = words.withColumn("__pieces", enc(F.col("__w")))
    per_doc = encoded.groupBy("__rid").agg(
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__wp"), F.col("__pieces")))
                ),
                lambda s: s["__pieces"],
            )
        ).alias(out_col)
    )
    return (
        base.join(per_doc, "__rid", "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.array().cast("array<string>")))
        .drop("__rid")
    )


def subword_token_counts(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: tuple[str, ...] = DEFAULT_VOCAB,
    broadcast_max_words: int | str | None = "auto",
) -> DataFrame:
    """(id, n_words, n_pieces, n_unk) per document — the scale path.

    Plan shape: explode to (doc, word) [codegen], hash-aggregate to
    per-doc-word counts, reduce to DISTINCT words, encode ONLY those
    through the Arrow UDF, and join the (word, piece_count, unk_count)
    table back over the per-doc word counts. The only
    corpus-proportional exchange is the per-doc aggregation; Python
    work is O(|distinct words|). Documents with no words keep a zero
    row (left join back to the input ids).

    ``broadcast_max_words`` guards the cost-table broadcast: distinct
    ``[a-z0-9]+`` tokens are CORPUS-bounded on web text (numerics,
    ids, typos grow without bound), so an unconditionally forced
    broadcast is a driver/executor OOM at scale.

    * ``"auto"`` (default): no broadcast hint — one plan, the corpus
      scanned once, and AQE picks broadcast-hash at runtime from the
      cost table's ACTUAL byte size (``autoBroadcastJoinThreshold``),
      falling back to a shuffle join when it is genuinely big. The
      size-aware choice with zero extra work.
    * an int: hard driver-side cap — the cost table is materialized
      (``localCheckpoint``) and counted, broadcast only when under
      the cap. Explicit and deterministic, but the materialization
      job costs one extra corpus pass; use when the plan must be
      fixed independent of AQE conf (tests, plan pinning).
    * ``None``: always hint broadcast (trusted bounded vocabulary).

    Crossover measurements in SCALING.md.
    """
    enc = encode_words_udf(spark, vocab)
    words = df.select(
        F.col(id_col), F.explode(pretokenize(text_col)).alias("__w")
    )
    per_doc_word = words.groupBy(id_col, "__w").agg(
        F.count(F.lit(1)).alias("__n")
    )
    distinct_words = per_doc_word.select("__w").distinct()
    word_costs = distinct_words.withColumn(
        "__pieces", enc(F.col("__w"))
    ).select(
        "__w",
        F.size("__pieces").alias("__pc"),
        F.size(
            F.filter(F.col("__pieces"), lambda p: p == F.lit(UNK_PIECE))
        ).alias("__uc"),
    )
    if broadcast_max_words is None:
        costs = F.broadcast(word_costs)
    elif broadcast_max_words == "auto":
        costs = word_costs
    else:
        wc = word_costs.localCheckpoint()
        costs = (
            F.broadcast(wc)
            if wc.count() <= broadcast_max_words
            else wc
        )
    counts = (
        per_doc_word.join(costs, "__w")
        .groupBy(id_col)
        .agg(
            F.sum("__n").alias("n_words"),
            F.sum(F.col("__n") * F.col("__pc")).alias("n_pieces"),
            F.sum(F.col("__n") * F.col("__uc")).alias("n_unk"),
        )
    )
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
        )
    )


# ---------------------------------------------------------------------------
# BPE vocabulary induction (training the tokenizer, not just running it)
# ---------------------------------------------------------------------------

def _merge_pair_col(s, a: str, b: str):
    """Fold ``s`` (array<string>) merging adjacent (a, b) -> a||b,
    leftmost-first non-overlapping — the classic BPE apply step, as a
    pure codegen-free HOF over the (vocabulary-sized) symbols column.
    Column-API lambdas, never string interpolation: symbol text can't
    break the expression."""
    ab = F.lit(a + b)
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over a (__cnt, __s) symbols frame —
    the per-round aggregation of the BPE loop (codegen explode + hash
    aggregate; overlapping pairs count, textbook convention)."""
    return (
        syms.where(F.size("__s") >= 2)
        .select(
            "__cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__s) - 1), i -> "
                    "struct(element_at(__s, i) AS a, "
                    "element_at(__s, i + 1) AS b))"
                )
            ).alias("__p"),
        )
        .groupBy(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .agg(F.sum("__cnt").alias("cnt"))
    )


def _char_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(__w, __cnt, __s) frame: distinct corpus words with counts and
    their character arrays — BPE's starting state. The ONLY
    corpus-proportional job in the trainer."""
    return (
        df.select(F.explode(pretokenize(text_col)).alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__w", "__cnt",
            F.expr(
                "transform(sequence(1, length(__w)), i -> substr(__w, i, 1))"
            ).alias("__s"),
        )
    )


def bpe_pair_counts(df: DataFrame, text_col: str) -> DataFrame:
    """First-round BPE statistics: adjacent CHARACTER pair counts
    weighted by word frequency — ``(a, b, pair_count)``. This is the
    aggregation every :func:`learn_bpe_merges` round argmaxes over,
    exposed standalone so the driver oracle can pin the corpus→pair
    machinery exactly (the iterative argmax itself is not
    set-expressible; it is pytest-pinned against a pure-Python
    reference trainer instead)."""
    return _pair_counts(_char_symbols(df, text_col)).select(
        "a", "b", F.col("cnt").cast("long").alias("pair_count")
    )


def learn_bpe_merges(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    num_merges: int = 50,
    min_pair_count: int = 2,
    merges_per_round: int = 1,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn a BPE merge table from a corpus — distributed vocabulary
    INDUCTION, the training half of the tokenizer surface (the
    round-8 encoder runs a given vocab; this produces one).

    Algorithm (Sennrich et al. 2016, the standard byte-pair-encoding
    recipe): start from characters, repeatedly count adjacent symbol
    pairs weighted by word frequency, merge the globally most
    frequent pair everywhere, repeat. Expressed Spark-first:

    * **One corpus-proportional pass, total.** The corpus collapses
      to DISTINCT (word, count) immediately (codegen explode +
      hash-aggregate, the same trick as
      :func:`subword_token_counts`); every iteration after that runs
      on the vocabulary-sized frame — bounded by the language plus
      corpus noise, not the corpus.
    * **Iterations are declarative.** Pair counting is an explode +
      hash aggregate; the argmax is ``orderBy(count desc, pair asc)
      limit 1`` (the lexicographic tiebreak makes the whole run
      deterministic); the merge application is an ``aggregate`` HOF
      fold — interpreted, but over distinct words only. Zero Python
      UDFs anywhere.
    * **Lineage is cut per round** (eager ``localCheckpoint`` on the
      small frame) so round N's plan doesn't replay rounds 1..N-1.
    * **``merges_per_round``** is the scale knob: >1 applies that
      many top pairs per round, greedily chosen SYMBOL-DISJOINT so
      their applications commute (a real 30k-merge vocab at one
      merge per job would mean 30k tiny jobs; disjoint batching is
      the standard production shortcut). Batched runs may diverge
      from strict sequential BPE — leave at 1 when exact parity with
      a reference trainer matters.

    Pair counts follow the textbook convention: overlapping pairs in
    a run ("aaa" -> (a,a) twice) COUNT twice but MERGE leftmost-first
    non-overlapping ("aaa" -> [aa, a]).

    Returns ``(merges, word_symbols)``: the ordered merge list
    ``[(left, right, pair_count), ...]`` (driver-side — K rows) and
    the final (word, count, symbols) DataFrame. Feed the merges to
    :func:`bpe_vocab_from_merges` to run the existing encoder with
    the learned vocabulary.
    """
    if num_merges < 1:
        raise ValueError("learn_bpe_merges: num_merges must be >= 1")
    if merges_per_round < 1:
        raise ValueError("learn_bpe_merges: merges_per_round must be >= 1")
    syms = _char_symbols(df, text_col).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    while len(merges) < num_merges:
        room = num_merges - len(merges)
        want = min(merges_per_round, room)
        pairs = (
            _pair_counts(syms)
            .where(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), "a", "b")
            # over-fetch so the disjoint filter still fills the round
            .limit(max(want * 4, 16))
            .collect()
        )
        if not pairs:
            break
        used: set[str] = set()
        round_merges = []
        for r in pairs:
            if len(round_merges) == want:
                break
            if r["a"] in used or r["b"] in used:
                continue
            round_merges.append((r["a"], r["b"], int(r["cnt"])))
            used.update((r["a"], r["b"], r["a"] + r["b"]))
        col = F.col("__s")
        for a, b, _ in round_merges:
            col = _merge_pair_col(col, a, b)
        syms = syms.withColumn("__s", col).localCheckpoint()
        merges.extend(round_merges)
    return merges, syms.select(
        F.col("__w").alias("word"),
        F.col("__cnt").alias("count"),
        F.col("__s").alias("symbols"),
    )


def bpe_vocab_from_merges(
    merges: list[tuple[str, str, int]],
) -> tuple[str, ...]:
    """Export learned merges as a greedy longest-match vocabulary for
    the existing encoder: every merge product plus the base alphabet,
    each in both word-start and ``##`` continuation roles. (BPE
    inference over a merges-as-vocab table IS the longest-match loop —
    module docstring; greedy longest-match and strict merge-order
    replay can differ on adversarial vocabularies, which is fine for
    a vocab EXPORT and pinned by test on the learned one.)"""
    prods = [a + b for a, b, _ in merges]
    base = list(_ALPHANUM)
    out: list[str] = []
    for p in base + prods:
        out.append(p)
        out.append("##" + p)
    return tuple(dict.fromkeys(out))

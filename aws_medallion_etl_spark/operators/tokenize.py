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

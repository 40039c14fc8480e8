"""Silver-layer cleaning: missing-data strategies, string normalization,
JSON-array tag parsing, and frequency classification.

Re-expresses the reference's silver jobs: impute/flag/drop strategies
with per-strategy counters (``Meta_Guideline.md:1623-1650``,
``1766-1797``), tag normalization ``lower/trim/regexp_replace``
(``Meta_Guideline.md:1963-1971``), the JSON-array tags column parsed
with ``from_json`` + ``explode`` (``Meta_Guideline.md:1268-1273``), and
the frequency → popularity-bucket classifier
(``Meta_Guideline.md:1982-1994``).

Scale notes: every strategy is a narrow, codegen'd projection — no
shuffle. The strategy counters ride on flag columns aggregated in ONE
pass instead of the reference's per-strategy ``.count()`` actions.
Frequency classification aggregates then joins back broadcast (the
per-tag frame is tiny relative to the row stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def impute_missing(
    df: DataFrame,
    defaults: dict[str, object],
    flag_suffix: str = "_was_imputed",
) -> DataFrame:
    """Fill NULL/blank string columns with defaults, flagging each fill.

    Mirrors the reference's "impute + flag" strategy
    (``Meta_Guideline.md:1629-1634``): the flag column lets DQ reports
    count imputations without a second scan.
    """
    out = df
    for col, default in defaults.items():
        is_missing = F.col(col).isNull()
        if isinstance(default, str):
            is_missing = is_missing | (F.trim(F.col(col)) == "")
        out = out.withColumn(col + flag_suffix, is_missing).withColumn(
            col, F.when(is_missing, F.lit(default)).otherwise(F.col(col))
        )
    return out


def drop_missing(df: DataFrame, required: list[str]) -> DataFrame:
    """Drop rows where any required column is NULL (the "drop" strategy)."""
    pred = F.lit(True)
    for c in required:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def strategy_counts(flagged: DataFrame, flag_cols: list[str]) -> dict:
    """One-scan counters for all strategy flags (DQ report input)."""
    row = flagged.agg(
        F.count(F.lit(1)).alias("total"),
        *[F.sum(F.col(c).cast("long")).alias(c) for c in flag_cols],
    ).collect()[0]
    return {c: row[c] or 0 for c in ["total", *flag_cols]}


def normalize_string(col: Column | str, keep: str = "a-z0-9\\- ") -> Column:
    """``lower(trim(x))`` with non-allowed characters stripped.

    Reference tag normalization (``Meta_Guideline.md:1963-1971``):
    lowercase, trim, drop everything outside ``[a-z0-9-]``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), f"[^{keep}]", "")


def parse_string_array(col: Column | str) -> Column:
    """Parse a JSON-encoded string array column (``from_json``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.from_json(c, ArrayType(StringType()))


def explode_tags(
    df: DataFrame,
    tags_col: str,
    id_cols: list[str],
    out_col: str = "tag",
    json_encoded: bool = True,
) -> DataFrame:
    """JSON tags column → one normalized, non-empty tag row per element.

    ``from_json`` + ``explode`` + normalize + drop blanks + exact dedup
    on (id, tag) — the full reference tags path
    (``Meta_Guideline.md:1268-1305``).
    """
    arr = parse_string_array(tags_col) if json_encoded else F.col(tags_col)
    out = (
        df.select(*id_cols, F.explode(arr).alias(out_col))
        .withColumn(out_col, normalize_string(out_col))
        .filter(F.col(out_col) != "")
        .dropDuplicates([*id_cols, out_col])
    )
    return out


def frequency_classify(
    df: DataFrame,
    col: str,
    popular_pct: float = 1.0,
    rare_count: int = 2,
    class_name: str = "frequency_class",
) -> DataFrame:
    """Per-value frequency + popularity bucket (popular / common / rare).

    Aggregate once, classify with a ``when`` ladder against the grand
    total (``Meta_Guideline.md:1982-1994``). Returns one row per value.
    """
    from pyspark.sql import Window

    freq = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return freq.withColumn(
        class_name,
        F.when(F.col("cnt") * 100.0 >= total * popular_pct, "popular")
        .when(F.col("cnt") <= rare_count, "rare")
        .otherwise("common"),
    )


def parse_boolean(col: Column | str) -> Column:
    """'TRUE'/'FALSE' (any case, padded) → boolean, else NULL.

    Reference boolean parse (``Meta_Guideline.md:1112-1115``) — an
    explicit when-chain, NOT ``cast('boolean')`` (which maps 'yes'/'1'
    too and differs between engines).
    """
    c = F.col(col) if isinstance(col, str) else col
    up = F.upper(F.trim(c))
    return (
        F.when(up == "TRUE", F.lit(True))
        .when(up == "FALSE", F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def rename_columns(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Bulk raw→snake_case rename (``Meta_Guideline.md:916-917``)."""
    return df.withColumnsRenamed(mapping)

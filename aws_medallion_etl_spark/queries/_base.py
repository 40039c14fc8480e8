"""Declared query inventory: one (Spark impl, DuckDB oracle) pair per operator.

Every operator family from SURVEY.md §2 — plus the training-data
extensions (dedup / similarity / text / multimodal) — is exercised
here against the driver's synthetic star schema (TESTDATA.md). Each
entry is registered with :func:`query`; ``QUERIES[name]`` is a
``(spark, sf_dir) -> DataFrame`` callable and ``ORACLES[name]`` the
ANSI-SQL equivalent DuckDB runs on the same parquet (omitted for ops
SQL cannot express — those get rows-only checks).

Conventions keeping the hash-compare honest:
* every computed column is aliased identically on both sides;
* double aggregates are ``round``-ed on both sides;
* BIGINT casts in the SQL wherever DuckDB would widen (sum → int128);
* top-k / window queries carry explicit tiebreakers so the row SET is
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import clean, corpus, dedup, dims, enrich, facts
from aws_medallion_etl_spark.operators import fuzzy, kpi, multimodal, scd, similarity, text, validate

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _hex8_bigint_sql(col: str) -> str:
    """Driver-portable BIGINT from 8 hex digits in column ``col``:
    per-digit ``strpos * 16^k`` rebuild instead of ``CAST('0x'||h AS
    BIGINT)``, which diverged on the driver's DuckDB before
    (``dq_dataset_fingerprint`` is the worked example, verify
    SKILL.md:144). Shared by every oracle that mirrors a Spark
    ``conv(substring(md5(..), 1, 8), 16, 10)`` hash.
    """
    terms = " +\n               ".join(
        f"CAST(strpos('0123456789abcdef', substr({col}, {i + 1}, 1)) - 1 "
        f"AS BIGINT) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return "(" + terms + ")"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events_probe(spark: SparkSession, sf_dir: str):
    """Shared events-encoding dispatch for batch AND streaming readers.

    The testdata generator has shipped ``ts`` both as TIMESTAMP(MICROS)
    (current) and TIMESTAMP(NANOS) (earlier rounds), so never assume
    either: probe the schema Spark actually reads and return
    ``(schema, rebuild)`` where ``rebuild(df)`` normalizes ``ts`` to a
    TIMESTAMP with the wall-clock values the file stores:

    * LONG — only happens when ``spark.sql.legacy.parquet.nanosAsLong``
      is set and the file is TIMESTAMP(NANOS): rebuild micros with
      integer ``div`` (float division loses precision above 2^53 ns).
      The escape hatch is flipped here on a failed first read (Spark
      rejects NANOS columns outright without it) — scoped to this read
      path, not a session default.
    * TIMESTAMP_NTZ — cast to TIMESTAMP (the cast interprets the wall
      clock in the SESSION timezone).

    Every branch first PINS ``spark.sql.session.timeZone=UTC`` — the
    engine's documented end-to-end contract (reference
    ``requirements/...:21``, our session factory default). This is a
    deliberate session-wide setting, not a scoped one: a driver
    session left on any other zone would render epoch-aligned window
    boundaries (``window``, ``date_trunc``) shifted away from the
    oracle's naive-UTC reading on EVERY encoding (micros included,
    not just the NTZ cast), and pinning it in the probe makes all
    events consumers order-independent. Non-events tables in this
    engine carry DATE columns, which the pin does not affect.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, LongType):
        def rebuild(df: DataFrame) -> DataFrame:
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(ts_type, TimestampNTZType):
        def rebuild(df: DataFrame) -> DataFrame:
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        def rebuild(df: DataFrame) -> DataFrame:
            return df
    return schema, rebuild


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events table with ``ts`` normalized (see ``_events_probe``)."""
    _, rebuild = _events_probe(spark, sf_dir)
    return rebuild(spark.read.parquet(f"{sf_dir}/events.parquet"))



def _scratch(tag: str, sf_dir: str) -> str:
    """Deterministic per-(query, sf) scratch dir under the system tmp."""
    import hashlib
    import tempfile

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return f"{tempfile.gettempdir()}/mdl_{tag}_{h}"
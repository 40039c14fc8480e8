"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (SURVEY.md §7.2 M7). The pattern for
image/audio/video at 100 TB: the payload is an opaque ``binary``
column travelling next to a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each Python worker
sees a columnar batch (zero per-row overhead), and the schema is
declared up front so Catalyst can prune/partition around the UDF.

The actual image/audio decoders are STUBBED (the container ships no
codec libraries): ``decode_stub`` raises ``NotImplementedError`` and
``fake_feature_extract`` computes deterministic sha256/length
"features" — the Spark-side plumbing (schema, batching, partitioning)
is real and is what the tests exercise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, sha256 string, n_bytes int"


def with_binary_payload(
    df: DataFrame, id_col: str, text_col: str, meta_cols: list[str]
) -> DataFrame:
    """Package rows as (id, payload binary, meta struct) — the transport schema.

    In production the binary column is the raw image/audio bytes read
    from object storage; here it is the utf-8 encoded text so the
    plumbing is exercisable on the synthetic tables.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(*[F.col(c) for c in meta_cols]).alias("meta"),
    )


def decode_stub(payload: bytes) -> object:
    """Placeholder for a real image/audio decode (no codec libs in env)."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment; "
        "swap in PIL/torchaudio/decord here"
    )


def fake_feature_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor (sha256 + byte length).

    Shaped exactly like a real extractor: consumes Arrow batches of
    (doc_id, payload), emits the declared FEATURE_SCHEMA. Swap the
    hash for a model forward pass without touching the plumbing.
    """
    import hashlib

    for pdf in batches:
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "sha256": [hashlib.sha256(b).hexdigest() for b in pdf["payload"]],
                "n_bytes": [len(b) for b in pdf["payload"]],
            }
        )
        out["n_bytes"] = out["n_bytes"].astype("int32")
        yield out


def extract_features(packaged: DataFrame) -> DataFrame:
    """Run the (stub) feature extractor over binary payloads via mapInPandas."""
    return packaged.select("doc_id", "payload").mapInPandas(
        fake_feature_extract, schema=FEATURE_SCHEMA
    )

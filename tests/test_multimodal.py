"""Multimodal plumbing: binary transport schema, Arrow-batched feature
extraction, frame sampling fan-out, resize normalization, decode stub.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from aws_medallion_etl_spark.operators import multimodal


@pytest.fixture()
def packaged(spark):
    docs = spark.createDataFrame(
        [
            (1, "short", "en"),
            (2, "a" * 500, "en"),
            (3, "", "es"),
        ],
        "doc_id long, text string, lang string",
    )
    return multimodal.with_binary_payload(docs, "doc_id", "text", ["lang"])


def test_transport_schema(packaged):
    assert packaged.schema.simpleString() == (
        "struct<doc_id:bigint,payload:binary,meta:struct<lang:string>>"
    )
    rows = {r.doc_id: r for r in packaged.collect()}
    assert bytes(rows[1].payload) == b"short"
    assert rows[2].meta.lang == "en"


def test_extract_features_deterministic(packaged):
    feats = {r.doc_id: r for r in multimodal.extract_features(packaged).collect()}
    assert feats[1].sha256 == hashlib.sha256(b"short").hexdigest()
    assert feats[1].n_bytes == 5
    assert feats[2].n_bytes == 500
    assert feats[3].n_bytes == 0  # empty payload still produces a row


def test_sample_frames_fanout(packaged):
    frames = multimodal.sample_frames(packaged, n_frames=4, frame_bytes=100)
    rows = frames.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 500-byte payload -> 4 frames of 100 bytes, evenly spaced
    f2 = sorted(by_doc[2], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in f2] == [0, 1, 2, 3]
    assert all(r.n_bytes == 100 for r in f2)
    # 5-byte payload -> one short frame; empty payload -> one empty frame
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_bytes == 5
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_bytes == 0


def test_resize_uniform_batch_shape(packaged):
    resized = multimodal.resize_stub(packaged, target_bytes=64)
    rows = resized.collect()
    assert all(r.n_bytes == 64 for r in rows)  # truncate AND zero-pad
    assert {r.doc_id for r in rows} == {1, 2, 3}


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="codec libraries"):
        multimodal.decode_stub(b"\x89PNG...")


def test_read_binary_files_glob_and_lossless(spark, tmp_path):
    """binaryFile scan: glob prunes at listing, bytes survive intact,
    metadata-only mode drops the content column."""
    from aws_medallion_etl_spark import io as eio

    payload = "héllo wörld é".encode("utf-8")
    (tmp_path / "a.bin").write_bytes(payload)
    (tmp_path / "b.bin").write_bytes(b"\x00\x01\xff")
    (tmp_path / "skip.tmp").write_bytes(b"pruned")
    df = eio.read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == payload
    assert rows["b.bin"]["length"] == 3
    meta = eio.read_binary_files(spark, str(tmp_path), glob="*.bin", drop_content=True)
    assert "content" not in meta.columns
    assert meta.count() == 2


def test_binary_files_feed_multimodal_pipeline(spark, tmp_path):
    """binaryFile rows slot straight into the Arrow-batched feature
    extractor — the ingest-to-decode path end to end."""
    from aws_medallion_etl_spark import io as eio

    (tmp_path / "7.bin").write_bytes(b"some fake image bytes")
    blobs = eio.read_binary_files(spark, str(tmp_path), glob="*.bin").select(
        F.regexp_extract("path", r"(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
        F.col("length").alias("payload_bytes"),
        F.lit("application/octet-stream").alias("mime"),
    )
    feats = multimodal.extract_features(blobs).collect()
    assert len(feats) == 1
    assert feats[0]["sha256"] == hashlib.sha256(
        b"some fake image bytes"
    ).hexdigest()


def test_image_metadata_from_real_headers(spark):
    """Real PNG/GIF header bytes parse to their true dimensions; other
    payloads yield NULLs (the corrupt-blob signal)."""
    import struct

    def png(w, h):
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00")

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5

    rows = [
        (1, png(640, 480)),
        (2, gif(320, 200)),
        (3, b"\xff\xd8\xff\xe0 jpeg-ish"),
        (4, b"plain text"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {
        r["id"]: (r["m"]["format"], r["m"]["width"], r["m"]["height"])
        for r in df.select(
            "id", multimodal.image_metadata("payload").alias("m")
        ).collect()
    }
    assert out[1] == ("png", 640, 480)
    assert out[2] == ("gif", 320, 200)
    assert out[3] == (None, None, None)
    assert out[4] == (None, None, None)
    # large dimensions survive the big-endian path (no sign issues)
    big = spark.createDataFrame([(9, png(70000, 3))], "id long, payload binary")
    r = big.select(multimodal.image_metadata("payload").alias("m")).first()
    assert (r["m"]["width"], r["m"]["height"]) == (70000, 3)

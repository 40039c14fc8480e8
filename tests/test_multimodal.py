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


# ---------------------------------------------------------------------------
# Real lib-free decode (round 11): netpbm + uncompressed BMP
# ---------------------------------------------------------------------------

def _ppm(w, h, fn):
    body = bytes(fn(x, y, c) for y in range(h) for x in range(w)
                 for c in range(3))
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + body


def _bmp24(w, h, fn, top_down=False):
    import struct

    stride = (w * 3 + 3) & ~3
    rows = []
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(w):
            r, g, b = fn(x, y, 0), fn(x, y, 1), fn(x, y, 2)
            row += bytes((b, g, r))                   # BGR on disk
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixel = b"".join(rows)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(pixel), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                      1, 24, 0, len(pixel), 2835, 2835, 0, 0)
    return header + dib + pixel


def test_decode_image_real_formats():
    """Pixel-exact decode of P6/P5 and 24-bit BMP (padding, bottom-up
    AND top-down), identical values across container formats; codec
    magics defer to the stub."""
    import numpy as np
    import pytest as _pytest

    fn = lambda x, y, c: (7 * x + 13 * y + 29 * c) % 256
    w, h = 5, 3                                       # stride padding hits
    ppm = multimodal.decode_image(_ppm(w, h, fn))
    bmp = multimodal.decode_image(_bmp24(w, h, fn))
    bmp_td = multimodal.decode_image(_bmp24(w, h, fn, top_down=True))
    assert ppm.shape == (h, w, 3)
    assert ppm[2, 4, 1] == fn(4, 2, 1)
    assert np.array_equal(ppm, bmp)
    assert np.array_equal(bmp, bmp_td)
    pgm = multimodal.decode_image(b"P5\n2 2\n255\n\x00\x40\x80\xff")
    assert pgm.shape == (2, 2, 1) and pgm[1, 1, 0] == 255
    with _pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\nrest")
    # resize: nearest-neighbor picks exact source pixels
    t = multimodal.resize_nearest(ppm, 2, 2)
    assert t.shape == (2, 2, 3)
    assert t[0, 0, 0] == fn(0, 0, 0)


def test_decode_image_features_mixed_corpus(spark):
    """The Arrow-batched decode->resize->featurize chain: real stats
    for decodable rows, decoded=false (not a batch failure) for codec
    rows mixed into the same frame."""
    import numpy as np

    fn = lambda x, y, c: (x + y + c) % 256
    rows = [
        (1, _ppm(4, 4, fn)),
        (2, _bmp24(4, 4, fn)),
        (3, b"\x89PNG\r\n\x1a\n not really"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r["doc_id"]: r
        for r in multimodal.decode_image_features(df, thumb=2).collect()
    }
    assert got[1]["decoded"] and got[2]["decoded"] and not got[3]["decoded"]
    assert (got[1]["height"], got[1]["width"], got[1]["channels"]) == (4, 4, 3)
    expect = round(float(np.mean(
        [fn(x, y, c) for y in range(4) for x in range(4) for c in range(3)]
    )), 4)
    assert got[1]["mean_px"] == expect == got[2]["mean_px"]
    assert got[3]["mean_px"] is None


def _wav16(samples, rate=8000, channels=1):
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    # an extra odd-sized chunk BEFORE data exercises chunk walking +
    # even-padding
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt + junk
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_audio_real_pcm():
    """Sample-exact PCM WAV decode: chunk walking with odd padding,
    16-bit scaling, 8-bit unsigned offset, stereo shape; float WAV and
    non-RIFF defer to the stub."""
    import struct

    import numpy as np
    import pytest as _pytest

    s = [0, 16384, -16384, -32768, 32767, 1]
    x, rate = multimodal.decode_audio(_wav16(s))
    assert rate == 8000 and x.shape == (6, 1)
    assert x[1, 0] == 0.5 and x[2, 0] == -0.5 and x[3, 0] == -1.0
    st, _ = multimodal.decode_audio(_wav16([1, 2, 3, 4], channels=2))
    assert st.shape == (2, 2) and st[1, 1] == 4 / 32768
    # 8-bit unsigned: 128 is silence
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    w8 = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt8) + 8 + 3) + b"WAVE"
          + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8
          + b"data" + struct.pack("<I", 3) + bytes([128, 255, 0]))
    x8, _ = multimodal.decode_audio(w8)
    assert x8[0, 0] == 0.0 and x8[1, 0] > 0.99 and x8[2, 0] == -1.0
    fmt_f = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    wf = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_f) + 8) + b"WAVE"
          + b"fmt " + struct.pack("<I", len(fmt_f)) + fmt_f
          + b"data" + struct.pack("<I", 0))
    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(wf)
    with _pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x03mp3 junk")


def test_decode_audio_features_mixed(spark):
    """RMS / zero-crossing / duration computed from REAL decoded
    samples; codec rows yield decoded=false."""
    import numpy as np

    s = [100, -100] * 8                       # alternating: max crossings
    rows = [(1, _wav16(s)), (2, b"ID3 not audio")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r
           for r in multimodal.decode_audio_features(df).collect()}
    r1 = got[1]
    assert r1["decoded"] and r1["sample_rate"] == 8000
    assert r1["n_frames"] == 16 and r1["duration_ms"] == 2
    assert r1["zero_cross"] == 1.0            # every adjacent pair flips
    assert r1["rms"] == round(100 / 32768, 4)
    assert not got[2]["decoded"] and got[2]["rms"] is None

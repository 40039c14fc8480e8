"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (SURVEY.md §7.2 M7). The pattern for
image/audio/video at 100 TB: the payload is an opaque ``binary``
column travelling next to a typed metadata struct; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each Python worker
sees a columnar batch (zero per-row overhead), and the schema is
declared up front so Catalyst can prune/partition around the UDF.

The codec boundary (round 11, narrowed): raster formats that need no
codec library — netpbm P5/P6 and uncompressed 24/32-bit BMP — decode
for REAL (:func:`decode_image`, pure numpy) with a real
nearest-neighbor resize and real pixel statistics
(:func:`decode_image_features`). Compressed formats (PNG/JPEG/audio/
video) still raise through ``decode_stub`` — swap in
PIL/torchaudio/decord there; ``fake_feature_extract`` remains the
deterministic stand-in for a model forward pass. The Spark-side
plumbing (schema, Arrow batching, partitioning) is identical for the
real and stubbed halves.
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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, n_bytes int"


def sample_frames(
    packaged: DataFrame, n_frames: int = 4, frame_bytes: int = 64
) -> DataFrame:
    """Frame sampling: N evenly-spaced fixed-size windows per payload.

    The video-pipeline shape: one input row fans out to ``n_frames``
    rows of (doc_id, frame_idx, frame bytes). A real decoder would
    seek keyframes; the deterministic stand-in slices evenly-spaced
    byte windows so offsets, fan-out, and schema behave exactly like
    production. Runs in ``mapInPandas`` — fan-out happens inside the
    Arrow batch, so no explode shuffle on the binary column.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                size = len(payload)
                k = min(n_frames, max(size // max(frame_bytes, 1), 1))
                step = max((size - frame_bytes) // max(k - 1, 1), 1) if size > frame_bytes else 0
                for i in range(k):
                    start = min(i * step, max(size - frame_bytes, 0))
                    frame = payload[start : start + frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(frame)
                    out["n_bytes"].append(len(frame))
            res = pd.DataFrame(out)
            res["frame_idx"] = res["frame_idx"].astype("int32")
            res["n_bytes"] = res["n_bytes"].astype("int32")
            yield res

    return packaged.select("doc_id", "payload").mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, payload binary, n_bytes int"


def resize_stub(packaged: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' payloads to a fixed byte budget (truncate / zero-pad).

    Stands in for image resize / audio resample: output size is
    uniform so downstream batch shapes are predictable — exactly the
    property a real resize provides. Swap the body for PIL/ffmpeg
    without touching schema or callers.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(p[:target_bytes]).ljust(target_bytes, b"\x00")
                for p in pdf["payload"]
            ]
            res = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "n_bytes": [len(p) for p in resized],
                }
            )
            res["n_bytes"] = res["n_bytes"].astype("int32")
            yield res

    return packaged.select("doc_id", "payload").mapInPandas(resize, schema=RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Container-header metadata: dimensions WITHOUT a codec
# ---------------------------------------------------------------------------

def _be32(payload, pos: int):
    """Big-endian uint32 at 1-based byte offset ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("long")


def _le16(payload, pos: int):
    """Little-endian uint16 at 1-based byte offset ``pos``."""
    lo = F.conv(F.hex(F.substring(payload, pos, 1)), 16, 10).cast("long")
    hi = F.conv(F.hex(F.substring(payload, pos + 1, 1)), 16, 10).cast("long")
    return lo + hi * 256


def image_metadata(payload) -> "F.Column":
    """(format, width, height) parsed straight from container-header
    BYTES — pure codegen substring/hex arithmetic, NO codec library.

    The fixed-offset formats a 100 TB media lake can triage for free
    during ingest (corrupt-blob quarantine, aspect-ratio filters,
    thumbnail-vs-full routing) before any decoder ever runs:

    * PNG: 8-byte signature, then the IHDR chunk puts width/height as
      big-endian uint32 at byte offsets 17/21 (1-based).
    * GIF87a/89a: 6-byte signature, then logical-screen width/height
      as little-endian uint16 at offsets 7/9.

    Variable-segment formats (JPEG) need a real scan — that belongs in
    the Arrow-batched decode stage, not the header triage. Non-image
    payloads yield (NULL, NULL, NULL), which doubles as the
    corrupt-blob detector for the two supported formats.
    """
    p = F.col(payload) if isinstance(payload, str) else payload
    sig8 = F.hex(F.substring(p, 1, 8))
    sig6 = F.hex(F.substring(p, 1, 6))
    is_png = sig8 == "89504E470D0A1A0A"
    is_gif = (sig6 == "474946383761") | (sig6 == "474946383961")
    fmt = F.when(is_png, "png").when(is_gif, "gif").otherwise(F.lit(None))
    width = (
        F.when(is_png, _be32(p, 17)).when(is_gif, _le16(p, 7)).otherwise(F.lit(None))
    )
    height = (
        F.when(is_png, _be32(p, 21)).when(is_gif, _le16(p, 9)).otherwise(F.lit(None))
    )
    return F.struct(
        fmt.alias("format"), width.alias("width"), height.alias("height")
    )


# ---------------------------------------------------------------------------
# REAL decode for lib-free raster formats (round 11)
# ---------------------------------------------------------------------------
#
# The codec boundary, made honest and narrower: formats whose pixels
# need no codec library — netpbm P5/P6 and uncompressed BMP — decode
# for REAL (pure numpy, zero dependencies beyond what Arrow already
# ships); compressed formats (PNG/JPEG/...) still raise through
# decode_stub. At 100 TB the plumbing is identical either way:
# mapInPandas over Arrow batches, one decoded array per payload.

def decode_image(payload: bytes):
    """Decode a raster payload to a ``numpy.uint8`` array of shape
    (h, w, channels).

    Supported WITHOUT codec libraries: netpbm binary grayscale (P5) /
    RGB (P6) with maxval <= 255, and uncompressed 24/32-bit BMP
    (bottom-up or top-down, row padding honored, BGR(A) -> RGB(A)).
    Anything else defers to :func:`decode_stub` (raises — the honest
    boundary for codec formats).
    """
    import numpy as np

    if payload[:2] in (b"P5", b"P6"):
        toks: list[bytes] = []
        i = 2
        while len(toks) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":           # comment to EOL
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
        w, h, maxval = (int(t) for t in toks)
        if maxval > 255:
            return decode_stub(payload)              # 16-bit netpbm
        i += 1                                       # single ws after maxval
        c = 3 if payload[:2] == b"P6" else 1
        pix = np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=i)
        return pix.reshape(h, w, c)
    if payload[:2] == b"BM":
        def le(pos, n):
            return int.from_bytes(payload[pos : pos + n], "little", signed=True)

        off, w, h = le(10, 4), le(18, 4), le(22, 4)
        bpp, compression = le(28, 2), le(30, 4)
        if bpp not in (24, 32) or compression != 0:
            return decode_stub(payload)              # paletted/RLE/...
        top_down, h = h < 0, abs(h)
        c = bpp // 8
        stride = (w * c + 3) & ~3
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=h * stride, offset=off
        ).reshape(h, stride)[:, : w * c].reshape(h, w, c)
        if not top_down:
            rows = rows[::-1]
        return rows[..., [2, 1, 0] + ([3] if c == 4 else [])]  # BGR(A)->RGB(A)
    return decode_stub(payload)


def resize_nearest(img, out_h: int, out_w: int):
    """Real nearest-neighbor resize of a decoded (h, w, c) array —
    pure index arithmetic, the classic pre-model thumbnail step."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


DECODED_SCHEMA = (
    "doc_id bigint, decoded boolean, height int, width int, channels int, "
    "mean_px double, thumb_mean_px double"
)


def decode_image_features(
    packaged: DataFrame, thumb: int = 8, ndigits: int = 4
) -> DataFrame:
    """Decode payloads (where the format is lib-free) and emit REAL
    pixel statistics: dimensions, global mean intensity, and the mean
    after a nearest-neighbor resize to ``thumb`` x ``thumb`` — the
    decode -> resize -> featurize chain of an image pipeline, Arrow-
    batched in ``mapInPandas``. Codec formats yield ``decoded=false``
    with NULL stats instead of failing the batch (a 100 TB corpus is
    never format-pure; the row-level miss is data, not an error)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "decoded", "height", "width", "channels",
                "mean_px", "thumb_mean_px",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    img = decode_image(bytes(payload))
                except (NotImplementedError, ValueError, IndexError):
                    img = None
                if img is None:
                    out["decoded"].append(False)
                    for k in ("height", "width", "channels"):
                        out[k].append(None)
                    out["mean_px"].append(None)
                    out["thumb_mean_px"].append(None)
                    continue
                t = resize_nearest(img, thumb, thumb)
                out["decoded"].append(True)
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                out["channels"].append(img.shape[2])
                out["mean_px"].append(
                    round(float(np.mean(img, dtype=np.float64)), ndigits)
                )
                out["thumb_mean_px"].append(
                    round(float(np.mean(t, dtype=np.float64)), ndigits)
                )
            res = pd.DataFrame(out)
            for k in ("height", "width", "channels"):
                res[k] = res[k].astype("Int32")
            yield res

    return packaged.select("doc_id", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


# ---------------------------------------------------------------------------
# REAL decode for lib-free audio (round 11): RIFF/WAVE PCM
# ---------------------------------------------------------------------------

def decode_audio(payload: bytes):
    """Decode a RIFF/WAVE payload with uncompressed PCM samples to
    ``(samples, sample_rate)`` — samples a float64 numpy array of
    shape (n_frames, channels) scaled to [-1, 1].

    Supported WITHOUT codec libraries: canonical WAV containers with
    ``fmt `` audio format 1 (integer PCM, 8/16/32-bit). Chunk walking
    honors arbitrary chunk order and odd-length padding. Compressed
    formats (MP3/AAC/float/extensible) defer to :func:`decode_stub`.
    """
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return decode_stub(payload)
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks pad to even
    if fmt is None or data is None:
        return decode_stub(payload)

    def le(b, p, n):
        return int.from_bytes(b[p : p + n], "little")

    audio_format, channels = le(fmt, 0, 2), le(fmt, 2, 2)
    rate, bits = le(fmt, 4, 4), le(fmt, 14, 2)
    if audio_format != 1 or bits not in (8, 16, 32) or channels < 1:
        return decode_stub(payload)
    if bits == 8:                             # 8-bit WAV is UNSIGNED
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    else:
        dt = np.int16 if bits == 16 else np.int32
        n = len(data) // (bits // 8)
        x = np.frombuffer(data, dtype=dt, count=n).astype(np.float64)
        x = x / float(2 ** (bits - 1))
    n_frames = len(x) // channels
    return x[: n_frames * channels].reshape(n_frames, channels), rate


AUDIO_SCHEMA = (
    "doc_id bigint, decoded boolean, sample_rate int, channels int, "
    "n_frames bigint, duration_ms bigint, rms double, zero_cross double"
)


def decode_audio_features(packaged: DataFrame, ndigits: int = 4) -> DataFrame:
    """Decode PCM WAV payloads and emit REAL signal statistics: frame
    count, duration, RMS level, and zero-crossing rate (the classic
    silence / tone / speech triage features) — Arrow-batched in
    ``mapInPandas``, codec rows marked ``decoded=false`` like the
    image chain."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("doc_id", "decoded", "sample_rate", "channels",
                    "n_frames", "duration_ms", "rms", "zero_cross")
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                try:
                    samples, rate = decode_audio(bytes(payload))
                except (NotImplementedError, ValueError, IndexError):
                    out["decoded"].append(False)
                    for k in cols[2:]:
                        out[k].append(None)
                    continue
                mono = samples.mean(axis=1)
                n = len(mono)
                out["decoded"].append(True)
                out["sample_rate"].append(rate)
                out["channels"].append(samples.shape[1])
                out["n_frames"].append(n)
                out["duration_ms"].append(int(n * 1000 // max(rate, 1)))
                out["rms"].append(
                    round(float(np.sqrt(np.mean(mono ** 2))), ndigits)
                    if n else None
                )
                zc = (
                    float(np.count_nonzero(np.diff(np.signbit(mono))))
                    / max(n - 1, 1)
                )
                out["zero_cross"].append(round(zc, ndigits) if n > 1 else None)
            res = pd.DataFrame(out)
            for k in ("sample_rate", "channels"):
                res[k] = res[k].astype("Int32")
            for k in ("n_frames", "duration_ms"):
                res[k] = res[k].astype("Int64")
            yield res

    return packaged.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_SCHEMA
    )

"""Multimodal column handling: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
layout, Arrow-batched ``mapInPandas`` UDF signatures, deterministic batch
shapes. Decoding has TWO tiers:

- REAL, dependency-free: uncompressed formats are parsed by pure
  Python/numpy — binary PPM (P6) / PGM (P5) and uncompressed 24-bit BMP
  (``_decode_uncompressed_image``) — yielding genuine pixel statistics
  (dims, per-channel means/stds, luma range, gradient energy) as the
  feature vector.
- STUBBED: compressed codecs (JPEG/PNG/audio/video) need Pillow/ffmpeg,
  which this container doesn't ship; those blobs get deterministic fake
  features, and under ``require_real_decoder=True`` they raise
  ``NotImplementedError`` at execution — the documented seam where the
  real codec libraries plug in.

Design (SURVEY §2.E5):
- media rows: (media_id, modality, content binary, meta struct) — content
  stays an opaque BinaryType column; Spark never interprets it, so scans
  prune it unless a stage actually needs bytes.
- feature extraction: ``mapInPandas`` over Arrow record batches — bytes
  arrive zero-copy per batch; output is a fixed-width float array column.
- at 100 TB: store media in Parquet with a small row-group size (bytes
  dominate), partition by modality/date, and keep features in a SEPARATE
  narrow table keyed by media_id so downstream training reads never touch
  the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, modality string, n_bytes long, "
    f"features array<float>"
)


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: md5-seeded floats in
    [0, 1). Stable across runs/machines so tests can assert exact values."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(content + counter.to_bytes(4, "big")).digest()
        for i in range(0, len(h), 4):
            if len(out) >= dim:
                break
            v = int.from_bytes(h[i : i + 4], "big") / 2**32
            out.append(float(v))
        counter += 1
    return out


def _parse_pnm(content: bytes):
    """Parse binary PPM (P6, RGB) / PGM (P5, grayscale) → (h, w, 3)
    float64 pixel array scaled to maxval, or None if not PNM. Pure
    stdlib + numpy — no image libraries."""
    import numpy as np

    if len(content) < 2 or content[:2] not in (b"P5", b"P6"):
        return None
    channels = 3 if content[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace-separated, with
    # '#' comments; pixel data starts after the single whitespace byte
    # following maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3 and i < len(content):
        c = content[i : i + 1]
        if c == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(content) and not content[j : j + 1].isspace():
                j += 1
            tokens.append(int(content[i:j]))
            i = j
    if len(tokens) < 3:
        return None
    w, h, maxval = tokens
    i += 1  # the single whitespace after maxval
    need = w * h * channels
    if maxval <= 0 or maxval > 255 or w <= 0 or h <= 0:
        return None
    if len(content) - i < need:
        return None
    px = np.frombuffer(content, dtype=np.uint8, count=need, offset=i)
    px = px.reshape(h, w, channels).astype(np.float64)
    if channels == 1:
        px = np.repeat(px, 3, axis=2)
    return px, maxval


def _parse_bmp24(content: bytes):
    """Parse uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) →
    (h, w, 3) float64 RGB array, or None if not such a BMP."""
    import struct

    import numpy as np

    if len(content) < 54 or content[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        return None
    w, h = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    if len(content) - data_off < stride * h:
        return None
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if bottom_up:
        px = px[::-1]
    return px.astype(np.float64), 255


def _real_pixel_features(content: bytes) -> "list[float] | None":
    """REAL feature extraction for dependency-free uncompressed formats:
    a FEATURE_DIM vector of genuine pixel statistics, or None when the
    bytes are not a supported format. Layout (all float64-exact,
    deterministic): [1.0 marker, width, height, channels-seen(3),
    maxval, meanR, meanG, meanB, stdR, stdG, stdB, mean_luma, min_luma,
    max_luma, mean |horizontal luma gradient|, frac pixels > mean_luma]."""
    import numpy as np

    parsed = _parse_pnm(content)
    if parsed is None:
        parsed = _parse_bmp24(content)
    if parsed is None:
        return None
    px, maxval = parsed
    h, w, _ = px.shape
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    mean_luma = float(luma.mean())
    grad = (
        float(np.abs(np.diff(luma, axis=1)).mean()) if w > 1 else 0.0
    )
    return [
        1.0,
        float(w),
        float(h),
        3.0,
        float(maxval),
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(stds[0]),
        float(stds[1]),
        float(stds[2]),
        mean_luma,
        float(luma.min()),
        float(luma.max()),
        grad,
        float((luma > mean_luma).mean()),
    ]


def decode_image_features(
    media: DataFrame, require_real_decoder: bool = False
) -> DataFrame:
    """(media_id, modality, n_bytes, features array<float>) via an
    Arrow-batched mapInPandas pass over the binary column.

    Per blob: uncompressed formats (P6 PPM / P5 PGM / 24-bit BMP) are
    REALLY decoded — the features are genuine pixel statistics
    (``_real_pixel_features``). Unrecognized bytes (JPEG/PNG/… need
    Pillow, absent here) fall back to deterministic fake features —
    or, with ``require_real_decoder=True``, raise ``NotImplementedError``
    at execution: the marked seam where real codec libraries plug in."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = []
            for c in pdf["content"]:
                if c is None:
                    feats.append(None)
                    continue
                b = bytes(c)
                real = _real_pixel_features(b)
                if real is not None:
                    feats.append(real)
                elif require_real_decoder:
                    raise NotImplementedError(
                        "blob is not an uncompressed PPM/PGM/BMP; real "
                        "decoding of compressed codecs needs Pillow/ffmpeg "
                        "(absent in this environment) — this is the "
                        "documented decoder seam"
                    )
                else:
                    feats.append(_fake_features(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(bytes(c)) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.select("media_id", "modality", "content").mapInPandas(
        extract, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id long, modality string, content binary, width int, height int"
)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    require_real_decoder: bool = False,
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` pass: image rows in,
    (media_id, modality, content, width, height) out with content replaced
    by the resized blob and metadata updated to the target dimensions.

    The pixel kernel is STUBBED (no Pillow in this container): the fake
    "resized" blob is a deterministic ``width*height*3``-byte RGB-sized
    payload derived from (original bytes, target dims), so tests can pin
    exact output sizes and bytes. ``require_real_decoder=True`` raises at
    plan build — the seam where Pillow's ``Image.resize`` plugs in.

    At 100 TB this is the canonical blob-transform shape: narrow input
    projection (id + bytes only), per-batch Arrow transfer, output written
    to a new media table — never mutate blobs in place.
    """
    if require_real_decoder:
        raise NotImplementedError(
            "real image resizing needs Pillow; not available in this "
            "environment — the deterministic byte stub stands in"
        )
    import pandas as pd

    n_out = width * height * 3

    def _fake_resize(content: bytes) -> bytes:
        seed = hashlib.md5(
            content + width.to_bytes(4, "big") + height.to_bytes(4, "big")
        ).digest()
        reps = -(-n_out // len(seed))  # ceil division
        return (seed * reps)[:n_out]

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": [
                        _fake_resize(bytes(c)) if c is not None else None
                        for c in pdf["content"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "modality", "content")
        .mapInPandas(resize, RESIZED_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame offset,
    derived from metadata only (no decoding): the Spark-side shape of a
    frame extractor. Offsets are exact multiples of ``every_ms`` within
    duration."""
    n = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_offset_ms"),
        )
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-modality size/meta stats — pure column expressions, blob column
    read but never interpreted."""
    return media.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum(F.length("content")).alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
        F.max("meta.duration_ms").alias("max_duration_ms"),
    )


N_PHASH_BITS = 64


def _phash_planes(
    dim: int = FEATURE_DIM, n_bits: int = N_PHASH_BITS, seed: int = 0x9E3779B9
) -> "list[list[float]]":
    """Deterministic hyperplane matrix (n_bits × dim) with md5-seeded
    weights in [-1, 1) — same derivation style as ``_fake_features`` so
    the hash is stable across runs/machines with no RNG state."""
    planes: list[list[float]] = []
    for b in range(n_bits):
        row: list[float] = []
        counter = 0
        while len(row) < dim:
            h = hashlib.md5(
                seed.to_bytes(8, "big") + b.to_bytes(4, "big") + counter.to_bytes(4, "big")
            ).digest()
            for i in range(0, len(h), 4):
                if len(row) >= dim:
                    break
                v = int.from_bytes(h[i : i + 4], "big") / 2**31 - 1.0
                row.append(float(v))
            counter += 1
        planes.append(row)
    return planes


def phash64(
    features: DataFrame,
    feature_col: str = "features",
    id_col: str = "media_id",
    seed: int = 0x9E3779B9,
) -> DataFrame:
    """64-bit perceptual-hash stand-in over a decoded feature vector: bit b
    is the sign of the feature's projection onto deterministic hyperplane b
    (features centered at 0.5, the mean of the fake decoder's uniform
    output — the role the median DCT coefficient plays in classic pHash).
    Nearby feature vectors flip few hyperplane signs, so Hamming distance
    on the hash tracks perceptual distance — the property the planted-pair
    tests pin. Replace ``decode_image_features``'s fake decoder with a real
    one and this hash becomes a real pHash pipeline unchanged.

    Shape: one Arrow-batched ``mapInPandas`` pass (numpy matmul per batch,
    n×dim @ dim×64), emitting (id, phash long) — fixed-width rows for any
    downstream exchange. The 64×dim plane matrix is process-local
    (re-derived per worker from the seed; nothing is broadcast)."""
    import pandas as pd

    planes = _phash_planes(seed=seed)

    def hashes(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        w = np.asarray(planes, dtype=np.float64).T  # dim × 64
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))  # bit packers
        for pdf in batches:
            x = np.asarray(list(pdf[feature_col]), dtype=np.float64) - 0.5
            bits = (x @ w) > 0.0  # n × 64 sign bits
            packed = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "phash": packed.view(np.int64)}
            )

    return features.select(id_col, feature_col).mapInPandas(
        hashes, f"{id_col} long, phash long"
    )


def phash_near_dups(
    features: DataFrame,
    feature_col: str = "features",
    id_col: str = "media_id",
    n_bands: int = 4,
    max_hamming: int = 6,
    seed: int = 0x9E3779B9,
) -> DataFrame:
    """Near-duplicate media pairs by banded perceptual hash — the shared
    LSH banding operator (``operators/dedup.banded_hamming_pairs``)
    applied to the 64-bit pHash. APPROXIMATE by the banding recall
    contract documented there: with 4 bands, pairs at Hamming 4-6 whose
    flipped bits straddle every band are missed; pass ``n_bands ≥
    max_hamming + 1`` for guaranteed capture.

    Scale: all-pairs work is confined to equal-chunk buckets (one
    exchange on (band, chunk)); candidates carry only two 8-byte hashes,
    so verification never revisits the blobs or the feature vectors."""
    from .dedup import banded_hamming_pairs

    ph = phash64(features, feature_col, id_col, seed).localCheckpoint(eager=False)
    return banded_hamming_pairs(ph, "phash", id_col, n_bands, max_hamming)

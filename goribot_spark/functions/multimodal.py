"""Multimodal column operators — image/audio/video as opaque binary + typed
metadata (training-pipeline surface beyond the reference crawler).

Everything runs as Arrow-batched ``mapInPandas`` so the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested at any scale. Decode
legs that need codecs absent from this sandbox (JPEG via PIL, audio, video)
are explicit deterministic stubs behind import guards — swap the inner
function on a cluster with the codec installed; the plan shape is identical.

Image ops are fully real: the pure-Python PNG codec decodes, and
resize/feature-extraction are plain numpy.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from goribot_spark.functions.pngcodec import decode_png, encode_png

RESIZED = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("error", StringType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("mean_rgb", ArrayType(DoubleType()), True),
        StructField("std_rgb", ArrayType(DoubleType()), True),
        StructField("brightness", DoubleType(), True),
        StructField("aspect", DoubleType(), True),
        StructField("error", StringType(), True),
    ]
)


def _resize_nn(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resample (pure numpy — deterministic, no PIL)."""
    sh, sw = px.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return px[ys][:, xs]


def resize_images(df: DataFrame, w: int, h: int, id_col: str = "image_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Batch image resize: binary → decode → NN-resample → re-encode PNG.

    mapInPandas keeps whole Arrow batches in one Python call; partitioning
    of the input carries through (no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "error": []}
            for iid, b in zip(pdf[id_col], pdf[bytes_col]):
                out["image_id"].append(iid)
                try:
                    px = _resize_nn(decode_png(bytes(b)), w, h)
                    out["bytes"].append(encode_png(px))
                    out["w"].append(w)
                    out["h"].append(h)
                    out["error"].append(None)
                except Exception as e:
                    out["bytes"].append(None)
                    out["w"].append(None)
                    out["h"].append(None)
                    out["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col).mapInPandas(run, RESIZED)


def image_features(df: DataFrame, id_col: str = "image_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Per-image feature extraction: channel means/stds, brightness, aspect."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    px = decode_png(bytes(b)).astype(np.float64)
                    mean = px.mean(axis=(0, 1))
                    std = px.std(axis=(0, 1))
                    rows.append(
                        (
                            iid,
                            [round(float(x), 4) for x in mean],
                            [round(float(x), 4) for x in std],
                            round(float(mean @ [0.299, 0.587, 0.114]), 4),
                            round(px.shape[1] / px.shape[0], 4),
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((iid, None, None, None, None, f"{type(e).__name__}"))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "mean_rgb", "std_rgb", "brightness", "aspect", "error"],
            )

    return df.select(id_col, bytes_col).mapInPandas(run, FEATURES)


def render_fingerprint_images(
    df: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fp8",
    size: int = 16,
) -> DataFrame:
    """Deterministic synthetic image per content fingerprint + its pHash.

    The sandbox corpus has no image column tied to documents, so this is the
    declared deterministic fake for "pages sharing boilerplate reuse the
    same hero image": the 32-char hex fingerprint is tiled into a
    ``size``x``size`` RGB array and round-tripped through the REAL codec
    path — ``encode_png`` → ``decode_png`` → ``phash64`` — so identical
    fingerprints yield identical images (pHash hamming 0) and distinct
    fingerprints yield unrelated noise (hamming ~32). Everything downstream
    (``phash_near_dups`` banded hamming join) is the production image
    near-dup plumbing; only the pixel source is synthetic.

    Returns (id, bytes, phash); input partitioning carries through (no
    shuffle — one Arrow batch in, one out)."""
    from pyspark.sql.types import LongType



    import hashlib

    n_bytes = size * size * 3
    n_blocks = (n_bytes + 15) // 16

    def _fill(fp: str) -> bytes:
        # Chained md5 keystream: full-range, non-periodic bytes per
        # fingerprint (a straight tiling of the hex string is so low-variance
        # that dHash box-mean gradients become near-ties and unrelated
        # fingerprints collide under the hamming<=3 gate).
        return b"".join(
            hashlib.md5(f"{fp}:{i}".encode()).digest() for i in range(n_blocks)
        )[:n_bytes]

    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("bytes", BinaryType(), True),
            StructField("phash", LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from goribot_spark.functions.pngcodec import phash64_batch

        for pdf in batches:
            blobs, pxs = [], []
            for fp in pdf[fp_col]:
                px = (
                    np.frombuffer(_fill(fp), np.uint8)
                    .reshape(size, size, 3)
                    .copy()
                )
                blobs.append(encode_png(px))
                pxs.append(decode_png(blobs[-1]))
            # Same-shape renders → one batched phash (bit-identical to the
            # scalar phash64; see test_phash_batch_bit_identical).
            hashes = phash64_batch(np.stack(pxs)).tolist() if pxs else []
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bytes": blobs, "phash": hashes}
            )

    return df.select(id_col, fp_col).mapInPandas(run, out_schema)


# -- stubbed decode legs (codec not in sandbox; plumbing is real) -----------

try:  # pragma: no cover
    import soundfile  # noqa: F401

    _HAS_AUDIO = True
except ImportError:
    _HAS_AUDIO = False

AUDIO_META = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", IntegerType(), True),
        StructField("rms", DoubleType(), True),
        StructField("error", StringType(), True),
    ]
)


def audio_features(df: DataFrame, id_col: str = "clip_id",
                   bytes_col: str = "bytes") -> DataFrame:
    """Audio decode + RMS. Without an audio codec in the image, every row
    reports the stub error — the batch plumbing and schema still execute."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, b in zip(pdf[id_col], pdf[bytes_col]):
                if not _HAS_AUDIO:
                    rows.append((iid, None, None, None, "audio_decode_unavailable:no_soundfile"))
                    continue
                raise NotImplementedError("wire soundfile decode here on a real cluster")
            yield pd.DataFrame(
                rows, columns=["clip_id", "sample_rate", "n_samples", "rms", "error"]
            )

    return df.select(id_col, bytes_col).mapInPandas(run, AUDIO_META)


FRAMES = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("frame_idx", IntegerType(), True),
        StructField("frame_png", BinaryType(), True),
        StructField("error", StringType(), True),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 30, id_col: str = "video_id",
                  bytes_col: str = "bytes") -> DataFrame:
    """Video frame sampling (1-to-many flatMap shape). Stubbed decode: no
    video codec in the sandbox — rows carry the stub error; the UDTF-like
    expansion contract (one input row → N frame rows) is the tested part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (iid, None, None, "video_decode_unavailable:no_codec")
                for iid in pdf[id_col]
            ]
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame_png", "error"])

    return df.select(id_col, bytes_col).mapInPandas(run, FRAMES)

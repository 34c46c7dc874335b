"""Image payload operators (I1-I2, input_hint) — decode, verify, phash.

The reference fetches opaque bytes and decodes only text payloads
(net.go:196-197, 305); the graft's payload is image+caption pairs, so the
charset-decode analog (S7) becomes image decode. All work is Arrow-batched:
a pandas UDF maps the binary column to a (w, h, fmt, phash, decode_error)
struct using the pure-Python PNG codec; JPEG decode requires PIL and is
cleanly stubbed when absent (sandbox has no image libs — the Spark-side
plumbing, schema and batch shape are real either way).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from goribot_spark.functions.pngcodec import decode_png, phash64, phash64_batch

try:  # pragma: no cover - sandbox has no PIL
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

DECODED = StructType(
    [
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("phash", LongType(), True),
        StructField("decode_error", StringType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SIG = b"\xff\xd8\xff"


def _decode_pixels(b: bytes | None):
    """bytes → (pixels|None, fmt, err). PNG via pure-Python codec; JPEG via
    PIL when available, else a marked stub error (never an exception)."""
    if b is None:
        return None, None, "empty"
    try:
        if b[:8] == _PNG_SIG:
            return decode_png(b), "png", None
        if b[:3] == _JPEG_SIG:
            if not _HAS_PIL:
                return None, "jpeg", "jpeg_decode_unavailable:no_PIL"
            import io

            import numpy as np

            return np.asarray(Image.open(io.BytesIO(b)).convert("RGB")), "jpeg", None
        return None, None, "unknown_format"
    except Exception as e:
        return None, None, f"decode_error:{type(e).__name__}"


def decode_image_bytes(b: bytes | None):
    """bytes → (w, h, fmt, phash, err) — scalar convenience path (tests,
    single-row callers). The hot path is decode_image_udf below."""
    px, fmt, err = _decode_pixels(b)
    if px is None:
        return None, None, fmt, None, err
    return px.shape[1], px.shape[0], fmt, phash64(px), err


@F.pandas_udf(DECODED)
def decode_image_udf(data: pd.Series) -> pd.DataFrame:
    """Decode + phash an Arrow batch of image bytes. Decode is per-image
    (variable-length bytes), but the phash — the dominant per-image cost
    after the filter-0 decode fast path — runs batched per pixel shape
    (``phash64_batch``, bit-identical to the scalar path): corpora have few
    distinct image shapes, so nearly the whole batch vectorizes across
    images instead of paying per-image numpy call overhead."""
    import numpy as np

    n = len(data)
    w_o: list = [None] * n
    h_o: list = [None] * n
    f_o: list = [None] * n
    p_o: list = [None] * n
    e_o: list = [None] * n
    by_shape: dict[tuple, tuple[list, list]] = {}
    for i, b in enumerate(data):
        px, fmt, err = _decode_pixels(b)
        f_o[i] = fmt
        e_o[i] = err
        if px is not None:
            h_o[i], w_o[i] = int(px.shape[0]), int(px.shape[1])
            idxs, arrs = by_shape.setdefault(px.shape[:2], ([], []))
            idxs.append(i)
            arrs.append(px)
    for _, (idxs, arrs) in by_shape.items():
        for i, v in zip(idxs, phash64_batch(np.stack(arrs))):
            p_o[i] = int(v)
    return pd.DataFrame(
        {"w": w_o, "h": h_o, "fmt": f_o, "phash": p_o, "decode_error": e_o}
    )


def with_decoded(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Attach engine-computed w/h/fmt/phash from the binary column.

    These override any stored metadata — the engine decodes, it does not
    trust the source (the per-row PSNR/caption oracle check compares against
    the fixture's stored values in tests).
    """
    return (
        df.withColumn("_dec", decode_image_udf(F.col(bytes_col)))
        .withColumn("w", F.col("_dec.w"))
        .withColumn("h", F.col("_dec.h"))
        .withColumn("fmt", F.col("_dec.fmt"))
        .withColumn("phash", F.col("_dec.phash"))
        .withColumn("decode_error", F.col("_dec.decode_error"))
        .drop("_dec")
    )

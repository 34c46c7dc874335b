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

from goribot_spark.functions.pngcodec import decode_png, phash64

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


def decode_image_bytes(b: bytes | None):
    """bytes → (w, h, fmt, phash, err). PNG via pure-Python codec; JPEG via
    PIL when available, else a marked stub error (never an exception)."""
    if b is None:
        return None, None, None, None, "empty"
    try:
        if b[:8] == _PNG_SIG:
            px = decode_png(b)
            return px.shape[1], px.shape[0], "png", phash64(px), None
        if b[:3] == _JPEG_SIG:
            if not _HAS_PIL:
                return None, None, "jpeg", None, "jpeg_decode_unavailable:no_PIL"
            import io

            import numpy as np

            px = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
            return px.shape[1], px.shape[0], "jpeg", phash64(px), None
        return None, None, None, None, "unknown_format"
    except Exception as e:
        return None, None, None, None, f"decode_error:{type(e).__name__}"


@F.pandas_udf(DECODED)
def decode_image_udf(data: pd.Series) -> pd.DataFrame:
    out = {"w": [], "h": [], "fmt": [], "phash": [], "decode_error": []}
    for b in data:
        w, h, fmt, ph, err = decode_image_bytes(b)
        out["w"].append(w)
        out["h"].append(h)
        out["fmt"].append(fmt)
        out["phash"].append(ph)
        out["decode_error"].append(err)
    return pd.DataFrame(out)


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

"""Multimodal binary-column operators.

Pattern (SURVEY-mandated): media are opaque ``binary`` columns with typed
metadata travelling beside them; decode / feature-extract / resize /
frame-sample run as ``mapInPandas`` over Arrow batches so a real decoder
drops in without touching the plumbing.

STUB NOTICE: this container has no image/audio codecs. ``decode_media``
with ``real_decoder=True`` raises NotImplementedError at the exact seam
where PIL/libav would plug in; the default path computes a DETERMINISTIC
FAKE decode (size, xxhash-derived pseudo-dimensions, byte-histogram
features) so schema, batching, and downstream aggregation are fully
exercised and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _fake_decode(buf: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for a real decoder: pseudo-dimensions from the
    content hash, features = 16-bin byte histogram (L1-normalized)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    h = int.from_bytes(arr[:8].tobytes().ljust(8, b"\0"), "little")
    width = 64 + (h % 960)
    height = 64 + ((h >> 16) % 960)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    total = hist.sum() or 1.0
    return width, height, (hist / total).astype(np.float32).tolist()


def decode_media(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    kind: str = "image",
    real_decoder: bool = False,
) -> DataFrame:
    """(id, binary) -> MEDIA_META_SCHEMA rows via mapInPandas."""
    proj = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decoder:
                raise NotImplementedError(
                    "real media decoding requires PIL/libav — not present in "
                    "this environment; plug the decoder in here"
                )
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(buf) if buf is not None else b""
                w, h, feats = _fake_decode(b)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(b),
                        "width": w,
                        "height": h,
                        "features": feats,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return proj.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def frame_sample(
    df: DataFrame, id_col: str, binary_col: str, every_n_bytes: int = 4096
) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled 'frame' offset (for video
    this is where a keyframe decoder plugs in). Deterministic offsets."""
    proj = df.select(F.col(id_col).alias("media_id"), F.col(binary_col).alias("payload"))
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("offset", LongType()),
            StructField("frame_hash", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(buf) if buf is not None else b""
                for i, off in enumerate(range(0, max(len(b), 1), every_n_bytes)):
                    chunk = np.frombuffer(b[off : off + 8].ljust(8, b"\0"), dtype="<i8")[0]
                    rows.append(
                        {"media_id": mid, "frame_idx": i, "offset": off, "frame_hash": int(chunk)}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return proj.mapInPandas(run, schema=schema)

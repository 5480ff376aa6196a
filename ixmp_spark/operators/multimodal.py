"""Multimodal column operators (north-star extension surface).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct:

    media struct<
        content binary,          -- raw bytes (or null when by-reference)
        uri string,              -- object-store pointer for >row-size blobs
        mime string,
        width int, height int,   -- images/video
        n_frames int,            -- video
        sample_rate int,         -- audio
        duration_s double
    >

Plumbing is real Spark (schema, partition-friendly batch iteration via
``mapInPandas``, Arrow transfer); the codec step is STUBBED — the
image/audio libraries are not in this container — behind
``_decode_bytes``, which produces a deterministic fake feature vector
from the bytes (documented NotImplementedError path for real decode).
At cluster scale each mapInPandas batch handles one Arrow record batch;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory for
large blobs, and by-reference rows (content null, uri set) let the UDF
fetch from object storage instead of shipping bytes through the shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("content", T.BinaryType()),
        T.StructField("uri", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

FEATURE_DIM = 16


def _decode_bytes(content: bytes, mime: str) -> list[float]:
    """STUB codec: deterministic pseudo-feature vector from a blake2b of
    the bytes. A real deployment implements per-mime decode here (PIL /
    torchaudio / pyav) — same signature, same batch shape.

    Raises NotImplementedError for mimes that would need a real decoder
    to produce anything meaningful beyond the fingerprint features.
    """
    if mime.startswith(("image/", "audio/", "video/")):
        h = hashlib.blake2b(content, digest_size=FEATURE_DIM * 2).digest()
        return [
            int.from_bytes(h[i * 2 : i * 2 + 2], "big") / 65535.0
            for i in range(FEATURE_DIM)
        ]
    raise NotImplementedError(f"no decoder for mime {mime!r}")


def extract_features(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: batches of rows in, one
    feature row per media item out. Arrow-batched — no per-row Python."""
    out_schema = (
        f"{id_col} long, mime string, n_bytes long, "
        f"features array<double>"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            rows = []
            for i, m in zip(pdf[id_col], media):
                content = m["content"] if m["content"] is not None else b""
                rows.append(
                    {
                        id_col: i,
                        "mime": m["mime"],
                        "n_bytes": len(content),
                        "features": _decode_bytes(bytes(content), m["mime"]),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(batches, schema=out_schema)


def resize_images(
    df: DataFrame, width: int, height: int, media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize pipeline shape: same-in/same-out struct with updated dims.
    The pixel transform is the stub (bytes pass through); the schema and
    batch plumbing are the real contract."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(media_col, MEDIA_STRUCT),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                m = dict(m)
                m["width"], m["height"] = width, height
                out.append({id_col: i, media_col: m})
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame, every_n: int, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling pipeline shape for video: one output row per kept
    frame index (explode without decoding — the frame decode itself is
    the stubbed step)."""
    out_schema = f"{id_col} long, frame_index int, mime string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                n = m["n_frames"] or 0
                rows.append(
                    pd.DataFrame(
                        {
                            id_col: i,
                            "frame_index": range(0, n, every_n),
                            "mime": m["mime"],
                        }
                    )
                )
            yield (
                pd.concat(rows, ignore_index=True)
                if rows
                else pd.DataFrame(columns=[id_col, "frame_index", "mime"])
            )

    return df.mapInPandas(batches, schema=out_schema)

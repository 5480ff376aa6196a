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


def chunk_audio(
    df: DataFrame,
    window_s: float,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio chunking pipeline shape: one output row per fixed-duration
    window of each clip, carrying the byte range a real decoder would
    slice (PCM-rate arithmetic on the metadata — the waveform decode
    itself is the stubbed step). The training-data use case is windowed
    transcription/embedding: downstream operators fan out per chunk, so
    chunk rows must be explodable WITHOUT shipping or decoding audio
    bytes — offsets come purely from (sample_rate, duration_s)."""
    out_schema = (
        f"{id_col} long, chunk_index int, start_s double, end_s double, "
        "start_sample long, end_sample long, mime string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                dur = m["duration_s"] or 0.0
                rate = m["sample_rate"] or 0
                n = max(1, -(-int(dur * 1e6) // int(window_s * 1e6))) if dur else 0
                for ci in range(n):
                    s = ci * window_s
                    e = min(dur, s + window_s)
                    rows.append(
                        {
                            id_col: i,
                            "chunk_index": ci,
                            "start_s": s,
                            "end_s": e,
                            "start_sample": int(s * rate),
                            "end_sample": int(e * rate),
                            "mime": m["mime"],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "chunk_index", "start_s", "end_s",
                    "start_sample", "end_sample", "mime",
                ],
            )

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

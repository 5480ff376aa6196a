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
``mapInPandas``, Arrow transfer). The codec layer decodes REAL bytes for
one stdlib-parseable format per modality — WAV audio (``wave`` +
numpy frombuffer) and BMP / binary-PPM images (header ``struct`` parse +
numpy pixel array) — producing genuine signal features (per-segment RMS
energy for audio; channel means + luminance histogram for images) and a
genuine nearest-neighbor resize for the image formats. Formats that
would need an external library (PNG/JPEG/MP4/FLAC — PIL/librosa/pyav are
not in this container) keep the deterministic fingerprint-vector
fallback, same signature, same batch shape; non-media mimes raise.
At cluster scale each mapInPandas batch handles one Arrow record batch;
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory for
large blobs, and by-reference rows (content null, uri set) let the UDF
fetch from object storage instead of shipping bytes through the shuffle.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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

#: mimes with a real pure-stdlib decode path (one per modality + PPM)
WAV_MIMES = ("audio/wav", "audio/x-wav", "audio/wave")
BMP_MIMES = ("image/bmp", "image/x-ms-bmp")
PPM_MIMES = ("image/x-portable-pixmap", "image/ppm")


def _wav_samples(content: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes (stdlib ``wave``) to a mono float waveform in
    [-1, 1] plus the sample rate. 8/16-bit PCM; multi-channel clips are
    mixed down by frame mean. Vectorized via numpy frombuffer — no
    per-sample Python."""
    with wave.open(io.BytesIO(content), "rb") as w:
        rate, nch = w.getframerate(), w.getnchannels()
        width, raw = w.getsampwidth(), w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width {width}")
    if nch > 1:
        samples = samples[: len(samples) - len(samples) % nch]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def _wav_features(content: bytes) -> list[float]:
    """Real audio features: RMS energy over FEATURE_DIM equal time
    segments (the classic energy envelope) — silence scores 0.0, a
    full-scale tone ~0.707 per covered segment."""
    samples, _ = _wav_samples(content)
    if len(samples) == 0:
        return [0.0] * FEATURE_DIM
    segs = np.array_split(samples, FEATURE_DIM)
    return [
        float(np.sqrt(np.mean(s * s))) if len(s) else 0.0 for s in segs
    ]


def _bmp_pixels(content: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bpp BMP (the format Windows Paint and
    every screenshot tool writes) into an (h, w, 3) RGB uint8 array.
    Handles bottom-up (positive height) and top-down rows, and the
    4-byte row padding. Header layout per the public BITMAPFILEHEADER /
    BITMAPINFOHEADER spec."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    data_off = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    bpp = struct.unpack_from("<H", content, 28)[0]
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bpp BMP supported (got {bpp} bpp, "
            f"compression {compression})"
        )
    bottom_up, height = height > 0, abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def _ppm_pixels(content: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) RGB uint8 array.
    Header = 'P6', width, height, maxval as whitespace/comment-separated
    ASCII tokens, then one raw RGB triple per pixel."""
    if content[:2] != b"P6":
        raise ValueError("not a binary PPM: missing 'P6' magic")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end-of-line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    width, height, maxval = tokens
    if maxval != 255:
        raise NotImplementedError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # single whitespace after maxval
    return np.frombuffer(
        content, dtype=np.uint8, count=width * height * 3, offset=pos
    ).reshape(height, width, 3).copy()


def _pixel_features(pixels: np.ndarray) -> list[float]:
    """Real image features from an (h, w, 3) RGB array: mean R/G/B and
    mean luminance (each /255), then a 12-bin luminance histogram
    (fraction of pixels per bin) — FEATURE_DIM = 4 + 12 values in
    [0, 1]."""
    flat = pixels.reshape(-1, 3).astype(np.float64)
    luma = flat @ np.array([0.299, 0.587, 0.114])
    means = [float(m) / 255.0 for m in flat.mean(axis=0)]
    hist, _ = np.histogram(luma, bins=FEATURE_DIM - 4, range=(0.0, 255.0001))
    return means + [float(luma.mean()) / 255.0] + (hist / len(luma)).tolist()


def _encode_ppm(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as binary PPM (P6)."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def _encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB uint8 array as an uncompressed 24-bpp
    bottom-up BMP (BITMAPFILEHEADER + BITMAPINFOHEADER)."""
    h, w = pixels.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


AVI_MIMES = ("video/avi", "video/x-msvideo", "video/vnd.avi")


def _riff_chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _riff_list(list_type: bytes, data: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + data)


def _encode_avi(frames: list, fps: int = 10) -> bytes:
    """Encode (h, w, 3) RGB uint8 frames as a minimal VALID uncompressed
    AVI (RIFF 'AVI ' / 'vids' stream, 'DIB ' handler, 24-bpp bottom-up
    BGR frames, idx1 index) — the video twin of ``_encode_bmp``, per the
    public RIFF/AVI and BITMAPINFOHEADER specs. Exists so tests and the
    m3 catalog row exercise a genuine video container end-to-end without
    pyav/ffmpeg."""
    h, w = frames[0].shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    payloads = []
    for f in frames:
        body = np.zeros((h, row_bytes), dtype=np.uint8)
        body[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        payloads.append(body.tobytes())
    frame_size = h * row_bytes
    avih = struct.pack(
        "<14I", int(1_000_000 / fps), frame_size * fps, 0, 0x10,
        len(frames), 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, len(frames), frame_size, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"".join(_riff_chunk(b"00db", p) for p in payloads)
    movi = _riff_list(b"movi", movi_body)
    idx, off = [], 4  # offsets relative to the 'movi' list-type fourcc
    for p in payloads:
        idx.append(struct.pack("<4sIII", b"00db", 0x10, off, len(p)))
        off += 8 + len(p) + (len(p) % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_frames(content: bytes) -> list:
    """Decode an uncompressed 24-bpp AVI into a list of (h, w, 3) RGB
    uint8 frames. Walks the RIFF chunk tree: BITMAPINFOHEADER from
    'strf' in the 'hdrl' list, frame payloads from '..db'/'..dc' chunks
    in the 'movi' list (bottom-up BGR rows, 4-byte padded — DIB rules,
    shared with the BMP decoder)."""
    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing RIFF/'AVI ' magic")

    def chunks(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            yield fourcc, pos + 8, size
            pos += 8 + size + (size % 2)

    w = h = bpp = None
    payloads = []
    for fourcc, dstart, size in chunks(content, 12, len(content)):
        if fourcc != b"LIST":
            continue
        ltype = content[dstart : dstart + 4]
        if ltype == b"hdrl":
            for f2, d2, s2 in chunks(content, dstart + 4, dstart + size):
                if f2 == b"LIST" and content[d2 : d2 + 4] == b"strl":
                    for f3, d3, s3 in chunks(content, d2 + 4, d2 + s2):
                        if f3 == b"strf":
                            w, h = struct.unpack_from("<ii", content, d3 + 4)
                            bpp = struct.unpack_from("<H", content, d3 + 14)[0]
        elif ltype == b"movi":
            for f2, d2, s2 in chunks(content, dstart + 4, dstart + size):
                if f2[2:4] in (b"db", b"dc"):
                    payloads.append(content[d2 : d2 + s2])
    if w is None or not payloads:
        raise ValueError("AVI without strf header or frame chunks")
    if bpp != 24:
        raise NotImplementedError(f"only 24-bpp DIB AVI supported, got {bpp}")
    bottom_up, h = h > 0, abs(h)
    row_bytes = (w * 3 + 3) & ~3
    frames = []
    for p in payloads:
        rows = np.frombuffer(
            p, dtype=np.uint8, count=row_bytes * h
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        frames.append(rows[:, :, ::-1].copy())  # BGR -> RGB
    return frames


def _video_features(content: bytes) -> list[float]:
    """Real video features: the per-frame pixel-feature vectors
    (mean R/G/B, luminance, 12-bin histogram) averaged across frames."""
    frames = _avi_frames(content)
    feats = np.array([_pixel_features(f) for f in frames])
    return [float(x) for x in feats.mean(axis=0)]


def _resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width, 3)."""
    src_h, src_w = pixels.shape[:2]
    rows = np.minimum((np.arange(height) * src_h) // height, src_h - 1)
    cols = np.minimum((np.arange(width) * src_w) // width, src_w - 1)
    return pixels[rows][:, cols]


def _decode_bytes(content: bytes, mime: str) -> list[float]:
    """Per-mime decode + feature extraction. Real decoders for the
    stdlib-parseable formats (WAV / BMP / binary PPM / uncompressed
    AVI — one per modality); other image,
    audio, and video mimes produce a deterministic fingerprint vector
    (blake2b of the bytes — the honest fallback while PIL/librosa/pyav
    are absent; a real deployment swaps decoders in here with the same
    signature and batch shape). Non-media mimes raise."""
    if mime in WAV_MIMES:
        return _wav_features(content)
    if mime in BMP_MIMES:
        return _pixel_features(_bmp_pixels(content))
    if mime in PPM_MIMES:
        return _pixel_features(_ppm_pixels(content))
    if mime in AVI_MIMES:
        return _video_features(content)
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

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def resize_images(
    df: DataFrame, width: int, height: int, media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize: same-in/same-out struct with updated dims. For the
    stdlib-decodable formats (BMP, binary PPM) the pixel data is REALLY
    resampled (nearest-neighbor) and re-encoded in the same format; for
    other mimes the bytes pass through with metadata-only updates (the
    documented fallback while PIL is absent)."""
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
                content = m.get("content")
                if content is not None and m["mime"] in BMP_MIMES:
                    pix = _resize_nearest(_bmp_pixels(bytes(content)), width, height)
                    m["content"] = _encode_bmp(pix)
                elif content is not None and m["mime"] in PPM_MIMES:
                    pix = _resize_nearest(_ppm_pixels(bytes(content)), width, height)
                    m["content"] = _encode_ppm(pix)
                m["width"], m["height"] = width, height
                out.append({id_col: i, media_col: m})
            yield pd.DataFrame(out)

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def chunk_audio(
    df: DataFrame,
    window_s: float,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Audio chunking pipeline shape: one output row per fixed-duration
    window of each clip, carrying the byte range a real decoder would
    slice. The training-data use case is windowed transcription /
    embedding: downstream operators fan out per chunk, so chunk rows
    must be explodable WITHOUT decoding audio — offsets come from
    (sample_rate, duration_s) metadata; when those are missing and the
    clip is an in-row WAV, the header is parsed (stdlib ``wave``) to
    fill them — a real decode of real bytes, still never materializing
    the waveform into the output."""
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
                if (not dur or not rate) and (
                    m["content"] is not None and m["mime"] in WAV_MIMES
                ):
                    with wave.open(io.BytesIO(bytes(m["content"])), "rb") as w:
                        rate = rate or w.getframerate()
                        dur = dur or w.getnframes() / w.getframerate()
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

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def extract_frames(
    df: DataFrame,
    every_n: int,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """REAL video frame extraction: decode AVI media in-batch
    (``_avi_frames``) and emit every ``every_n``-th frame as a binary-PPM
    image row — the decode-then-fan-out shape of a video training
    pipeline (frames become image-modality rows downstream: resize,
    feature-extract, dedup). Non-AVI video mimes raise the documented
    NotImplementedError (pyav/ffmpeg absent); the Spark plumbing —
    Arrow batches, one output row per kept frame, binary payloads — is
    the same for any codec swapped in."""
    out_schema = (
        f"{id_col} long, frame_index int, width int, height int, "
        "frame_ppm binary"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                if m["mime"] not in AVI_MIMES:
                    raise NotImplementedError(
                        f"no frame decoder for mime {m['mime']!r}"
                    )
                frames = _avi_frames(bytes(m["content"]))
                for fi in range(0, len(frames), every_n):
                    f = frames[fi]
                    rows.append(
                        (int(i), fi, f.shape[1], f.shape[0], _encode_ppm(f))
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_index", "width", "height", "frame_ppm"],
            )

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(
    df: DataFrame, every_n: int, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling pipeline shape for video: one output row per kept
    frame index (explode without decoding — cheap INDEX planning from
    metadata; ``extract_frames`` is the real decode path for AVI)."""
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

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def _dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: grayscale → 9×8 nearest-neighbor
    thumbnail → one bit per horizontal neighbor gradient. The standard
    perceptual fingerprint: stable under resize/re-encode/brightness,
    flipped bits count visual difference."""
    small = _resize_nearest(pixels, 9, 8).astype(np.float64).mean(axis=2)
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | int(small[r, c] > small[r, c + 1])
    return bits


def image_dhash(
    df: DataFrame, media_col: str = "media", id_col: str = "media_id"
) -> DataFrame:
    """Perceptual dHash per image — the multimodal twin of SimHash:
    near-identical images (resized, re-encoded, slightly edited) land
    within a few bits, so corpus-scale image dedup becomes the same
    banded-hash machinery the text side uses. Real decode for the
    stdlib-parseable formats (BMP / binary PPM); other image mimes
    raise — a perceptual hash of undecoded bytes would be a lie (the
    repo's honest-gate rule; PIL swaps in here when present).

    Arrow ``mapInPandas`` batches; output hashes are 64-bit SIGNED
    longs (bit 63 may set — compare with xor/bit_count, not order).

    Output: (id, mime, dhash long).
    """
    out_schema = f"{id_col} long, mime string, dhash long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                content = bytes(m["content"]) if m["content"] is not None else b""
                mime = m["mime"]
                if mime in BMP_MIMES:
                    px = _bmp_pixels(content)
                elif mime in PPM_MIMES:
                    px = _ppm_pixels(content)
                else:
                    raise NotImplementedError(
                        f"image_dhash: no real decoder for {mime!r} "
                        "(PIL absent); refusing to hash undecoded bytes"
                    )
                h = _dhash64(px)
                # to signed 64-bit (Spark long)
                rows.append(
                    {id_col: i, "mime": mime,
                     "dhash": h - (1 << 64) if h >= (1 << 63) else h}
                )
            yield pd.DataFrame(rows)

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )


def dhash_neardup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate image pairs from dHashes via the pigeonhole band
    trick (the d4 SimHash scheme on the image side): two hashes within
    ``max_hamming ≤ 6`` bits must agree EXACTLY on at least one of 4
    16-bit bands (6 flipped bits cannot touch all 4), so candidates
    come from four band-keyed equi-joins — never an all-pairs scan —
    and the exact Hamming verify (``bit_count(xor)``) runs JVM-side on
    the candidates only. max_hamming > 7 would need finer bands for
    the guarantee; raise instead of silently losing recall.

    Output: (a, b, hamming), a < b by id.
    """
    if max_hamming > 7:
        raise ValueError(
            "pigeonhole guarantee with 4x16-bit bands holds only for "
            "max_hamming <= 7; use more bands for a looser threshold"
        )
    h = F.col(hash_col)
    banded = hashes.select(
        F.col(id_col).alias("_id"),
        h.alias("_h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftrightunsigned(h, 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("_id", "_h", "band.bi", "band.bv")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["bi", "bv"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("a"),
            F.col("b._id").alias("b"),
            F.col("a._h").alias("_ha"),
            F.col("b._h").alias("_hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
    return (
        cand.withColumn("hamming", ham.cast("long"))
        .where(F.col("hamming") <= int(max_hamming))
        .select("a", "b", "hamming")
    )


def patchify_images(
    df: DataFrame,
    patch: int = 4,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """ViT-style image patchification: split each image into a grid of
    ``patch`` x ``patch`` pixel tiles and emit one row per tile with
    its grid position and mean-RGB feature — the preprocessing shape a
    vision-transformer training pipeline needs (a patch sequence per
    image), expressed as Arrow-batched ``mapInPandas`` so the batch
    shape, output schema, and partitioning are the real 100 TB
    plumbing. Ragged edges truncate (standard ViT behavior: W//p x
    H//p tiles); images smaller than one patch emit zero rows.

    Real pixel math for the stdlib-decodable formats (BMP, binary
    PPM); other image mimes emit ONE deterministic fingerprint patch
    at (0, 0) (the documented PIL-absent fallback — same contract as
    ``_decode_bytes``); non-image mimes raise. Output: (media_id,
    patch_row, patch_col, n_rows, n_cols, mean_r, mean_g, mean_b)
    rounded 6 — one row per tile, fanout = n_rows x n_cols per image.
    """
    import hashlib as _hashlib

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("patch_row", T.IntegerType()),
            T.StructField("patch_col", T.IntegerType()),
            T.StructField("n_rows", T.IntegerType()),
            T.StructField("n_cols", T.IntegerType()),
            T.StructField("mean_r", T.DoubleType()),
            T.StructField("mean_g", T.DoubleType()),
            T.StructField("mean_b", T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for i, m in zip(pdf[id_col], pdf[media_col]):
                m = dict(m)
                content = m.get("content")
                mime = m["mime"]
                if content is None:
                    continue
                content = bytes(content)
                if mime in BMP_MIMES:
                    pix = _bmp_pixels(content)
                elif mime in PPM_MIMES:
                    pix = _ppm_pixels(content)
                elif mime.startswith("image/"):
                    h = _hashlib.blake2b(content, digest_size=6).digest()
                    out.append(
                        {
                            id_col: i, "patch_row": 0, "patch_col": 0,
                            "n_rows": 1, "n_cols": 1,
                            "mean_r": round(h[0] / 255.0, 6),
                            "mean_g": round(h[1] / 255.0, 6),
                            "mean_b": round(h[2] / 255.0, 6),
                        }
                    )
                    continue
                else:
                    raise NotImplementedError(
                        f"patchify_images: not an image mime {mime!r}"
                    )
                hgt, wid = pix.shape[0], pix.shape[1]
                n_rows, n_cols = hgt // patch, wid // patch
                trimmed = pix[: n_rows * patch, : n_cols * patch, :]
                if n_rows == 0 or n_cols == 0:
                    continue
                # (n_rows, patch, n_cols, patch, 3) -> per-tile means
                tiles = trimmed.reshape(
                    n_rows, patch, n_cols, patch, 3
                ).astype(np.float64)
                means = tiles.mean(axis=(1, 3)) / 255.0
                for pr in range(n_rows):
                    for pc in range(n_cols):
                        out.append(
                            {
                                id_col: i,
                                "patch_row": pr,
                                "patch_col": pc,
                                "n_rows": n_rows,
                                "n_cols": n_cols,
                                "mean_r": round(float(means[pr, pc, 0]), 6),
                                "mean_g": round(float(means[pr, pc, 1]), 6),
                                "mean_b": round(float(means[pr, pc, 2]), 6),
                            }
                        )
            yield pd.DataFrame(
                out, columns=[f.name for f in out_schema.fields]
            )

    # guide §4.1: select only the two columns the batch fn reads —
    # Spark cannot see inside the opaque function and would ship
    # (and scan) every input column otherwise
    return df.select(id_col, media_col).mapInPandas(
        batches, schema=out_schema
    )

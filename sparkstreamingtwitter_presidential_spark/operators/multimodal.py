"""Multimodal (image/audio/video) column operators.

Media travels as opaque ``binary`` payloads + typed metadata
(schemas.MEDIA). Two decode backends:

  'fake'  deterministic pseudo-decodes from the raw payload bytes —
          exercises every downstream stage with stable results on any
          payload.
  'real'  actual decodes for the UNCOMPRESSED formats the in-repo
          pure-numpy codecs cover (BMP, PPM/PGM, WAV/PCM — see
          operators/codecs.py); video payloads are streams of
          concatenated BMP frames. Compressed formats (JPEG/MP4/…)
          still need PIL/av, which are not in this container — they
          route to an import-try probe that raises NotImplementedError,
          and light up unchanged where the libs exist.

Why mapInPandas: per-row Python UDFs serialize row-at-a-time; media
feature extraction is batch-friendly (decode N payloads per Arrow
batch, vectorize with numpy). Each output row keeps the input's
media_id so downstream joins need no shuffle beyond the id.

Scale notes: payloads dominate partition size — set
``spark.sql.files.maxPartitionBytes`` (and target parquet row-group
sizes) so one Arrow batch of payloads fits executor memory; feature
extraction is map-only (zero shuffle); pushdown still works on the
metadata columns because they are plain parquet columns next to the
blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_HIST_BINS = 16

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, byte_entropy double, "
    "byte_hist array<float>"
)

RESIZE_SCHEMA = (
    "media_id long, out_width int, out_height int, payload binary"
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_offset long, frame binary"


def _require_pil(context: str) -> None:
    """COMPRESSED-format decodes need PIL/av — not in this container.
    Kept behind an import-try so environments with the libs light up
    unchanged; uncompressed formats never reach here (codecs.py)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - the only path here
        raise NotImplementedError(
            f"real decode of {context} requires Pillow/av, which are not "
            "installed in this environment; supply BMP/PPM/PGM/WAV payloads "
            "(decoded natively), use decode_backend='fake', or install the "
            "codec libraries"
        ) from e


def _decode_pixels(payload: bytes) -> np.ndarray:
    """Real backend: payload -> flat uint8 content array (pixel bytes
    for images / BMP-stream videos, 16-bit samples mapped to uint8 bins
    for WAV audio). Unknown magic -> the PIL probe raises."""
    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    fmt = C.sniff_format(payload)
    if fmt == "bmp":
        frames = _split_bmp_stream(payload)
        return np.concatenate(
            [C.decode_bmp(f).reshape(-1) for _off, f in frames]
        )
    if fmt in ("ppm", "pgm"):
        return C.decode_ppm(payload).reshape(-1)
    if fmt == "wav":
        _rate, samples = C.decode_wav(payload)
        return ((samples.astype(np.int32) + 32768) >> 8).astype(np.uint8).reshape(-1)
    _require_pil(f"payload with magic {payload[:4]!r}")
    raise AssertionError("unreachable")  # pragma: no cover


def _split_bmp_stream(data: bytes) -> list[tuple[int, bytes]]:
    """Split a concatenation of BMP files (the real backend's
    uncompressed 'video' container) into [(byte_offset, bmp_bytes)...],
    using each header's file-size field. A single BMP yields one frame."""
    import struct

    frames: list[tuple[int, bytes]] = []
    i = 0
    while i + 6 <= len(data) and data[i : i + 2] == b"BM":
        (sz,) = struct.unpack_from("<I", data, i + 2)
        if sz < 54 or i + sz > len(data):
            raise ValueError(f"bad BMP stream: frame at {i} claims {sz} bytes")
        frames.append((i, data[i : i + sz]))
        i += sz
    if not frames or i != len(data):
        raise ValueError("bad BMP stream: trailing bytes or no frames")
    return frames


def make_synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = UTF-8 bytes of the text (stable across runs/engines),
    kind round-robins image/audio/video. Stands in for a real media
    parquet table until the driver ships one."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


#: Real-media synthesis dims (small on purpose: the point is exercising
#: real decodes end-to-end, not volume — the fixture supplies volume).
_IMG_W, _IMG_H = 16, 12
_WAV_RATE, _WAV_SAMPLES = 8000, 256
_VIDEO_FRAMES, _FRAME_W, _FRAME_H = 6, 8, 8


def make_real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table whose payloads are GENUINE encoded files, derived
    deterministically from doc_id (pure integer recurrences -> identical
    bytes on every run/engine): images are BMP (even doc_id) or P6 PPM
    (odd), audio is 16-bit PCM WAV, video is a stream of concatenated
    BMP frames. Built per Arrow batch via mapInPandas — encoding is
    numpy-vectorized per item and map-only, same scale shape as decode."""
    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                kind = ("image", "audio", "video")[i % 3]
                if kind == "image":
                    y, x = np.mgrid[0:_IMG_H, 0:_IMG_W]
                    px = np.stack(
                        [(i * 31 + y * 7 + x * 13 + c * 101) % 256 for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                    payload = C.encode_bmp(px) if i % 2 == 0 else C.encode_ppm(px)
                    mime = "image/bmp" if i % 2 == 0 else "image/x-portable-pixmap"
                    w, h, dur = _IMG_W, _IMG_H, None
                elif kind == "audio":
                    t = np.arange(_WAV_SAMPLES, dtype=np.int64)
                    samples = (((i * 7 + t * 13) % 65536) - 32768).astype(np.int16)
                    payload = C.encode_wav(_WAV_RATE, samples)
                    mime = "audio/wav"
                    w = h = None
                    dur = _WAV_SAMPLES * 1000 // _WAV_RATE
                else:
                    y, x = np.mgrid[0:_FRAME_H, 0:_FRAME_W]
                    payload = b"".join(
                        C.encode_bmp(
                            np.repeat(
                                ((i * 17 + f * 29 + y * 5 + x * 3) % 256)[..., None],
                                3,
                                axis=-1,
                            ).astype(np.uint8)
                        )
                        for f in range(_VIDEO_FRAMES)
                    )
                    mime = "video/x-bmp-stream"
                    w, h, dur = _FRAME_W, _FRAME_H, _VIDEO_FRAMES * 40
                rows.append((i, kind, payload, mime, w, h, dur))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "mime",
                    "width", "height", "duration_ms",
                ],
            )

    return docs.mapInPandas(
        op,
        "media_id long, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long",
    )


def extract_features(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """binary payload -> fixed-size feature row via mapInPandas.

    Fake backend: byte-level statistics (length, entropy, 16-bin byte
    histogram normalized to sum 1) — real computation over the real
    bytes, deterministic everywhere. Real backend DECODES first (BMP/
    PPM/PGM pixels, WAV samples, BMP-stream video frames — codecs.py)
    and computes the same statistics over the decoded content, so
    container framing (headers, padding, sample width) stops polluting
    the features; n_bytes stays the payload size either way.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = payload if payload is not None else b""
                if decode_backend == "real" and len(raw):
                    buf = _decode_pixels(bytes(raw))
                else:
                    buf = np.frombuffer(raw, dtype=np.uint8)
                n = int(buf.size)
                if n:
                    hist = np.bincount(buf >> 4, minlength=N_HIST_BINS).astype(np.float64)
                    p = hist / n
                    nz = p[p > 0]
                    entropy = float(-(nz * np.log2(nz)).sum())
                    hist_norm = (p).astype(np.float32)
                else:
                    entropy = 0.0
                    hist_norm = np.zeros(N_HIST_BINS, dtype=np.float32)
                out_rows.append(
                    (int(media_id), kind, len(raw), round(entropy, 6), hist_norm.tolist())
                )
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "kind", "n_bytes", "byte_entropy", "byte_hist"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(op, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_backend: str = "fake"
) -> DataFrame:
    """Resize: filters to images, emits (media_id, out dims, payload).
    Fake backend passes bytes through (bookkeeping only); real backend
    decode-resize(nearest)-reencodes per Arrow batch, preserving each
    payload's container (BMP stays BMP, PPM/PGM stays PNM)."""

    def _resize_one(raw: bytes) -> bytes:
        from sparkstreamingtwitter_presidential_spark.operators import codecs as C

        fmt = C.sniff_format(raw)
        if fmt == "bmp":
            return C.encode_bmp(C.resize_nearest(C.decode_bmp(raw), width, height))
        if fmt in ("ppm", "pgm"):
            return C.encode_ppm(C.resize_nearest(C.decode_ppm(raw), width, height))
        _require_pil(f"payload with magic {raw[:4]!r}")
        raise AssertionError("unreachable")  # pragma: no cover

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            if decode_backend == "real":
                payload = payload.map(lambda b: _resize_one(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": np.int32(width),
                    "out_height": np.int32(height),
                    "payload": payload,
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(op, RESIZE_SCHEMA)
    )


def sample_frames(
    media: DataFrame, n_frames: int = 4, decode_backend: str = "fake"
) -> DataFrame:
    """Frame sampling: for each video payload emit n_frames rows
    (media_id, frame_index, deterministic byte offset, frame bytes).
    Fake backend slices the payload at evenly spaced byte offsets; real
    backend parses the BMP-stream container (codecs.py) and emits
    complete, individually-decodable BMP frames picked evenly from the
    stream — the same contract an av/ffmpeg keyframe sampler fulfills
    for compressed containers (those route to the PIL/av probe)."""

    def _real_rows(media_id: int, data: bytes):
        from sparkstreamingtwitter_presidential_spark.operators import codecs as C

        if C.sniff_format(data) != "bmp":
            _require_pil(f"payload with magic {data[:4]!r}")
        parts = _split_bmp_stream(data)
        for i in range(n_frames):
            off, frame = parts[(i * len(parts)) // n_frames]
            yield media_id, i, off, frame

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                n = len(data)
                if decode_backend == "real" and n:
                    for mid, i, off, frame in _real_rows(int(media_id), bytes(data)):
                        ids.append(mid)
                        idxs.append(i)
                        offs.append(off)
                        frames.append(frame)
                    continue
                for i in range(n_frames):
                    off = (i * n) // n_frames if n else 0
                    ids.append(int(media_id))
                    idxs.append(i)
                    offs.append(off)
                    frames.append(data[off : off + 16])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_index": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame": frames,
                }
            )

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(op, FRAME_SCHEMA)
    )

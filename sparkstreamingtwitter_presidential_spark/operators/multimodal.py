"""Multimodal (image/audio/video) column operators.

Media travels as opaque ``binary`` payloads + typed metadata
(schemas.MEDIA). The Spark-side plumbing — schema, partitioning, Arrow
batch shape, mapInPandas signatures — is real and tested; the actual
codec calls are STUBBED for this container (no PIL/ffmpeg/librosa baked
in): ``decode_backend='real'`` raises NotImplementedError behind an
import-try, while the default ``'fake'`` backend derives deterministic
pseudo-decodes from the payload bytes so every downstream stage
(feature extraction, resize bookkeeping, frame sampling) is exercised
end-to-end with stable results.

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


def _require_real_backend() -> None:
    """Real decodes need PIL/av — not in this container. Kept behind an
    import-try so environments that have the libs light up unchanged."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - the only path here
        raise NotImplementedError(
            "real media decode requires Pillow/av, which are not installed "
            "in this environment; use decode_backend='fake' (deterministic) "
            "or install the codec libraries"
        ) from e


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


def extract_features(media: DataFrame, decode_backend: str = "fake") -> DataFrame:
    """binary payload -> fixed-size feature row via mapInPandas.

    Fake backend: byte-level statistics (length, entropy, 16-bin byte
    histogram normalized to sum 1) — real computation over the real
    bytes, deterministic everywhere. Real backend would decode pixels /
    samples first and histogram those instead.
    """
    if decode_backend == "real":
        _require_real_backend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                buf = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
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
                    (int(media_id), kind, n, round(entropy, 6), hist_norm.tolist())
                )
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "kind", "n_bytes", "byte_entropy", "byte_hist"],
            )

    return media.select("media_id", "kind", "payload").mapInPandas(op, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_backend: str = "fake"
) -> DataFrame:
    """Resize plumbing: filters to images, emits (media_id, out dims,
    payload). Fake backend passes bytes through (bookkeeping only);
    real backend would decode-resize-reencode per Arrow batch."""
    if decode_backend == "real":
        _require_real_backend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": np.int32(width),
                    "out_height": np.int32(height),
                    "payload": pdf["payload"],
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
    """Frame sampling plumbing: for each video payload emit n_frames rows
    (media_id, frame_index, deterministic byte offset, frame bytes).
    Fake backend slices the payload at evenly spaced offsets; a real
    backend would seek keyframes via av/ffmpeg per batch."""
    if decode_backend == "real":
        _require_real_backend()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = payload or b""
                n = len(data)
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

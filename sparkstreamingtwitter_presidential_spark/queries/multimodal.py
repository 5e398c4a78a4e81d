"""Multimodal queries (rows-only: payloads are binary, and byte-level
feature math lives in numpy — no portable SQL twin; tests pin
determinism and schemas instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtwitter_presidential_spark.operators import multimodal as M
from sparkstreamingtwitter_presidential_spark.queries.registry import query


@query(
    "multimodal_byte_features",
    oracle=None,
    doc=(
        "REAL decode path: BMP/PPM/WAV payloads (pure-numpy codecs) -> "
        "decoded-content entropy/16-bin histogram via mapInPandas"
    ),
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(M.make_real_media(spark, sf_dir), decode_backend="real")


@query(
    "multimodal_frame_samples",
    oracle=None,
    doc=(
        "REAL decode path: BMP-stream video payloads -> 4 complete, "
        "individually-decodable BMP frames per item"
    ),
)
def multimodal_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(M.make_real_media(spark, sf_dir), n_frames=4, decode_backend="real")

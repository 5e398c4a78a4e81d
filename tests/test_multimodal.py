"""Multimodal plumbing tests: schema/batch shape of the mapInPandas
operators, determinism of the fake decodes, and the real-backend stub
raising cleanly without codec libs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkstreamingtwitter_presidential_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return M.make_synthetic_media(spark, SF_DIR).cache()


def test_feature_extraction_shape_and_determinism(spark, media):
    f1 = M.extract_features(media)
    rows = f1.collect()
    assert f1.columns == ["media_id", "kind", "n_bytes", "byte_entropy", "byte_hist"]
    assert len(rows) == media.count()
    r = rows[0]
    assert len(r.byte_hist) == M.N_HIST_BINS
    assert math.isclose(sum(r.byte_hist), 1.0, rel_tol=1e-5)
    assert r.n_bytes > 0
    # deterministic across runs
    again = {x.media_id: (x.n_bytes, x.byte_entropy) for x in M.extract_features(media).collect()}
    first = {x.media_id: (x.n_bytes, x.byte_entropy) for x in rows}
    assert again == first


def test_feature_extraction_empty_payload(spark):
    df = spark.createDataFrame(
        [(1, "image", None), (2, "audio", b"")],
        "media_id long, kind string, payload binary",
    )
    got = {r.media_id: r for r in M.extract_features(df).collect()}
    assert got[1].n_bytes == 0 and got[1].byte_entropy == 0.0
    assert got[2].n_bytes == 0
    assert sum(got[1].byte_hist) == 0.0


def test_resize_passthrough_images_only(media):
    out = M.resize_images(media, 224, 224)
    rows = out.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(r.out_width == 224 and r.out_height == 224 for r in rows)


def test_frame_sampling_offsets(media):
    out = M.sample_frames(media, n_frames=4)
    rows = out.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) == 4 * n_videos
    one = sorted(
        (r for r in rows if r.media_id == rows[0].media_id),
        key=lambda r: r.frame_index,
    )
    offs = [r.frame_offset for r in one]
    assert offs == sorted(offs) and offs[0] == 0
    assert all(len(r.frame) <= 16 for r in one)


def test_real_backend_stub_raises(media):
    with pytest.raises(NotImplementedError, match="decode"):
        M.extract_features(media, decode_backend="real")

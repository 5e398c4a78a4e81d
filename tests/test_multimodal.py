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


def test_real_backend_unknown_format_raises(spark):
    """Compressed/unknown magics still route to the PIL probe, which
    raises in this container (the error surfaces from the executor)."""
    df = spark.createDataFrame(
        [(1, "image", b"\xff\xd8\xff\xe0 not actually decodable")],
        "media_id long, kind string, payload binary",
    )
    with pytest.raises(Exception, match="Pillow"):
        M.extract_features(df, decode_backend="real").collect()


# ----------------------------------------------------- real codecs/backend


def _bmp_2x2() -> tuple[bytes, list]:
    """A literal 2x2 24bpp BMP and its known RGB pixels."""
    import numpy as np

    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [16, 32, 48]]], dtype=np.uint8
    )
    return C.encode_bmp(px), px.tolist()


def test_codec_roundtrips():
    import numpy as np

    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (C.decode_bmp(C.encode_bmp(rgb)) == rgb).all()
    assert (C.decode_ppm(C.encode_ppm(rgb)) == rgb).all()
    gray = rng.integers(0, 256, size=(4, 7), dtype=np.uint8)
    assert (C.decode_ppm(C.encode_ppm(gray)) == gray).all()
    samples = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    rate, back = C.decode_wav(C.encode_wav(8000, samples))
    assert rate == 8000 and (back == samples).all()
    assert C.sniff_format(C.encode_wav(8000, samples[:, 0])) == "wav"
    # PPM header comments per spec
    ppm = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    assert C.decode_ppm(ppm).shape == (1, 2, 3)


def test_bmp_golden_bytes():
    """Pin the exact on-disk layout: bottom-up BGR rows, 4-byte padding."""
    data, px = _bmp_2x2()
    assert data[:2] == b"BM" and len(data) == 54 + 16  # 2 rows x 8 padded bytes
    # last row of the array is the FIRST stored row, as BGR
    assert data[54 : 54 + 6] == bytes([255, 0, 0, 48, 32, 16])  # (0,0,255),(16,32,48)
    assert data[62 : 62 + 6] == bytes([0, 0, 255, 0, 255, 0])  # (255,0,0),(0,255,0)


def test_real_feature_extraction_golden(spark):
    """Real backend decodes pixels: a 2-pixel-value BMP has a known
    2-bin histogram and exactly 1 bit of entropy."""
    import numpy as np

    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:2] = 0  # bin 0
    px[2:] = 255  # bin 15
    df = spark.createDataFrame(
        [(7, "image", bytearray(C.encode_bmp(px)))],
        "media_id long, kind string, payload binary",
    )
    r = M.extract_features(df, decode_backend="real").collect()[0]
    assert r.n_bytes == len(C.encode_bmp(px))  # payload size, not pixel count
    assert r.byte_entropy == 1.0
    hist = list(r.byte_hist)
    assert hist[0] == 0.5 and hist[15] == 0.5 and sum(hist) == 1.0


def test_real_resize_golden(spark):
    """Nearest-neighbor 2x2 -> 4x4: each source pixel becomes a 2x2
    block; container preserved."""
    import numpy as np

    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    data, px = _bmp_2x2()
    df = spark.createDataFrame(
        [(1, "image", bytearray(data))],
        "media_id long, kind string, payload binary",
    )
    out = M.resize_images(df, 4, 4, decode_backend="real").collect()[0]
    assert (out.out_width, out.out_height) == (4, 4)
    got = C.decode_bmp(bytes(out.payload))
    want = np.kron(np.array(px, dtype=np.uint8), np.ones((2, 2, 1), dtype=np.uint8))
    assert got.shape == (4, 4, 3) and (got == want).all()


def test_real_frame_sampling_decodable(spark):
    """Real sampler returns complete BMP frames at the right offsets,
    each independently decodable to the planted frame pixels."""
    import numpy as np

    from sparkstreamingtwitter_presidential_spark.operators import codecs as C

    frames = [np.full((2, 2, 3), v, dtype=np.uint8) for v in (10, 20, 30, 40, 50, 60)]
    blobs = [C.encode_bmp(f) for f in frames]
    stream = b"".join(blobs)
    df = spark.createDataFrame(
        [(9, "video", bytearray(stream))],
        "media_id long, kind string, payload binary",
    )
    rows = sorted(
        M.sample_frames(df, n_frames=3, decode_backend="real").collect(),
        key=lambda r: r.frame_index,
    )
    assert [r.frame_offset for r in rows] == [0, 2 * len(blobs[0]), 4 * len(blobs[0])]
    for r, want in zip(rows, (10, 30, 50)):
        assert (C.decode_bmp(bytes(r.frame)) == want).all()


def test_real_media_queries_end_to_end(spark):
    """The registered real-decode queries run over the fixture-derived
    real media table with stable schemas and per-kind coverage."""
    media = M.make_real_media(spark, SF_DIR).cache()
    feats = M.extract_features(media, decode_backend="real")
    by_kind = {r.kind: r for r in feats.collect()}
    assert set(by_kind) == {"image", "audio", "video"}
    n_videos = media.filter(F.col("kind") == "video").count()
    frames = M.sample_frames(media, n_frames=4, decode_backend="real")
    assert frames.count() == 4 * n_videos
    media.unpersist()

"""Multimodal operator tests: codec roundtrips, nearest-neighbor resize
math, explode-shaped frame sampling, PCM features, and the explicit
real-decoder gap."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from projectone_spark.functions.multimodal import (
    IMAGE_MAGIC,
    _parse_image,
    audio_features,
    decode_image_metadata,
    decode_with_real_library,
    encode_fake_audio,
    encode_fake_image,
    encode_fake_video,
    image_pixel_stats,
    resize_images,
    sample_video_frames,
    synthesize_images,
)


def test_image_roundtrip():
    buf = encode_fake_image(4, 2, 3, fill=7)
    w, h, c, raster = _parse_image(buf)
    assert (w, h, c) == (4, 2, 3)
    assert raster.shape == (2, 4, 3) and (raster == 7).all()


def test_real_decoder_is_explicit_gap():
    with pytest.raises(NotImplementedError):
        decode_with_real_library(b"anything")


def test_decode_metadata_mapinpandas(spark):
    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    imgs = synthesize_images(df, width_expr="CAST(10 AS INT)",
                             height_expr="CAST(4 AS INT)",
                             fill_expr="CAST(doc_id AS INT)")
    got = {r["doc_id"]: (r["width"], r["height"], r["channels"], r["n_bytes"])
           for r in decode_image_metadata(imgs).collect()}
    assert got == {1: (10, 4, 3, 13 + 120), 2: (10, 4, 3, 13 + 120)}


def test_resize_nearest_neighbor_picks_correct_pixels(spark):
    # 2x2 single-channel raster with distinct values: resize to 1x1 must
    # keep pixel (0,0); to 4x4 must replicate each pixel into a 2x2 block
    raster = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    buf = IMAGE_MAGIC + struct.pack("<IIB", 2, 2, 1) + raster.tobytes()
    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, media binary")

    small = resize_images(df, 1, 1).collect()[0]["media"]
    _, _, _, r1 = _parse_image(bytes(small))
    assert r1.reshape(-1).tolist() == [1]

    big = resize_images(df, 4, 4).collect()[0]["media"]
    _, _, _, r4 = _parse_image(bytes(big))
    assert r4[:, :, 0].tolist() == [[1, 1, 2, 2], [1, 1, 2, 2],
                                    [3, 3, 4, 4], [3, 3, 4, 4]]


def test_video_frame_sampling_counts(spark):
    df = spark.createDataFrame(
        [(1, bytearray(encode_fake_video(7, 4, fill=9)))],
        "doc_id long, media binary")
    rows = sample_video_frames(df, every_n=3).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 3, 6]
    assert all(len(r["frame"]) == 4 for r in rows)


def test_audio_rms_nonconstant(spark):
    # hand-built PCM with values [3, 4] → rms = sqrt((9+16)/2)
    pcm = np.array([3, 4], dtype=np.int16)
    buf = b"FAUD" + struct.pack("<II", 8000, 2) + pcm.tobytes()
    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, media binary")
    r = audio_features(df).collect()[0]
    assert r["sample_rate"] == 8000
    assert abs(r["rms"] - np.sqrt(12.5)) < 1e-12
    assert abs(r["duration_ms"] - 0.25) < 1e-12


def test_image_dhash_invariances(spark):
    """Identical rasters hash identically; different textures diverge;
    the hash tolerates tiny brightness shifts (difference hash compares
    neighbors, not absolute values)."""
    from projectone_spark.functions.multimodal import (
        encode_fake_image, image_dhash,
    )

    rows = [
        (1, encode_fake_image(16, 12, 3, fill=10, texture=3)),
        (2, encode_fake_image(16, 12, 3, fill=10, texture=3)),   # identical
        (3, encode_fake_image(16, 12, 3, fill=11, texture=3)),   # brightness+1
        (4, encode_fake_image(16, 12, 3, fill=10, texture=7)),   # new texture
    ]
    df = spark.createDataFrame(rows, "id long, media binary")
    got = {r["id"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got[1] == got[2]
    assert got[1] == got[3]  # global brightness shift: same neighbor order
    assert got[1] != got[4]


def test_m05_groups_are_consistent(spark):
    from projectone_spark.queries import queries

    df = queries()["m05_image_phash_dedup"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert sum(r["n_images"] for r in rows) == 500  # every doc grouped once
    assert all(r["n_images"] >= 1 for r in rows)
    # round 6: groups are exactly the (w, h) classes — 4 widths x 3
    # heights — because fill (brightness) and texture (contrast) are
    # dhash-invariant by construction; the query asserts this in-query
    assert len(rows) == 12
    assert {(r["w"], r["h"]) for r in rows} == {
        (16 + a, 8 + b) for a in range(4) for b in range(3)}

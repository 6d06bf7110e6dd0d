"""Multimodal pipeline queries over the ``documents`` table.

Each query synthesizes deterministic media payloads (sizes derived
arithmetically from ``doc_id``/``n_chars``), pushes them through the real
mapInPandas decode/feature/sample operators, and emits values the DuckDB
oracle can recompute in closed form — so the binary plumbing (schema,
Arrow batches, explode shapes) is what the correctness gate actually
exercises.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.multimodal import (
    audio_features,
    decode_image_metadata,
    image_pixel_stats,
    resize_images,
    sample_video_frames,
    synthesize_images,
)
from projectone_spark.functions.text import spread
from projectone_spark.queries import load, register

# deterministic payload dimensions (mirrored in every oracle)
_W = "CAST(16 + doc_id % 17 AS INT)"
_H = "CAST(8 + doc_id % 11 AS INT)"
_FILL = "CAST(doc_id % 256 AS INT)"


def _with_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return synthesize_images(spread(docs), width_expr=_W, height_expr=_H,
                             fill_expr=_FILL)


_M01_SQL = """
SELECT doc_id,
       CAST(16 + doc_id % 17 AS INT) AS width,
       CAST(8 + doc_id % 11 AS INT) AS height,
       3 AS channels,
       CAST(13 + (16 + doc_id % 17) * (8 + doc_id % 11) * 3 AS BIGINT) AS n_bytes
FROM documents
"""


@register("m01_image_decode_metadata", _M01_SQL,
          doc="binary image column → typed metadata via mapInPandas decode",
          tags=("multimodal", "mapinpandas"))
def m01_image_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_image_metadata(_with_images(spark, sf_dir), keep=["doc_id"])


_M02_SQL = """
SELECT doc_id,
       CAST(doc_id % 256 AS DOUBLE) AS mean_pixel,
       CAST(doc_id % 256 AS INT) AS max_pixel
FROM documents
"""


@register("m02_image_pixel_stats", _M02_SQL,
          doc="raster feature extraction (mean/max pixel) after resize, "
              "vectorized numpy inside Arrow batches",
          tags=("multimodal", "mapinpandas"))
def m02_image_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = resize_images(_with_images(spark, sf_dir), 8, 8)
    return image_pixel_stats(imgs, keep=["doc_id"])


_M03_SQL = """
SELECT doc_id, CAST(unnest(range(0, CAST(1 + n_chars % 24 AS INT), 5)) AS INT) AS frame_idx
FROM documents
"""


@register("m03_video_frame_sample", _M03_SQL,
          doc="video frame sampling: every 5th frame, one row per kept frame",
          tags=("multimodal", "mapinpandas"))
def m03_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    from projectone_spark.functions.multimodal import encode_fake_video

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["media"] = [encode_fake_video(int(1 + n % 24), 16, int(d))
                            for d, n in zip(pdf["doc_id"], pdf["n_chars"])]
            yield pdf[["doc_id", "media"]]

    vids = spread(docs).mapInPandas(gen, "doc_id bigint, media binary")
    out = sample_video_frames(vids, every_n=5, keep=["doc_id"])
    return out.select("doc_id", "frame_idx")


_M04_SQL = """
SELECT doc_id,
       CAST(8000 + (doc_id % 3) * 8000 AS INT) AS sample_rate,
       1000.0 * (n_chars * 4) / (8000 + (doc_id % 3) * 8000) AS duration_ms,
       CAST(doc_id % 100 AS DOUBLE) AS rms
FROM documents
"""


@register("m04_audio_features", _M04_SQL,
          doc="PCM audio feature extraction: sample rate, duration, RMS",
          tags=("multimodal", "mapinpandas"))
def m04_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")

    from projectone_spark.functions.multimodal import encode_fake_audio

    def gen(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media"] = [
                encode_fake_audio(int(8000 + (d % 3) * 8000), int(n * 4),
                                  int(d % 100))
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])]
            yield pdf[["doc_id", "media"]]

    clips = spread(docs).mapInPandas(gen, "doc_id bigint, media binary")
    return audio_features(clips, keep=["doc_id"])


# m05_image_phash_dedup lives in multimodal2.py: it has no SQL oracle by
# design, and the registry contract (queries/__init__.py) keeps no-oracle
# entries out of the driver's 50-slot adjudication prefix.

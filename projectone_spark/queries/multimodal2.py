"""No-oracle multimodal queries — registered at the registry TAIL.

m05 has no DuckDB oracle by design (difference-hash raster math is not
SQL-reproducible); per the registry contract (queries/__init__.py) such
entries must never occupy one of the driver's 50 oracle-adjudicated prefix
slots, so this module is imported last alongside the other no-oracle
entries (a01/a02, e04/e05).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.text import spread
from projectone_spark.queries import load, register


@register("m05_image_phash_dedup", None,
          doc="perceptual-hash image dedup: textured synthetic rasters → "
              "difference-hash (grayscale 9x8 downsample, adjacent-column "
              "comparisons) → exact groupBy on the hash = near-dup image "
              "groups with a kept representative; the image-side analogue "
              "of d01 (no SQL oracle: raster math; invariances asserted in "
              "tests/test_multimodal.py)",
          tags=("multimodal", "dedup", "mapinpandas", "llm"))
def m05_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.multimodal import (
        image_dhash, synthesize_images,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    imgs = synthesize_images(
        spread(docs), width_expr="CAST(16 + doc_id % 4 AS INT)",
        height_expr="CAST(8 + doc_id % 3 AS INT)",
        fill_expr="CAST(doc_id % 16 AS INT)",
        texture_expr="CAST(1 + doc_id % 5 AS INT)")
    hashed = image_dhash(imgs, keep=["doc_id"])
    return (hashed.groupBy("dhash")
            .agg(F.min("doc_id").alias("kept_doc"),
                 F.count(F.lit(1)).alias("n_images"))
            .orderBy("dhash"))

"""Perceptual-hash dedup under an exact closed-form oracle.

Round 6 converted m05 from a no-oracle tail entry into a fully adjudicated
query: the synthetic rasters are constructed so the difference-hash's OWN
invariances (brightness shift, contrast scale) make the expected group
structure computable in SQL — fill is a non-wrapping constant offset and
texture a positive amplitude, both of which cancel in dhash's adjacent-
column brightness comparisons, so images group exactly by their (width,
height) class. The query ASSERTS both halves of that contract in-query
(fill/texture invariance within each class, injectivity across classes)
and returns the class roll-up the DuckDB oracle recomputes closed-form.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.text import spread
from projectone_spark.queries import check, load, register

_M05_SQL = """
SELECT CAST(16 + doc_id % 4 AS BIGINT) AS w,
       CAST(8 + doc_id % 3 AS BIGINT) AS h,
       CAST(min(doc_id) AS BIGINT) AS kept_doc,
       CAST(count(*) AS BIGINT) AS n_images
FROM documents
GROUP BY 1, 2
"""


@register("m05_image_phash_dedup", _M05_SQL,
          doc="perceptual-hash image dedup under an EXACT oracle: "
              "synthetic rasters vary brightness (fill, non-wrapping "
              "constant shift) and contrast (texture amplitude) per "
              "document — transformations difference-hash is invariant "
              "to BY CONSTRUCTION — so the dhash groups must equal the "
              "(width, height) classes exactly; the query asserts "
              "fill/texture invariance within each class and injectivity "
              "across classes, then returns the class roll-up the oracle "
              "recomputes closed-form (the image-side analogue of d01)",
          tags=("multimodal", "dedup", "mapinpandas", "llm"))
def m05_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.multimodal import (
        image_dhash, synthesize_images,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    # fill < 64 and texture <= 2 keep pixel values <= 2*96 + 63 = 255:
    # no mod-256 wrap, so fill is a pure brightness shift and texture a
    # pure contrast scale — both cancel in dhash's ordered comparisons
    imgs = synthesize_images(
        spread(docs), width_expr="CAST(16 + doc_id % 4 AS INT)",
        height_expr="CAST(8 + doc_id % 3 AS INT)",
        fill_expr="CAST(doc_id % 64 AS INT)",
        texture_expr="CAST(1 + doc_id % 2 AS INT)")
    hashed = image_dhash(imgs, keep=["doc_id"]).select(
        "doc_id", "dhash",
        (16 + F.col("doc_id") % 4).cast("bigint").alias("w"),
        (8 + F.col("doc_id") % 3).cast("bigint").alias("h"))

    # adjudicate the perceptual contract (bounded: <=12 classes):
    # 1. invariance — every (w, h) class produced exactly ONE dhash even
    #    though fill spans 64 values and texture 2 amplitudes;
    # 2. injectivity — distinct (w, h) classes never share a dhash.
    per_class = (hashed.groupBy("w", "h")
                 .agg(F.countDistinct("dhash").alias("n_hashes"))
                 .collect())
    check(per_class and all(r["n_hashes"] == 1 for r in per_class),
          f"dhash not brightness/contrast-invariant: {per_class}")
    agg = hashed.agg(
        F.countDistinct("dhash").alias("nd"),
        F.countDistinct("w", "h").alias("nc")).collect()[0]
    check(agg["nd"] == agg["nc"],
          f"dhash collides across (w,h) classes: {agg}")

    # the user-facing roll-up: group on the HASH (the operator under
    # test), then name each group by its class for the oracle compare
    return (hashed.groupBy("dhash")
            .agg(F.min("w").alias("w"), F.min("h").alias("h"),
                 F.min("doc_id").alias("kept_doc"),
                 F.count(F.lit(1)).alias("n_images"))
            .select("w", "h", "kept_doc", "n_images"))

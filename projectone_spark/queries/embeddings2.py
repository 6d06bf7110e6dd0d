"""Embedding analytics added in round 4 (registry tail): nearest-centroid
classification as an oracle-checked confusion matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register
from projectone_spark.queries._embed_sql import _E_DBL, _dot, _norm

_E07_SQL = f"""
WITH v AS (SELECT vec_id, label, {_E_DBL} AS e FROM embeddings),
comp AS (
  SELECT label, i, avg(e[i]) AS m
  FROM v, unnest(range(1, len(e) + 1)) AS u(i)
  GROUP BY label, i),
cent AS (
  SELECT label AS clabel, list(m ORDER BY i) AS ce FROM comp GROUP BY label),
scored AS (
  SELECT v.vec_id, v.label, cent.clabel,
         {_dot('v.e', 'cent.ce')} / ({_norm('v.e')} * {_norm('cent.ce')})
           AS cos
  FROM v CROSS JOIN cent),
top AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, clabel) AS rk
  FROM scored)
SELECT label, clabel AS assigned_label, count(*) AS n_vectors
FROM top WHERE rk = 1
GROUP BY label, clabel
"""


@register("e07_centroid_classify", _E07_SQL,
          doc="nearest-label-centroid classification confusion matrix: "
              "elementwise-mean centroids (float32-exact double sums, "
              "order-independent), broadcast onto the corpus, highest "
              "cosine wins; counts only — cross-row means of full-"
              "mantissa doubles would not be order-stable",
          tags=("embeddings", "classify", "llm"))
def e07_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import centroid_classify

    emb = load(spark, sf_dir, "embeddings")
    return centroid_classify(emb)

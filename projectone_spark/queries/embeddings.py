"""Embedding similarity-search queries over `embeddings` (array<float>),
with DuckDB oracles computing the identical double-precision sequential
dot products and deterministic sign-LSH hyperplanes."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.embeddings import (
    knn_bruteforce,
    knn_lsh,
    lsh_bucket_stats,
)
from projectone_spark.queries import load, register
from projectone_spark.queries._embed_sql import (  # noqa: F401  (re-export)
    _E_DBL,
    _W_MULT,
    _bucket_sql,
    _dot,
    _norm,
)


_E01_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_dot('q.qe', 'v.e')} / ({_norm('q.qe')} * {_norm('v.e')}), 6) AS score
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
"""


@register("e01_knn_bruteforce", _E01_SQL,
          doc="exact cosine top-5 neighbors for every 50th vector (broadcast probe)",
          tags=("embeddings", "knn"))
def e01_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_bruteforce(emb, queries, k=5)
            .select("query_id", "neighbor_id", "score", "rank"))


_E02_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings)
SELECT {_bucket_sql('e')} AS bucket, count(*) AS n_vectors
FROM v
GROUP BY 1
"""


@register("e02_lsh_bucket_stats", _E02_SQL,
          doc="sign-LSH bucket histogram (the ANN index partition map)",
          tags=("embeddings", "lsh"))
def e02_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bucket_stats(load(spark, sf_dir, "embeddings"))


_E03_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
b AS (SELECT vec_id, e, {_bucket_sql('e')} AS bucket FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, bucket FROM b WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         round({_dot('q.qe', 'b.e')} / ({_norm('q.qe')} * {_norm('b.e')}), 6) AS score
  FROM b JOIN q USING (bucket)
  WHERE b.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
"""


@register("e03_knn_lsh", _E03_SQL,
          doc="approximate top-5: candidates restricted to the query's LSH bucket",
          tags=("embeddings", "knn", "lsh"))
def e03_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_lsh(emb, queries, k=5)
            .select("query_id", "neighbor_id", "score", "rank"))


@register("e04_knn_ivf", None, bench=True,
          doc="IVF approximate nearest neighbor: driver-trained spherical "
              "k-means coarse quantizer (deterministic sample), corpus "
              "binned to nearest centroid, queries probe 3 of 8 cells — "
              "the index shape that scales ANN past brute force (no SQL "
              "oracle: k-means is iterative; recall floor asserted in "
              "tests/test_embeddings_ivf.py)",
          tags=("embeddings", "knn", "ann"))
def e04_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import knn_ivf

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_ivf(emb, queries, k=5, n_clusters=8, nprobe=3)
            .select("query_id", "neighbor_id", "score", "rank"))


@register("e05_knn_pq", None, bench=True,
          doc="product-quantization ANN: per-subspace driver-trained "
              "codebooks compress each vector to m nibble codes (64x "
              "smaller index), queries score via m ADC table lookups, and "
              "the shortlist re-ranks with the exact cosine — the storage-"
              "bound ANN shape for corpora whose raw vectors don't fit "
              "(no SQL oracle: k-means is iterative; recall floor asserted "
              "in tests/test_embeddings_ivf.py)",
          tags=("embeddings", "knn", "ann", "pq"))
def e05_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import knn_pq

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_pq(emb, queries, k=5, m=8, n_codes=16)
            .select("query_id", "neighbor_id", "score", "rank"))

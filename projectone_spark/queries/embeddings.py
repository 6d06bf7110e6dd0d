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


_E04_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n_queries,
       CAST(5 AS BIGINT) AS k,
       TRUE AS recall_ok
FROM embeddings WHERE vec_id % 50 = 0
"""


@register("e04_knn_ivf", _E04_SQL, bench=True,
          doc="IVF approximate nearest neighbor in its PRODUCTION shape "
              "(queries probe 3 of 8 cells), adjudicated by an in-query "
              "recall gate: the nprobe search's top-5 sets are compared "
              "against exact brute-force KNN and recall@5 must clear 0.5 "
              "(deterministic: seeded driver k-means sample), with the "
              "query-domain summary oracle-checked; the full machinery is "
              "separately bit-exact-adjudicated at nprobe=n_clusters (e08)",
          tags=("embeddings", "knn", "ann"))
def e04_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import knn_bruteforce, knn_ivf
    from projectone_spark.queries import check

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    ann = (knn_ivf(emb, queries, k=5, n_clusters=8, nprobe=3)
           .select("query_id", "neighbor_id"))
    exact = (knn_bruteforce(emb, queries, k=5)
             .select("query_id", "neighbor_id"))
    exact = exact.localCheckpoint()  # referenced twice: hit join + total
    hit = exact.join(ann, ["query_id", "neighbor_id"], "semi").count()
    tot = exact.count()
    check(tot > 0 and hit / tot >= 0.5,
          f"IVF nprobe=3/8 recall@5 {hit}/{tot} below 0.5 floor")
    return (queries.agg(F.count(F.lit(1)).alias("n_queries"))
            .select("n_queries", F.lit(5).cast("bigint").alias("k"),
                    F.lit(True).alias("recall_ok")))


_E05_SQL = _E04_SQL  # same query domain; the gate differs


@register("e05_knn_pq", _E05_SQL, bench=True,
          doc="product-quantization ANN in its PRODUCTION shape (m=8 "
              "nibble codes, corpus-fraction shortlist: ~2% of the "
              "corpus re-ranked exactly, the sizing that keeps recall "
              "stable as the corpus grows), adjudicated by an in-query "
              "recall gate vs exact brute-force KNN (recall@5 >= 0.6 "
              "with ~0.8 measured, deterministic seeded codebooks) and "
              "the query-domain summary oracle-checked; the search "
              "scaffold is separately bit-exact-adjudicated with a "
              "full-corpus shortlist (e09)",
          tags=("embeddings", "knn", "ann", "pq"))
def e05_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import knn_bruteforce, knn_pq
    from projectone_spark.queries import check

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # corpus-fraction shortlist (ceil(n/50) ~ 2% re-ranked, floor 8): a
    # FIXED shortlist
    # loses recall as the corpus grows (0.72 at n=500 -> 0.48 at n=2000
    # for shortlist=8); the 2% fraction holds ~0.8 at every measured
    # scale (0.800 at n=500, 0.795 at n=2000) while the ADC-coded scan
    # still prunes ~98% of exact re-rank work
    n = emb.count()  # bounded driver scalar
    ann = (knn_pq(emb, queries, k=5, m=8, n_codes=16,
                  shortlist=max(8, -(-n // 50)))
           .select("query_id", "neighbor_id"))
    exact = (knn_bruteforce(emb, queries, k=5)
             .select("query_id", "neighbor_id"))
    exact = exact.localCheckpoint()  # referenced twice: hit join + total
    hit = exact.join(ann, ["query_id", "neighbor_id"], "semi").count()
    tot = exact.count()
    check(tot > 0 and hit / tot >= 0.6,
          f"PQ recall@5 {hit}/{tot} below 0.6 floor")
    return (queries.agg(F.count(F.lit(1)).alias("n_queries"))
            .select("n_queries", F.lit(5).cast("bigint").alias("k"),
                    F.lit(True).alias("recall_ok")))

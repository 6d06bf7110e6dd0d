"""Embedding similarity search over ``array<float>`` columns.

Brute-force cosine top-k is the exact baseline (probe set broadcast, corpus
scanned once — the corpus never shuffles). The scale path is sign-LSH
bucketing: 2^H buckets from deterministic hyperplanes, candidate search only
within the probe's bucket — the IVF-style pruning that makes 100 TB ANN
tractable (pre-partition the corpus by bucket and a probe touches one
partition).

Dot products use ``zip_with`` + ``aggregate`` in double precision — pure
Catalyst expressions, sequential summation, reproducible by external
oracles. L2 norms are precomputed per side *before* the join so the
per-pair work is one dot product, not three.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from projectone_spark.functions.text import spread


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double precision (sequential, deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    sq = F.aggregate(a, F.lit(0.0),
                     lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return F.sqrt(sq)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _topk(scored: DataFrame, query_id_col: str, k: int) -> DataFrame:
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def knn_bruteforce(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id",
                   parallelism: int | None = None) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (small by construction); each corpus
    partition computes its pair scores independently and only (query_id,
    neighbor_id, score) rows reach the per-query top-k window.
    """
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    c = c.select(id_col, "__vec", l2_norm(F.col("__vec")).alias("__vn"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    q = q.select(query_id_col, "__qvec", l2_norm(F.col("__qvec")).alias("__qn"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col), F.col(id_col).alias("neighbor_id"),
                      F.round(dot(F.col("__qvec"), F.col("__vec"))
                              / (F.col("__qn") * F.col("__vn")), 6).alias("score")))
    return _topk(scored, query_id_col, k)


def hyperplane_weight(bit: int, dim: Column) -> Column:
    """Deterministic pseudo-random ±1 weight for hyperplane ``bit`` at
    coordinate ``dim`` — pure integer arithmetic so any engine reproduces it."""
    v = (dim * F.lit(2654435761 % 1000003) + F.lit(bit * 40503 + 17)) % F.lit(97)
    return F.when(v < 48, F.lit(1.0)).otherwise(F.lit(-1.0))


def lsh_bucket(vec_col: Column, num_bits: int = 8) -> Column:
    """Sign-LSH bucket id: concat of sign bits of ⟨v, h_b⟩ for deterministic
    hyperplanes h_b."""

    def weighted(bit: int):
        return lambda x, i: x.cast("double") * hyperplane_weight(bit, i)

    bits = []
    for b in range(num_bits):
        idx = F.sequence(F.lit(0), F.size(vec_col) - 1)
        prods = F.zip_with(vec_col, idx, weighted(b))
        total = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(total > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucket_stats(df: DataFrame, vec_col: str = "embedding",
                     num_bits: int = 8,
                     parallelism: int | None = None) -> DataFrame:
    """Bucket histogram — the partition map an IVF/LSH ANN index would use."""
    base = spread(df.select(F.col(vec_col).alias("__vec")), parallelism)
    return (base.select(lsh_bucket(F.col("__vec"), num_bits).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_vectors")))


def knn_lsh(corpus: DataFrame, queries: DataFrame, k: int = 5,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", num_bits: int = 8,
            parallelism: int | None = None) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    c = c.select(id_col, "__vec",
                 l2_norm(F.col("__vec")).alias("__vn"),
                 lsh_bucket(F.col("__vec"), num_bits).alias("__bucket"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    q = q.select(query_id_col, "__qvec",
                 l2_norm(F.col("__qvec")).alias("__qn"),
                 lsh_bucket(F.col("__qvec"), num_bits).alias("__bucket"))
    scored = (c.join(F.broadcast(q), "__bucket")
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col), F.col(id_col).alias("neighbor_id"),
                      F.round(dot(F.col("__qvec"), F.col("__vec"))
                              / (F.col("__qn") * F.col("__vn")), 6).alias("score")))
    return _topk(scored, query_id_col, k)


# -- IVF (centroid-partitioned ANN) ------------------------------------------

def ivf_train(df: DataFrame, n_clusters: int = 16, sample_size: int = 2000,
              iters: int = 5, vec_col: str = "embedding",
              id_col: str = "vec_id") -> list[list[float]]:
    """Driver-side spherical k-means over a deterministic sample — the IVF
    coarse quantizer. The collect is bounded by ``sample_size`` rows (the
    same driver-side cost class as CDC min/max bound resolution); at 100 TB
    the sample is still a few thousand vectors, trained once and reused.

    Deterministic: sample = first ``sample_size`` ids, init = evenly spaced
    sample rows, cosine assignment with argmax ties going to the lowest
    cluster id. Returns unit-norm centroids.
    """
    import numpy as np

    rows = (df.select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col).limit(sample_size).collect())
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
    n_clusters = min(n_clusters, len(X))
    C = X[np.linspace(0, len(X) - 1, n_clusters).astype(int)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(n_clusters):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                norm = np.linalg.norm(c)
                if norm > 1e-12:
                    C[j] = c / norm
    return C.tolist()


def _centroid_dot(vec_col: Column, centroid: list[float]) -> Column:
    return dot(vec_col, F.array(*[F.lit(float(v)) for v in centroid]))


def ivf_probes(vec_col: Column, centroids: list[list[float]],
               nprobe: int = 1) -> Column:
    """``array<int>`` of the ``nprobe`` nearest centroid ids — pure struct
    sort over per-centroid dot products, no UDF. Centroids are unit-norm so
    argmax of the raw dot equals argmax cosine."""
    entries = [F.struct((-_centroid_dot(vec_col, c)).alias("neg"),
                        F.lit(i).alias("idx"))
               for i, c in enumerate(centroids)]
    ranked = F.slice(F.sort_array(F.array(*entries)), 1, nprobe)
    return F.transform(ranked, lambda s: s["idx"])


def knn_ivf(corpus: DataFrame, queries: DataFrame, k: int = 5,
            n_clusters: int = 16, nprobe: int = 2,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", sample_size: int = 2000,
            cell_col: str | None = None,
            parallelism: int | None = None) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``nprobe`` nearest cells and scores exactly
    inside them.

    Scale path: pass ``cell_col`` naming a precomputed cell column (assign
    once at ingest, store partitioned/bucketed by cell) and the search is a
    broadcast join on an int key touching ~nprobe/n_clusters of the data —
    no per-query corpus scan. Without it the assignment (n_clusters dot
    products per row) runs inline, still codegen-only.
    """
    centroids = ivf_train(corpus, n_clusters, sample_size,
                          vec_col=vec_col, id_col=id_col)
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec"),
                             *( [F.col(cell_col).alias("__cell")] if cell_col else [])),
               parallelism)
    if not cell_col:
        c = c.withColumn("__cell", ivf_probes(F.col("__vec"), centroids, 1)[0])
    c = c.select(id_col, "__vec", "__cell", l2_norm(F.col("__vec")).alias("__vn"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    q = (q.select(query_id_col, "__qvec",
                  l2_norm(F.col("__qvec")).alias("__qn"),
                  F.explode(ivf_probes(F.col("__qvec"), centroids, nprobe))
                  .alias("__cell")))
    scored = (c.join(F.broadcast(q), "__cell")
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col), F.col(id_col).alias("neighbor_id"),
                      F.round(dot(F.col("__qvec"), F.col("__vec"))
                              / (F.col("__qn") * F.col("__vn")), 6).alias("score")))
    return _topk(scored, query_id_col, k)

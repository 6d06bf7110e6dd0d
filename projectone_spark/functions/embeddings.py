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

import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from projectone_spark.functions import values_frame
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


def _shortlist_topk(scored: DataFrame, query_id_col: str,
                    order: Sequence[Column], limit: int,
                    salt_mod: int = 64, final: bool = True) -> DataFrame:
    """Exact two-level per-query top-``limit`` over a CORPUS-SIZED
    candidate frame: a pre-pass window over (query, salt-of-neighbor)
    splits each query's candidates across ``salt_mod`` groups, then the
    final per-query window ranks only the ``salt_mod × limit``
    survivors. Top-k under a TOTAL order (every call site ties off by
    neighbor_id) is decomposable — the union of per-salt top-limits
    contains the global top-limit — so the result is row-identical to
    the single window.

    What this buys (probe-measured at 1M vectors): PARALLELISM when
    queries are fewer than cores — a single per-query window
    concentrates all rank work into ``n_queries`` groups (3 queries ×
    1M corpus: 7.0 s single window vs 2.9 s two-level, 2.4×; on a
    1000-core cluster a small probe batch would otherwise idle almost
    every core). What it does NOT buy: the sorter's spill, which is
    proportional to total candidate bytes per task, not to group
    count — at 50 queries × 1M rows the ~2.5 GB candidate set spills
    gracefully under local[32]'s per-task memory either way (wall time
    ×1.8 at ×10 data; production tunes rows/task via partition count).
    Keep the single window only for frames already bounded by a
    shortlist. ``final=False`` skips the closing per-query window and
    returns the (superset) union of per-salt top-limits — for callers
    that immediately re-rank with :func:`_topk` anyway."""
    w1 = Window.partitionBy(query_id_col, "__salt").orderBy(*order)
    pruned = (scored
              .withColumn("__salt", F.pmod(F.xxhash64("neighbor_id"),
                                           F.lit(salt_mod)))
              .withColumn("__r1", F.row_number().over(w1))
              .filter(F.col("__r1") <= limit))
    if not final:
        return pruned.drop("__salt", "__r1")
    w2 = Window.partitionBy(query_id_col).orderBy(*order)
    return (pruned
            .withColumn("__r2", F.row_number().over(w2))
            .filter(F.col("__r2") <= limit)
            .drop("__salt", "__r1", "__r2"))


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
    # two-level: the candidate frame is corpus-(fraction-)sized, so the
    # per-query top-k must not funnel it into n_queries window partitions
    # (prune-only pre-pass; _topk does the final exact rank)
    return _topk(_shortlist_topk(scored, query_id_col,
                                 [F.desc("score"), F.asc("neighbor_id")], k,
                                 final=False),
                 query_id_col, k)


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
    # two-level: the candidate frame is corpus-(fraction-)sized, so the
    # per-query top-k must not funnel it into n_queries window partitions
    # (prune-only pre-pass; _topk does the final exact rank)
    return _topk(_shortlist_topk(scored, query_id_col,
                                 [F.desc("score"), F.asc("neighbor_id")], k,
                                 final=False),
                 query_id_col, k)


def knn_matryoshka(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   prefix_dims: int = 16, shortlist: int = 25,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id",
                   parallelism: int | None = None) -> DataFrame:
    """Two-stage KNN over Matryoshka-style nested embeddings (Kusupati
    et al. 2022, "Matryoshka Representation Learning" — MRL trains
    representations whose PREFIX coordinates are themselves usable
    embeddings): stage 1 ranks every candidate by cosine over only the
    first ``prefix_dims`` coordinates and keeps a per-query
    ``shortlist``; stage 2 re-ranks that shortlist with full-dimension
    cosine and returns the top ``k``. The funnel-retrieval shape of the
    paper — candidate generation pays ``prefix_dims/d`` of the FLOPs
    (4× cheaper at 16/64) and full vectors are touched for only
    ``shortlist`` rows per query.

    Scale shape: the corpus scan needs only the prefix slice for stage 1
    (with embeddings stored dimension-sharded, that is a column-pruned
    read of a quarter of the bytes); queries broadcast, so stage 1 is
    embarrassingly parallel with no corpus shuffle. The shortlist window
    shuffles only (query_id, neighbor_id, pscore) TRIPLES — full-
    dimension vectors never ride the candidate shuffle; the surviving
    ``n_queries × shortlist`` ids broadcast back onto the corpus (and
    the query table) to fetch vectors for the stage-2 rerank.

    Both stages rank on the 6-dp-rounded score with neighbor-id
    tie-break — the same total order in any engine, so results are
    exact-oracle-checkable end to end (unlike IVF/PQ, whose training
    state needs the e08/e09 full-probe adjudication trick).

    Returns (query_id, neighbor_id, pscore, score, rank) for the top-k.
    """
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    c = c.select(id_col, "__vec",
                 F.slice("__vec", 1, prefix_dims).alias("__pvec"))
    c = c.select(id_col, "__vec", "__pvec",
                 l2_norm(F.col("__vec")).alias("__vn"),
                 l2_norm(F.col("__pvec")).alias("__pn"))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    q = q.select(query_id_col, "__qvec",
                 F.slice("__qvec", 1, prefix_dims).alias("__qp"))
    q = q.select(query_id_col, "__qvec", "__qp",
                 l2_norm(F.col("__qvec")).alias("__qn"),
                 l2_norm(F.col("__qp")).alias("__qpn"))
    # the candidate shuffle carries only id/id/score triples — never the
    # full vectors, which would multiply the exchange bytes by the
    # vector width for candidates that stage 1 is about to discard
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col), F.col(id_col).alias("neighbor_id"),
                      F.round(dot(F.col("__qp"), F.col("__pvec"))
                              / (F.col("__qpn") * F.col("__pn")), 6)
                      .alias("pscore")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.desc("pscore"), F.asc("neighbor_id")],
                            shortlist) \
        .select(query_id_col, "neighbor_id", "pscore")
    rr = _funnel_rerank(c.select(id_col, "__vec", "__vn"),
                        q.select(query_id_col, "__qvec", "__qn"),
                        short, "pscore", id_col, query_id_col)
    return _topk(rr, query_id_col, k)


def _funnel_rerank(c: DataFrame, q: DataFrame, short: DataFrame,
                   carried_col: str, id_col: str,
                   query_id_col: str) -> DataFrame:
    """Stage 2 of a funnel retrieval: exact full-dimension cosine over a
    per-query shortlist. ``short`` is n_queries × shortlist (query_id,
    neighbor_id, carried_col) rows — broadcast it onto the corpus to
    fetch full vectors for exactly the surviving candidates, then
    broadcast the queries on. ``c`` must carry (id_col, __vec, __vn),
    ``q`` (query_id_col, __qvec, __qn); the 6-dp rounding and the
    neighbor-id tie-break (applied by the caller's :func:`_topk`) are
    the shared contract that keeps every funnel bit-exact-oracle-
    checkable."""
    return (c.select(F.col(id_col).alias("neighbor_id"), "__vec", "__vn")
            .join(F.broadcast(short), "neighbor_id")
            .join(F.broadcast(q), query_id_col)
            .select(query_id_col, "neighbor_id", carried_col,
                    F.round(dot(F.col("__qvec"), F.col("__vec"))
                            / (F.col("__qn") * F.col("__vn")), 6)
                    .alias("score")))


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


def _lit_double_array(vals: Sequence[float]) -> Column:
    """``array<double>`` literal built from ONE parsed SQL expression
    instead of ``len(vals) + 1`` py4j round trips (r12 guide-§1.2
    finding: at dims=64 the per-literal path costs ~50 ms of pure
    driver/py4j latency per centroid, re-paid on every index build,
    micro-batch and search that embeds centroids). The Catalyst tree —
    CreateArray over double Literals — is identical either way:
    ``repr()`` of a finite double round-trips bit-exactly through the
    SQL parser (verified for denormals, signed zero and exponent
    forms). Non-finite values have no SQL literal form, so they fall
    back to the per-literal path."""
    fv = [float(v) for v in vals]
    if fv and all(math.isfinite(v) for v in fv):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in fv) + ")")
    return F.array(*[F.lit(v) for v in fv])


def _centroid_dot(vec_col: Column, centroid: list[float]) -> Column:
    return dot(vec_col, _lit_double_array(centroid))


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
            parallelism: int | None = None,
            centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``nprobe`` nearest cells and scores exactly
    inside them.

    Scale path: pass ``cell_col`` naming a precomputed cell column (assign
    once at ingest, store partitioned/bucketed by cell) and the search is a
    broadcast join on an int key touching ~nprobe/n_clusters of the data —
    no per-query corpus scan. Without it the assignment (n_clusters dot
    products per row) runs inline, still codegen-only.

    ``centroids`` swaps in a PERSISTED coarse quantizer (the
    ``ivf_centroids`` model kind, via ``store.models.load_model`` +
    ``centroids_from_model``) instead of training in-query — the
    production lifecycle: the quantizer trains once, the search task's
    plan carries zero training work (``ivf_train``'s sample collect
    never runs). ``n_clusters``/``sample_size`` are ignored when given.
    """
    if centroids is None:
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
    # two-level: the candidate frame is corpus-(fraction-)sized, so the
    # per-query top-k must not funnel it into n_queries window partitions
    # (prune-only pre-pass; _topk does the final exact rank)
    return _topk(_shortlist_topk(scored, query_id_col,
                                 [F.desc("score"), F.asc("neighbor_id")], k,
                                 final=False),
                 query_id_col, k)


def _folded_norm(comps: list[float]) -> float:
    """Driver-side |c| with the EXACT sequential fold order the DuckDB
    oracle's ``_norm`` fragment and Spark's ``l2_norm`` use — both
    assignment paths (literal codegen and broadcast-join) must divide by
    bit-identical norms, so this fold exists exactly once."""
    sq = 0.0
    for x in comps:
        sq += x * x
    return math.sqrt(sq)


def seed_centroids(df: DataFrame, k: int = 8, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """The ``k`` lowest-id vectors as coarse-quantizer centroids — the
    fully deterministic, SQL-replicable seeding an *adjudicable* index
    build needs (a trained quantizer is better-balanced but its centroids
    are not derivable by an external oracle; swap in ``ivf_train`` for
    production and keep this for verification). Driver collect is bounded
    by ``k`` rows, the same cost class as ``ivf_train``'s sample.

    Returns ``[(cell_id, components), ...]`` with ``cell_id`` = the
    centroid row's own id, ordered by id.
    """
    rows = (df.select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col).limit(k).collect())
    return [(r[0], [float(x) for x in r[1]]) for r in rows]


def _finite_centroids(centroids: list[tuple[int, list[float]]]) -> bool:
    return all(math.isfinite(float(v)) for _, comps in centroids
               for v in comps)


def assign_cell(vec_col: Column | str,
                centroids: list[tuple[int, list[float]]]) -> Column:
    """Cell id of the nearest centroid by cosine — one struct-sort over
    per-centroid scores, pure codegen, no shuffle and no per-row join
    (the scale shape: at ingest this runs inside the scan stage, so an
    incremental index refresh touches only the delta's rows).

    The ranking score is ``dot(v, c) / |c|`` — ``|v|`` is constant across
    centroids and drops out of the argmax, and the remaining ops (zip-
    multiply, sequential fold, one divide) are the exact IEEE sequence a
    DuckDB oracle reproduces with ``_dot/_norm``. ``|c|`` is folded
    driver-side in the same element order. Ties go to the lowest cell id.

    The descending rank rides a negated sort key; ``0.0 - score``
    (not unary minus) so a ``+0.0`` score cannot become ``-0.0`` —
    Spark's Double ordering distinguishes the two while an oracle's
    ``ORDER BY score DESC`` does not, so a signed-zero tie between two
    cells would otherwise order differently across engines.
    """
    if not centroids:
        raise ValueError("assign_cell needs at least one centroid "
                         "(seed_centroids over an empty corpus?)")
    if isinstance(vec_col, str):
        if _finite_centroids(centroids):
            return F.expr("sort_array(array("
                          + _cell_entries_sql(vec_col, centroids)
                          + "))[0].cid")
        vec_col = F.col(vec_col)
    entries = []
    for cid, comps in centroids:
        entries.append(F.struct(
            (F.lit(0.0) - (_centroid_dot(vec_col, comps)
                           / F.lit(_folded_norm(comps))))
            .alias("neg"),
            F.lit(cid).alias("cid")))
    return F.sort_array(F.array(*entries))[0]["cid"]


def _cell_entries_sql(vec_sql: str,
                      centroids: list[tuple[int, list[float]]]) -> str:
    """The ``(neg score, cid)`` struct array body shared by the
    :func:`assign_cell` / :func:`probe_cells` string fast paths — ONE
    parsed SQL expression instead of ~90 py4j round trips per centroid
    (r12: each higher-order function alone costs ~20 ms of py4j lambda
    setup, re-paid per centroid per build/batch/search). The operation
    sequence — zip-multiply in double, sequential fold, one divide by
    the driver-folded norm, ``0.0 - score`` for the signed-zero rule —
    is exactly the Column path's, so scores and tie order are
    bit-identical; non-finite components fall back to the Column path
    upstream (they have no SQL literal form)."""
    entries = []
    for cid, comps in centroids:
        arr = "array(" + ",".join(f"{float(v)!r}D" for v in comps) + ")"
        d = (f"aggregate(zip_with({vec_sql}, {arr}, (x, y) ->"
             " CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D,"
             " (acc, x) -> acc + x)")
        entries.append(f"named_struct('neg', 0.0D - ({d}"
                       f" / {_folded_norm(comps)!r}D), 'cid', {int(cid)})")
    return ",".join(entries)


def assign_cell_vectorized(centroids: list[tuple[int, list[float]]]):
    """Arrow-batched cell assignment for LARGE k — the
    :func:`pq_encode_vectorized` discipline applied to coarse routing:
    one numpy matmul per batch computes every ``dot(v, c) / |c|`` and
    the argmax (first-wins ties = lowest cell id, matching
    :func:`assign_cell`'s tie rule). Returns a callable for
    ``df.select(fn(col))``.

    Use when k × dims literal expressions outgrow codegen (≳32 cells —
    the :func:`assign_cell_join` threshold) but a corpus-wide groupBy
    shuffle is unacceptable: this stays scan-side (zero shuffle), the
    production build shape for a 64-256-cell index at 100 TB.

    Honesty note on bit-identity: numpy's dot uses pairwise summation
    while the literal/join paths fold sequentially, so a vector whose
    two best cells tie within float rounding COULD route differently.
    Oracle-adjudicated queries therefore keep the literal path (bounded
    k); this is the large-k production/probe path, recall-tested rather
    than bit-adjudicated."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    if not centroids:
        raise ValueError("assign_cell_vectorized needs at least one "
                         "centroid")
    cids = np.asarray([cid for cid, _ in centroids], dtype=np.int64)
    C = np.asarray([c for _, c in centroids], dtype=np.float64)
    Cn = np.sqrt((C ** 2).sum(axis=1))
    Cn[Cn == 0.0] = 1.0

    @pandas_udf("int")
    def assign(v):
        import pandas as pd

        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        scores = (X @ C.T) / Cn[None, :]
        return pd.Series(cids[scores.argmax(axis=1)].astype(np.int32))

    return assign


def assign_cell_join(df: DataFrame, centroids: list[tuple[int, list[float]]],
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Broadcast-join argmax assignment — the large-k twin of
    :func:`assign_cell`. Past a few dozen centroids the literal codegen
    expression outgrows what Janino compiles comfortably (k structs ×
    dim literal doubles), so the centroids become a broadcast k-row
    frame and the argmax a ``max(struct(score, -cid))`` aggregation
    (highest score, ties to the lowest cell id — identical ordering to
    the literal path and the SQL oracle's ``ORDER BY s DESC, cid``).

    Scores are the same ``dot(v, c) / |c|`` doubles as the literal path:
    the centroid rows carry exactly the collected component values and a
    driver-folded norm, so the two paths are bit-identical and a caller
    can switch on k freely.

    Returns ``(id_col, cell_id)``; join the assignment back to the
    vector frame when the downstream needs the vectors too.
    """
    if not centroids:
        raise ValueError("assign_cell_join needs at least one centroid "
                         "(seed_centroids over an empty corpus?)")
    rows = [(int(cid), comps, _folded_norm(comps))
            for cid, comps in centroids]
    # VALUES LocalRelation (r12): the broadcast build runs driver-side
    # with zero tasks; createDataFrame shipped the same bounded rows as
    # a 32-slice pickled RDD (a 32-Python-task job per action)
    cdf = values_frame(df.sparkSession, rows,
                       "cid long, ce array<double>, cnorm double")
    s = dot(F.col(vec_col), F.col("ce")) / F.col("cnorm")
    return (df.select(id_col, vec_col)
            .crossJoin(F.broadcast(cdf))
            .groupBy(id_col)
            .agg(F.max(F.struct(s.alias("s"), (-F.col("cid")).alias("nc")))
                 .alias("m"))
            .select(id_col, (-F.col("m.nc")).alias("cell_id")))


def kmeans_lloyd(df: DataFrame, k: int = 8, iters: int = 3,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Lloyd's k-means over an embedding corpus — the clustering step the
    engine's cluster-then-X operators (SemDeDup e11, IVF e04/e10) seed
    with :func:`seed_centroids` but production runs REFINE: ``iters``
    rounds of assign-to-nearest (cosine, ties to the lowest cell id) and
    recompute-the-mean, then one final assignment under the converged
    centroids. Returns per-vector ``(id_col, cell_id)``.

    Fully adjudicable, unlike library k-means: seeding is the k lowest-id
    vectors; each round's centroid components are means of FLOAT32 values
    summed in double (every partial sum exact — 24-bit mantissas
    accumulate within double's 53 — so the mean is order-independent and
    bit-identical in any engine, the :func:`centroid_classify` trick);
    assignment scores ``dot(v, c)/|c|`` fold sequentially row-local. An
    external oracle unrolls one assign+mean CTE level per iteration.

    Scale shape per iteration: ONE broadcast-join argmax over the corpus
    (centroids are ≤k bounded rows collected driver-side, the
    seed_centroids cost class) and one (cell × dim)-key mean aggregate —
    the corpus never shuffles on a data-scaled key; the only exchanges
    carry (cell, pos) partials bounded by k·dim. The vector projection is
    localCheckpointed once so the 2·iters+1 passes don't each re-plan the
    source scan. Empty cells drop (standard Lloyd); k is bounded by the
    corpus size through the seeding.
    """
    v = _lloyd_project(df, id_col, vec_col)
    cents = _lloyd_refine(v, k, iters, id_col)
    return assign_cell_join(v, cents, id_col=id_col, vec_col="e")


def kmeans_lloyd_centroids(df: DataFrame, k: int = 8, iters: int = 3,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           ) -> list[tuple[int, list[float]]]:
    """The TRAINED STATE of :func:`kmeans_lloyd` — the converged
    centroid list after ``iters`` refinement rounds, without the final
    corpus-wide assignment pass. This is what a quantizer RETRAIN needs
    (e23's retrain-and-swap): the refreshed centroids feed
    :func:`build_ivf_sq8_codes` / ``save_index`` directly, exactly like
    :func:`seed_centroids` output but refined on the current (drifted)
    corpus. Cell ids are the surviving seed vec_ids (empty cells drop,
    standard Lloyd), sorted ascending — re-index to ``0..len-1`` before
    an index build if a dense cell space is wanted. Bounded output
    (≤ k rows of dim doubles); same adjudicability contract as
    :func:`kmeans_lloyd` (an oracle unrolls one assign+mean CTE level
    per iteration and reads centroids ``c{iters}``)."""
    return _lloyd_refine(_lloyd_project(df, id_col, vec_col), k, iters,
                         id_col)


def _lloyd_project(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return (df.select(F.col(id_col),
                      F.transform(F.col(vec_col),
                                  lambda x: x.cast("double")).alias("e"))
            .localCheckpoint(eager=False))


def _lloyd_refine(v: DataFrame, k: int, iters: int,
                  id_col: str) -> list[tuple[int, list[float]]]:
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    cents = seed_centroids(v, k=k, id_col=id_col, vec_col="e")
    for _ in range(iters):
        # r12 (guide §2.4): the vector rides THROUGH the argmax
        # aggregate instead of being joined back afterwards — 2
        # exchanges per iteration instead of 3. The comparator is the
        # same max(struct(score, -cid)) as assign_cell_join; the carried
        # vector field is never compared because (score, -cid) is unique
        # within an id group. Means are bit-identical: each component
        # sum adds float32-valued doubles (exact at any order while the
        # term count stays below 2^29), so losing the join changes no
        # low bit.
        rows_c = [(int(cid), comps, _folded_norm(comps))
                  for cid, comps in cents]
        # VALUES LocalRelation per iteration (r12): see assign_cell_join
        cdf = values_frame(v.sparkSession, rows_c,
                           "cid long, ce array<double>, cnorm double")
        s = dot(F.col("e"), F.col("ce")) / F.col("cnorm")
        asg_v = (v.crossJoin(F.broadcast(cdf))
                 .groupBy(id_col)
                 .agg(F.max(F.struct(s.alias("s"),
                                     (-F.col("cid")).alias("nc"),
                                     F.col("e").alias("e"))).alias("m"))
                 .select((-F.col("m.nc")).alias("cell_id"),
                         F.col("m.e").alias("e")))
        cm = (asg_v
              .select("cell_id", F.posexplode("e").alias("pos", "val"))
              .groupBy("cell_id", "pos").agg(F.avg("val").alias("m"))
              .groupBy("cell_id")
              .agg(F.transform(
                  F.array_sort(F.collect_list(F.struct("pos", "m"))),
                  lambda s: s["m"]).alias("ce")))
        rows = cm.collect()  # bounded: <= k rows of dim doubles
        cents = sorted((int(r["cell_id"]), [float(x) for x in r["ce"]])
                       for r in rows)
    return cents


def kmeans_farthest_first(df: DataFrame, k: int = 8,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> DataFrame:
    """Gonzalez (1985) farthest-first traversal — k-center seeding, the
    deterministic stand-in for k-means++ D² sampling (k-means++ samples
    the next seed ∝ squared distance to the chosen set; farthest-first
    is its deterministic limit and carries the 2-approximation
    guarantee for the k-center objective). Pairs :func:`kmeans_lloyd`
    the way seeding pairs refinement: lowest-id start, then each round
    picks the vector MAXIMIZING the squared L2 distance to its nearest
    already-chosen seed, ties to the lowest id — every choice exactly
    reproducible by an external oracle (squared distances fold
    sequentially in double on both engines, the :func:`dot` discipline).

    Scale shape: ``k - 1`` rounds of ONE corpus scan each — the chosen
    seeds are k-bounded literal vectors compiled into a scan-side
    ``least()`` of fold expressions (the small-k literal path
    ``assign_cell_join`` documents; k·dim literal doubles stay well
    inside codegen comfort at seeding sizes), and each round collects
    exactly one (argmax, then vector-fetch) row. No shuffle ever
    carries the corpus: the only exchanges are the two single-row
    aggregates per round.

    Returns k rows: (seed_rank, ``id_col``, dist_sq) where dist_sq is
    the squared distance to the nearest earlier seed at selection time
    (NULL for the rank-0 start).

    ``id_col`` must be NUMERIC (unlike the string-tolerant ``knn_*``
    family): the per-round argmax breaks ties toward the LOWEST id via
    ``max(struct(d, -id))``, and the negation that flips the tie
    direction inside a single max has no string analogue — validated up
    front so a string id fails loudly here, not deep in analysis.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.types import NumericType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"kmeans_farthest_first requires a numeric {id_col!r} for its "
            f"lowest-id argmax tie-break (got {id_type.simpleString()}); "
            f"map string ids to a numeric surrogate first")
    v = (df.select(F.col(id_col),
                   F.transform(F.col(vec_col),
                               lambda x: x.cast("double")).alias("e"))
         .localCheckpoint(eager=False))

    def sqdist(vec: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in vec])
        return F.aggregate(
            F.zip_with(F.col("e"), lit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)

    first = (v.orderBy(id_col).limit(1).collect())  # deterministic start
    if not first:
        raise ValueError("kmeans_farthest_first needs a non-empty corpus")
    chosen = [(0, first[0][id_col], None,
               [float(x) for x in first[0]["e"]])]
    for rank in range(1, k):
        mind = F.least(*[sqdist(vec) for _, _, _, vec in chosen]) \
            if len(chosen) > 1 else sqdist(chosen[0][3])
        # ONE single-row aggregate per round: the max struct carries the
        # winning vector itself (comparison never reaches it — the
        # negated id in field 2 is already unique), so there is no
        # second corpus pass to fetch it
        far = (v.select(F.col(id_col), mind.alias("__d"), "e")
               .agg(F.max(F.struct(F.col("__d").alias("d"),
                                   (-F.col(id_col)).alias("ni"),
                                   F.col("e").alias("e"))).alias("m"))
               .select((-F.col("m.ni")).alias("pid"), F.col("m.d"),
                       F.col("m.e"))
               .collect()[0])  # bounded: one row per round
        if float(far["d"]) == 0.0:
            # the farthest remaining point coincides with a chosen seed:
            # fewer than k distinct vectors exist, and continuing would
            # silently return duplicate seeds
            raise ValueError(
                f"k={k} exceeds the corpus's distinct vector count "
                f"({rank} seeds cover every point exactly)")
        chosen.append((rank, far["pid"], float(far["d"]),
                       [float(x) for x in far["e"]]))
    spark = df.sparkSession
    from pyspark.sql import types as T

    id_type = df.schema[id_col].dataType
    schema = T.StructType([
        T.StructField("seed_rank", T.LongType()),
        T.StructField(id_col, id_type),
        T.StructField("dist_sq", T.DoubleType())])
    return spark.createDataFrame([(r, i, d) for r, i, d, _ in chosen],
                                 schema)


# -- product quantization ----------------------------------------------------

def pq_train(df: DataFrame, m: int = 8, n_codes: int = 16,
             sample_size: int = 2000, iters: int = 5,
             vec_col: str = "embedding",
             id_col: str = "vec_id") -> list[list[list[float]]]:
    """Driver-side PQ codebooks: vectors are unit-normalized, split into
    ``m`` subvectors, and each subspace gets its own ``n_codes``-centroid
    k-means (same deterministic sample / init / cost class as
    ``ivf_train``). Returns ``codebooks[s][j]`` = centroid ``j`` of
    subspace ``s``.

    Why PQ at 100 TB: a 64-dim float corpus is 256 B/vector; with m=8,
    n_codes=16 it stores as 8 nibble codes — a 64× smaller index whose
    distance evaluation is ``m`` table lookups instead of a 64-dim dot.
    """
    import numpy as np

    rows = (df.select(F.col(id_col), F.col(vec_col))
            .orderBy(id_col).limit(sample_size).collect())
    X = np.array([r[1] for r in rows], dtype=np.float64)
    X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = []
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        k = min(n_codes, len(Xs))
        C = Xs[np.linspace(0, len(Xs) - 1, k).astype(int)].copy()
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books.append(C.tolist())
    return books


def _unit(vec: Column) -> Column:
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x / n)


def pq_encode(vec_col: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of ``m`` codes: per subspace, the L2-nearest codebook
    entry of the unit-normalized vector. Pure codegen expressions (struct
    sort as argmin, ties to the lowest code id) — encoding is a scan-side
    map, no UDF, no shuffle."""
    v = _unit(vec_col)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    codes = []
    for s in range(m):
        xs = F.slice(v, s * sub + 1, sub)
        entries = []
        for j, c in enumerate(codebooks[s]):
            cc = F.array(*[F.lit(float(x)) for x in c])
            d2 = F.aggregate(
                F.zip_with(xs, cc, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x)
            entries.append(F.struct(d2.alias("d"), F.lit(j).alias("j")))
        codes.append(F.sort_array(F.array(*entries))[0]["j"])
    return F.array(*codes)


def pq_adc_tables(vec_col: Column,
                  codebooks: list[list[list[float]]]) -> Column:
    """``array<array<double>>``: ``tables[s][j] = q_s · codebook[s][j]``
    for the unit-normalized query — the asymmetric-distance lookup tables.
    Built per query row (queries are few and broadcast)."""
    v = _unit(vec_col)
    sub = len(codebooks[0][0])
    tabs = []
    for s, book in enumerate(codebooks):
        xs = F.slice(v, s * sub + 1, sub)
        tabs.append(F.array(*[
            dot(xs, F.array(*[F.lit(float(x)) for x in c])) for c in book]))
    return F.array(*tabs)


def knn_pq(corpus: DataFrame, queries: DataFrame, k: int = 5,
           m: int = 8, n_codes: int = 16, shortlist: int = 8,
           id_col: str = "vec_id", vec_col: str = "embedding",
           query_id_col: str = "query_id", sample_size: int = 2000,
           parallelism: int | None = None) -> DataFrame:
    """PQ approximate top-k with exact re-rank: corpus rows are scored via
    ``m`` table lookups (ADC estimate of the cosine), the top
    ``k*shortlist`` shortlist per query is re-scored with the exact
    cosine, and the final top-k comes from the refined scores — the
    standard two-stage PQ search.

    Scale path: ``pq_encode`` runs once at ingest and the codes column
    (m small ints) is what the search scans — the raw vectors are touched
    only for the shortlist re-rank, so the per-query scan is ~64× lighter
    than brute force at m=8, n_codes=16.
    """
    books = pq_train(corpus, m, n_codes, sample_size,
                     vec_col=vec_col, id_col=id_col)
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    enc = pq_encode_vectorized(books)
    codes = (c.select(id_col, enc(F.col("__vec")).alias("__codes"))
             .localCheckpoint(eager=False))  # encode once, reuse both scans
    mk_tabs = pq_adc_tables_vectorized(books)
    q_tabs = queries.select(F.col(id_col).alias(query_id_col),
                            mk_tabs(F.col(vec_col)).alias("__tabs"))
    est = F.aggregate(
        F.zip_with(F.col("__codes"), F.col("__tabs"),
                   lambda code, tab: F.element_at(tab, code + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    # the shortlist window sees ONLY (query_id, neighbor_id, est) — the
    # raw vectors never ride through the candidate shuffle
    scored = (codes.crossJoin(F.broadcast(q_tabs))
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(query_id_col, F.col(id_col).alias("neighbor_id"),
                      est.alias("__est")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.desc("__est"), F.asc("neighbor_id")],
                            k * shortlist) \
        .select(query_id_col, "neighbor_id")
    # exact re-rank joins the vectors back for shortlist rows only
    cv = c.select(F.col(id_col).alias("neighbor_id"), "__vec",
                  l2_norm(F.col("__vec")).alias("__vn"))
    qv = queries.select(F.col(id_col).alias(query_id_col),
                        F.col(vec_col).alias("__qvec"),
                        l2_norm(F.col(vec_col)).alias("__qn"))
    exact = (short.join(cv, "neighbor_id")
             .join(F.broadcast(qv), query_id_col)
             .select(query_id_col, "neighbor_id",
                     F.round(dot(F.col("__qvec"), F.col("__vec"))
                             / (F.col("__qn") * F.col("__vn")), 6)
                     .alias("score")))
    return _topk(exact, query_id_col, k)


def pq_encode_vectorized(codebooks: list[list[list[float]]]):
    """Arrow-batched encoder: the expression form above evaluates m×k
    interpreted higher-order lambdas per row, which dominates runtime once
    the corpus is non-trivial; this computes all subspace argmins as one
    numpy matmul per batch (||x_s||² − 2·x_sCᵀ + ||C||², argmin with
    first-wins ties — identical codes). Returns a callable for
    ``df.select(fn(col))``."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = B[0].shape[1]

    @pandas_udf("array<int>")
    def enc(v):
        import pandas as pd

        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        codes = np.empty((len(X), len(B)), dtype=np.int64)
        for s, C in enumerate(B):
            Xs = X[:, s * sub:(s + 1) * sub]
            d2 = ((Xs ** 2).sum(1, keepdims=True)
                  - 2.0 * (Xs @ C.T)
                  + (C ** 2).sum(1)[None, :])
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return enc


def pq_adc_tables_vectorized(codebooks: list[list[list[float]]]):
    """Arrow-batched ADC-table builder — the expression form above builds
    an m×n_codes×sub literal tree (~1000 nodes at m=8, n_codes=16) whose
    Catalyst analysis alone costs seconds regardless of row count; this
    computes ``tables[s][j] = q_s · codebook[s][j]`` as one numpy matmul
    per subspace per batch. Same float64 math, same output shape
    ``array<array<double>>``."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = B[0].shape[1]

    @pandas_udf("array<array<double>>")
    def tabs(v):
        import pandas as pd

        X = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        X = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
        per_row: list[list] = [[] for _ in range(len(X))]
        for s, C in enumerate(B):
            T = X[:, s * sub:(s + 1) * sub] @ C.T  # (rows, n_codes)
            for i in range(len(X)):
                per_row[i].append(T[i])
        return pd.Series(per_row)

    return tabs


def centroid_classify(df: DataFrame, vec_col: str = "embedding",
                      label_col: str = "label",
                      id_col: str = "vec_id") -> DataFrame:
    """Nearest-label-centroid classification with a confusion-matrix
    output: per label, the elementwise-mean centroid; per vector, the
    centroid with the highest cosine; returned as (label, assigned_label,
    n_vectors) counts — the standard embedding-space sanity check that
    labels form separable clusters (and the cheap classifier over them).

    Cross-engine determinism: centroid components are means of FLOAT32
    values summed in double — every partial sum is exact (a float32
    mantissa is 24 bits; thousands of them accumulate within double's 53),
    so the result is order-independent and identical in any engine. The
    per-vector cosine then folds sequentially row-local (same as
    :func:`dot`). Cross-row averages of full-mantissa doubles would NOT
    be order-stable, which is why the output is counts, not mean scores.

    Scale shape: centroids via one (label × dim)-key aggregate (bounded
    rows) reassembled and BROADCAST onto the corpus; assignment is a
    scan-side cross join against ~n_labels rows, then one bounded
    group-by. Nothing corpus-sized shuffles except the dim-explode
    aggregate, whose key space is labels × dim.
    """
    v = df.select(
        F.col(id_col), F.col(label_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("e"))
    comp = v.select(F.col(label_col),
                    F.posexplode("e").alias("pos", "val"))
    cent = (comp.groupBy(label_col, "pos").agg(F.avg("val").alias("m"))
            .groupBy(label_col)
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("ce"))
            .withColumnRenamed(label_col, "__clabel"))
    scored = (v.crossJoin(F.broadcast(cent))
              .withColumn("__cos", cosine(F.col("e"), F.col("ce"))))
    w = Window.partitionBy(id_col).orderBy(F.col("__cos").desc(),
                                           F.col("__clabel"))
    top = (scored.withColumn("__rk", F.row_number().over(w))
           .filter(F.col("__rk") == 1))
    return (top.groupBy(F.col(label_col), F.col("__clabel"))
            .agg(F.count(F.lit(1)).alias("n_vectors"))
            .select(F.col(label_col),
                    F.col("__clabel").alias("assigned_label"), "n_vectors"))


def sign_words(vec: Column, dims: int) -> list[Column]:
    """Pack a vector's sign bits into ``ceil(dims/32)`` BIGINT words
    (bit i of word j set iff coordinate ``32*j + i`` is > 0). 32-bit
    words keep every value far from the int64 sign bit, so XOR/popcount
    behave identically in any engine."""
    if dims <= 0:
        raise ValueError(f"dims must be positive, got {dims}")
    def bit_of(off: int):
        # factory, not a defaulted lambda: a two-parameter callable would
        # receive the ARRAY INDEX as its second argument
        def expr(i: Column) -> Column:
            # 2^(i-1) via double pow is exact here (i <= 32 << 2^53);
            # F.shiftleft only takes a literal shift amount
            return F.when(
                F.element_at(vec, (F.lit(off) + i).cast("int")) > F.lit(0.0),
                F.pow(F.lit(2.0), (i - 1).cast("double")).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint"))
        return expr

    words = []
    for j in range(0, dims, 32):
        nbits = min(32, dims - j)
        words.append(F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(nbits)), bit_of(j)),
            F.lit(0).cast("bigint"), lambda a, x: a + x))
    return words


def knn_binary_hamming(corpus: DataFrame, queries: DataFrame, k: int = 5,
                       shortlist: int = 25, dims: int = 64,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       query_id_col: str = "query_id",
                       parallelism: int | None = None) -> DataFrame:
    """Two-stage KNN over sign-bit binary quantization: stage 1 ranks
    every candidate by HAMMING distance between packed sign bitmaps
    (2 XOR + 2 popcounts per pair at 64 dims — the binary-quantization
    shortlist used by vector stores for a 32× compressed first pass),
    stage 2 re-ranks the per-query ``shortlist`` with exact
    full-dimension cosine and returns the top ``k``.

    Same funnel scaffolding as :func:`knn_matryoshka`, one step further
    down the compression ladder: the stage-1 corpus projection is two
    BIGINT words per row (16 bytes vs 64 floats = 256 bytes, a 16×
    smaller scan with the packing precomputed), the candidate shuffle
    carries (query, neighbor, hamming) triples only, and full vectors
    are fetched by broadcast-back for just ``n_queries × shortlist``
    rows. Stage 1 is INTEGER-ranked (no float rounding anywhere), so
    the whole funnel is bit-exact-oracle-checkable; ties break by
    neighbor id in both stages.

    Returns (query_id, neighbor_id, hamming, score, rank) for the top-k.
    """
    n_words = (dims + 31) // 32
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    cw = c.select(id_col, "__vec",
                  *[w.alias(f"__w{j}")
                    for j, w in enumerate(sign_words(F.col("__vec"), dims))])
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    qw = q.select(query_id_col, "__qvec",
                  *[w.alias(f"__q{j}")
                    for j, w in enumerate(sign_words(F.col("__qvec"), dims))])
    ham = sum(F.bit_count(F.col(f"__w{j}").bitwiseXOR(F.col(f"__q{j}")))
              for j in range(n_words)).cast("bigint")
    # words only on the corpus side of the pair loop — the full vector
    # stays behind and is re-fetched for the shortlist alone
    scored = (cw.drop("__vec").crossJoin(
                  F.broadcast(qw.drop("__qvec")))
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col),
                      F.col(id_col).alias("neighbor_id"),
                      ham.alias("hamming")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.asc("hamming"), F.asc("neighbor_id")],
                            shortlist) \
        .select(query_id_col, "neighbor_id", "hamming")
    rr = _funnel_rerank(
        c.select(id_col, "__vec", l2_norm(F.col("__vec")).alias("__vn")),
        q.select(query_id_col, "__qvec",
                 l2_norm(F.col("__qvec")).alias("__qn")),
        short, "hamming", id_col, query_id_col)
    return _topk(rr, query_id_col, k)


def sq8_bounds(corpus: DataFrame, dims: int,
               vec_col: str = "embedding") -> DataFrame:
    """One-row frame of per-dimension (min, max) arrays over the corpus
    — the entire trained state of a scalar int8 quantizer, as columns
    ``__mn``/``__mx`` (``array<double>``, 1-based coordinate order).
    min/max are exact and order-independent (no float summation), so
    the bounds are bit-identical in any engine and the quantizer needs
    no adjudicated model artifact.

    Shape: one (pos)-keyed aggregate over the dim-explode (key space =
    dims, the :func:`centroid_classify` pattern — per-dim UNROLLED
    aggregate/code expressions compile multi-second whole-stage codegen
    at 64 dims, measured, so everything per-dim here is array-typed),
    reassembled into two arrays on a single row. At 100 TB this is the
    one full scan the quantizer ever takes, folding to ~1 KiB."""
    if dims <= 0:
        raise ValueError(f"dims must be positive, got {dims}")

    def _asc(col: str) -> Column:
        return F.transform(
            F.array_sort(F.collect_list(F.struct("pos", col))),
            lambda s: s[col])

    return (corpus
            .select(F.posexplode(
                F.slice(F.transform(F.col(vec_col),
                                    lambda x: x.cast("double")),
                        1, dims)).alias("pos", "val"))
            .groupBy("pos")
            .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
            .agg(_asc("mn").alias("__mn"), _asc("mx").alias("__mx")))


def sq8_codes(vec: Column | str, dims: int) -> Column:
    """int8-style scalar quantization codes (FAISS ``SQ8``): coordinate
    ``i`` maps to ``floor((x - mn_i) * 255 / (mx_i - mn_i))`` clamped to
    [0, 255], or 0 when the dimension is constant. Expects the
    :func:`sq8_bounds` array columns (``__mn``/``__mx``) in scope
    (broadcast-joined by the caller); one higher-order expression, not
    ``dims`` unrolled ones (codegen size — see :func:`sq8_bounds`).

    Cross-engine exactness: every step is a single correctly-rounded
    IEEE double op on deterministic inputs (min/max of float32 values),
    so identical expressions yield identical codes in any engine — the
    codes, and everything ranked on them, are exact integers."""
    if isinstance(vec, str) and "`" not in vec:
        # fast path (r12): the whole quantizer — transform, CASE, clamp —
        # parses as ONE SQL expression instead of ~80 py4j round trips
        # (~77 ms of pure driver latency per call site, re-paid per
        # build, micro-batch and search); the parsed Catalyst tree is
        # operator-for-operator the Column path's below, so codes are
        # bit-identical
        return F.expr(
            f"transform(sequence(1, {int(dims)}), i -> CAST("
            "CASE WHEN element_at(__mx, i) > element_at(__mn, i)"
            " THEN least(CAST(255 AS BIGINT), greatest(CAST(0 AS BIGINT),"
            f" floor((CAST(element_at(`{vec}`, i) AS DOUBLE)"
            " - element_at(__mn, i)) * 255.0D"
            " / (element_at(__mx, i) - element_at(__mn, i)))))"
            " ELSE CAST(0 AS BIGINT) END AS INT))")

    def code(i: Column) -> Column:
        x = F.element_at(vec, i).cast("double")
        mn = F.element_at(F.col("__mn"), i)
        mx = F.element_at(F.col("__mx"), i)
        q = F.floor((x - mn) * F.lit(255.0) / (mx - mn))
        return (F.when(mx > mn,
                       F.least(F.lit(255).cast("bigint"),
                               F.greatest(F.lit(0).cast("bigint"), q)))
                .otherwise(F.lit(0).cast("bigint")).cast("int"))

    return F.transform(F.sequence(F.lit(1), F.lit(dims)), code)


def sq8_pack_words(code: Column | str, dims: int) -> list[Column]:
    """Pack an SQ8 code array into ``ceil(dims/4)`` BIGINT words, 4
    codes per word little-endian (code ``4*j + b`` occupies byte ``b``
    of word ``j``) — the :func:`sign_words` discipline one rung up the
    precision ladder. 32 bits of payload per word keeps every value far
    from the int64 sign bit, so the packing is a plain integer sum that
    behaves identically in any engine, and the packed layout is the
    honest SQ8 storage shape: 8 bytes per 4 dims on disk instead of a
    4-byte int per dim, and scalar (sortable, hashable) columns instead
    of an array."""
    if dims <= 0:
        raise ValueError(f"dims must be positive, got {dims}")
    if isinstance(code, str):
        # fast path (r12): the whole word — 4 element_at/cast/mul terms
        # and the sum — parses as ONE SQL expression instead of ~28 py4j
        # round trips; at dims=64 that is 16 calls instead of ~450 per
        # build, identical integer arithmetic on the same inputs
        return [F.expr(
            "CAST(0 + " + " + ".join(
                f"(CAST(element_at({code}, {j + b + 1}) AS BIGINT)"
                f" * {256 ** b})"
                for b in range(min(4, dims - j))) + " AS BIGINT)")
            for j in range(0, dims, 4)]
    words = []
    for j in range(0, dims, 4):
        nb = min(4, dims - j)
        words.append(sum(
            F.element_at(code, j + b + 1).cast("bigint") * F.lit(256 ** b)
            for b in range(nb)).cast("bigint"))
    return words


def sq8_unpack_words(dims: int, prefix: str = "w") -> Column:
    """Rebuild the SQ8 code array from :func:`sq8_pack_words` columns
    ``{prefix}00..{prefix}NN`` — one higher-order expression (two nested
    transforms over a 4-element divisor array), never ``dims`` unrolled
    byte extractions (codegen size, the :func:`sq8_bounds` rule). Exact
    integer div/mod, so pack -> unpack is an identity in any engine."""
    if dims <= 0:
        raise ValueError(f"dims must be positive, got {dims}")
    n_words = (dims + 3) // 4
    wcols = ", ".join(f"{prefix}{j:02d}" for j in range(n_words))
    return F.slice(F.expr(
        f"flatten(transform(array({wcols}),"
        " w -> transform(array(1, 256, 65536, 16777216),"
        " d -> CAST((w div d) % 256 AS INT))))"), 1, dims)


def probe_cells(vec_col: Column | str, centroids: list[tuple[int, list[float]]],
                nprobe: int) -> Column:
    """``array<int>`` of the ``nprobe`` nearest cell ids under the
    :func:`assign_cell` score ``dot(v, c) / |c|`` (ties to the lowest
    cell id) — the multi-probe twin of ``assign_cell``, same struct-sort
    codegen, same IEEE op sequence a DuckDB oracle reproduces with
    ``_dot/_norm``. ``probe_cells(v, cents, 1)[0] == assign_cell(v,
    cents)`` by construction. The sort key is ``0.0 - score`` (not
    unary minus) for the same signed-zero reason as
    :func:`assign_cell`."""
    if not centroids:
        raise ValueError("probe_cells needs at least one centroid")
    if nprobe <= 0:
        raise ValueError(f"nprobe must be positive, got {nprobe}")
    if isinstance(vec_col, str):
        if _finite_centroids(centroids):
            return F.expr(
                "transform(slice(sort_array(array("
                + _cell_entries_sql(vec_col, centroids)
                + f")), 1, {int(nprobe)}), s -> s.cid)")
        vec_col = F.col(vec_col)
    entries = []
    for cid, comps in centroids:
        entries.append(F.struct(
            (F.lit(0.0) - (_centroid_dot(vec_col, comps)
                           / F.lit(_folded_norm(comps))))
            .alias("neg"),
            F.lit(cid).alias("cid")))
    ranked = F.slice(F.sort_array(F.array(*entries)), 1, nprobe)
    return F.transform(ranked, lambda s: s["cid"])


def build_ivf_sq8_codes(corpus: DataFrame,
                        centroids: list[tuple[int, list[float]]],
                        bounds: DataFrame, dims: int = 64,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        route: str = "literal") -> DataFrame:
    """The BUILD side of a persisted IVF-SQ8 index (the ``ivf_sq8``
    kind in ``store.indexes``): one corpus scan emitting ``(vec_id,
    cell, packed code words)`` — cell routing via :func:`assign_cell`
    under the given coarse centroids, codes via :func:`sq8_codes` under
    the given broadcast bounds row, packed 4-per-bigint by
    :func:`sq8_pack_words`. Everything is scan-side codegen: at 100 TB
    the build is exactly one pass over the raw vectors, and the emitted
    table is the 4x-compressed artifact every later search scans
    INSTEAD of the corpus.

    ``route="literal"`` (default) routes via :func:`assign_cell`'s
    codegen expression — bit-adjudicable, bounded k.
    ``route="vectorized"`` swaps in :func:`assign_cell_vectorized`
    (Arrow matmul, still scan-side/zero-shuffle) for large-k builds
    where k × dims literal trees outgrow codegen; see its docstring
    for the tie-rounding honesty note."""
    if route == "vectorized":
        router = assign_cell_vectorized(centroids)
    elif route == "literal":
        def router(c):
            # c is the vec column NAME (assign_cell's one-parsed-expr
            # fast path); the vectorized route still takes a Column
            return assign_cell(c, centroids)
    else:
        raise ValueError(f"route must be 'literal' or 'vectorized', "
                         f"got {route!r}")
    coded = (corpus.crossJoin(F.broadcast(bounds))
             .select(F.col(id_col),
                     router(F.col(vec_col) if route == "vectorized"
                            else vec_col).alias("cell"),
                     sq8_codes(vec_col, dims).alias("__code")))
    return coded.select(
        id_col, "cell",
        *[w.alias(f"w{j:02d}")
          for j, w in enumerate(sq8_pack_words("__code", dims))])


def search_ivf_sq8_index(codes: DataFrame,
                         centroids: list[tuple[int, list[float]]],
                         bounds: DataFrame, corpus: DataFrame,
                         queries: DataFrame, k: int = 5, nprobe: int = 2,
                         shortlist: int = 25, dims: int = 64,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         query_id_col: str = "query_id",
                         prune_cells: bool = True,
                         fetch_ids=None,
                         rebalance: int | None = None) -> DataFrame:
    """The SEARCH side of a persisted IVF-SQ8 index — the production
    cold read path: rank candidates from the PERSISTED code table alone
    and touch raw vectors only for the per-query shortlist rerank.

    ``fetch_ids`` (optional, ``Callable[[list], DataFrame]``) replaces
    the stage-2 corpus SCAN with a KEYED fetch: the shortlist id set
    (bounded at ``n_queries × shortlist`` by contract) is collected and
    handed to the callable, which returns the ``(id_col, vec_col)``
    rows for exactly those ids — at 100 TB, ``store.skipping.read_where
    (..., [(id_col, "in", ids)])`` over an id-stats/z-ordered corpus
    table reads only the files containing shortlist vectors, where the
    default streams the ENTIRE raw corpus through the broadcast join
    (bounded output rows, but full-scan I/O). Without it, pass the
    corpus frame and the scan shape applies (fine when the corpus is
    already cached or the batch is huge enough to amortize the scan).

    ``rebalance`` (optional int) round-robin-repartitions the pruned,
    still-PACKED candidate rows before the stage-1 join. Per-scan-task
    stage-1 work is rows-in-split × queries-probing-that-cell; splits
    are uniform in BYTES, so a hot cell (high occupancy AND probed by
    most queries) concentrates the pair fold into its few splits — the
    r11 skew probe measured a 30%-occupancy cell turning 929 s of
    aggregate stage time into 203 s wall (~5 effective cores of 32). A
    round-robin shuffle mixes hot and cold rows into every task
    (uniform per-task work by construction — no salting keys needed,
    the join side is broadcast). Cost: one shuffle of the pruned code
    subset; leave None for huge offline scans where that shuffle would
    dominate, set to the session parallelism for skewed/online shapes.
    Results are bit-identical either way (the ranking's total order is
    partition-independent).

    Stage 0 (bounded): each query encodes against the broadcast bounds
    row and probes its ``nprobe`` nearest cells under the broadcast
    centroids. Stage 1 (the only index-sized work): the code table,
    filtered to probed cells by an int equi-join against the broadcast
    query frame, ranked by exact integer squared-L2 between unpacked
    code arrays — raw vectors never appear. Stage 2: the established
    funnel rerank fetches full vectors for ``n_queries × shortlist``
    rows only, exact cosine, tie-break by neighbor id.

    At 100 TB stage 1 scans the 4x-compressed code table — partition
    the code table by ``cell`` and the probed-cell join prunes to
    ~nprobe/n_cells of it; the corpus itself is read only by the
    bounded broadcast-back in stage 2 (a plan property, pinned by
    ``tests/test_plans.py``). Stage 1 ranks on integers, so the whole
    funnel stays bit-exact-oracle-checkable."""
    # the query batch is bounded by contract and feeds TWO subtrees
    # (stage-0 encode/probe and the stage-2 rerank) — checkpoint it
    # lazily so its source is scanned once, not once per subtree
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec")) \
        .localCheckpoint(eager=False)
    qc = (q.crossJoin(F.broadcast(bounds))
          .select(query_id_col,
                  sq8_codes("__qvec", dims).alias("__qc"),
                  F.explode(probe_cells("__qvec", centroids, nprobe))
                  .alias("cell")))
    idx = codes
    if prune_cells:
        # qc feeds both the probed-cell collect below and the stage-1
        # broadcast join — checkpoint it (lazily; the collect
        # materializes it) so the bounded encode/probe subtree is
        # computed once, not once per consumer
        qc = qc.localCheckpoint(eager=False)
        # the probed-cell set is bounded by n_cells (model state, never
        # corpus-scaled), so collecting it turns the stage-1 restriction
        # into LITERAL filters the scan can push down — on a code table
        # partitioned by cell (save_index's production layout) this
        # prunes to ~nprobe/n_cells of the FILES, the read-path analogue
        # of partition pruning a 100 TB fact table
        probed = sorted(r["cell"] for r in
                        qc.select("cell").distinct().collect())
        if probed:  # no queries -> the qc join below is empty anyway
            idx = idx.filter(F.col("cell").isin(probed))
    if rebalance:
        idx = idx.repartition(rebalance)  # packed rows shuffle compact;
        # the unpack projection below runs post-shuffle
    idx = idx.select(F.col(id_col), F.col("cell"),
                     sq8_unpack_words(dims).alias("__c"))
    sq = F.aggregate(
        F.zip_with(F.col("__c"), F.col("__qc"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    scored = (idx.join(F.broadcast(qc), "cell")
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col),
                      F.col(id_col).alias("neighbor_id"),
                      sq.alias("sq_dist")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.asc("sq_dist"), F.asc("neighbor_id")],
                            shortlist) \
        .select(query_id_col, "neighbor_id", "sq_dist")
    if fetch_ids is not None:
        # the shortlist feeds BOTH the id collect and the rerank join —
        # checkpoint so stage 1 computes once, not once per consumer
        short = short.localCheckpoint(eager=False)
    c = _rerank_source(corpus, short, fetch_ids, id_col, vec_col)
    rr = _funnel_rerank(
        c,
        q.select(query_id_col, "__qvec",
                 l2_norm(F.col("__qvec")).alias("__qn")),
        short, "sq_dist", id_col, query_id_col)
    return _topk(rr, query_id_col, k)


def _rerank_source(corpus: DataFrame | None, short: DataFrame, fetch_ids,
                   id_col: str, vec_col: str) -> DataFrame:
    """Stage-2 vector source for the funnel rerank: the corpus SCAN by
    default, or a KEYED fetch when ``fetch_ids`` is given — the
    shortlist's distinct neighbor ids (bounded at n_queries × shortlist
    by contract, the probed-cell collect's cost class) are collected
    and handed to the callable, so a store-backed fetch
    (``read_where(..., [(id, "in", ids)])``) reads only the files that
    contain shortlist vectors instead of streaming the whole raw
    corpus through the broadcast join. Returns (id, __vec, __vn)."""
    if fetch_ids is not None:
        ids = sorted(r[0] for r in
                     short.select("neighbor_id").distinct().collect())
        src = fetch_ids(ids).localCheckpoint(eager=True)  # bounded
        # a fetch that comes back short would make the inner rerank
        # join DROP candidates silently — index/corpus drift (vectors
        # deleted from the corpus table but not the index) must fail
        # loudly, not skew top-k
        n_got = src.select(id_col).distinct().count()
        if n_got < len(ids):
            raise ValueError(
                f"fetch_ids returned vectors for {n_got} of {len(ids)} "
                f"shortlist ids — the corpus table is missing indexed "
                f"vectors (index/corpus drift); rebuild or "
                f"drop_from_index the missing ids")
    elif corpus is not None:
        src = corpus
    else:
        raise ValueError("search needs a corpus frame or fetch_ids")
    c = src.select(F.col(id_col), F.col(vec_col).alias("__vec"))
    return c.select(id_col, "__vec", l2_norm(F.col("__vec")).alias("__vn"))


def build_ivf_pq_codes(corpus: DataFrame,
                       centroids: list[tuple[int, list[float]]],
                       codebooks: list[list[list[float]]],
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """The BUILD side of a persisted IVF-PQ index (the ``ivf_pq`` kind
    in ``store.indexes``): one corpus scan emitting ``(vec_id, cell,
    packed code words)`` — cell routing via :func:`assign_cell` under
    the given coarse centroids, ``m`` byte codes via the Arrow-batched
    :func:`pq_encode_vectorized` (one numpy matmul per subspace per
    batch; the expression form's m×n_codes interpreted lambdas dominate
    a corpus-sized build), packed 4-per-bigint by the same
    :func:`sq8_pack_words` word discipline SQ8 codes use (PQ codes are
    bytes too: n_codes <= 256). At 100 TB the emitted table is the
    16-64x-compressed artifact every later search scans INSTEAD of the
    corpus — the economics rung below SQ8's 4x."""
    m = len(codebooks)
    coded = corpus.select(
        F.col(id_col),
        assign_cell(vec_col, centroids).alias("cell"),
        pq_encode_vectorized(codebooks)(F.col(vec_col)).alias("__code"))
    return coded.select(
        id_col, "cell",
        *[w.alias(f"w{j:02d}")
          for j, w in enumerate(sq8_pack_words("__code", m))])


def search_ivf_pq_index(codes: DataFrame,
                        centroids: list[tuple[int, list[float]]],
                        codebooks: list[list[list[float]]],
                        corpus: DataFrame, queries: DataFrame, k: int = 5,
                        nprobe: int = 2, shortlist: int = 25,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        query_id_col: str = "query_id",
                        prune_cells: bool = True,
                        fetch_ids=None,
                        rebalance: int | None = None) -> DataFrame:
    """The SEARCH side of a persisted IVF-PQ index — ADC over the
    persisted code table, raw vectors touched only for the shortlist
    rerank (the :func:`search_ivf_sq8_index` funnel with stage 1's
    integer L2 swapped for asymmetric-distance table lookups;
    ``fetch_ids`` swaps the rerank's corpus scan for a keyed fetch and
    ``rebalance`` round-robins the pruned candidates against hot-cell
    stragglers the same way — see that function's docstring).

    Stage 0 (bounded): each query builds its m×n_codes ADC tables
    (Arrow-batched) and probes its ``nprobe`` nearest cells. Stage 1
    (the only index-sized work): the code table, restricted to probed
    cells, scores each candidate as ``sum_s tabs[s][code_s]`` — m array
    lookups per row, raw vectors never appear. Stage 2: the established
    funnel rerank fetches full vectors for ``n_queries × shortlist``
    rows only, exact cosine, tie-break by neighbor id.

    ADC estimates are floats, so production recall is shortlist-floored
    (tested), while full-shortlist searches pass any estimate through
    and must equal brute force bit-for-bit — the e09 adjudication
    pattern, applied to the PERSISTED artifact by e21."""
    m = len(codebooks)
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec")) \
        .localCheckpoint(eager=False)
    qt = (q.select(query_id_col,
                   pq_adc_tables_vectorized(codebooks)(F.col("__qvec"))
                   .alias("__tabs"),
                   F.explode(probe_cells("__qvec", centroids, nprobe))
                   .alias("cell")))
    idx = codes
    if prune_cells:
        # bounded by n_cells; collected so the stage-1 restriction
        # becomes LITERAL partition filters on the code-table scan
        # (checkpoint first: qt also feeds the stage-1 broadcast join)
        qt = qt.localCheckpoint(eager=False)
        probed = sorted(r["cell"] for r in
                        qt.select("cell").distinct().collect())
        if probed:
            idx = idx.filter(F.col("cell").isin(probed))
    if rebalance:
        idx = idx.repartition(rebalance)
    idx = idx.select(F.col(id_col), F.col("cell"),
                     sq8_unpack_words(m).alias("__c"))
    est = F.aggregate(
        F.zip_with(F.col("__c"), F.col("__tabs"),
                   lambda code, tab: F.element_at(tab, code + 1)),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = (idx.join(F.broadcast(qt), "cell")
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col),
                      F.col(id_col).alias("neighbor_id"),
                      est.alias("__est")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.desc("__est"), F.asc("neighbor_id")],
                            shortlist) \
        .select(query_id_col, "neighbor_id")
    if fetch_ids is not None:
        short = short.localCheckpoint(eager=False)
    c = _rerank_source(corpus, short, fetch_ids, id_col, vec_col)
    rr = _funnel_rerank(
        c,
        q.select(query_id_col, "__qvec",
                 l2_norm(F.col("__qvec")).alias("__qn")),
        short.withColumn("__carried", F.lit(0)), "__carried",
        id_col, query_id_col).drop("__carried")
    return _topk(rr, query_id_col, k)


def knn_sq8(corpus: DataFrame, queries: DataFrame, k: int = 5,
            shortlist: int = 25, dims: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id",
            parallelism: int | None = None) -> DataFrame:
    """Two-stage KNN over scalar int8 quantization (the FAISS
    ``IndexScalarQuantizer(SQ8)`` recipe with symmetric distance):
    stage 1 ranks every candidate by the exact integer squared L2
    distance between uint8 code arrays (both sides quantized with the
    CORPUS's per-dimension bounds), stage 2 re-ranks the per-query
    ``shortlist`` with exact full-dimension cosine and returns the top
    ``k``.

    Same funnel scaffolding as :func:`knn_binary_hamming`, one rung up
    the compression ladder: 1 byte/dim instead of 1 bit/dim (64 B vs
    256 B float32 — a 4× smaller stage-1 projection that, unlike sign
    bits, preserves magnitude), candidate pairs carry only (query,
    neighbor, sq_dist) with ``sq_dist ≤ dims * 255² < 2^31``, and full
    vectors are re-fetched by broadcast-back for just
    ``n_queries × shortlist`` rows. Stage 1 is INTEGER-ranked, so the
    whole funnel is bit-exact-oracle-checkable; ties break by neighbor
    id in both stages.

    Plan shape at 100 TB: one bounds scan folding to a broadcast row,
    one code-projection scan (scan-side Catalyst arithmetic, no
    shuffle), the pair loop over codes only, and the established
    two-level shortlist window. Pre-materializing the code column next
    to the vectors (a writers.append of the projection) turns the
    stage-1 scan into a 4×-pruned column read.

    Returns (query_id, neighbor_id, sq_dist, score, rank) for the top-k.
    """
    c = spread(corpus.select(F.col(id_col), F.col(vec_col).alias("__vec")),
               parallelism)
    bounds = sq8_bounds(c, dims, vec_col="__vec")
    cc = (c.crossJoin(F.broadcast(bounds))
          .select(id_col, sq8_codes("__vec", dims).alias("__c")))
    q = queries.select(F.col(id_col).alias(query_id_col),
                       F.col(vec_col).alias("__qvec"))
    qc = (q.crossJoin(F.broadcast(bounds))
          .select(query_id_col, sq8_codes("__qvec", dims).alias("__qc")))
    sq = F.aggregate(
        F.zip_with(F.col("__c"), F.col("__qc"),
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    scored = (cc.crossJoin(F.broadcast(qc))
              .filter(F.col(id_col) != F.col(query_id_col))
              .select(F.col(query_id_col),
                      F.col(id_col).alias("neighbor_id"),
                      sq.alias("sq_dist")))
    short = _shortlist_topk(scored, query_id_col,
                            [F.asc("sq_dist"), F.asc("neighbor_id")],
                            shortlist) \
        .select(query_id_col, "neighbor_id", "sq_dist")
    rr = _funnel_rerank(
        c.select(id_col, "__vec", l2_norm(F.col("__vec")).alias("__vn")),
        q.select(query_id_col, "__qvec",
                 l2_norm(F.col("__qvec")).alias("__qn")),
        short, "sq_dist", id_col, query_id_col)
    return _topk(rr, query_id_col, k)


def knn_recall(exact: DataFrame, approx: DataFrame, method: str, k: int,
               query_id_col: str = "query_id",
               neighbor_col: str = "neighbor_id") -> DataFrame:
    """Recall@k of an ANN result set against the exact top-k — the
    standard retrieval-quality audit (what FAISS/ann-benchmarks report)
    run INSIDE the engine so an index rebuild ships with its own
    measured recall.

    Both inputs are per-query top-k pair sets (``n_queries × k`` rows —
    bounded by construction, never corpus-sized), so the audit is a
    broadcast-scale left join + one bounded aggregation regardless of
    corpus size: at 100 TB the expensive parts are the retrievals being
    audited, never the audit itself. ``n_hit`` counts exact neighbors
    the method recovered; ``recall_micro = (1e6 * n_hit) div k`` keeps
    the ratio in exact integers (k=5 divides 1e6 evenly; other k floor,
    documented) with the one closing divide producing the double.

    Returns (method, query_id, n_hit, recall_micro, recall)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    hit = (approx.select(query_id_col, neighbor_col)
           .withColumn("__hit", F.lit(1)))
    return (exact.select(query_id_col, neighbor_col)
            .join(hit, [query_id_col, neighbor_col], "left")
            .groupBy(query_id_col)
            .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                 .cast("bigint").alias("n_hit"))
            .select(F.lit(method).alias("method"), F.col(query_id_col),
                    F.col("n_hit"),
                    F.expr(f"(CAST(1000000 AS BIGINT) * n_hit) div {int(k)}")
                    .alias("recall_micro"))
            .withColumn("recall",
                        F.col("recall_micro").cast("double")
                        / F.lit(1000000.0)))

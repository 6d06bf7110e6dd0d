"""Embedding analytics added in round 4 (registry tail): nearest-centroid
classification as an oracle-checked confusion matrix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import multiset_diff_count
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


_E08_SQL = f"""
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


@register("e08_knn_ivf_fullprobe", _E08_SQL,
          doc="IVF at nprobe = n_clusters carries a FULL exact-KNN oracle "
              "(the brute-force SQL): probing every cell must reproduce "
              "exact top-5 bit-for-bit, so the whole IVF machinery - "
              "driver-trained coarse quantizer, cell assignment, probe "
              "routing, in-cell exact scoring, tie-break ranking - is "
              "oracle-adjudicated, not just recall-floor-tested; e04 "
              "remains the production nprobe<clusters shape",
          tags=("embeddings", "knn", "ann", "llm"))
def e08_knn_ivf_fullprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import knn_ivf

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_ivf(emb, queries, k=5, n_clusters=8, nprobe=8)
            .select("query_id", "neighbor_id", "score", "rank"))


_E09_SQL = _E08_SQL  # full-shortlist PQ must equal the same exact top-5


@register("e09_knn_pq_fullshortlist", _E09_SQL,
          doc="PQ search scaffold under the exact-KNN oracle: with the "
              "shortlist sized to the whole corpus (ceil(n/k)) the "
              "two-stage search - ADC candidate scoring, per-query "
              "shortlist window, exact-cosine re-rank join, tie-break "
              "top-k - must reproduce brute force bit-for-bit; ADC "
              "estimate ACCURACY stays recall-floor-tested (e05, "
              "test_embeddings_ivf.py) since a full shortlist passes any "
              "estimate through",
          tags=("embeddings", "knn", "ann", "pq", "llm"))
def e09_knn_pq_fullshortlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import knn_pq

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # one bounded driver scalar (same cost class as CDC bound resolution)
    # sizes the shortlist to cover every candidate at any sf
    n = emb.count()
    return (knn_pq(emb, queries, k=5, m=8, n_codes=16,
                   shortlist=math.ceil(n / 5))
            .select("query_id", "neighbor_id", "score", "rank"))


_E10_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
c AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT 8),
scored AS (
  SELECT v.vec_id, c.cid, {_dot('v.e', 'c.ce')} / {_norm('c.ce')} AS s
  FROM v CROSS JOIN c),
assigned AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rk
  FROM scored)
SELECT cid AS cell_id,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) FILTER (WHERE vec_id % 4 <> 0) AS BIGINT) AS n_base,
       CAST(count(*) FILTER (WHERE vec_id % 4 = 0) AS BIGINT) AS n_delta
FROM assigned WHERE rk = 1
GROUP BY cid
"""


@register("e10_incremental_ivf_maintenance", _E10_SQL,
          doc="O(delta) ANN index maintenance: base vectors are assigned "
              "to deterministic seed centroids and persisted as the IVF "
              "cell index; a later delta batch is assigned by scanning "
              "ONLY the delta (scan-side codegen argmax, no shuffle) and "
              "appended — the query proves the incrementally-maintained "
              "index equals a full rebuild row-for-row (check, not bare "
              "assert), and the per-cell occupancy is oracle-checked "
              "against an argmax-cosine recomputation in SQL",
          tags=("embeddings", "ann", "incremental", "store", "llm"))
def e10_incremental_ivf_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import assign_cell, seed_centroids
    from projectone_spark.queries import check
    from projectone_spark.session import scratch_dir
    from projectone_spark.store import TableStore

    emb = load(spark, sf_dir, "embeddings")
    cents = seed_centroids(emb, k=8)

    def assigned(df):
        return df.select("vec_id",
                         assign_cell("embedding", cents).alias("cell_id"))

    st = TableStore(scratch_dir(prefix="pos-ivfidx-"))
    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    st.overwrite(spark, assigned(base).withColumn("is_delta", F.lit(False)),
                 "ivf_index")
    st.append(spark, assigned(delta).withColumn("is_delta", F.lit(True)),
              "ivf_index")
    idx = st.read(spark, "ivf_index")

    # adjudicate: the maintained index must equal a from-scratch rebuild
    rebuild = assigned(emb).withColumnRenamed("cell_id", "want")
    n_bad = (idx.join(rebuild, "vec_id", "full")
             .filter(F.col("cell_id").isNull() | F.col("want").isNull()
                     | (F.col("cell_id") != F.col("want"))).count())
    check(n_bad == 0,
          f"incremental IVF index diverged from full rebuild: {n_bad} rows")

    return (idx.groupBy("cell_id")
            .agg(F.count(F.lit(1)).alias("n_vectors"),
                 F.sum(F.when(F.col("is_delta"), 0).otherwise(1))
                 .cast("bigint").alias("n_base"),
                 F.sum(F.when(F.col("is_delta"), 1).otherwise(0))
                 .cast("bigint").alias("n_delta")))


_E11_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
c AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id
      LIMIT (SELECT CAST(greatest(8, ceil(sqrt(count(*) / 2.0))) AS BIGINT)
             FROM embeddings)),
scored AS (
  SELECT v.vec_id, v.e, c.cid, {_dot('v.e', 'c.ce')} / {_norm('c.ce')} AS s
  FROM v CROSS JOIN c),
cells AS (
  SELECT vec_id, e, cid FROM (
    SELECT vec_id, e, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rk
    FROM scored) WHERE rk = 1),
best AS (
  SELECT a.vec_id,
         max({_dot('a.e', 'b.e')} / ({_norm('a.e')} * {_norm('b.e')}))
           AS raw_max
  FROM cells a JOIN cells b ON a.cid = b.cid AND b.vec_id < a.vec_id
  GROUP BY a.vec_id)
SELECT cells.vec_id, cells.cid AS cell_id,
       floor(best.raw_max * 1000000.0 + 0.5) / 1000000.0 AS max_sim,
       (best.raw_max IS NULL OR best.raw_max < 0.35) AS keep
FROM cells LEFT JOIN best ON cells.vec_id = best.vec_id
"""


@register("e11_semdedup_prune", _E11_SQL,
          doc="SemDeDup (Abbas et al. 2023): cluster-then-prune semantic "
              "dedup — a vector is pruned when a LOWER-id vector in the "
              "SAME cell is more similar than the threshold, with the "
              "full keep/prune labeling oracle-checked per vector. "
              "k = ceil(sqrt(n/2)) balances the two cost terms "
              "(assignment O(n·k) vs within-cell pairs O(n²/2k)) at "
              "O(n^1.5) total; assignment is the broadcast-join argmax "
              "(bit-identical to e10's literal scan-side path — "
              "unit-proven — and free of its per-k codegen compile "
              "cost), and the within-cell self-join is triangle-blocked "
              "on the ORDERED block pair so a hot cell spreads over "
              "blocks·(blocks+1)/2 reducer keys",
          tags=("embeddings", "dedup", "ann", "llm"))
def e11_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    import pyspark.sql.functions as F

    from projectone_spark.functions.dedup import triangle_self_join
    from projectone_spark.functions.embeddings import (
        assign_cell_join,
        dot,
        l2_norm,
        seed_centroids,
    )

    emb = load(spark, sf_dir, "embeddings")
    # balanced cell count (one bounded driver scalar, the e05/e09 cost
    # class): assignment costs n·k dots, within-cell pairs cost ~n²/2k —
    # k = sqrt(n/2) makes both O(n^1.5), the SemDeDup scaling contract
    n = emb.count()
    k = max(8, math.ceil(math.sqrt(n / 2.0)))
    cents = seed_centroids(emb, k=k)
    vecs = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"))
    # the literal scan-side argmax (e10's shape) pays a per-k Janino
    # compile that already exceeds the whole query at k=32; the
    # broadcast-join twin computes identical doubles with no compile
    assigned = assign_cell_join(vecs, cents, vec_col="e")
    cells = (vecs.join(assigned, "vec_id")
             .withColumn("__n", l2_norm(F.col("e")))  # norms once per
             .localCheckpoint(eager=False))  # SIDE, not per pair
    # each unordered within-cell pair is emitted exactly once and folds
    # into its HIGHER id's max (pruning is only ever by a lower id)
    cos = (dot(F.col("a.e"), F.col("b.e"))
           / (F.col("a.__n") * F.col("b.__n")))
    best = (triangle_self_join(cells, ["cell_id"], "vec_id", blocks=8)
            .select(F.greatest(F.col("a.vec_id"), F.col("b.vec_id"))
                    .alias("vec_id"), cos.alias("__cos"))
            .groupBy("vec_id").agg(F.max("__cos").alias("raw_max")))
    return (cells.select("vec_id", "cell_id")
            .join(best, "vec_id", "left")
            .select("vec_id", "cell_id",
                    # floor(x·1e6 + 0.5)/1e6 instead of round(x, 6): the
                    # raw cosine doubles are bit-identical across engines
                    # (same fixed-order IEEE ops), and this close is pure
                    # IEEE arithmetic too — no shortest-decimal-repr
                    # HALF_UP midpoint (the .xx5 tie class) to diverge on
                    (F.floor(F.col("raw_max") * 1_000_000.0 + 0.5)
                     / 1_000_000.0).alias("max_sim"),
                    (F.col("raw_max").isNull() | (F.col("raw_max") < 0.35))
                    .alias("keep")))


_E12_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
p AS (SELECT vec_id, e, list_slice(e, 1, 16) AS pe FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, pe AS qpe FROM p
      WHERE vec_id % 50 = 0),
s1 AS (
  SELECT q.query_id, p.vec_id AS neighbor_id, p.e AS e, q.qe AS qe,
         round({_dot('q.qpe', 'p.pe')}
               / ({_norm('q.qpe')} * {_norm('p.pe')}), 6) AS pscore
  FROM p CROSS JOIN q WHERE p.vec_id <> q.query_id),
sh AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY pscore DESC, neighbor_id) AS srank
  FROM s1),
rr AS (
  SELECT query_id, neighbor_id, pscore,
         round({_dot('qe', 'e')} / ({_norm('qe')} * {_norm('e')}), 6) AS score
  FROM sh WHERE srank <= 25),
rk AS (
  SELECT query_id, neighbor_id, pscore, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM rr)
SELECT query_id, neighbor_id, pscore, score, rank FROM rk WHERE rank <= 5
"""


@register("e12_knn_matryoshka", _E12_SQL,
          doc="Matryoshka funnel retrieval (Kusupati et al. 2022): "
              "stage-1 shortlist by cosine over the first 16 of 64 "
              "coordinates (quarter-FLOPs candidate generation, prefix-"
              "pruned reads), stage-2 exact full-dimension rerank of 25 "
              "candidates per query — both stages rank on the rounded "
              "score with id tie-break, so the whole funnel is bit-"
              "exact-oracle-checkable (no trained state to adjudicate)",
          tags=("embeddings", "knn", "ann"))
def e12_knn_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import knn_matryoshka

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_matryoshka(emb, queries, k=5, prefix_dims=16, shortlist=25)


def _sign_word_sql(vec: str, off: int) -> str:
    """DuckDB mirror of functions/embeddings.sign_words: one 32-bit word
    of sign bits starting at 0-based coordinate ``off``."""
    return (f"CAST(list_sum(list_transform(range(1, 33), i -> "
            f"CASE WHEN {vec}[{off} + i] > 0 THEN (1::BIGINT << (i - 1)) "
            f"ELSE 0 END)) AS BIGINT)")


def _ham_ctes(p: str = "", shortlist: int = 25) -> str:
    """CTE chain for the binary-Hamming funnel (e13; reused prefixed by
    the e17 recall audit). Assumes a ``v(vec_id, e)`` CTE is already in
    scope; emits ``{p}w``/``{p}q``/``{p}s1``/``{p}sh``/``{p}rr``/``{p}rk``
    with ``{p}rk`` carrying (query_id, neighbor_id, hamming, score,
    rank)."""
    return f"""{p}w AS (SELECT vec_id, e, {_sign_word_sql('e', 0)} AS w0,
             {_sign_word_sql('e', 32)} AS w1 FROM v),
{p}q AS (SELECT vec_id AS query_id, e AS qe, w0 AS q0, w1 AS q1 FROM {p}w
      WHERE vec_id % 50 = 0),
{p}s1 AS (
  SELECT {p}q.query_id, {p}w.vec_id AS neighbor_id, {p}w.e AS e,
         {p}q.qe AS qe,
         CAST(bit_count(xor({p}w.w0, {p}q.q0))
              + bit_count(xor({p}w.w1, {p}q.q1)) AS BIGINT) AS hamming
  FROM {p}w CROSS JOIN {p}q WHERE {p}w.vec_id <> {p}q.query_id),
{p}sh AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY hamming, neighbor_id) AS srank
  FROM {p}s1),
{p}rr AS (
  SELECT query_id, neighbor_id, hamming,
         round({_dot('qe', 'e')} / ({_norm('qe')} * {_norm('e')}), 6) AS score
  FROM {p}sh WHERE srank <= {shortlist}),
{p}rk AS (
  SELECT query_id, neighbor_id, hamming, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM {p}rr)"""


_E13_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
{_ham_ctes()}
SELECT query_id, neighbor_id, hamming, score, rank FROM rk WHERE rank <= 5
"""


@register("e13_knn_binary_hamming", _E13_SQL,
          doc="binary-quantized funnel retrieval: stage-1 shortlist by "
              "Hamming distance between packed sign-bit words (two "
              "XOR+popcounts per pair over a 16-byte projection — 16x "
              "smaller than the float vectors), stage-2 exact cosine "
              "rerank of 25 candidates per query; stage 1 ranks on exact "
              "integers, so the whole funnel is bit-exact-oracle-checked "
              "with no trained state",
          tags=("embeddings", "knn", "ann", "hamming"))
def e13_knn_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import knn_binary_hamming

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_binary_hamming(emb, queries, k=5, shortlist=25, dims=64)


def _e14_sql(k: int = 8, iters: int = 3) -> str:
    """Unrolled Lloyd oracle (the t12 unroll technique): one assign+mean
    CTE level per iteration, scores and means exactly as the Spark side
    computes them (sequential dot / |c|, ties to the lowest cell id,
    float32-exact double means)."""
    def assign(i: int, csrc: str) -> str:
        return f"""
a{i} AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cid AS cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_dot('v.e', 'c.ce')}
                                       / {_norm('c.ce')} DESC,
                                       c.cid) AS rk
    FROM v CROSS JOIN {csrc} c) WHERE rk = 1)"""
    parts = [f"""WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
c0 AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {k})"""]
    for i in range(1, iters + 1):
        parts.append("," + assign(i, f"c{i - 1}"))
        parts.append(f""",
m{i} AS (
  SELECT a{i}.cell AS cid, i, avg(v.e[i]) AS m
  FROM v JOIN a{i} USING (vec_id), unnest(range(1, len(v.e) + 1)) AS u(i)
  GROUP BY a{i}.cell, i),
c{i} AS (SELECT cid, list(m ORDER BY i) AS ce FROM m{i} GROUP BY cid)""")
    parts.append("," + assign(iters + 1, f"c{iters}"))
    parts.append(f"\nSELECT vec_id, cell AS cell_id FROM a{iters + 1}")
    return "".join(parts)


@register("e14_kmeans_lloyd", _e14_sql(),
          doc="Lloyd's k-means (3 refinement rounds, k=8) over the "
              "embedding corpus — the clustering step SemDeDup/IVF seed "
              "but production refines: per round ONE broadcast-join "
              "argmax assignment (centroids are bounded driver rows) "
              "and one (cell x dim)-key mean aggregate; float32-exact "
              "order-independent double means and sequential cosine "
              "folds make every per-vector assignment bit-adjudicable "
              "against an oracle that unrolls one assign+mean CTE "
              "level per iteration",
          tags=("embeddings", "clustering", "ann", "llm"))
def e14_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import kmeans_lloyd

    return kmeans_lloyd(load(spark, sf_dir, "embeddings"), k=8, iters=3)


def _sq8_ctes(p: str = "", dims: int = 64, shortlist: int = 25) -> str:
    """CTE chain for the SQ8 funnel (e16; reused prefixed by the e17
    recall audit): per-dim corpus min/max bounds -> integer codes ->
    integer squared-L2 stage-1 rank -> exact-cosine rerank of the
    shortlist. Assumes a ``v(vec_id, e)`` CTE is already in scope;
    ``{p}rk`` carries (query_id, neighbor_id, sq_dist, score, rank).
    Mirrors functions/embeddings.sq8_bounds/sq8_codes/knn_sq8 op-for-op
    (same IEEE double steps, same clamps, same tie-breaks)."""
    return f"""{p}b AS (SELECT i, min(e[i]) AS mn, max(e[i]) AS mx
      FROM v CROSS JOIN (SELECT unnest(range(1, {dims} + 1)) AS i) dd
      GROUP BY i),
{p}pc AS (SELECT v.vec_id, {p}b.i,
              CASE WHEN {p}b.mx > {p}b.mn
                   THEN CAST(least(255, greatest(0,
                        floor((v.e[{p}b.i] - {p}b.mn) * 255.0
                              / ({p}b.mx - {p}b.mn))))
                        AS INTEGER)
                   ELSE 0 END AS code
       FROM v CROSS JOIN {p}b),
{p}cd AS (SELECT vec_id, list(code ORDER BY i) AS c FROM {p}pc
          GROUP BY vec_id),
{p}w AS (SELECT v.vec_id, v.e, {p}cd.c FROM v JOIN {p}cd USING (vec_id)),
{p}q AS (SELECT vec_id AS query_id, e AS qe, c AS qc FROM {p}w
      WHERE vec_id % 50 = 0),
{p}s1 AS (
  SELECT {p}q.query_id, {p}w.vec_id AS neighbor_id, {p}w.e AS e,
         {p}q.qe AS qe,
         CAST(list_aggregate(list_transform(range(1, {dims} + 1),
              i -> ({p}w.c[i] - {p}q.qc[i]) * ({p}w.c[i] - {p}q.qc[i])),
              'sum') AS BIGINT) AS sq_dist
  FROM {p}w CROSS JOIN {p}q WHERE {p}w.vec_id <> {p}q.query_id),
{p}sh AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sq_dist, neighbor_id) AS srank
  FROM {p}s1),
{p}rr AS (
  SELECT query_id, neighbor_id, sq_dist,
         round({_dot('qe', 'e')} / ({_norm('qe')} * {_norm('e')}), 6) AS score
  FROM {p}sh WHERE srank <= {shortlist}),
{p}rk AS (
  SELECT query_id, neighbor_id, sq_dist, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM {p}rr)"""


_E16_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
{_sq8_ctes()}
SELECT query_id, neighbor_id, sq_dist, score, rank FROM rk WHERE rank <= 5
"""


@register("e16_knn_sq8", _E16_SQL,
          doc="scalar-int8-quantized funnel retrieval (the FAISS SQ8 "
              "recipe, symmetric distance): per-dim corpus min/max "
              "bounds fold to one broadcast row (the quantizer's entire "
              "trained state, exact order-independent aggregates), "
              "stage-1 shortlist by exact integer squared-L2 between "
              "1-byte-per-dim code arrays (4x smaller than float32 and "
              "magnitude-preserving where sign bits are not), stage-2 "
              "exact cosine rerank of 25 candidates per query; stage 1 "
              "ranks on integers, so the funnel is bit-exact-oracle-"
              "checked with no model artifact to adjudicate",
          tags=("embeddings", "knn", "ann", "quantization"))
def e16_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import knn_sq8

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_sq8(emb, queries, k=5, shortlist=25, dims=64)


_E17_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
xq AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
xs AS (
  SELECT xq.query_id, v.vec_id AS neighbor_id,
         round({_dot('xq.qe', 'v.e')} / ({_norm('xq.qe')} * {_norm('v.e')}),
               6) AS score
  FROM v CROSS JOIN xq WHERE v.vec_id <> xq.query_id),
xr AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM xs),
x5 AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= 5),
{_ham_ctes('h')},
{_sq8_ctes('s')},
mth AS (
  SELECT 'hamming' AS method, query_id, neighbor_id FROM hrk WHERE rank <= 5
  UNION ALL
  SELECT 'sq8' AS method, query_id, neighbor_id FROM srk WHERE rank <= 5),
mx AS (
  SELECT d.method, x5.query_id, x5.neighbor_id
  FROM x5 CROSS JOIN (SELECT unnest(['hamming', 'sq8']) AS method) d),
hit AS (
  SELECT mx.method, mx.query_id,
         CAST(count(mth.neighbor_id) AS BIGINT) AS n_hit
  FROM mx LEFT JOIN mth
    ON mx.method = mth.method AND mx.query_id = mth.query_id
   AND mx.neighbor_id = mth.neighbor_id
  GROUP BY mx.method, mx.query_id)
SELECT method, query_id, n_hit,
       CAST((1000000 * n_hit) // 5 AS BIGINT) AS recall_micro,
       CAST(CAST((1000000 * n_hit) // 5 AS BIGINT) AS DOUBLE) / 1000000
         AS recall
FROM hit
"""


@register("e17_ann_recall_audit", _E17_SQL,
          doc="recall@5 audit of both quantized funnels (binary-Hamming "
              "e13 and scalar-int8 e16) against the exact brute-force "
              "top-5 — the ann-benchmarks quality metric computed "
              "INSIDE the engine so an index choice ships with measured "
              "recall; the audit join runs over bounded n_queries x k "
              "pair sets (never corpus-sized) and the per-query recall "
              "is exact integer micro-units with one closing divide",
          tags=("embeddings", "knn", "ann", "evaluation"))
def e17_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        knn_bruteforce,
        knn_binary_hamming,
        knn_recall,
        knn_sq8,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # the exact scan is the audit's dominant cost and feeds BOTH union
    # branches — checkpoint it so lineage does not replay the corpus
    # cross-join per method
    exact = (knn_bruteforce(emb, queries, k=5)
             .select("query_id", "neighbor_id")
             .localCheckpoint(eager=True))
    ham = knn_binary_hamming(emb, queries, k=5, shortlist=25, dims=64)
    sq8 = knn_sq8(emb, queries, k=5, shortlist=25, dims=64)
    return (knn_recall(exact, ham, "hamming", k=5)
            .unionByName(knn_recall(exact, sq8, "sq8", k=5)))


_E18_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         round({_dot('q.qe', 'v.e')} / ({_norm('q.qe')} * {_norm('v.e')}),
               6) AS score
  FROM v CROSS JOIN q
  WHERE v.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 5
"""


@register("e18_persisted_ivf_search", _E18_SQL,
          doc="IVF search under a PERSISTED coarse quantizer — the "
              "f15 model lifecycle applied to the ANN index: ivf_train "
              "runs once and its centroids persist through save_model "
              "as the kind-stamped ivf_centroids store table; the "
              "search task loads them back (kind-validated, cell ids "
              "validated 0..k-1 by centroids_from_model) and probes "
              "with the LOADED model — its plan carries no training "
              "sample collect at all; the store round-trip is proven "
              "lossless in-query (loaded == trained bit-for-bit — "
              "parquet doubles are exact) and the full-probe search "
              "under the loaded quantizer carries the exact-KNN "
              "oracle (the e08 adjudication, now over persisted "
              "model state)",
          tags=("embeddings", "knn", "ann", "model"))
def e18_persisted_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import ivf_train, knn_ivf
    from projectone_spark.queries import check
    from projectone_spark.session import scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
        load_model,
        save_model,
    )

    emb = load(spark, sf_dir, "embeddings")
    store = TableStore(scratch_dir(prefix="po_e18_store_"))
    trained = ivf_train(emb, n_clusters=8)
    save_model(store, spark, "e18_quantizer", "ivf_centroids",
               centroids_to_frame(spark, trained),
               params={"n_clusters": 8, "metric": "cosine",
                       "trainer": "ivf_train"})
    frame, meta = load_model(store, spark, "e18_quantizer",
                             kind="ivf_centroids")
    loaded = centroids_from_model(frame)
    # the round-trip is the artifact under adjudication: one drifted
    # component would re-route cell assignments at nprobe < k, so the
    # gate demands bit-identity (parquet stores doubles exactly; a
    # bounded k x dims comparison, driver-side)
    check(loaded == trained,
          "persisted quantizer differs from the trained centroids")
    check(meta.get("params", {}).get("n_clusters") == 8,
          f"model params lost in the round-trip: {meta}")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_ivf(emb, queries, k=5, nprobe=8, centroids=loaded)
            .select("query_id", "neighbor_id", "score", "rank"))


# The PERSISTED-INDEX open-and-search lifecycle (e19): the whole funnel
# — seed-centroid cell routing, SQ8 bounds/codes, probed-cell stage 1
# on exact integers, cosine rerank — mirrored in SQL at the production
# shape (nprobe < n_cells, bounded shortlist), so the search FROM THE
# PERSISTED ARTIFACT is adjudicated bit-for-bit, not recall-floored.
_E19_NPROBE, _E19_CELLS, _E19_SHORTLIST = 2, 8, 25


def _e19_sql(train_where: str = "TRUE", corpus_where: str = "TRUE") -> str:
    """The full persisted-index funnel in SQL. ``train_where`` restricts
    the QUANTIZER's training corpus (``tv`` — centroid seeds and SQ8
    bounds) while cells/codes/search always cover every vector: exactly
    the streamed-maintenance shape where the quantizer trains once at t0
    and later deltas are encoded under the persisted parts (out-of-bound
    coordinates clamp, the sq8_codes contract). st17 reuses this with
    the base-corpus filter; e19 trains on everything.

    ``corpus_where`` restricts the INDEXED set — candidates, rerank
    vectors, and queries — while the quantizer still trains on
    everything: the re-curation shape (e20) where vectors are DROPPED
    from a standing index built before the purge."""
    return f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
tv AS (SELECT vec_id, e FROM v WHERE {train_where}),
c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
        AS cid, e AS ce
      FROM (SELECT vec_id, e FROM tv ORDER BY vec_id LIMIT {_E19_CELLS})),
{_e19_funnel_ctes(corpus_where)}
SELECT query_id, neighbor_id, sq_dist, score, rank FROM rk WHERE rank <= 5
"""


def _e19_funnel_ctes(corpus_where: str = "TRUE") -> str:
    """The IVF-SQ8 funnel CTE chain (cell routing → SQ8 bounds/codes →
    probed-cell integer stage 1 → cosine rerank → ``rk``), assuming
    ``v(vec_id, e)``, ``tv`` (the quantizer's training corpus) and
    ``c(cid, ce)`` (the coarse centroids) are already in scope. Shared
    by the e19/e20/st17 funnel oracles (through :func:`_e19_sql`), the
    retrained-quantizer funnel (e23 — same funnel under kmeans-refined
    centroids) and the persisted-artifact recall audit (e24 — the
    funnel's ``rk`` joined against exact brute force)."""
    return f"""asg AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid) AS rk
  FROM (SELECT v.vec_id, c.cid, {_dot('v.e', 'c.ce')} / {_norm('c.ce')} AS s
        FROM v CROSS JOIN c)),
cells AS (SELECT vec_id, cid AS cell FROM asg WHERE rk = 1),
b AS (SELECT i, min(e[i]) AS mn, max(e[i]) AS mx
      FROM tv CROSS JOIN (SELECT unnest(range(1, 65)) AS i) dd GROUP BY i),
pc AS (SELECT v.vec_id, b.i,
              CASE WHEN b.mx > b.mn
                   THEN CAST(least(255, greatest(0,
                        floor((v.e[b.i] - b.mn) * 255.0 / (b.mx - b.mn))))
                        AS INTEGER)
                   ELSE 0 END AS code
       FROM v CROSS JOIN b),
cd AS (SELECT vec_id, list(code ORDER BY i) AS c FROM pc GROUP BY vec_id),
w AS (SELECT v.vec_id, v.e, cd.c, cells.cell
      FROM v JOIN cd USING (vec_id) JOIN cells USING (vec_id)
      WHERE {corpus_where}),
q AS (SELECT vec_id AS query_id, e AS qe, c AS qc
      FROM v JOIN cd USING (vec_id)
      WHERE vec_id % 50 = 0 AND ({corpus_where})),
qp AS (SELECT query_id, cid AS cell FROM (
         SELECT q.query_id, c.cid,
                row_number() OVER (PARTITION BY q.query_id
                                   ORDER BY {_dot('q.qe', 'c.ce')}
                                            / {_norm('c.ce')} DESC,
                                            c.cid) AS prk
         FROM q CROSS JOIN c) WHERE prk <= {_E19_NPROBE}),
s1 AS (
  SELECT qp.query_id, w.vec_id AS neighbor_id, w.e AS e, q.qe AS qe,
         CAST(list_aggregate(list_transform(range(1, 65),
              i -> (w.c[i] - q.qc[i]) * (w.c[i] - q.qc[i])), 'sum')
              AS BIGINT) AS sq_dist
  FROM w JOIN qp ON w.cell = qp.cell
  JOIN q ON q.query_id = qp.query_id
  WHERE w.vec_id <> qp.query_id),
sh AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                    ORDER BY sq_dist, neighbor_id) AS srank
       FROM s1),
rr AS (SELECT query_id, neighbor_id, sq_dist,
              round({_dot('qe', 'e')} / ({_norm('qe')} * {_norm('e')}), 6)
                AS score
       FROM sh WHERE srank <= {_E19_SHORTLIST}),
rk AS (SELECT query_id, neighbor_id, sq_dist, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY score DESC, neighbor_id) AS rank
       FROM rr)"""


_E19_SQL = _e19_sql()


@register("e19_index_open_and_search", _E19_SQL,
          doc="persisted-INDEX lifecycle — save_index/open-and-search, "
              "the production cold read path at 100 TB (the index is "
              "the 4x-compressed artifact a search scans INSTEAD of "
              "the corpus): task A builds the full IVF-SQ8 index in "
              "one corpus scan (seed-centroid cell routing + SQ8 "
              "codes packed 4-per-bigint) and persists it via "
              "save_index — code table stamped with its kind/params/"
              "part names, centroids and bounds as kind-stamped model "
              "parts bound to the index by name; task B OPENS the "
              "index cold (stamp, kind, part-pairing and code columns "
              "all validated) and answers KNN from the persisted "
              "artifact alone: queries encode against the loaded "
              "bounds and probe 2 of 8 cells under the loaded "
              "centroids, stage 1 ranks probed-cell candidates by "
              "exact integer squared-L2 over UNPACKED persisted "
              "codes (raw vectors untouched — a plan test pins that "
              "the only embeddings scans are the query input and the "
              "bounded rerank fetch), stage 2 reranks 25/query with "
              "exact cosine; the oracle mirrors the ENTIRE funnel at "
              "this production shape bit-for-bit",
          tags=("embeddings", "knn", "ann", "quantization", "model",
                "pipeline", "dag"))
def e19_index_open_and_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.queries import check
    from projectone_spark.queries.corpus7 import _curation_task_builder
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.task.dag import PipelineRunner, TaskNode

    configure(spark)
    root = scratch_dir(prefix="po_e19_store_")
    state = scratch_dir(prefix="po_e19_state_")
    task = _curation_task_builder(spark, root, state)
    emb_in = {"name": "emb", "path": f"{sf_dir}/embeddings.parquet",
              "source": "parquet"}

    t_build = task("e19_build", f"""
        import pyspark.sql.functions as F
        from projectone_spark.functions.embeddings import (
            build_ivf_sq8_codes, seed_centroids, sq8_bounds)
        from projectone_spark.store import TableStore
        from projectone_spark.store.indexes import save_index
        from projectone_spark.store.models import centroids_to_frame
        def build_stage(emb):
            spark = emb.sparkSession
            store = TableStore({root!r})
            # deterministic seeding (the e10 discipline) keeps the
            # whole index SQL-adjudicable; swap ivf_train for
            # production balance, nothing downstream changes
            seeds = seed_centroids(emb, k={_E19_CELLS})
            cents = [(i, comps) for i, (_, comps) in enumerate(seeds)]
            bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)
            codes = build_ivf_sq8_codes(emb, cents, bounds, dims=64)
            save_index(store, spark, "e19_index", "ivf_sq8", codes,
                       parts={{"centroids": centroids_to_frame(
                                   spark, [c for _, c in cents]),
                              "bounds": bounds}},
                       params={{"dims": 64, "n_cells": {_E19_CELLS},
                               "metric": "cosine",
                               "seeding": "seed_centroids"}},
                       partition_by=["cell"])  # the production layout:
            # probed-cell literals prune the search to ~nprobe/n_cells
            # of the code table's FILES
            return (codes.groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n_vectors")))
    """, "build_stage", [emb_in], "e19_build_summary")

    t_search = task("e19_search", f"""
        import pyspark.sql.functions as F
        from projectone_spark.functions.embeddings import (
            search_ivf_sq8_index)
        from projectone_spark.store import TableStore
        from projectone_spark.store.indexes import open_index
        from projectone_spark.store.models import centroids_from_model
        def search_stage(emb):
            spark = emb.sparkSession
            store = TableStore({root!r})
            idx = open_index(store, spark, "e19_index", kind="ivf_sq8")
            cents = [(i, c) for i, c in enumerate(
                centroids_from_model(idx.parts["centroids"]))]
            # bounded one-row model state, pinned driver-side so the
            # per-query broadcast does not re-read the store table
            bounds = idx.parts["bounds"].localCheckpoint(eager=True)
            queries = emb.filter(F.col("vec_id") % 50 == 0)
            return search_ivf_sq8_index(
                idx.codes, cents, bounds, emb, queries, k=5,
                nprobe={_E19_NPROBE}, shortlist={_E19_SHORTLIST},
                dims=int(idx.params["dims"]))
    """, "search_stage", [emb_in], "e19_knn")

    runs = PipelineRunner(spark).run([
        TaskNode("e19_build", t_build.config),
        TaskNode("e19_search", t_search.config, depends_on=["e19_build"]),
    ])
    bad = {n: r.error for n, r in runs.items() if r.status != "SUCCESS"}
    check(not bad, f"e19 DAG tasks failed: {bad}")

    store = TableStore(root)
    out = (store.read(spark, "e19_knn")
           .select("query_id", "neighbor_id", "sq_dist", "score", "rank")
           .localCheckpoint(eager=True))  # the checks below and the
    # returned frame share one read of the search output
    # lifecycle sanity: the index opens cold AFTER the DAG too, and
    # its summary accounts for every indexed vector exactly once
    from projectone_spark.store.indexes import open_index

    idx = open_index(store, spark, "e19_index", kind="ivf_sq8")
    n_codes = idx.codes.count()
    n_sum = (store.read(spark, "e19_build_summary")
             .agg(F.sum("n_vectors").cast("bigint").alias("n")).first()["n"])
    check(n_codes == n_sum,
          f"index/summary disagree: {n_codes} codes vs {n_sum} summed")
    per_q = (out.groupBy("query_id").count()
             .agg(F.max("count").alias("mx")).first()["mx"])
    check(per_q is not None and per_q <= 5,
          f"top-k contract violated: {per_q} rows for one query")
    return out


# The re-curation flow (e20): the LLM-pipeline loop ends with REMOVAL —
# a dedup/decontamination pass condemns vectors and the standing index
# must shed them without a full rebuild. The oracle is the e19 funnel
# with the quantizer trained on EVERYTHING (it predates the purge) and
# the indexed set — candidates, rerank vectors, queries — restricted to
# the survivors.
_E20_SQL = _e19_sql(corpus_where="vec_id % 4 <> 0")


@register("e20_index_drop_maintenance", _E20_SQL,
          doc="index maintenance under DELETE — the re-curation flow: "
              "the full IVF-SQ8 index persists via save_index (quantizer "
              "trained on everything), a decontamination pass then "
              "condemns a quarter of the ids and drop_from_index sheds "
              "them in ONE validated copy-on-write DELETE — the stamp "
              "re-published through the delete's own atomic commit "
              "(plain DML would strip it by design), cost proportional "
              "to files touched on the cell-partitioned layout; the "
              "maintained artifact is then OPENED COLD, proven equal to "
              "a from-scratch rebuild over the surviving corpus under "
              "the same persisted parts, and searched (no condemned id "
              "can surface — they are gone from stage 1's scan, not "
              "filtered at query time); the oracle mirrors the funnel "
              "with an everything-trained quantizer over survivors "
              "bit-for-bit",
          tags=("embeddings", "knn", "ann", "quantization", "model",
                "store", "dml"))
def e20_index_drop_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        search_ivf_sq8_index,
        seed_centroids,
        sq8_bounds,
    )
    from projectone_spark.queries import check
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import (
        code_word_columns,
        drop_from_index,
        open_index,
        save_index,
    )
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
    )

    configure(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = TableStore(scratch_dir(prefix="po_e20_store_"))

    # t0: the index predates the purge — quantizer and codes cover
    # EVERYTHING (one corpus scan, the e19 build)
    seeds = seed_centroids(emb, k=_E19_CELLS)
    cents = [(i, c) for i, (_, c) in enumerate(seeds)]
    bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)
    save_index(store, spark, "e20_index", "ivf_sq8",
               build_ivf_sq8_codes(emb, cents, bounds, dims=64),
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents]),
                      "bounds": bounds},
               params={"dims": 64, "n_cells": _E19_CELLS,
                       "seeding": "seed_centroids"},
               partition_by=["cell"])

    # t1: the re-curation pass condemns ids — delivered as a FRAME
    # (what a d06-d16 dedup/decontamination output looks like at
    # 100 TB: corpus-scaled, never collected); the drop runs as an
    # anti-join MERGE delete with source-key-range file pruning, the
    # stamp re-published through the same commit
    condemned = emb.filter(F.col("vec_id") % 4 == 0).select("vec_id")
    v = drop_from_index(store, spark, "e20_index", ids=condemned)
    check(v is not None, "drop_from_index pruned everything — the "
                         "condemned ids never reached the index?")

    # t2: cold open of the MAINTAINED artifact (stamp survived the
    # validated delete) and the rebuild-equality proof
    idx = open_index(store, spark, "e20_index", kind="ivf_sq8")
    loaded_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    loaded_bounds = idx.parts["bounds"].localCheckpoint(eager=True)
    survivors = emb.filter(F.col("vec_id") % 4 != 0)
    word_cols = (["vec_id", "cell"]
                 + code_word_columns(idx.kind, idx.params))
    acc = idx.codes.select(*word_cols).localCheckpoint(eager=True)
    rebuild = build_ivf_sq8_codes(
        survivors, loaded_cents, loaded_bounds,
        dims=int(idx.params["dims"])).select(*word_cols)
    diff = multiset_diff_count(acc, rebuild)
    check(diff == 0,
          f"maintained index diverges from survivor rebuild by {diff} rows")

    queries = survivors.filter(F.col("vec_id") % 50 == 0)
    return search_ivf_sq8_index(
        acc, loaded_cents, loaded_bounds, survivors, queries, k=5,
        nprobe=_E19_NPROBE, shortlist=_E19_SHORTLIST,
        dims=int(idx.params["dims"]))


# The persisted PQ index (e21): the 16-64x artifact. PQ codebooks are
# trained driver-side (numpy Lloyd over a bounded sample — not
# SQL-derivable), so the adjudication uses the e09 pattern: at full
# probe + full shortlist every ADC estimate passes through and the
# search from the PERSISTED artifact must equal exact brute force
# bit-for-bit; ADC estimate ACCURACY stays recall-floor-tested
# (test_indexes, test_embeddings_ivf) and the production pruned shape
# is plan-pinned (test_plans).
_E21_SQL = _E08_SQL


@register("e21_persisted_pq_search", _E21_SQL,
          doc="persisted IVF-PQ index lifecycle — save_index/open/"
              "search for the ivf_pq kind: one corpus scan builds "
              "(vec_id, cell, m byte codes packed 4-per-bigint) under "
              "driver-trained codebooks (numpy Lloyd per subspace, "
              "Arrow-batched encode) and persists codes + centroids + "
              "codebooks as one stamped artifact; the index is OPENED "
              "COLD (kind, part pairing, code columns validated; "
              "loaded codebooks proven bit-identical to the trained "
              "ones), queries build m x n_codes ADC tables and stage 1 "
              "ranks candidates by table lookups over UNPACKED "
              "persisted codes; at full probe + full shortlist the "
              "funnel must reproduce exact brute-force top-5 "
              "bit-for-bit (the e09 adjudication applied to the "
              "persisted artifact; production pruned shape is "
              "plan-pinned)",
          tags=("embeddings", "knn", "ann", "pq", "quantization",
                "model", "store"))
def e21_persisted_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_pq_codes,
        pq_train,
        search_ivf_pq_index,
        seed_centroids,
    )
    from projectone_spark.queries import check
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import open_index, save_index
    from projectone_spark.store.models import (
        centroids_from_model,
        codebooks_from_model,
        codebooks_to_frame,
        centroids_to_frame,
    )

    configure(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = TableStore(scratch_dir(prefix="po_e21_store_"))

    seeds = seed_centroids(emb, k=_E19_CELLS)
    cents = [(i, c) for i, (_, c) in enumerate(seeds)]
    books = pq_train(emb, m=8, n_codes=16)
    save_index(store, spark, "e21_index", "ivf_pq",
               build_ivf_pq_codes(emb, cents, books),
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents]),
                      "codebooks": codebooks_to_frame(spark, books)},
               params={"dims": 64, "m": 8, "n_codes": 16,
                       "n_cells": _E19_CELLS,
                       "seeding": "seed_centroids"},
               partition_by=["cell"])

    idx = open_index(store, spark, "e21_index", kind="ivf_pq")
    loaded_books = codebooks_from_model(idx.parts["codebooks"])
    check(loaded_books == books,
          "persisted codebooks differ from the trained ones")
    loaded_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # full probe + full shortlist: every candidate survives stage 1, so
    # the persisted-artifact funnel must equal exact brute force (one
    # bounded driver scalar sizes the shortlist, the e09 discipline)
    n = emb.count()
    return search_ivf_pq_index(
        idx.codes, loaded_cents, loaded_books, emb, queries, k=5,
        nprobe=int(idx.params["n_cells"]), shortlist=n)


# Pinned search under concurrent rebuild (e22): f16's version-pinning
# contract lifted to the whole index artifact. The oracle is e19's —
# the v0 artifact's funnel — which the pinned search must keep
# reproducing bit-for-bit AFTER a rebuild with a DIFFERENT quantizer
# publishes v0+1 over the same table names.
_E22_SQL = _E19_SQL


@register("e22_pinned_index_search", _E22_SQL,
          doc="version-pinned index open under a concurrent rebuild: "
              "save_index publishes v0 (8-cell quantizer, the e19 "
              "artifact), a REBUILD then overwrites codes AND parts "
              "with a 4-cell quantizer under the same names; "
              "open_index(version=v0) pins the code table via time "
              "travel and each part via the part_versions the stamp "
              "recorded at save time, so the pinned search reproduces "
              "the HISTORICAL artifact's funnel bit-for-bit (the e19 "
              "oracle) while the live open sees the new quantizer — "
              "verified in-query (live params differ, pinned params "
              "match v0); the f16 model-refresh contract lifted to the "
              "whole persisted artifact",
          tags=("embeddings", "knn", "ann", "quantization", "model",
                "store", "versioning"))
def e22_pinned_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        search_ivf_sq8_index,
        seed_centroids,
        sq8_bounds,
    )
    from projectone_spark.queries import check
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import open_index, save_index
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
    )

    configure(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = TableStore(scratch_dir(prefix="po_e22_store_"))

    # both publishes quantize over the same corpus, so the bounds scan
    # (the one full-corpus fold) runs once and both saves reuse the row
    shared_bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)

    def publish(k: int) -> int:
        seeds = seed_centroids(emb, k=k)
        cents = [(i, c) for i, (_, c) in enumerate(seeds)]
        bounds = shared_bounds
        return save_index(
            store, spark, "e22_index", "ivf_sq8",
            build_ivf_sq8_codes(emb, cents, bounds, dims=64),
            parts={"centroids": centroids_to_frame(
                       spark, [c for _, c in cents]),
                   "bounds": bounds},
            params={"dims": 64, "n_cells": k,
                    "seeding": "seed_centroids"},
            partition_by=["cell"])

    v0 = publish(_E19_CELLS)   # the artifact under adjudication
    publish(_E19_CELLS // 2)   # the concurrent rebuild: different
    # quantizer, same table names — what an unpinned reader now sees

    live = open_index(store, spark, "e22_index", kind="ivf_sq8")
    check(int(live.params["n_cells"]) == _E19_CELLS // 2,
          f"live open should see the rebuild: {live.params}")
    pinned = open_index(store, spark, "e22_index", kind="ivf_sq8",
                        version=v0)
    check(int(pinned.params["n_cells"]) == _E19_CELLS,
          f"pinned open lost v0's params: {pinned.params}")
    cents = [(i, c) for i, c in enumerate(
        centroids_from_model(pinned.parts["centroids"]))]
    check(len(cents) == _E19_CELLS,
          "pinned parts must be v0's 8-cell quantizer")
    bounds = pinned.parts["bounds"].localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return search_ivf_sq8_index(
        pinned.codes, cents, bounds, emb, queries, k=5,
        nprobe=_E19_NPROBE, shortlist=_E19_SHORTLIST,
        dims=int(pinned.params["dims"]))

"""Round-12 index-lifecycle queries: the quantizer RETRAIN-and-swap
(e23 — the last lifecycle verb: the r11 skew probe's own guidance is
"retrain when occupancy skew is structural", and this adjudicates doing
so) and the persisted-artifact recall audit (e24 — e17's ANN quality
metric lifted to the cold-opened production artifacts).

Reference parity: the reference's whole refresh contract is
deterministic rerun-and-swap (SURVEY §2.4 — `core/features/cdc.py`
recomputes derived state and republishes it atomically); e23 applies
that contract to the index's trained state, and f16/e22 are the
version-pinning precedents it extends."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import multiset_diff_count, values_frame
from projectone_spark.queries import load, register
from projectone_spark.queries._embed_sql import _E_DBL, _dot, _norm
from projectone_spark.queries.embeddings2 import (
    _E19_CELLS,
    _E19_NPROBE,
    _E19_SHORTLIST,
    _e19_funnel_ctes,
)

_E23_K, _E23_ITERS = 8, 3


def _e23_sql(k: int = _E23_K, iters: int = _E23_ITERS) -> str:
    """The retrained-quantizer funnel over the DRIFTED corpus: vectors
    with ``vec_id % 5 < 2`` are component-wise ``abs()``-folded into
    the positive orthant (a dense post-drift cluster; ``abs`` on a
    float32 value is float-exact, so every downstream mean stays
    order-independent — the e14 exactness discipline). The e14 kmeans
    unroll (one assign+mean CTE level per Lloyd iteration, seeds = k
    lowest-id vectors of the drifted corpus) produces the converged
    centroids ``kc{iters}``, which are re-indexed to the dense 0..k-1
    cell space (``row_number`` over cid — exactly the Spark side's
    enumerate-after-sort) and drive the e19 funnel unchanged.
    Everything the swapped-in artifact computes — retrained routing,
    SQ8 codes, probed-cell integer stage 1, cosine rerank — is
    mirrored bit-for-bit."""
    def assign(i: int, csrc: str) -> str:
        return f"""
ka{i} AS (
  SELECT vec_id, cell FROM (
    SELECT v.vec_id, c.cid AS cell,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {_dot('v.e', 'c.ce')}
                                       / {_norm('c.ce')} DESC,
                                       c.cid) AS rk
    FROM v CROSS JOIN {csrc} c) WHERE rk = 1)"""
    parts = [f"""
WITH v AS (SELECT vec_id,
                  CASE WHEN vec_id % 5 < 2
                       THEN list_transform(embedding,
                                           x -> abs(CAST(x AS DOUBLE)))
                       ELSE {_E_DBL} END AS e
           FROM embeddings),
tv AS (SELECT vec_id, e FROM v WHERE TRUE),
kc0 AS (SELECT vec_id AS cid, e AS ce FROM v ORDER BY vec_id LIMIT {k})"""]
    for i in range(1, iters + 1):
        parts.append("," + assign(i, f"kc{i - 1}"))
        parts.append(f""",
km{i} AS (
  SELECT ka{i}.cell AS cid, i, avg(v.e[i]) AS m
  FROM v JOIN ka{i} USING (vec_id), unnest(range(1, len(v.e) + 1)) AS u(i)
  GROUP BY ka{i}.cell, i),
kc{i} AS (SELECT cid, list(m ORDER BY i) AS ce FROM km{i} GROUP BY cid)""")
    parts.append(f""",
c AS (SELECT CAST(row_number() OVER (ORDER BY cid) - 1 AS INTEGER) AS cid,
             ce
      FROM kc{iters}),
{_e19_funnel_ctes("TRUE")}
SELECT query_id, neighbor_id, sq_dist, score, rank FROM rk WHERE rank <= 5
""")
    return "".join(parts)


_E23_SQL = _e23_sql()


@register("e23_quantizer_retrain_swap", _E23_SQL,
          doc="quantizer RETRAIN-and-swap — the index lifecycle's last "
              "verb, run against a genuinely DRIFTED corpus (40% of "
              "vectors abs()-folded into a dense positive-orthant "
              "cluster the t0 quantizer never saw; abs on float32 is "
              "float-exact so every adjudicated mean stays order-"
              "independent): v0 persists under centroids seeded from "
              "the PRE-drift region only, index_stats reads the "
              "resulting hot-cell skew signal from the manifest's own "
              "file stats (no data scan — the retrain trigger, "
              "checked >= 1.5x the uniform share), the refreshed "
              "quantizer trains on the current corpus with "
              "kmeans_lloyd_centroids (3 Lloyd rounds), the rebuilt "
              "index publishes as v0+1 over the same names while the "
              "version-pinned open keeps answering v0's funnel — "
              "proven in-query, the pinned search equals the pre-swap "
              "capture row-for-row — the cutover artifact's persisted "
              "parts round-trip bit-identically, routing FIDELITY "
              "(mean assignment cosine, the quantity Lloyd refines) "
              "must improve by a wide margin, and the pinned "
              "occupancy profile stays readable after the swap; the "
              "returned search runs under the swapped-in artifact "
              "against an oracle that mirrors the drift, unrolls the "
              "kmeans refinement, and replays the whole funnel under "
              "the converged centroids",
          tags=("embeddings", "knn", "ann", "clustering", "quantization",
                "model", "store", "versioning"))
def e23_quantizer_retrain_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        dot,
        kmeans_lloyd_centroids,
        l2_norm,
        search_ivf_sq8_index,
        seed_centroids,
        sq8_bounds,
    )
    from projectone_spark.queries import check
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import (
        index_stats,
        open_index,
        save_index,
    )
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
    )

    configure(spark)
    raw = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the drifted corpus: a dense post-drift cluster (abs folds 40% of
    # vectors into the positive orthant — float-exact, so downstream
    # means keep the e14 order-independence) that the t0 quantizer
    # never trained on
    emb = (raw.select(
        "vec_id",
        F.when(F.col("vec_id") % 5 < 2,
               F.transform("embedding", lambda x: F.abs(x.cast("double"))))
         .otherwise(F.transform("embedding", lambda x: x.cast("double")))
         .alias("embedding"))
        .localCheckpoint(eager=False))  # feeds builds, searches, both
    # fidelity folds and the retrain — one scan, many consumers
    store = TableStore(scratch_dir(prefix="po_e23_store_"))

    # both quantizers encode under the same corpus bounds: the ONE
    # full-corpus fold runs once and every publish reuses the row
    bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)

    def publish(cents: list, seeding: str) -> int:
        return save_index(
            store, spark, "e23_index", "ivf_sq8",
            build_ivf_sq8_codes(emb, cents, bounds, dims=64),
            parts={"centroids": centroids_to_frame(
                       spark, [c for _, c in cents]),
                   "bounds": bounds},
            params={"dims": 64, "n_cells": len(cents), "seeding": seeding},
            partition_by=["cell"])

    def routing_fidelity(cents: list) -> float:
        """Mean over the corpus of cos(v, nearest centroid) — the
        quantization-fidelity number the retrain must move. Bounded
        model state broadcast onto one corpus scan."""
        rows = [(int(cid), c, sum(x * x for x in c) ** 0.5)
                for cid, c in cents]
        cdf = values_frame(spark, rows,
                           "cid long, ce array<double>, cn double")
        s = (dot(F.col("embedding"), F.col("ce"))
             / (F.col("cn") * l2_norm(F.col("embedding"))))
        return float(
            emb.crossJoin(F.broadcast(cdf))
            .groupBy("vec_id").agg(F.max(s).alias("best"))
            .agg(F.avg("best").alias("f")).first()["f"])

    # t0: the standing artifact — quantizer seeded from the PRE-drift
    # region only (trained before the drifted cohort arrived), codes
    # over the full current corpus (the e20 "index predates the purge"
    # shape, for arrival instead of removal)
    cents0 = [(i, c) for i, (_, c) in enumerate(
        seed_centroids(emb.filter(F.col("vec_id") % 5 >= 2), k=_E23_K))]
    v0 = publish(cents0, "seed_centroids")

    # the retrain DECISION input: per-cell occupancy from the
    # manifest's own file stats — files, not rows; no data scan. The
    # drifted cluster hot-spots one t0 cell well past the uniform
    # share: that is the structural-skew signal the r11 probe said to
    # answer with a retrain, not query-time rebalance=
    occ0 = {r["cell"]: int(r["occupancy_micro"])
            for r in index_stats(store, spark, "e23_index").collect()}
    check(occ0 and max(occ0.values()) * 2 * _E23_K >= 3 * 1_000_000,
          lambda: f"no skew signal at v0 — max occupancy "
                  f"{max(occ0.values(), default=0)} micro-units is "
                  f"below 1.5x the uniform {1_000_000 // _E23_K}")

    # the pre-swap answer a pinned reader must keep reproducing
    # (bounded: n_queries x k rows, captured once)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    s0 = search_ivf_sq8_index(
        open_index(store, spark, "e23_index", kind="ivf_sq8").codes,
        cents0, bounds, emb, queries, k=5, nprobe=_E19_NPROBE,
        shortlist=_E19_SHORTLIST, dims=64).localCheckpoint(eager=True)

    # RETRAIN on the current (drifted) corpus: Lloyd refinement
    # (bounded trained state, the e14 adjudication), re-indexed to the
    # dense cell space the layout partitions on
    # (kmeans_lloyd_centroids projects/pins its own double view — a
    # second bounded-lifetime corpus copy next to emb's; at retrain
    # scale production would train on a sample anyway)
    refined = kmeans_lloyd_centroids(emb, k=_E23_K, iters=_E23_ITERS)
    cents1 = [(i, comps) for i, (_, comps) in enumerate(refined)]

    # SWAP: the rebuilt index publishes v0+1 over the same table names
    v1 = publish(cents1, "kmeans_lloyd")
    check(v1 == v0 + 1, f"retrain publish did not advance: {v0} -> {v1}")

    # the pinned reader survives the cutover (e22's contract): v0's
    # codes AND v0's part contents, bit-for-bit
    pinned = open_index(store, spark, "e23_index", kind="ivf_sq8",
                        version=v0)
    check(pinned.params["seeding"] == "seed_centroids",
          f"pinned open lost v0's params: {pinned.params}")
    pinned_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(pinned.parts["centroids"]))]
    check(pinned_cents == cents0,
          "pinned parts are not v0's quantizer bit-for-bit")
    s_pinned = search_ivf_sq8_index(
        pinned.codes, pinned_cents,
        pinned.parts["bounds"].localCheckpoint(eager=True),
        emb, queries, k=5, nprobe=_E19_NPROBE,
        shortlist=_E19_SHORTLIST, dims=64)
    moved = multiset_diff_count(s_pinned, s0)
    check(moved == 0,
          f"pinned search diverged from the pre-swap answer by {moved} rows")

    # the cutover artifact: live open sees the retrained quantizer and
    # its persisted parts round-trip bit-identically — so the v1 codes
    # ARE a from-scratch build under the loaded parts (the e18/e21
    # round-trip discipline)
    live = open_index(store, spark, "e23_index", kind="ivf_sq8")
    check(live.params["seeding"] == "kmeans_lloyd",
          f"live open should see the retrain: {live.params}")
    live_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(live.parts["centroids"]))]
    check(live_cents == cents1,
          "persisted retrained quantizer differs from the trained one")
    live_bounds = live.parts["bounds"].localCheckpoint(eager=True)

    # the retrain must have HELPED at the quantity Lloyd refines:
    # routing fidelity (mean assignment cosine) jumps ~0.19 -> ~0.45
    # on this corpus; the 0.05 margin is ~5 orders above double-mean
    # noise. (Occupancy BALANCE is deliberately not asserted: k-means
    # optimizes fidelity, and a genuinely dense cluster may correctly
    # stay one cell — the honest finding recorded in PLANS.md r12;
    # balance needs capacity or balanced variants, and the occupancy
    # profile above is exactly the observability that tells you which.)
    f0, f1 = routing_fidelity(cents0), routing_fidelity(live_cents)
    check(f1 > f0 + 0.05,
          f"retrain did not improve routing fidelity: {f0:.6f} -> {f1:.6f}")
    # and the historical profile stays pinned: stats at v0 still
    # describe the OLD layout after the swap
    occ0_again = {r["cell"]: int(r["occupancy_micro"])
                  for r in index_stats(store, spark, "e23_index",
                                       version=v0).collect()}
    check(occ0_again == occ0,
          "version-pinned index_stats no longer reproduces v0's profile")

    return search_ivf_sq8_index(
        live.codes, live_cents, live_bounds, emb, queries, k=5,
        nprobe=_E19_NPROBE, shortlist=_E19_SHORTLIST,
        dims=int(live.params["dims"]))


# The persisted-artifact recall audit (e24): e17 audits the IN-QUERY
# funnels; production searches run from COLD-OPENED artifacts, so the
# quality metric must be measured there. The ivf_sq8 production shape
# (nprobe < n_cells, bounded shortlist) is fully SQL-mirrorable (the
# e19 funnel), so its per-query recall carries an exact oracle; the
# ivf_pq funnel ranks on ADC estimates under numpy-trained codebooks
# (not cross-engine derivable), so its oracle row is the full-probe
# full-shortlist identity (== exact brute force, the e21 proof) and
# the PRODUCTION pq shape is floor-checked in-query instead.
_E24_SQL = f"""
WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
tv AS (SELECT vec_id, e FROM v WHERE TRUE),
c AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER)
        AS cid, e AS ce
      FROM (SELECT vec_id, e FROM tv ORDER BY vec_id LIMIT {_E19_CELLS})),
{_e19_funnel_ctes("TRUE")},
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
mth AS (
  SELECT 'ivf_sq8' AS method, query_id, neighbor_id FROM rk WHERE rank <= 5
  UNION ALL
  SELECT 'ivf_pq_full' AS method, query_id, neighbor_id FROM x5),
mx AS (
  SELECT d.method, x5.query_id, x5.neighbor_id
  FROM x5 CROSS JOIN (SELECT unnest(['ivf_pq_full', 'ivf_sq8']) AS method) d),
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


@register("e24_persisted_index_recall_audit", _E24_SQL,
          doc="recall@5 audit at the ARTIFACT level — e17's ANN quality "
              "metric over the cold-opened persisted indexes, where "
              "production searches actually run: both kinds persist "
              "via save_index and reopen cold (stamp/kind/part-pairing "
              "validated), then (a) the ivf_sq8 artifact's PRODUCTION "
              "funnel (nprobe 2/8, shortlist 25) is audited per-query "
              "against exact brute force under an exact-oracle mirror "
              "of the whole funnel, (b) the ivf_pq artifact at full "
              "probe + full shortlist must reproduce brute force "
              "exactly (recall == 1.0 per query, the e21 identity as "
              "an audit row), and (c) the ivf_pq PRODUCTION shape "
              "(nprobe 3/4, shortlist corpus-scaled at ceil(n/10) "
              "min 50 — a fixed shortlist shrinks as a corpus "
              "fraction and recall with it) — whose ADC ranks on "
              "numpy-trained codebooks no external engine can derive "
              "— is floor-checked in-query (avg recall >= 0.5, the "
              "broken-funnel detector); recall stays exact integer "
              "micro-units with one closing divide",
          tags=("embeddings", "knn", "ann", "quantization", "model",
                "store", "evaluation"))
def e24_persisted_index_recall_audit(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_pq_codes,
        build_ivf_sq8_codes,
        knn_bruteforce,
        knn_recall,
        pq_train,
        search_ivf_pq_index,
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
        codebooks_from_model,
        codebooks_to_frame,
    )

    configure(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = TableStore(scratch_dir(prefix="po_e24_store_"))

    # artifact 1: the ivf_sq8 production index (the e19 build)
    cents8 = [(i, c) for i, (_, c)
              in enumerate(seed_centroids(emb, k=_E19_CELLS))]
    bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)
    save_index(store, spark, "e24_sq8", "ivf_sq8",
               build_ivf_sq8_codes(emb, cents8, bounds, dims=64),
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents8]),
                      "bounds": bounds},
               params={"dims": 64, "n_cells": _E19_CELLS,
                       "seeding": "seed_centroids"},
               partition_by=["cell"])

    # artifact 2: the ivf_pq index (the test_indexes recall-floor
    # build: 4 coarse cells, m=8 subspaces x 16 codes)
    cents4 = [(i, c) for i, (_, c) in enumerate(seed_centroids(emb, k=4))]
    books = pq_train(emb, m=8, n_codes=16)
    save_index(store, spark, "e24_pq", "ivf_pq",
               build_ivf_pq_codes(emb, cents4, books),
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents4]),
                      "codebooks": codebooks_to_frame(spark, books)},
               params={"dims": 64, "m": 8, "n_codes": 16, "n_cells": 4,
                       "seeding": "seed_centroids"},
               partition_by=["cell"])

    queries = emb.filter(F.col("vec_id") % 50 == 0)
    # ground truth feeds every audit branch — one corpus cross-join,
    # checkpointed (the e17 discipline)
    exact = (knn_bruteforce(emb, queries, k=5)
             .select("query_id", "neighbor_id")
             .localCheckpoint(eager=True))

    sq8_idx = open_index(store, spark, "e24_sq8", kind="ivf_sq8")
    sq8_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(sq8_idx.parts["centroids"]))]
    sq8_res = search_ivf_sq8_index(
        sq8_idx.codes, sq8_cents,
        sq8_idx.parts["bounds"].localCheckpoint(eager=True),
        emb, queries, k=5, nprobe=_E19_NPROBE, shortlist=_E19_SHORTLIST,
        dims=int(sq8_idx.params["dims"]))

    pq_idx = open_index(store, spark, "e24_pq", kind="ivf_pq")
    pq_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(pq_idx.parts["centroids"]))]
    pq_books = codebooks_from_model(pq_idx.parts["codebooks"])
    n = emb.count()  # one bounded driver scalar sizes the full shortlist
    pq_full = search_ivf_pq_index(
        pq_idx.codes, pq_cents, pq_books, emb, queries, k=5,
        nprobe=int(pq_idx.params["n_cells"]), shortlist=n)
    # the production pq shape: measurable, not oracle-mirrorable —
    # floor-checked here (the test_indexes:~510 floor, now
    # driver-adjudicated: a broken ADC/unpack/funnel reads ~0). The
    # shortlist scales with the corpus (ceil(n/10), floored at 50) the
    # way production sizes it to a recall target — a FIXED shortlist
    # shrinks as a corpus fraction and the measured recall with it
    # (0.68 at n=500, 0.45 at n=2000 with shortlist=50; 0.72 scaled)
    import math

    pq_prod = search_ivf_pq_index(
        pq_idx.codes, pq_cents, pq_books, emb, queries, k=5,
        nprobe=3, shortlist=max(50, math.ceil(n / 10)))
    rec = (knn_recall(exact, pq_prod, "ivf_pq", k=5)
           .agg(F.avg("recall").alias("r")).first()["r"])
    check(rec is not None and rec >= 0.5,
          f"persisted-PQ production-shape recall collapsed: {rec}")

    return (knn_recall(exact, sq8_res, "ivf_sq8", k=5)
            .unionByName(knn_recall(exact, pq_full, "ivf_pq_full", k=5)))


# The keyed-fetch serving shape (e25): the r11 probe's measured online
# win (stage-2 rerank as a keyed store read instead of a full corpus
# scan, 1.9x CPU at 3 queries) was pytest-proven bit-identical but
# never driver-adjudicated. The oracle is exactly the e19 funnel: a
# keyed fetch that silently dropped or duplicated shortlist vectors
# would diverge from it.
from projectone_spark.queries.embeddings2 import _E19_SQL as _E25_SQL


@register("e25_keyed_fetch_search", _E25_SQL,
          doc="persisted-index search with a KEYED rerank fetch — the "
              "online serving shape at 100 TB: the corpus persists as "
              "an id-range-clustered store table with per-file vec_id "
              "stats, the ivf_sq8 artifact opens cold, and stage 2 "
              "fetches ONLY the bounded shortlist id set through "
              "read_where's file skipping (fetch_ids) instead of "
              "streaming the whole raw corpus through the rerank join "
              "— the r11 probe's 1.9x online win, now under the "
              "bit-exact e19 funnel oracle (a fetch that dropped "
              "candidates or re-read stale vectors would diverge); "
              "in-query: the fetched id set is proven bounded by "
              "n_queries x shortlist and index/corpus drift fails "
              "loudly (tested) rather than skewing top-k",
          tags=("embeddings", "knn", "ann", "quantization", "model",
                "store", "serving"))
def e25_keyed_fetch_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        seed_centroids,
        search_ivf_sq8_index,
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
    from projectone_spark.store.skipping import read_where

    configure(spark)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store = TableStore(scratch_dir(prefix="po_e25_store_"))

    # the serving corpus: id-range-clustered files with per-file vec_id
    # stats — the layout that makes a keyed fetch read only the files
    # containing shortlist vectors (and, per the r12 drop probe, the
    # same layout that makes id-scoped re-curation prunable)
    store.overwrite(spark, emb.repartitionByRange(8, "vec_id"),
                    "e25_corpus", stats_columns=["vec_id"])

    cents = [(i, c) for i, (_, c)
             in enumerate(seed_centroids(emb, k=_E19_CELLS))]
    bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)
    save_index(store, spark, "e25_index", "ivf_sq8",
               build_ivf_sq8_codes(emb, cents, bounds, dims=64),
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents]),
                      "bounds": bounds},
               params={"dims": 64, "n_cells": _E19_CELLS,
                       "seeding": "seed_centroids"},
               partition_by=["cell"])

    idx = open_index(store, spark, "e25_index", kind="ivf_sq8")
    loaded_cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    loaded_bounds = idx.parts["bounds"].localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    n_queries = queries.count()  # bounded driver scalar, sizes the check

    fetched: list = []

    def fetch(ids):
        fetched.append(list(ids))
        return read_where(store, spark, "e25_corpus",
                          [("vec_id", "in", list(ids))]) \
            .select("vec_id", "embedding")

    out = search_ivf_sq8_index(
        idx.codes, loaded_cents, loaded_bounds, None, queries, k=5,
        nprobe=_E19_NPROBE, shortlist=_E19_SHORTLIST,
        dims=int(idx.params["dims"]), fetch_ids=fetch)
    # the fetch contract: invoked exactly once with a DISTINCT id set
    # bounded by n_queries x shortlist (the probed-cell collect's cost
    # class — never corpus-scaled)
    check(len(fetched) == 1, f"fetch_ids invoked {len(fetched)} times")
    ids = fetched[0]
    check(0 < len(ids) <= n_queries * _E19_SHORTLIST,
          f"shortlist id set out of contract: {len(ids)} ids for "
          f"{n_queries} queries")
    # (id distinctness is structural — _rerank_source collects the
    # shortlist through .distinct() — so it is not re-asserted here;
    # what the ORACLE adjudicates is the fetch's CONTENT: dropped,
    # stale, or re-read-differently vectors diverge from the funnel)
    return out

"""r11 probe B — skewed-cell behavior of the index search (verdict
item 8).

Corpus: 2M vectors × 64 dims where ~30% sit in ONE tight cluster (the
hot centroid) and the rest spread over 15 others — the worst
occupancy skew a 16-cell index plausibly sees. Every query probes the
hot cell (it is everyone's nearest-or-second centroid by
construction? no — we FORCE it by drawing half the queries from the
hot cluster). Measured, per stage-1 scan of the search: per-task max
vs median runtime (the straggler ratio), total CPU, spill — skewed
corpus vs a balanced control of the SAME size, same plan.

Hypothesis under test: stage 1 is a broadcast-hash join on top of a
size-split file scan, so cell-occupancy skew does NOT concentrate in
one task the way a shuffle-keyed join would — tasks are bounded by
split bytes, and the hot cell's extra output rows distribute over its
(many) splits. If the data says otherwise, build-time sub-splitting
of hot cells is the fix; either way the number gets recorded.

Run:  python tools/probe_r11_skew.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIMS = 64
K = 16


def gen(spark, path: str, skewed: bool):
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    import pandas as pd

    def make(batches):
        for pdf in batches:
            part = int(pdf["pid"].iloc[0])
            rng = np.random.RandomState(2000 + part)
            ids = pdf["id"].to_numpy()
            centers = rng_centers()
            if skewed:
                # ~30% hot cluster 0, rest uniform over 1..15
                hot = rng.random(len(ids)) < 0.30
                cl = np.where(hot, 0, rng.randint(1, K, len(ids)))
            else:
                cl = rng.randint(0, K, len(ids))
            X = (centers[cl]
                 + 0.15 * rng.standard_normal((len(ids), DIMS))
                 ).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    df = (spark.range(N).repartition(32)
          .withColumn("pid", F.spark_partition_id())
          .mapInPandas(make, "vec_id long, embedding array<float>"))
    df.write.mode("overwrite").parquet(path)


def rng_centers() -> np.ndarray:
    r = np.random.RandomState(7)
    C = r.standard_normal((K, DIMS))
    return C / np.linalg.norm(C, axis=1, keepdims=True) * 4.0


def run_case(spark, label: str, path: str) -> dict:
    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        search_ivf_sq8_index,
        sq8_bounds,
    )
    from projectone_spark.observability import stage_metrics
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import open_index, save_index
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
    )

    sc = spark.sparkContext
    emb = spark.read.parquet(path)
    store = TableStore(path + "_store")
    if not store.exists("idx"):
        # the true cluster centers as the coarse quantizer: occupancy
        # mirrors the generated skew exactly
        cents = [(i, [float(x) for x in c]) for i, c in
                 enumerate(rng_centers())]
        bounds = sq8_bounds(emb, dims=DIMS).localCheckpoint(eager=True)
        save_index(store, spark, "idx", "ivf_sq8",
                   build_ivf_sq8_codes(emb, cents, bounds, dims=DIMS,
                                       route="vectorized"),
                   parts={"centroids": centroids_to_frame(
                              spark, [c for _, c in cents]),
                          "bounds": bounds},
                   params={"dims": DIMS, "n_cells": K},
                   partition_by=["cell"])
    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    occ = {int(r["cell"]): int(r["n"]) for r in
           idx.codes.groupBy("cell").agg(F.count("*").alias("n")).collect()}
    cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    bounds = idx.parts["bounds"].localCheckpoint(eager=True)
    # half the queries from the hot cluster -> the hot cell is probed
    # by most queries
    queries = emb.filter(F.col("vec_id") % (N // 100) == 1) \
        .localCheckpoint(eager=True)

    tag = f"search_{label}"
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    out = search_ivf_sq8_index(idx.codes, cents, bounds, emb, queries,
                               k=5, nprobe=2, shortlist=25, dims=DIMS)
    n = out.count()
    wall = time.perf_counter() - t0
    sc.setLocalProperty("spark.jobGroup.id", None)
    st = stage_metrics(spark, group=tag)
    # straggler ratio from the per-stage task-time shape: the stage
    # with the largest input is stage 1's codes scan+join
    s1 = max(st, key=lambda s: s["inputBytes"])
    return {
        "case": label, "rows": n, "wall_s": round(wall, 1),
        "cpu_s": round(sum(s["executorCpuTime"] for s in st) / 1e9, 1),
        "spill_mb": round(sum(s["memoryBytesSpilled"] +
                              s["diskBytesSpilled"] for s in st) / 1e6, 1),
        "occupancy_max_pct": round(100 * max(occ.values()) /
                                   sum(occ.values()), 1),
        "s1_num_tasks": s1["numTasks"],
        "s1_run_ms": s1["executorRunTime"],
        "s1_input_mb": round(s1["inputBytes"] / 1e6, 1),
    }


def main() -> None:
    from projectone_spark.session import get_spark

    spark = get_spark("probe-r11-skew")
    gen(spark, "/tmp/amp_r11_skewed", skewed=True)
    gen(spark, "/tmp/amp_r11_balanced", skewed=False)
    for label, path in (("skewed", "/tmp/amp_r11_skewed"),
                        ("balanced", "/tmp/amp_r11_balanced")):
        print(json.dumps(run_case(spark, label, path)), flush=True)


if __name__ == "__main__":
    main()

"""r11 probe A — probed-cell pruning at honest scale (verdict item 7).

Shape: the e19/st17 search over a 4M-vector × 64-dim corpus indexed
into 64 cells (route="vectorized" build — the large-k production
path), 100 query vectors, nprobe ∈ {2, 4, 8}, shortlist 25. For each
nprobe the SAME search runs pruned (prune_cells=True → literal cell
partition filters on the codes scan) and unpruned, in fresh job
groups, recording from the engine's own stage_metrics: aggregate
executor CPU, input bytes, and wall. Files-read is counted directly:
parquet files under probed cell partitions vs total.

Run:  python tools/probe_r11_prune.py [n_vectors] [n_cells]
Writes one JSON line per measurement to stdout; summary at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
DIMS = 64
CORPUS = f"/tmp/amp_r11_vecs_{N // 1_000_000}m"
STORE = f"/tmp/amp_r11_store_{N // 1_000_000}m_{K}c"


def gen_corpus(spark):
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    import pandas as pd

    def make(batches):
        for pdf in batches:
            part = int(pdf["pid"].iloc[0])
            rng = np.random.RandomState(1000 + part)
            ids = pdf["id"].to_numpy()
            X = rng.standard_normal((len(ids), DIMS)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": list(X)})

    df = (spark.range(N).repartition(64)
          .withColumn("pid", F.spark_partition_id())
          .mapInPandas(make, "vec_id long, embedding array<float>"))
    df.write.mode("overwrite").parquet(CORPUS)


def main() -> None:
    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        search_ivf_sq8_index,
        sq8_bounds,
    )
    from projectone_spark.observability import stage_metrics
    from projectone_spark.session import get_spark
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import open_index, save_index
    from projectone_spark.store.models import (
        centroids_from_model,
        centroids_to_frame,
    )

    spark = get_spark("probe-r11-prune")
    sc = spark.sparkContext
    gen_corpus(spark)
    emb = spark.read.parquet(CORPUS)
    store = TableStore(STORE)

    if not store.exists("idx"):
        t0 = time.perf_counter()
        sc.setJobGroup("build", "build")
        # deterministic k-means-- seeding: K spread sample vectors
        sample = (emb.filter(F.col("vec_id") % (N // K) == 0)
                  .orderBy("vec_id").limit(K).collect())
        cents = [(i, [float(x) for x in r["embedding"]])
                 for i, r in enumerate(sample)]
        bounds = sq8_bounds(emb, dims=DIMS).localCheckpoint(eager=True)
        save_index(store, spark, "idx", "ivf_sq8",
                   build_ivf_sq8_codes(emb, cents, bounds, dims=DIMS,
                                       route="vectorized"),
                   parts={"centroids": centroids_to_frame(
                              spark, [c for _, c in cents]),
                          "bounds": bounds},
                   params={"dims": DIMS, "n_cells": K},
                   partition_by=["cell"])
        st = stage_metrics(spark, group="build")
        print(json.dumps({
            "phase": "build", "wall_s": round(time.perf_counter() - t0, 1),
            "cpu_s": round(sum(s["executorCpuTime"] for s in st) / 1e9, 1),
            "spill_mb": round(sum(s["memoryBytesSpilled"] +
                                  s["diskBytesSpilled"] for s in st) / 1e6, 1),
        }), flush=True)

    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    bounds = idx.parts["bounds"].localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") % (N // 100) == 1) \
        .localCheckpoint(eager=True)
    nq = queries.count()

    # file accounting straight from the persisted layout
    m = store.manifest("idx")
    all_files = []
    for d in m["dirs"]:
        for dp, _, fs in os.walk(d):
            all_files += [os.path.join(dp, f) for f in fs
                          if f.endswith(".parquet")]

    results = []
    for nprobe in (2, 4, 8):
        for pruned in (True, False):
            tag = f"search_np{nprobe}_{'p' if pruned else 'u'}"
            sc.setJobGroup(tag, tag)
            t0 = time.perf_counter()
            out = search_ivf_sq8_index(
                idx.codes, cents, bounds, emb, queries, k=5,
                nprobe=nprobe, shortlist=25, dims=DIMS,
                prune_cells=pruned)
            n = out.count()
            wall = time.perf_counter() - t0
            sc.setLocalProperty("spark.jobGroup.id", None)
            st = stage_metrics(spark, group=tag)
            row = {
                "phase": tag, "nprobe": nprobe, "pruned": pruned,
                "rows": n, "n_queries": nq,
                "wall_s": round(wall, 1),
                "cpu_s": round(sum(s["executorCpuTime"]
                                   for s in st) / 1e9, 1),
                "input_mb": round(sum(s["inputBytes"]
                                      for s in st) / 1e6, 1),
                "spill_mb": round(sum(s["memoryBytesSpilled"] +
                                      s["diskBytesSpilled"]
                                      for s in st) / 1e6, 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    # files under probed cells for nprobe=2 (partition-path arithmetic)
    from projectone_spark.functions.embeddings import probe_cells
    probed2 = sorted({c for r in queries.select(
        F.explode(probe_cells(F.col("embedding"), cents, 2)).alias("c"))
        .distinct().collect() for c in [r["c"]]})
    probed_files = [f for f in all_files
                    if any(f"cell={c}/" in f or f"cell={c}{os.sep}" in f
                           for c in probed2)]
    print(json.dumps({
        "phase": "files", "total_files": len(all_files),
        "probed_cells_np2": len(probed2),
        "files_in_probed_cells_np2": len(probed_files),
        "n_cells": K}), flush=True)


if __name__ == "__main__":
    main()

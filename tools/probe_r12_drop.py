"""r12 probe — drop_from_index at index scale (r11 verdict item 5).

Shape: the 4M-vector × 64-cell ivf_sq8 artifact (the r11 prune-probe
scale), id-ORDERED corpus writes (contiguous spark.range partitions, so
code files inherit tight per-file vec_id ranges — the layout a
production corpus scan order gives you). Two condemned-set variants,
~1% of ids each, delivered as frames (the e20 ids shape):

- ``clustered``: one contiguous id range (what an expire-by-ingest-id
  or purge-one-source re-curation emits) — should rewrite only the
  files whose recorded key range overlaps, hard-linking the rest;
- ``scattered``: every 100th id (what a content-dedup pass emits) —
  bounds cover the whole id space, so pruning is provably vacuous and
  the drop rewrites ~every file. The honest asymmetry to record, plus
  its mitigation (cell-scoped predicates when the condemned set maps
  to cells; otherwise accept the rewrite and schedule it with OPTIMIZE).

Each variant builds a fresh artifact (a drop mutates it), measures the
drop's wall/CPU (stage_metrics job group), and counts rewritten vs
hard-linked files by inode identity against the pre-drop file set.

Run:  python tools/probe_r12_drop.py [n_vectors] [n_cells]
One JSON line per measurement; findings go to PLANS.md.
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
CORPUS = f"/tmp/amp_r12_vecs_{N // 1_000_000}m_ordered"


def gen_corpus(spark):
    """Id-ordered corpus: contiguous ranges per partition (NO round-robin
    repartition — the r11 generator's repartition(64) scatters ids
    across every file, which makes per-file key ranges vacuous and
    id-range pruning impossible by construction)."""
    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    import pandas as pd

    def make(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(1000 + int(ids[0] % 997))
            X = rng.standard_normal((len(ids), DIMS)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    (spark.range(0, N, 1, 64)
     .mapInPandas(make, "vec_id long, embedding array<float>")
     .write.mode("overwrite").parquet(CORPUS))


def files_with_inodes(store, name):
    m = store.manifest(name)
    out = {}
    for d in m["dirs"]:
        for dp, _, fs in os.walk(d):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    out[p] = os.stat(p).st_ino
    return out


def main() -> None:
    from projectone_spark.functions.embeddings import (
        build_ivf_sq8_codes,
        sq8_bounds,
    )
    from projectone_spark.observability import stage_metrics
    from projectone_spark.session import get_spark
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import (
        drop_from_index,
        index_stats,
        open_index,
        save_index,
    )
    from projectone_spark.store.models import centroids_to_frame

    spark = get_spark("probe-r12-drop")
    sc = spark.sparkContext
    gen_corpus(spark)
    emb = spark.read.parquet(CORPUS)

    clustered = emb.filter(
        (F.col("vec_id") >= N // 2)
        & (F.col("vec_id") < N // 2 + N // 100)).select("vec_id")
    scattered = emb.filter(F.col("vec_id") % 100 == 37).select("vec_id")
    # variant -> (condemned frame, range-sort the build?, strip stats?)
    variants = {
        # the shipped default: scan-order layout, vec_id stats recorded
        "clustered": (clustered, False, False),
        "scattered": (scattered, False, False),
        # the pre-r12 CONTROL: same drop with the per-file key stats
        # stripped from the manifest — what every ids-shaped drop paid
        # before save_index declared stats_columns
        "clustered_nostats": (clustered, False, True),
        # the layout-guidance variant: the build range-partitions codes
        # by vec_id before the write, so every (task, cell) file gets a
        # TIGHT id range (scan-order layouts inherit FilePartition
        # bin-packing, which unions non-adjacent corpus chunks into one
        # task and widens per-file ranges)
        "clustered_rangesorted": (clustered, True, False),
    }

    for variant, (condemned, rangesort, strip) in variants.items():
        root = f"/tmp/amp_r12_drop_{variant}_{N // 1_000_000}m"
        # the measured drop MUTATES the artifact, so a cached store from
        # a previous run would time a drop whose condemned ids are
        # already gone (rows_dropped=0) — unlike the r11 read-only
        # probes, every run must rebuild fresh
        if os.path.exists(root):
            import shutil

            shutil.rmtree(root)
        store = TableStore(root)
        if not store.exists("idx"):
            t0 = time.perf_counter()
            sample = (emb.filter(F.col("vec_id") % (N // K) == 0)
                      .orderBy("vec_id").limit(K).collect())
            cents = [(i, [float(x) for x in r["embedding"]])
                     for i, r in enumerate(sample)]
            bounds = sq8_bounds(emb, dims=DIMS).localCheckpoint(eager=True)
            codes = build_ivf_sq8_codes(emb, cents, bounds, dims=DIMS,
                                        route="vectorized")
            if rangesort:
                codes = codes.repartitionByRange(32, "vec_id")
            save_index(store, spark, "idx", "ivf_sq8", codes,
                       parts={"centroids": centroids_to_frame(
                                  spark, [c for _, c in cents]),
                              "bounds": bounds},
                       params={"dims": DIMS, "n_cells": K},
                       partition_by=["cell"])
            if strip:
                def _strip(man):
                    man["stats_columns"] = []
                    for f in man.get("files") or []:
                        f["min"], f["max"] = {}, {}
                store.amend_manifest("idx", _strip)
            print(json.dumps({
                "phase": f"build_{variant}",
                "wall_s": round(time.perf_counter() - t0, 1)}), flush=True)

        before = files_with_inodes(store, "idx")
        n_before = open_index(store, spark, "idx").codes.count()
        tag = f"drop_{variant}"
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        v = drop_from_index(store, spark, "idx", ids=condemned)
        wall = time.perf_counter() - t0
        sc.setLocalProperty("spark.jobGroup.id", None)
        st = stage_metrics(spark, group=tag)
        after = files_with_inodes(store, "idx")
        before_inodes = set(before.values())
        linked = sum(1 for ino in after.values() if ino in before_inodes)
        idx = open_index(store, spark, "idx")  # stamp survived
        n_after = idx.codes.count()
        prof = index_stats(store, spark, "idx")  # stats stay readable
        print(json.dumps({
            "phase": tag, "version": v,
            "wall_s": round(wall, 1),
            "cpu_s": round(sum(s["executorCpuTime"] for s in st) / 1e9, 1),
            "input_mb": round(sum(s["inputBytes"] for s in st) / 1e6, 1),
            "files_before": len(before), "files_after": len(after),
            "files_hard_linked": linked,
            "files_rewritten": len(after) - linked,
            "rows_dropped": n_before - n_after,
            "cells_after": prof.count(),
        }), flush=True)


if __name__ == "__main__":
    main()

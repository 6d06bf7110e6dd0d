"""r11 probe A2 — pruning + keyed rerank fetch at 4M × 64 cells, by
query-batch size.

Probe A1 (probe_r11_prune.py) found that a 100-query UNIFORM batch at
nprobe=2 collectively probes 63/64 cells — cell pruning is vacuous for
large diverse offline batches (which amortize a full index scan
anyway). The per-query claim matters for the ONLINE shape: small or
clustered batches. This probe measures, for batch sizes 3 and 100 at
nprobe=2 over the SAME persisted 4M-vector index:

- probed-cell count and the exact file arithmetic (files the pruned
  scan lists vs total) — from the store manifest, not task metrics
  (StageData.inputBytes does not capture parquet scan bytes on this
  Spark build; verified with a 1 GB scan reporting 0.3 MB);
- wall + aggregate executor CPU (works) pruned vs unpruned;
- the stage-2 rerank as a KEYED fetch (read_where over an id-stats
  corpus table, fetch_ids) vs the full-corpus scan — rerank files
  read from read_where's own prune accounting.

Run AFTER probe_r11_prune.py (reuses its corpus + index):
    python tools/probe_r11_prune2.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CORPUS = "/tmp/amp_r11_vecs_4m"
STORE = "/tmp/amp_r11_store_4m_64c"


def main() -> None:
    from projectone_spark.functions.embeddings import (
        probe_cells,
        search_ivf_sq8_index,
    )
    from projectone_spark.observability import stage_metrics
    from projectone_spark.session import get_spark
    from projectone_spark.store import TableStore
    from projectone_spark.store.indexes import open_index
    from projectone_spark.store.models import centroids_from_model
    from projectone_spark.store.skipping import (
        _validate_predicates,
        prune_files,
        read_where,
    )

    spark = get_spark("probe-r11-prune2")
    sc = spark.sparkContext
    emb = spark.read.parquet(CORPUS)
    store = TableStore(STORE)
    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    cents = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    bounds = idx.parts["bounds"].localCheckpoint(eager=True)

    # an id-stats corpus table for the keyed rerank fetch (one-time;
    # at 100 TB this is the id-clustered raw-vector table)
    if not store.exists("corpus"):
        store.overwrite(spark, emb.repartitionByRange(64, "vec_id"),
                        "corpus", stats_columns=["vec_id"])
    m_idx = store.manifest("idx")
    m_cor = store.manifest("corpus")
    total_idx_files = len(m_idx.get("files") or [])
    total_cor_files = len(m_cor.get("files") or [])
    N = emb.count()

    for nq in (3, 100):
        queries = emb.filter(F.col("vec_id") % (N // nq) == 1) \
            .limit(nq).localCheckpoint(eager=True)
        probed = sorted({r["c"] for r in queries.select(
            F.explode(probe_cells(F.col("embedding"), cents, 2))
            .alias("c")).distinct().collect()})
        idx_files_pruned = sum(
            1 for f in (m_idx.get("files") or [])
            if any(f"cell={c}/" in f["path"] for c in probed))
        for mode in ("pruned+keyed", "pruned", "unpruned"):
            tag = f"nq{nq}_{mode.replace('+', '_')}"
            fetch = None
            rerank_files = [total_cor_files]
            if mode == "pruned+keyed":
                def fetch(ids, rf=rerank_files):
                    preds = _validate_predicates([("vec_id", "in", ids)])
                    kept, _ = prune_files(store.manifest("corpus"), preds)
                    rf[0] = len(kept)
                    return read_where(store, spark, "corpus",
                                      [("vec_id", "in", ids)])
            sc.setJobGroup(tag, tag)
            t0 = time.perf_counter()
            out = search_ivf_sq8_index(
                idx.codes, cents, bounds,
                None if fetch else emb, queries, k=5, nprobe=2,
                shortlist=25, dims=64,
                prune_cells=mode.startswith("pruned"), fetch_ids=fetch)
            n = out.count()
            wall = time.perf_counter() - t0
            sc.setLocalProperty("spark.jobGroup.id", None)
            st = stage_metrics(spark, group=tag)
            print(json.dumps({
                "case": tag, "rows": n,
                "probed_cells": len(probed),
                "idx_files_scanned": (idx_files_pruned
                                      if mode.startswith("pruned")
                                      else total_idx_files),
                "idx_files_total": total_idx_files,
                "rerank_files_read": (rerank_files[0]
                                      if mode == "pruned+keyed"
                                      else total_cor_files),
                "rerank_files_total": total_cor_files,
                "wall_s": round(wall, 1),
                "cpu_s": round(sum(s["executorCpuTime"]
                                   for s in st) / 1e9, 1),
                "spill_mb": round(sum(s["memoryBytesSpilled"] +
                                      s["diskBytesSpilled"]
                                      for s in st) / 1e6, 1),
            }), flush=True)


if __name__ == "__main__":
    main()

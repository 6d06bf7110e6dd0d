"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line with per-query and
total wall seconds.

Execution is forced with a `noop` format write — full pipeline runs
(scan → shuffle → sink) without driver-side collect cost.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from projectone_spark.queries import REGISTRY, queries
    from projectone_spark.session import get_spark

    spark = get_spark("projectone_spark-bench")
    all_queries = queries()

    # Warm the JVM/session AND the Python worker pool on the smallest scale
    # so timings measure the queries, not process spin-up: chained
    # mapInPandas stages each fork a pyspark worker per core on first use
    # (~5-15 s across 32 cores), reused afterwards.
    # st08 additionally warms the Python DataSource worker pool (a
    # separate pool from the mapInPandas workers m02 warms)
    for warm_name in ("q01_pricing_summary", "m02_image_pixel_stats",
                      "st08_stream_from_table"):
        all_queries[warm_name](spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(all_queries.items()):
        if not REGISTRY[name].bench:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.3f}s", file=sys.stderr)
        # memory-sink streaming queries leave their result tables registered
        # (each holds its rows in driver memory); the noop write above has
        # already consumed the result, so drop them to keep the shared
        # session's footprint flat across the whole registry (r5 drift A/B:
        # accumulation measured harmless at this scale — 17 tiny tables —
        # but unbounded by design without this)
        for t in spark.catalog.listTables():
            if t.name.startswith("mem_"):
                spark.catalog.dropTempView(t.name)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # The driver captures only ~2 KB of stdout tail; with 95 queries a
    # per-query map blows that budget (rounds 1-3 all recorded
    # `parsed: null`). Keep stdout to ONE tiny line (<200 bytes) with the
    # headline metric only; the full per-query map goes to stderr where
    # humans (and BENCH_r*.json's stderr capture) can still read it.
    print(json.dumps({"queries": timings, "sf": float(sf) if sf else None},
                     separators=(",", ":")), file=sys.stderr, flush=True)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(json.dumps({
        "metric": "total_query_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in sorted(slowest.items())},
        "n_queries": len(timings),
        "sf": float(sf) if sf else None,
    }, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()

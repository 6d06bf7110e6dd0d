"""Dump mechanism-level plan pairs for pipelines whose production form is
checkpoint-truncated (the returned-frame explain shows only a Scan
ExistingRDD past a localCheckpoint, so the optimization evidence lives in
the MATERIALIZATION plan). This no-ops DataFrame.localCheckpoint and dumps
the full logical pipeline for the operators the r13 round reshaped.

Usage (run in each tree; copy the before files over):
    PYTHONPATH=<tree> python tools/dump_mechanism_plans.py <tag>
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    # no-op the checkpoint so the full pipeline stays in the plan (patch
    # the CLASSIC class — instances resolve their method there, not on
    # the re-exported pyspark.sql.DataFrame base)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-connect layouts
        from pyspark.sql import DataFrame
    DataFrame.localCheckpoint = lambda self, *a, **k: self  # type: ignore

    from projectone_spark.session import configure, get_spark

    spark = configure(get_spark("projectone_spark-mech-plans"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    from projectone_spark.functions.dedup import winnow_fingerprint_pairs
    from projectone_spark.functions.text import (
        bpe_doc_word_counts,
        unigram_surprise,
    )

    frames = {
        "mech_bpe_doc_word_counts": bpe_doc_word_counts(docs),
        "mech_unigram_surprise": unigram_surprise(docs),
        "mech_winnow_pairs": winnow_fingerprint_pairs(docs),
    }
    for name, df in frames.items():
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()

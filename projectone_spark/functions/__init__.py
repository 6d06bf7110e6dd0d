"""Beyond-reference function library for large-scale training-data pipelines:
text analysis, deduplication, embedding similarity, multimodal columns.

All hot-path logic is built-in ``pyspark.sql.functions`` expressions (JVM,
whole-stage codegen) — no Python UDFs. Pandas UDFs appear only in the
multimodal decode plumbing where per-cell binary processing is inherent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def multiset_diff_count(a: DataFrame, b: DataFrame) -> int:
    """0 iff ``a`` and ``b`` are equal as row MULTISETS — the engine's
    equality-proof primitive (streamed-vs-rebuilt index, arrow-vs-expr
    tokenizer stage, pinned-vs-captured search).

    One union + one hash aggregate: each side contributes +1/-1 per row
    and a group whose signed count is non-zero witnesses a multiplicity
    mismatch. Replaces the r11-era double ``exceptAll`` + union + count,
    which evaluated BOTH input subtrees twice (four plan evaluations —
    for an unchecked-pointed rebuild that meant two full rebuild scans)
    and paid four shuffles instead of one (guide §2.4: remove shuffles
    outright). NULL grouping matches ``exceptAll``'s null-safe equality,
    so zero-ness is identical; the non-zero magnitude counts distinct
    mismatched row-values rather than excess rows, which every caller
    only renders into an error message.
    """
    cols = a.columns
    tagged = (a.select(*cols).withColumn("__side", F.lit(1))
              .unionByName(b.select(*cols).withColumn("__side", F.lit(-1))))
    return (tagged.groupBy(*cols)
            .agg(F.sum("__side").alias("__d"))
            .filter(F.col("__d") != 0)
            .count())

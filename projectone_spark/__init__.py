"""projectone_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of the reference engine
(narramukhesh/projectone, surveyed in SURVEY.md) as idiomatic Spark:

- ``sources``   — batch/stream readers (csv/parquet/json/delta-gated/jdbc/kafka-gated/odata)
- ``store``     — versioned parquet TableStore (atomic snapshot swap) + JSON KV state
- ``writers``   — append / overwrite / selective_overwrite / scd1 / scd2 / scd3 /
                  table-constraint checks, all hash-based merge semantics
- ``features``  — input features: filter/select/drop, schema inference, interpolation
- ``cdc``       — attribute CDC state machine (incremental scan predicates), backfill
- ``task``      — SparkTask builder (input -> execution -> output), result envelopes,
                  local DAG runner
- ``functions`` — text analysis, dedup (exact/minhash/simhash/jaccard), embedding
                  similarity, multimodal column plumbing
- ``streaming`` — structured-streaming read/write, foreachBatch writer reuse,
                  watermarked/windowed aggregations
- ``events``    — severity-tagged event bus with webhook/custom handlers
- ``observability`` — job groups, plan capture, streaming metrics listener
- ``queries``   — the registered analytics query library (driver correctness gate)

Everything is DataFrame-first: operators are pure functions
``DataFrame -> DataFrame`` and Catalyst does the planning. Designed for
multi-executor scale (broadcast dims, partition-pruned merges, no
driver-side data loops) even though tests run on local[*].
"""

__version__ = "0.1.0"

"""Beyond-reference function library for large-scale training-data pipelines:
text analysis, deduplication, embedding similarity, multimodal columns.

All hot-path logic is built-in ``pyspark.sql.functions`` expressions (JVM,
whole-stage codegen) — no Python UDFs. Pandas UDFs appear only in the
multimodal decode plumbing where per-cell binary processing is inherent.
"""

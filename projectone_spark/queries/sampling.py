"""Dataset-assembly queries (p-family): deterministic splits, quota
sampling, sequence packing, contamination — each with a DuckDB oracle
reproducing the identical md5-bucket / window arithmetic.

Reference scope: the reference engine stops at ETL writes; these cover the
training-set assembly steps downstream of it (SURVEY §7.3 item 10)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.sampling import (
    contamination_report,
    deterministic_split,
    estimate_tokens,
    pack_sequences,
    quota_sample,
)
from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _NORM, _SHINGLES

# Engine-portable md5 bucket: Spark conv(substr(md5,1,4),16,10) ==
# DuckDB CAST('0x'||substr(md5,1,4) AS INT); both md5s are lowercase hex.
_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100"

_P01_SQL = f"""
WITH b AS (
  SELECT lang,
         CASE WHEN {_BUCKET} < 80 THEN 'train'
              WHEN {_BUCKET} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT split, lang, count(*) AS n_docs
FROM b GROUP BY split, lang
"""


@register("p01_deterministic_split", _P01_SQL,
          doc="stable md5-bucket train/val/test assignment, counted per split×lang",
          tags=("sampling",))
def p01_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (deterministic_split(docs)
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs")))


_P02_SQL = """
SELECT doc_id, lang, n_chars, rk FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents)
WHERE rk <= 40
"""


@register("p02_quota_sample", _P02_SQL,
          doc="language-balanced quota: two-phase top-40 per lang by length",
          tags=("sampling",))
def p02_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return quota_sample(docs, "lang", "n_chars", 40, tie_col="doc_id")


_P03_SQL = """
WITH t AS (
  SELECT lang, doc_id % 4 AS shard, doc_id,
         CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks
  FROM documents),
packed AS (
  SELECT lang, shard, toks,
         CAST(floor((sum(toks) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - toks)
                    / 512.0) AS BIGINT) AS bin
  FROM t)
SELECT lang, shard, bin,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS bin_tokens
FROM packed GROUP BY lang, shard, bin
"""


@register("p03_sequence_packing", _P03_SQL,
          doc="greedy 512-token sequence packing per (lang, id-shard)",
          tags=("sampling",))
def p03_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (load(spark, sf_dir, "documents")
            .select("lang", (F.col("doc_id") % 4).alias("shard"),
                    F.col("doc_id"),
                    estimate_tokens("n_chars").alias("toks")))
    return (pack_sequences(docs, "toks", 512, ["lang", "shard"], "doc_id")
            .groupBy("lang", "shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("toks").alias("bin_tokens")))


# Normalization + char-5-gram shingles, identical to functions/dedup.py.

_P04_SQL = f"""
WITH sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM documents),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
tr AS (SELECT * FROM sh WHERE doc_id % 97 <> 0)
SELECT tr.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap,
       sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END)
         / count(*) AS contamination
FROM tr LEFT JOIN ev ON tr.s = ev.s
GROUP BY tr.doc_id
"""


@register("p04_contamination", _P04_SQL,
          doc="benchmark-leak check: shingle overlap vs broadcast eval set",
          tags=("sampling",))
def p04_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return contamination_report(corpus, bench)


_P05_SQL = """
WITH mass AS (
  SELECT source, sum(n_chars) AS m FROM documents GROUP BY source),
quota AS (
  SELECT source,
         greatest(4, CAST(floor(pow(CAST(m AS DOUBLE), 0.5) / 8.0) AS INT))
           AS quota
  FROM mass),
ranked AS (
  SELECT d.doc_id, d.source, q.quota,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY md5(CAST(d.doc_id AS VARCHAR)),
                                     d.doc_id) AS rk
  FROM documents d JOIN quota q USING (source))
SELECT doc_id, source, quota FROM ranked WHERE rk <= quota
"""


@register("p05_temperature_mixture", _P05_SQL,
          doc="temperature-scaled mixture sampling: per-source quota grows "
              "sublinearly with the source's character mass (mass^0.5, "
              "per-group-exact so no cross-engine float-total drift), rows "
              "picked in deterministic md5 order — the domain-flattening "
              "step of an LLM pretraining mixture",
          tags=("sampling", "mixture", "llm"))
def p05_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.sampling import temperature_quota_sample

    docs = load(spark, sf_dir, "documents").select("doc_id", "source",
                                                   "n_chars")
    return (temperature_quota_sample(docs, "source", "n_chars")
            .select("doc_id", "source", F.col("quota").cast("int")))

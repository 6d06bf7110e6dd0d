"""Corpus-level text analytics — cross-document / cross-source statistics
(registered at the registry tail; adding here never disturbs the driver's
50-slot adjudication prefix).

Both queries share the normalization + shingle recipes of
``functions/text.py`` / ``functions/dedup.py``, mirrored exactly in the
DuckDB fragments below.
"""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling modules)
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.dedup import source_overlap
from projectone_spark.functions.text import distinctive_terms
from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _NORM, _SHINGLES, _TOKS


_T08_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY lang, term),
dfreq AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
          FROM toks GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT lang, tf.term, tf, df_docs,
         round((tf * (SELECT n_docs FROM n)) / CAST(df_docs AS DOUBLE), 6)
           AS score
  FROM tf JOIN dfreq ON tf.term = dfreq.term)
SELECT lang, term, tf, df_docs, score
FROM (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn <= 5
"""


@register("t08_tfidf_terms", _T08_SQL,
          doc="top-5 distinctive terms per language by linear-idf TF-IDF "
              "(tf * N / df — log-free so DuckDB and the JVM agree bit-for-"
              "bit; one explode, two map-side-combining aggs, term equi-"
              "join, broadcast scalar count, size-5 window)",
          tags=("text", "tfidf", "llm"))
def t08_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return distinctive_terms(docs, group_col="lang", k=5)


_D09_SQL = f"""
WITH sh AS (
  SELECT DISTINCT source AS src, unnest({_SHINGLES}) AS s FROM documents),
sizes AS (SELECT src, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY src),
inter AS (
  SELECT a.src AS source_a, b.src AS source_b,
         CAST(count(*) AS BIGINT) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.src < b.src
  GROUP BY a.src, b.src)
SELECT source_a, source_b, n_common,
       sa.n_sh AS n_a, sb.n_sh AS n_b,
       round(n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.src = source_a
JOIN sizes sb ON sb.src = source_b
"""


@register("d09_source_overlap", _D09_SQL,
          doc="pairwise source-overlap matrix: Jaccard of each source's "
              "distinct shingle set (which crawls/dumps share content); "
              "one distinct shuffle + a shingle equi-join whose fan-out is "
              "bounded by sources^2, set sizes broadcast — no all-pairs "
              "document join, 100 TB-shaped",
          tags=("dedup", "contamination", "llm"))
def d09_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("source", "text")
    return source_overlap(docs)


_P06_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks,
         md5({_NORM}) AS h
  FROM documents),
k AS (SELECT h, min(doc_id) AS keeper FROM d GROUP BY h)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN doc_id = keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN doc_id = keeper THEN toks ELSE 0 END) AS BIGINT)
         AS unique_tokens,
       round(1.0 - sum(CASE WHEN doc_id = keeper THEN toks ELSE 0 END)
                   / CAST(sum(toks) AS DOUBLE), 6) AS dup_token_ratio
FROM d JOIN k USING (h)
GROUP BY source
"""


@register("p06_dedup_token_accounting", _P06_SQL,
          doc="effective-token accounting under exact dedup: per source, "
              "docs/tokens surviving when each duplicate cluster keeps its "
              "min-id representative — the corrected mass that mixture/"
              "quota stages (p02/p05) should weight by; one 16-byte-hash "
              "agg + one hash join, no collects",
          tags=("sampling", "dedup", "llm"))
def p06_dedup_token_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import dedup_token_accounting

    docs = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dedup_token_accounting(docs)

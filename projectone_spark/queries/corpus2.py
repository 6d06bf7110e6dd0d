"""Corpus quality / dedup / mixture queries added in round 4 (registry
tail — rotation candidates for round 5):

- t09: Gopher-rule document filter battery (word-count, mean-word-length,
  stopword, top-word-frequency verdicts);
- d10: cross-document duplicated-n-gram detection (word-level ExactSubstr
  analogue);
- p07: capped equal-token-share mixture rebalance with deterministic
  md5 stochastic rounding.

All DuckDB fragments mirror `functions/text.py` / `functions/dedup.py` /
`functions/sampling.py` arithmetic exactly: integer masses aggregate as
integers, every emitted double is an int/int division (bit-identical in
both engines), so nothing needs rounding.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.text import STOPWORDS
from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _NORM, _TOKS
from projectone_spark.session import scratch_dir


_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

def _gopher_metric_sql(src: str) -> str:
    """Per-document Gopher metrics of ``src`` (a relation exposing
    doc_id, norm, toks) — ONE definition of the metric recipe shared by
    the t09 and f14 oracles so the thresholds/metrics cannot drift."""
    return f"""SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(length(norm) - (len(toks) - 1) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mean_word_len,
         CAST(len(list_intersect(list_distinct(toks), {_STOPLIST_SQL}))
              AS BIGINT) AS n_stopwords,
         CASE WHEN len(toks) > 0
              THEN CAST(list_max(list_transform(
                     list_distinct(toks),
                     w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS top_word_frac
  FROM {src}"""


#: the ANDed Gopher keep verdict over _gopher_metric_sql's columns —
#: the same single source of truth for the thresholds
_GOPHER_KEEP_SQL = """((n_words >= 40 AND n_words <= 100000)
        AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
        AND (n_stopwords >= 2)
        AND (top_word_frac <= 0.08))"""


_T09_SQL = f"""
WITH t AS (
  SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks FROM documents),
m AS (
  {_gopher_metric_sql("t")})
SELECT doc_id, n_words, mean_word_len, n_stopwords, top_word_frac,
       (n_words >= 40 AND n_words <= 100000) AS rule_word_count,
       (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         AS rule_mean_word_len,
       (n_stopwords >= 2) AS rule_stopwords,
       (top_word_frac <= 0.08) AS rule_top_word,
       {_GOPHER_KEEP_SQL} AS keep
FROM m
"""


@register("t09_gopher_rules", _T09_SQL,
          doc="Gopher-style filter battery: per-document word-count, "
              "mean-word-length, distinct-stopword, and top-word-share "
              "verdicts ANDed to a keep flag — all scan-side Catalyst "
              "expressions, no shuffle",
          tags=("text", "quality", "llm"))
def t09_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import gopher_rules

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return gopher_rules(docs)


_D10_SQL = f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)),
gd AS (SELECT DISTINCT doc_id, gram FROM g),
c AS (SELECT gram, count(*) AS nd FROM gd GROUP BY gram)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS dup_frac,
       (CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) <= 0.5) AS keep
FROM gd JOIN c USING (gram)
GROUP BY doc_id
"""


@register("d10_crossdoc_ngram_dedup", _D10_SQL,
          doc="cross-document duplicated 8-gram detection (word-level "
              "ExactSubstr analogue): per-doc fraction of distinct word "
              "8-grams shared with any other document; distinct grams "
              "stay row-local (array_distinct before explode) and the one "
              "corpus-scale shuffle carries 8-byte gram hashes",
          tags=("dedup", "text", "llm"))
def d10_crossdoc_ngram_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import cross_doc_ngram_dedup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return cross_doc_ngram_dedup(docs)


_P07_SQL = """
WITH d AS (
  SELECT doc_id, source, CAST(ceil(n_chars / 4.0) AS BIGINT) AS t
  FROM documents),
m AS (
  SELECT source, CAST(sum(t) AS BIGINT) AS gt,
         CAST(count(*) AS BIGINT) AS gn
  FROM d GROUP BY source),
s AS (
  SELECT CAST(sum(gt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS ngroups
  FROM m),
w AS (
  SELECT source, gt, gn,
         least(4.0, (CAST(total AS DOUBLE) / ngroups) / CAST(gt AS DOUBLE))
           AS wt
  FROM m, s),
c AS (
  SELECT d.source, d.t, w.gt, w.gn, w.wt,
         CAST(floor(wt) AS BIGINT)
         + CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) / 4294967296.0 < wt - floor(wt)
                THEN 1 ELSE 0 END AS cp
  FROM d JOIN w USING (source))
SELECT source,
       any_value(gn) AS n_docs,
       any_value(gt) AS tokens_in,
       any_value(wt) AS weight,
       CAST(sum(cp) AS BIGINT) AS n_copies,
       CAST(sum(cp * t) AS BIGINT) AS tokens_out
FROM c GROUP BY source
"""


@register("p07_mixture_rebalance", _P07_SQL,
          doc="capped equal-token-share mixture rebalance: per-source "
              "weight min(4, target/actual), documents replicated by "
              "floor(w) plus md5-deterministic stochastic rounding — "
              "exact integer masses, broadcast weights, one bounded "
              "group-by; no RNG, stable under re-runs",
          tags=("sampling", "mixture", "llm"))
def p07_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.sampling import (
        estimate_tokens,
        mixture_rebalance,
    )

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "source", estimate_tokens("n_chars").alias("toks")))
    return mixture_rebalance(docs)


_P08_SQL = """
WITH b AS (
  SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        AS INT) % 100 < 80 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                        AS INT) % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         CAST(ceil(n_chars / 4.0) AS BIGINT) AS toks
  FROM documents)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens
FROM b GROUP BY split
"""


@register("p08_sharded_export", _P08_SQL,
          doc="size-governed sharded export round trip: md5-bucket split "
              "assignment, parquet written partitioned by split with "
              "maxRecordsPerFile capping every shard (footer row counts "
              "verified in-query), then the aggregate recomputed FROM THE "
              "EXPORTED FILES — proving write+read equivalence, not "
              "writer intent",
          tags=("sampling", "export", "llm"))
def p08_sharded_export(spark: SparkSession, sf_dir: str) -> DataFrame:

    from projectone_spark.functions.sampling import (
        deterministic_split,
        estimate_tokens,
        export_shards,
    )

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", estimate_tokens("n_chars").alias("toks")))
    assigned = deterministic_split(docs)
    out = export_shards(assigned, scratch_dir(prefix="po_p08_"),
                        max_records_per_file=200)
    return (out.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("toks").alias("n_tokens")))

"""Text-analysis queries over the `documents` table, each with a DuckDB
oracle reproducing the identical arithmetic (shared normalization recipe,
list lambdas, md5)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint_of_norm,
    lang_id,
    normalize,
    spread,
    text_stats,
    tokens_of_norm,
)
from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _NORM, _TOKS

# Shared DuckDB fragments mirroring functions/text.py exactly.
_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)

_T01_SQL = f"""
WITH d AS (
  SELECT doc_id,
         length(text) AS n_chars,
         CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS punct_ratio_raw,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                   / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END AS digit_ratio_raw,
         CASE WHEN len({_TOKS}) > 0
              THEN CAST(len(list_filter({_TOKS}, t -> t IN ({_STOP_IN}))) AS DOUBLE)
                   / len({_TOKS})
              ELSE 0.0 END AS stop_ratio_raw
  FROM documents)
SELECT doc_id, n_chars, n_tokens,
       round(punct_ratio_raw, 4) AS punct_ratio,
       round(digit_ratio_raw, 4) AS digit_ratio,
       round(stop_ratio_raw, 4)  AS stop_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.4
             + (1.0 - least(abs(stop_ratio_raw - 0.3) * 2, 1.0)) * 0.3
             + (1.0 - least(punct_ratio_raw * 4, 1.0)) * 0.3, 4) AS quality
FROM d
"""


@register("t01_text_stats", _T01_SQL,
          doc="per-document length/token/punct/stopword stats + quality score",
          tags=("text",))
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load(spark, sf_dir, "documents"))


def _lang_case() -> str:
    score_exprs = {
        lang: (f"CAST(len(list_filter({_TOKS}, t -> t IN "
               f"({', '.join(repr(w) for w in markers)}))) AS BIGINT)")
        for lang, markers in LANG_MARKERS.items()
    }
    score_exprs["zh"] = ("CAST(length(text) - length(regexp_replace(text, "
                         "'[^\\x00-\\x7F]', '', 'g')) AS BIGINT)")
    langs = sorted(score_exprs)
    selects = ",\n         ".join(f"{score_exprs[lang]} AS s_{lang}" for lang in langs)
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cases = "\n            ".join(
        f"WHEN s_{lang} = {best} AND {best} > 0 THEN '{lang}'" for lang in langs)
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         {selects}
  FROM documents)
SELECT doc_id, lang,
       CASE {cases}
            ELSE 'und' END AS pred_lang,
       CAST(CASE {cases}
            ELSE 'und' END = lang AS INTEGER) AS is_correct
FROM scored
"""


@register("t02_lang_id", _lang_case(),
          doc="marker-vocabulary language identification vs ground-truth label",
          tags=("text", "langid"))
def t02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load(spark, sf_dir, "documents"))


_T03_SQL = f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 25
"""


@register("t03_top_tokens", _T03_SQL,
          doc="corpus token histogram (explode + count), top-25",
          tags=("text", "explode"))
def t03_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents")
                  .select(normalize("text").alias("__norm")))
    return (docs.select(F.explode(tokens_of_norm("__norm")).alias("token"))
            .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("token"))
            .limit(25))


_T04_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
FROM documents
"""


@register("t04_fingerprint", _T04_SQL,
          doc="document fingerprint: md5 of sorted distinct token set",
          tags=("text", "fingerprint"))
def t04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load(spark, sf_dir, "documents")
                  .select("doc_id", normalize("text").alias("__norm")))
    return docs.select("doc_id", fingerprint_of_norm("__norm").alias("fp"))


_C01_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t
  FROM documents),
starts AS (
  SELECT doc_id, t, CAST(unnest(range(0, len(t), 40)) AS INT) AS start
  FROM toks WHERE len(t) > 0)
SELECT doc_id,
       CAST(start / 40 AS INT) AS chunk_ix,
       array_to_string(t[start + 1 : start + 50], ' ') AS chunk,
       CAST(least(50, len(t) - start) AS INT) AS n_tokens
FROM starts
"""


@register("c01_doc_chunks", _C01_SQL, bench=True,
          doc="document chunking (50-token chunks, stride 40): split → "
              "sequence-of-starts → slice/concat + posexplode, all "
              "JVM-side expressions; the Python-UDTF twin is equivalence- "
              "tested in tests/test_chunking.py",
          tags=("text", "chunking", "llm"))
def c01_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.chunking import chunk_docs

    docs = load(spark, sf_dir, "documents")
    return chunk_docs(docs, size=50, stride=40)


_T05_SQL = r"""
SELECT doc_id,
       CAST(len(list_filter(
            regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
            t -> NOT regexp_matches(t, '^\s+$'))) AS BIGINT) AS n_bpe,
       CAST(len(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                     ELSE string_split_regex(trim(text), '\s+') END)
            AS BIGINT) AS n_ws,
       round(CAST(len(list_filter(
            regexp_extract_all(text,
              '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'),
            t -> NOT regexp_matches(t, '^\s+$'))) AS DOUBLE)
         / greatest(len(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                        ELSE string_split_regex(trim(text), '\s+') END), 1),
         4) AS tokens_per_word
FROM documents
"""


@register("t05_bpe_token_count", _T05_SQL,
          doc="LLM-style token counting: a GPT-2-shaped pre-tokenizer "
              "regex (contractions / space-prefixed letter / digit / "
              "punctuation runs, lookahead-free so Java and RE2 agree) "
              "next to the whitespace word count, with the tokens-per-word "
              "budget ratio — all codegen scan-side expressions",
          tags=("text", "tokens", "llm"))
def t05_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import bpe_ish_token_count

    docs = spread(load(spark, sf_dir, "documents"))
    ws = F.size(F.when(F.trim("text") == "", F.array().cast("array<string>"))
                .otherwise(F.split(F.trim("text"), r"\s+")))
    bpe = bpe_ish_token_count("text")
    return docs.select(
        "doc_id",
        bpe.cast("bigint").alias("n_bpe"),
        ws.cast("bigint").alias("n_ws"),
        F.round(bpe.cast("double") / F.greatest(ws, F.lit(1)), 4)
        .alias("tokens_per_word"))


_T06_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS g2,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS g3
  FROM toks),
f AS (
  SELECT doc_id,
         CASE WHEN len(g2) > 0
              THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
              ELSE 0.0 END AS f2,
         CASE WHEN len(g3) > 0
              THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
              ELSE 0.0 END AS f3
  FROM g)
SELECT doc_id,
       round(f2, 4) AS dup_2gram_frac,
       round(f3, 4) AS dup_3gram_frac,
       round(f3, 4) <= 0.3 AS keep
FROM f
"""


@register("t06_repetition_filter", _T06_SQL,
          doc="Gopher-style repetition filter: duplicate 2-/3-gram "
              "fractions per document with a keep flag at dup3 <= 0.3 — "
              "the standard pretraining-corpus boilerplate drop; all "
              "scan-side expressions, O(tokens) per document",
          tags=("text", "quality", "llm"))
def t06_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import repetition_stats

    return repetition_stats(load(spark, sf_dir, "documents"))


def _t07_sql() -> str:
    from projectone_spark.functions.text import PII_PATTERNS

    em, ip, ph = (PII_PATTERNS["email"], PII_PATTERNS["ipv4"],
                  PII_PATTERNS["phone"])
    inject = ("text || ' contact u' || CAST(doc_id AS VARCHAR) || "
              "'@ex.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' "
              "|| CAST(doc_id % 100 AS VARCHAR) || ' call 555-' || "
              "CAST(100 + doc_id % 900 AS VARCHAR) || '-' || "
              "CAST(1000 + doc_id % 9000 AS VARCHAR)")
    return f"""
WITH d AS (SELECT doc_id, {inject} AS t FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{em}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(t, '{ph}')) AS BIGINT) AS n_phone,
       regexp_replace(regexp_replace(regexp_replace(t,
           '{em}', '<EMAIL>', 'g'),
           '{ip}', '<IP>', 'g'),
           '{ph}', '<PHONE>', 'g') AS scrubbed
FROM d
"""


@register("t07_pii_scrub", _t07_sql(),
          doc="PII scrub pass: count + redact emails / IPv4s / phone "
              "numbers (RE2-compatible patterns, chained regexp_replace, "
              "all scan-side codegen). The synthetic corpus is clean, so "
              "deterministic PII derived from doc_id is injected first — "
              "identically on both engines — to give the scrub real work",
          tags=("text", "quality", "llm"))
def t07_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import pii_scrub

    docs = load(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact u"),
            F.col("doc_id").cast("string"), F.lit("@ex.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit("."),
            (F.col("doc_id") % 100).cast("string"), F.lit(" call 555-"),
            (F.col("doc_id") % 900 + 100).cast("string"), F.lit("-"),
            (F.col("doc_id") % 9000 + 1000).cast("string")).alias("text"))
    return pii_scrub(injected)

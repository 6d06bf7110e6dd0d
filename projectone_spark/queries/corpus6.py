"""Corpus retrieval/scheduling queries added late in round 6 (registry
tail):

- t13: Okapi BM25 top-k retrieval (the classic sparse-retrieval scorer a
  curation pipeline uses for benchmark-adjacent document mining and hard
  negatives), exact-integer micro-unit scores;
- further additions land here as the round progresses.

Same exact-arithmetic discipline as corpus4/corpus5: rational constants
clear every denominator, per-term scores round HALF-UP to integer
micro-units in 128-bit lanes (Spark DECIMAL(38,0) / DuckDB HUGEINT), and
sums are BIGINT — bit-identical across engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _TOKS

#: the three retrieval probes t13 runs — terms drawn from the synthetic
#: corpus vocabulary, already in normalized [a-z0-9]+ form
_T13_QUERIES: dict[str, tuple[str, ...]] = {
    "q_join": ("hash", "join", "merge"),
    "q_scan": ("scan", "filter", "column"),
    "q_stream": ("stream", "window", "batch"),
}

_T13_TERMS_SQL = ", ".join(
    f"('{q}', '{t}')" for q, ts in sorted(_T13_QUERIES.items()) for t in ts)
_T13_IN_SQL = ", ".join(
    f"'{t}'" for t in sorted({t for ts in _T13_QUERIES.values() for t in ts}))

# Mirror of functions/text.bm25_topk at the defaults k1=6/5, b=3/4,
# scale=1e6: NUM = 44*tf*T*N, DEN = df*(20*tf*T + 6*T + 18*dl*N),
# micro = (2*NUM*1e6 + DEN) // (2*DEN) in HUGEINT (the div-free half-up
# form — Spark's `DECIMAL div 2` intermediate would leave the 128-bit
# lane), summed as BIGINT.
_T13_SQL = f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
dls AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks
        WHERE len(t) > 0),
stats AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(dl) AS HUGEINT) AS tt FROM dls),
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
qt AS (SELECT * FROM (VALUES {_T13_TERMS_SQL}) v(query_id, term)),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE term IN ({_T13_IN_SQL}) GROUP BY doc_id, term),
dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
parts AS (
  SELECT tf.doc_id, tf.term, tf.tf, dls.dl,
         44::HUGEINT * tf.tf * stats.tt * stats.n * 1000000 AS num,
         CAST(dfq.df AS HUGEINT)
           * (20 * tf.tf * stats.tt + 6 * stats.tt + 18 * dls.dl * stats.n)
           AS den
  FROM tf JOIN dfq USING (term) JOIN dls USING (doc_id) CROSS JOIN stats),
scored AS (
  SELECT qt.query_id, parts.doc_id,
         CAST(max(parts.dl) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_terms_hit,
         CAST(sum(CAST((2 * parts.num + parts.den) // (2 * parts.den)
                        AS BIGINT))
              AS BIGINT) AS score_micro
  FROM parts JOIN qt USING (term)
  GROUP BY qt.query_id, parts.doc_id),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
  FROM scored)
SELECT query_id, rank, doc_id, n_terms_hit, n_tokens, score_micro,
       CAST(score_micro AS DOUBLE) / 1000000 AS score
FROM ranked WHERE rank <= 10
"""


@register("t13_bm25_retrieval", _T13_SQL,
          doc="Okapi BM25 top-10 retrieval for three fixed term queries "
              "(log-free linear idf, rational k1=6/5 b=3/4): per-term "
              "scores clear all denominators into one integer fraction, "
              "round HALF-UP to micro-units in a 128-bit lane "
              "(DECIMAL(38,0) / HUGEINT), and sum as exact BIGINTs — "
              "ranking and scores bit-identical across engines; the only "
              "corpus-sized shuffle carries docs matching the literal "
              "query-term IN filter",
          tags=("text", "retrieval", "bm25", "llm"))
def t13_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import bm25_topk

    return bm25_topk(load(spark, sf_dir, "documents"), _T13_QUERIES)


# Mirror of functions/sampling.unimax_allocation at budget=3*T, cap=4:
# ascending waterfill with the naive-full-prefix capped test (monotone —
# see the function docstring's proof), integer remainder distribution,
# HALF-UP 6-dp epochs.
_P13_SQL = f"""
WITH lt AS (
  SELECT lang, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang HAVING sum(len({_TOKS})) > 0),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS g,
               CAST((3 * sum(n_tokens)) // 1 AS BIGINT) AS b FROM lt),
ord AS (
  SELECT lang, n_tokens, CAST(4 * n_tokens AS BIGINT) AS cap_tokens,
         row_number() OVER (ORDER BY 4 * n_tokens, lang) AS i,
         COALESCE(CAST(sum(4 * n_tokens) OVER (ORDER BY 4 * n_tokens, lang
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS prefix
  FROM lt),
flag AS (
  SELECT ord.*, tot.b, tot.g, tot.t,
         cap_tokens * (g - i + 1) <= b - prefix AS capped
  FROM ord CROSS JOIN tot),
pool AS (
  SELECT *,
         b - COALESCE(CAST(sum(CASE WHEN capped THEN cap_tokens END)
                           OVER () AS BIGINT), 0) AS r,
         CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END) OVER () AS BIGINT)
           AS k,
         CAST(sum(CASE WHEN capped THEN 0 ELSE 1 END)
              OVER (ORDER BY cap_tokens, lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS urank
  FROM flag),
alloc AS (
  SELECT lang, n_tokens, cap_tokens, capped,
         CAST(CASE WHEN capped THEN cap_tokens
              ELSE r // k + CASE WHEN urank <= r % k THEN 1 ELSE 0 END
              END AS BIGINT) AS alloc_tokens
  FROM pool)
SELECT lang, n_tokens, cap_tokens, capped, alloc_tokens,
       CAST((1000000::HUGEINT * alloc_tokens + n_tokens // 2) // n_tokens
            AS DOUBLE)
         / 1000000 AS epochs
FROM alloc
"""


@register("p13_unimax_allocation", _P13_SQL,
          doc="UniMax language sampling (Chung et al. 2023): a 3x-corpus "
              "token budget waterfills uniformly across languages with a "
              "4-epoch per-language cap — the closed-form single-window "
              "fixpoint of the iterative waterfill (capped-test "
              "monotonicity proven in the docstring), exact integer "
              "remainder distribution, one bounded per-language "
              "aggregation as the only corpus-sized stage",
          tags=("sampling", "mixture", "llm"))
def p13_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.sampling import unimax_allocation

    return unimax_allocation(load(spark, sf_dir, "documents"),
                             group_col="lang", budget=(3, 1), cap_epochs=4)

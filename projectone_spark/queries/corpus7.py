"""Corpus operators added in round 7 (registry tail):

- t14: BPE tokenizer APPLICATION — encode the corpus with the merge
  rules t12 trains, completing the Sennrich et al. 2016 train/apply
  pair (oracle: t12's unrolled training chain + one replace level per
  merge over the distinct-word vocabulary);
- t15: model-based quality/language classifier in the fastText
  supervised shape (Joulin et al. 2017) — a bounded per-token weight
  table trained on a labeled split, applied scan-side with a hard
  sigmoid, everything in exact integer micro-units.

Same exactness discipline as corpus4/5: integer arithmetic end-to-end,
float division only as a single final correctly-rounded IEEE op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _TOKS
from projectone_spark.queries.corpus5 import _t12_ctes

_N_MERGES = 8


def _t14_sql(n_merges: int = _N_MERGES) -> str:
    """Encode oracle: reuse t12's training CTE chain verbatim (w, v0,
    p{i}/b{i}/v{i}), then apply each learned rule b{i} to the DISTINCT
    corpus words (u0..u{n}) with the identical replace, and fold the
    encoded lengths back over the per-document word counts."""
    # LEFT JOIN, not CROSS JOIN: when training exhausts pairs before
    # n_merges, b{i} is EMPTY — a cross join would empty the whole
    # u-chain (zero oracle rows) while the Spark side correctly applies
    # only the rules that were learned. An absent rule is a no-op level.
    apply_levels = "".join(f""",
u{i} AS (
  SELECT w, CASE WHEN b.l IS NULL THEN sym
            ELSE replace(sym, '_' || b.l || '__' || b.r || '_',
                         '_' || b.l || b.r || '_') END AS sym
  FROM u{i - 1} LEFT JOIN b{i} b ON true)""" for i in range(1, n_merges + 1))
    return f"""
WITH {_t12_ctes(n_merges)},
wf AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM documents) s
  WHERE w <> '' GROUP BY doc_id, w),
u0 AS (
  SELECT DISTINCT w, '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS sym
  FROM wf){apply_levels},
enc AS (
  SELECT w, CAST(len(string_split(sym, '__')) - 2 AS BIGINT) AS nsym
  FROM u{n_merges}),
agg AS (
  SELECT wf.doc_id,
         CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(c * length(w)) AS BIGINT) AS n_chars,
         CAST(sum(c * nsym) AS BIGINT) AS n_bpe_tokens
  FROM wf JOIN enc USING (w) GROUP BY wf.doc_id)
SELECT doc_id, n_words, n_chars, n_bpe_tokens,
       CAST((2000000 * n_bpe_tokens + n_chars) // (2 * n_chars) AS DOUBLE)
         / 1000000.0 AS compression
FROM agg
"""


@register("t14_bpe_encode", _t14_sql(),
          doc="BPE tokenizer application (Sennrich et al. 2016 §3.2), "
              "completing t12's training step: the corpus is encoded "
              "with the trained merge table — ONE corpus scan feeding a "
              "(doc, word) count, the replace chain (a scan-side "
              "Catalyst expression per rule, no UDFs) running over the "
              "DISTINCT-word vocabulary only, and one vocabulary-sized "
              "equi-join carrying encoded lengths back; per-document "
              "pre/post token counts and the exact 6-dp half-up "
              "compression ratio are oracle-checked",
          tags=("text", "tokenizer", "llm"))
def t14_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import bpe_encode, bpe_train_merges

    docs = load(spark, sf_dir, "documents")
    # the trained merge table is bounded MODEL STATE (n_merges rows) —
    # a driver collect of the same class as CDC bounds / t12's argmax
    rules = bpe_train_merges(docs, n_merges=_N_MERGES).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in rules]
    return bpe_encode(docs, merges)


_T15_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS y, doc_id % 7 = 0 AS tr,
         unnest({_TOKS}) AS term
  FROM documents),
tf AS (
  SELECT doc_id, y, tr, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IS NOT NULL GROUP BY doc_id, y, tr, term),
v AS (
  SELECT term,
         CAST(sum(CASE WHEN y THEN tf ELSE 0 END) AS BIGINT) AS cpos,
         CAST(sum(CASE WHEN y THEN 0 ELSE tf END) AS BIGINT) AS cneg
  FROM tf WHERE tr GROUP BY term),
tot AS (SELECT CAST(sum(cpos) AS BIGINT) AS npos,
               CAST(sum(cneg) AS BIGINT) AS nneg,
               CAST(count(*) AS BIGINT) AS vv FROM v),
sc AS (
  SELECT tf.doc_id, bool_or(tf.y) AS label,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf.tf * (least(CAST(1000000000000 AS HUGEINT)
                                   * (v.cneg + 1) * (tot.npos + tot.vv),
                                 CAST(1000000 AS HUGEINT)
                                   * (v.cpos + 1) * (tot.nneg + tot.vv))
                           // (CAST(v.cneg + 1 AS HUGEINT)
                               * (tot.npos + tot.vv))))
              AS BIGINT) AS dot
  FROM tf JOIN v USING (term) CROSS JOIN tot
  WHERE NOT tf.tr
  GROUP BY tf.doc_id)
SELECT doc_id, n_tokens,
       CAST(dot // n_tokens AS BIGINT) AS logit_micro,
       CAST(least(1000000, (dot // n_tokens + 1000000) // 4) AS BIGINT)
         AS score_micro,
       least(1000000, (dot // n_tokens + 1000000) // 4) > 500000 AS pred,
       label
FROM sc
"""


@register("t15_linear_classifier", _T15_SQL,
          doc="model-based quality/language classifier in the fastText "
              "supervised shape (Joulin et al. 2017): add-one-smoothed "
              "count-ratio token weights trained on the doc_id%7 labeled "
              "split (label: lang='en'), applied to the held-out rest as "
              "a mean-token-weight linear score through a hard sigmoid — "
              "all in exact integer micro-units (no transcendental "
              "float; the hard sigmoid is monotone-equivalent to the "
              "real one at the ½ threshold), per-document logit/score/"
              "prediction/label oracle-checked",
          tags=("text", "quality", "llm"))
def t15_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.text import linear_token_classifier

    return linear_token_classifier(
        load(spark, sf_dir, "documents"),
        label=F.col("lang") == "en",
        train=F.col("doc_id") % 7 == 0)

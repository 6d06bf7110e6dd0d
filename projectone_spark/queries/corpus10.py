"""Corpus operators added in round 10 (registry tail):

- f16: model REFRESH semantics — the retrain-and-swap flow the f15
  lifecycle implies but never adjudicated: task A trains classifier
  weights on the t0 corpus and persists them (v1); a delta arrives and
  a retrain persists v2 over the same model name; a scorer PINNED to
  v1 (``load_model(version=v1)``) keeps reading exactly v1's weights
  while unpinned loads pick up v2 — proven bit-identically in-query
  (pinned == fresh-t0-train, latest == fresh-t1-train, exceptAll both
  ways), with the per-document score divergence on a held-out split
  reported per source and recomputed end-to-end by the oracle.

Reference parity: the reference's CDC state machine exists to make
incremental reruns deterministic (``core/task/spark/task.py:519-544``
— a rerun reads the bounds it persisted, not today's data); version-
pinned model loads are the same contract one level up, on the store's
existing time-travel machinery (``read_version`` + per-version
manifest stamps).

Same exactness discipline as corpus4-9: integer micro-unit arithmetic
end-to-end, every adjudicated column exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import multiset_diff_count
from projectone_spark.queries import check, load, register
from projectone_spark.queries._sql_fragments import _TOKS

_SCALE = 1_000_000


def _weight_ctes(p: str, train_where: str) -> str:
    """The fastText-style weight-table fold (f15's qv/qtot/qwt chain
    verbatim, prefix-parameterized) trained on ``documents WHERE
    {train_where}`` — emitted twice by f16, once per model version."""
    return f"""{p}tok AS (
  SELECT lang = 'en' AS y, unnest({_TOKS}) AS term
  FROM documents WHERE {train_where}),
{p}v AS (
  SELECT term,
         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS cpos,
         CAST(sum(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS cneg
  FROM {p}tok WHERE term IS NOT NULL GROUP BY term),
{p}tot AS (SELECT CAST(sum(cpos) AS BIGINT) AS npos,
                  CAST(sum(cneg) AS BIGINT) AS nneg,
                  CAST(count(*) AS BIGINT) AS vv FROM {p}v),
{p}wt AS MATERIALIZED (
  SELECT term,
         CAST(least(CAST({_SCALE} AS HUGEINT) * {_SCALE}
                      * (cneg + 1) * (npos + vv),
                    CAST({_SCALE} AS HUGEINT) * (cpos + 1) * (nneg + vv))
              // (CAST(cneg + 1 AS HUGEINT) * (npos + vv)) AS BIGINT) AS w
  FROM {p}v CROSS JOIN {p}tot)"""


def _f16_sql() -> str:
    """Both model versions recomputed from raw parquet (t0 train and
    t0+delta train), both applied to the held-out split, divergence
    accounted per source — one drifted weight in either version's
    round-trip (or a pin that silently read the wrong version) moves a
    score sum or the divergence count and hash-mismatches."""
    return f"""
WITH ev AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 3 = 2),
{_weight_ctes('a', 'doc_id % 3 = 0')},
{_weight_ctes('b', 'doc_id % 3 <> 2')},
etf AS MATERIALIZED (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS term FROM ev) s
  WHERE term IS NOT NULL GROUP BY doc_id, term),
s1 AS (
  SELECT doc_id,
         CAST(least({_SCALE},
                    (CAST(sum(tf * w) AS BIGINT) // CAST(sum(tf) AS BIGINT)
                     + {_SCALE}) // 4) AS BIGINT) AS sc
  FROM etf JOIN awt USING (term) GROUP BY doc_id),
s2 AS (
  SELECT doc_id,
         CAST(least({_SCALE},
                    (CAST(sum(tf * w) AS BIGINT) // CAST(sum(tf) AS BIGINT)
                     + {_SCALE}) // 4) AS BIGINT) AS sc
  FROM etf JOIN bwt USING (term) GROUP BY doc_id)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(s1.sc) AS BIGINT) AS n_scored_v1,
       CAST(count(s2.sc) AS BIGINT) AS n_scored_v2,
       CAST(coalesce(sum(CASE WHEN s1.sc IS DISTINCT FROM s2.sc
                          THEN 1 END), 0) AS BIGINT) AS n_diverged,
       CAST(coalesce(sum(s1.sc), 0) AS BIGINT) AS sum_score_v1,
       CAST(coalesce(sum(s2.sc), 0) AS BIGINT) AS sum_score_v2
FROM ev d
LEFT JOIN s1 USING (doc_id)
LEFT JOIN s2 USING (doc_id)
GROUP BY d.source
"""


@register("f16_model_version_pinning", _f16_sql(),
          doc="model REFRESH semantics over the persisted-model "
              "lifecycle: weights train on the t0 corpus and persist "
              "as v1; a delta batch arrives and a retrain persists v2 "
              "over the SAME model name; a scorer pinned to v1 "
              "(load_model(version=...) — the store's time-travel "
              "machinery carrying the per-version model stamp) keeps "
              "reading exactly v1 while unpinned loads pick up v2 — "
              "both loads proven BIT-IDENTICAL to from-scratch "
              "trainings on their respective corpora (exceptAll both "
              "directions, in-query), and the held-out split scored "
              "under both versions with per-source divergence "
              "accounting the oracle recomputes end-to-end from raw "
              "parquet",
          tags=("pipeline", "model", "quality", "llm", "store"))
def f16_model_version_pinning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.text import (
        apply_token_classifier,
        token_weight_table,
    )
    from projectone_spark.session import scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.store.models import load_model, save_model

    docs = load(spark, sf_dir, "documents")
    label = F.col("lang") == "en"
    store = TableStore(scratch_dir(prefix="po_f16_store_"))

    # t0 train -> v1; delta arrives -> retrain on t0+delta -> v2. The
    # trained frames are pinned eagerly so the bit-identity proofs below
    # compare against EXACTLY what save_model wrote, not a replayed fold.
    w1 = token_weight_table(
        docs, label=label,
        train=F.col("doc_id") % 3 == 0).localCheckpoint(eager=True)
    v1 = save_model(store, spark, "f16_weights", "token_weights", w1,
                    params={"train": "doc_id % 3 = 0",
                            "corpus_version": "t0", "scale": _SCALE})
    w2 = token_weight_table(
        docs, label=label,
        train=F.col("doc_id") % 3 != 2).localCheckpoint(eager=True)
    v2 = save_model(store, spark, "f16_weights", "token_weights", w2,
                    params={"train": "doc_id % 3 <> 2",
                            "corpus_version": "t1", "scale": _SCALE})
    check(v2 == v1 + 1, f"retrain must bump the version: {v1} -> {v2}")

    pinned, pmeta = load_model(store, spark, "f16_weights",
                               kind="token_weights", version=v1)
    latest, lmeta = load_model(store, spark, "f16_weights",
                               kind="token_weights")
    # the stamp travels WITH the version: a pinned scorer sees v1's
    # training provenance, a fresh run sees v2's
    check(pmeta["params"]["corpus_version"] == "t0"
          and lmeta["params"]["corpus_version"] == "t1",
          f"per-version params drifted: pinned={pmeta} latest={lmeta}")
    for got, want, tag in ((pinned, w1, "pinned!=v1"),
                           (latest, w2, "latest!=v2")):
        d = multiset_diff_count(got, want)
        check(d == 0, f"{tag}: version load diverges by {d} weight rows")
    # the two versions genuinely differ (the delta changed the corpus),
    # so divergence below measures refresh impact, not noise
    check(w1.exceptAll(w2).count() > 0,
          "retrain produced identical weights — delta slice empty?")

    ev = docs.filter(F.col("doc_id") % 3 == 2)
    sp = (apply_token_classifier(ev, pinned)
          .select("doc_id", F.col("score_micro").alias("__s1")))
    sl = (apply_token_classifier(ev, latest)
          .select("doc_id", F.col("score_micro").alias("__s2")))
    diverged = F.when(~(F.col("__s1").eqNullSafe(F.col("__s2"))), 1)
    return (ev.select("doc_id", "source")
            .join(sp, "doc_id", "left")
            .join(sl, "doc_id", "left")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count("__s1").alias("n_scored_v1"),
                 F.count("__s2").alias("n_scored_v2"),
                 F.coalesce(F.sum(diverged), F.lit(0)).cast("bigint")
                  .alias("n_diverged"),
                 F.coalesce(F.sum("__s1"), F.lit(0)).cast("bigint")
                  .alias("sum_score_v1"),
                 F.coalesce(F.sum("__s2"), F.lit(0)).cast("bigint")
                  .alias("sum_score_v2")))

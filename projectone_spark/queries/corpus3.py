"""Round-5 composed corpus queries: operators chained the way a real
pretraining pipeline chains them, each adjudicated end-to-end as ONE
oracle row (VERDICT r4 #6 — compose existing operators rather than adding
isolated ones):

- d12: near-dup-aware contamination — d07's minhash-bucket keeper
  election feeds p04's benchmark-overlap check, so leakage is measured on
  the corpus that would actually train (dedup first, then contamination;
  measuring before dedup double-counts leaked duplicates);
- f05: quality→mixture pipeline — t09's Gopher keep-flag filters the
  corpus, then p07's capped equal-token-share rebalance reweighs the
  SURVIVORS, run through the full SparkTask lifecycle (input features →
  body-mode execution fn → store write → read-back) like f01–f04.

Oracle fragments mirror ``functions/text.py`` / ``functions/dedup.py`` /
``functions/sampling.py`` arithmetic exactly; every emitted double is an
int/int or int-derived division (bit-identical across engines), every
count/sum is cast to BIGINT (DuckDB HUGEINT would float-widen through
pandas).
"""

from __future__ import annotations

import textwrap

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions.text import STOPWORDS
from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _NORM, _SHINGLES, _TOKS
from projectone_spark.session import scratch_dir

_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def _mh_sql(i: int) -> str:
    # mirror of functions/dedup.minhash_signatures (one copy also in
    # queries/dedup.py — both derive from the same _SHINGLES fragment)
    return (f"list_aggregate(list_transform({_SHINGLES},"
            f" s -> md5('{i}' || s)), 'min')")


_D12_SQL = f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
sig AS (
  SELECT doc_id, md5({_mh_sql(0)} || '|' || {_mh_sql(1)}) AS bucket
  FROM corpus),
keep AS (SELECT min(doc_id) AS doc_id FROM sig GROUP BY bucket),
sh AS (
  SELECT doc_id, unnest({_SHINGLES}) AS s FROM corpus
  WHERE doc_id IN (SELECT doc_id FROM keep)),
ev AS (
  SELECT DISTINCT s FROM (
    SELECT unnest({_SHINGLES}) AS s FROM documents WHERE doc_id % 97 = 0)),
per AS (
  SELECT sh.doc_id, count(*) AS n_sh,
         sum(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS n_ov
  FROM sh LEFT JOIN ev ON sh.s = ev.s GROUP BY sh.doc_id),
tot AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM corpus GROUP BY source),
agg AS (
  SELECT c.source,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(CASE WHEN n_ov * 10 >= n_sh THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated,
         CAST(sum(n_ov) AS BIGINT) AS n_overlap,
         CAST(sum(n_sh) AS BIGINT) AS n_shingles
  FROM per JOIN corpus c USING (doc_id) GROUP BY c.source)
SELECT tot.source, tot.n_docs, agg.n_kept, agg.n_contaminated,
       agg.n_overlap, agg.n_shingles
FROM tot JOIN agg USING (source)
"""


@register("d12_neardup_aware_contamination", _D12_SQL,
          doc="near-dup-aware contamination (d07 x p04 composition): "
              "minhash-bucket keeper election (min doc_id) dedups the "
              "corpus FIRST, then the survivors' shingle overlap vs the "
              "broadcast benchmark set rolls up per source (kept docs, "
              "contaminated-at->=10% docs, overlap/shingle masses) — "
              "leakage measured on the corpus that would actually train",
          tags=("dedup", "contamination", "sampling", "llm"))
def d12_neardup_aware_contamination(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import minhash_signatures
    from projectone_spark.functions.sampling import contamination_report

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    sigs = minhash_signatures(corpus).select(
        "doc_id", F.md5(F.concat_ws("|", "mh0", "mh1")).alias("bucket"))
    # keeper election: one hash aggregate over the signature frame — the
    # d07 'which copy survives' half with the simplest deterministic
    # policy (min id); the bucket domain bounds nothing here, so no
    # broadcast hint — AQE sees the keeper count at runtime
    keepers = sigs.groupBy("bucket").agg(F.min("doc_id").alias("doc_id"))
    kept = corpus.join(keepers.select("doc_id"), "doc_id")
    rep = contamination_report(kept, bench)
    # integer cross-multiply (n_ov*10 >= n_sh) instead of a float >=0.1
    # compare: exact in both engines, no rounding ambiguity
    agg = (rep.join(corpus.select("doc_id", "source"), "doc_id")
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_kept"),
                F.sum((F.col("n_overlap") * 10 >= F.col("n_shingles"))
                      .cast("long")).alias("n_contaminated"),
                F.sum("n_overlap").alias("n_overlap"),
                F.sum("n_shingles").alias("n_shingles")))
    tot = corpus.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return tot.join(agg, "source").select(
        "source", "n_docs", "n_kept", "n_contaminated",
        "n_overlap", "n_shingles")


_F05_SQL = f"""
WITH t AS (
  SELECT doc_id, source, n_chars, {_NORM} AS norm, {_TOKS} AS toks
  FROM documents),
m AS (
  SELECT doc_id, source, n_chars,
         CAST(len(toks) AS BIGINT) AS n_words,
         CASE WHEN len(toks) > 0
              THEN CAST(length(norm) - (len(toks) - 1) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS mwl,
         CAST(len(list_intersect(list_distinct(toks), {_STOPLIST_SQL}))
              AS BIGINT) AS n_stop,
         CASE WHEN len(toks) > 0
              THEN CAST(list_max(list_transform(
                     list_distinct(toks),
                     w -> len(list_filter(toks, x -> x = w)))) AS DOUBLE)
                   / len(toks)
              ELSE 0.0 END AS twf
  FROM t),
kept AS (
  SELECT doc_id, source, n_chars FROM m
  WHERE n_words >= 40 AND n_words <= 100000
    AND mwl >= 3.0 AND mwl <= 10.0
    AND n_stop >= 2 AND twf <= 0.08),
d AS (
  SELECT doc_id, source, CAST(ceil(n_chars / 4.0) AS BIGINT) AS t
  FROM kept),
m2 AS (
  SELECT source, CAST(sum(t) AS BIGINT) AS gt,
         CAST(count(*) AS BIGINT) AS gn
  FROM d GROUP BY source),
s AS (
  SELECT CAST(sum(gt) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS ngroups
  FROM m2),
w AS (
  SELECT source, gt, gn,
         least(4.0, (CAST(total AS DOUBLE) / ngroups) / CAST(gt AS DOUBLE))
           AS wt
  FROM m2, s),
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


@register("f05_quality_mixture_pipeline", _F05_SQL,
          doc="quality->mixture pipeline (t09 x p07 composition) through "
              "the FULL SparkTask lifecycle: select_columns feature, a "
              "body-mode execution fn that gates the corpus on the Gopher "
              "keep flag then rebalances the survivors to capped "
              "equal-token-share, overwrite to the store, read-back — "
              "one adjudicated row covering filter, rebalance, and the "
              "task machinery end-to-end",
          tags=("task", "sampling", "text", "mixture", "framework", "llm"))
def f05_quality_mixture_pipeline(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from projectone_spark.session import configure
    from projectone_spark.store import TableStore
    from projectone_spark.task import SparkTask

    configure(spark)
    root = scratch_dir(prefix="po_f05_store_")
    body = textwrap.dedent("""
        import pyspark.sql.functions as F
        def quality_mixture(docs):
            from projectone_spark.functions.sampling import (
                estimate_tokens, mixture_rebalance)
            from projectone_spark.functions.text import gopher_rules
            # keep_cols pass-through instead of a join back to docs (a
            # self-join doubles analyzer/codegen work on the large gopher
            # tree), and the checkpoint sits BEFORE the filter: inlining
            # the four rule trees into one filter predicate re-generates
            # a pathological codegen body on EVERY run (~6 s driver time,
            # data-size independent); against the checkpointed frame the
            # filter is a plain boolean-column test, and the same barrier
            # serves mixture_rebalance's three input references
            # (mass / corpus-total scalar / final join).
            stats = (gopher_rules(docs, keep_cols=["source", "n_chars"])
                     .localCheckpoint(eager=False))
            base = (stats.filter("keep")
                    .select("doc_id", "source",
                            estimate_tokens("n_chars").alias("toks")))
            return mixture_rebalance(base)
    """)
    task = (SparkTask.builder
            .setName("f05")
            .setInput(name="docs", path=f"{sf_dir}/documents.parquet",
                      source="parquet",
                      features=[{"name": "select_columns",
                                 "columns": "doc_id, text, source, n_chars"}])
            .setExecution(name="quality_mixture", body=body)
            .setOutput(name="out", table="f05_out", write_type="overwrite")
            .setStateLocation(scratch_dir(prefix="po_f05_state_"))
            .setStoreLocation(root)
            .setSession(spark)
            .create())
    task.execute()
    return (TableStore(root).read(spark, "f05_out")
            .select("source", "n_docs", "tokens_in", "weight",
                    "n_copies", "tokens_out"))

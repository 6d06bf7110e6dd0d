"""Corpus operators added in round 7 (registry tail):

- t14: BPE tokenizer APPLICATION — encode the corpus with the merge
  rules t12 trains, completing the Sennrich et al. 2016 train/apply
  pair (oracle: t12's unrolled training chain + one replace level per
  merge over the distinct-word vocabulary);
- t15: model-based quality/language classifier in the fastText
  supervised shape (Joulin et al. 2017) — a bounded per-token weight
  table trained on a labeled split, applied scan-side with a hard
  sigmoid, everything in exact integer micro-units;
- f12: the FIVE-STAGE curation flagship — winnowing dedup → bigram-
  surprisal quality gate → bloom decontamination → epoch schedule →
  curriculum binning, run through the SparkTask DAG with store-table
  handoffs at every stage boundary and per-source drop/survivor/
  schedule/bin accounting oracle-checked end-to-end;
- p14: GPT-3-style word-13-gram benchmark decontamination (Brown et
  al. 2020, Appendix C) — the token-level twin of the shingle screens.

Same exactness discipline as corpus4/5: integer arithmetic end-to-end,
float division only as a single final correctly-rounded IEEE op.
"""

from __future__ import annotations

import textwrap

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import check, load, register
from projectone_spark.queries._sql_fragments import _TOKS
from projectone_spark.queries.corpus4 import _bloom_ctes
from projectone_spark.queries.corpus5 import _d13_ctes, _t11_ctes, _t12_ctes

_N_MERGES = 8


def _t14_apply_ctes(n_merges: int = _N_MERGES,
                    src: str = "documents") -> str:
    """The encode-application CTE chain over any doc_id+text relation
    ``src`` — requires t12's training CTEs (``b{{i}}``) in scope: the
    per-document word counts (wf), the DISTINCT-word vocabulary with one
    LEFT-JOIN replace level per learned rule (u0..u{{n}}), the encoded
    lengths (enc), and the per-document fold (agg). Shared by the
    t14/t16 oracles and f13's train-then-encode chain."""
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
    return f"""wf AS MATERIALIZED (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest({_TOKS}) AS w FROM {src}) s
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
  FROM wf JOIN enc USING (w) GROUP BY wf.doc_id)"""


def _t14_sql(n_merges: int = _N_MERGES) -> str:
    """Encode oracle: reuse t12's training CTE chain verbatim (w, v0,
    p{i}/b{i}/v{i}), then apply each learned rule b{i} to the DISTINCT
    corpus words (u0..u{n}) with the identical replace, and fold the
    encoded lengths back over the per-document word counts."""
    return f"""
WITH {_t12_ctes(n_merges)},
{_t14_apply_ctes(n_merges)}
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
    from projectone_spark.functions.text import (
        bpe_doc_word_counts,
        bpe_fold,
        bpe_train_merges_from_counts,
        bpe_vocab_encode,
    )

    docs = load(spark, sf_dir, "documents")
    # ONE corpus tokenize scan (r12, guide §2.4): the checkpointed
    # (doc, word) counts feed BOTH training's word-frequency fold and
    # the encode pipeline — bpe_train_merges previously ran its own
    # spread→tokenize→explode→count pass over the same corpus
    wf = bpe_doc_word_counts(docs)
    # the trained merge table is bounded MODEL STATE (n_merges rows) —
    # a driver collect of the same class as CDC bounds / t12's argmax
    rules = bpe_train_merges_from_counts(wf, n_merges=_N_MERGES).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in rules]
    return bpe_fold(wf, bpe_vocab_encode(wf.select("__w").distinct(),
                                         merges))


def _t15_ctes() -> str:
    """The tok/tf/v/tot/sc/cls CTE chain mirroring
    ``functions/text.linear_token_classifier`` on the documents table
    (label: lang='en', train split: doc_id%7=0), closing with ``cls`` —
    one row per held-out document with (doc_id, n_tokens, logit_micro,
    score_micro, pred, label). Shared by the t15 oracle and t17's
    calibration sweep (the _sql_fragments discipline)."""
    return f"""tok AS (
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
  GROUP BY tf.doc_id),
cls AS (
  SELECT doc_id, n_tokens,
         CAST(dot // n_tokens AS BIGINT) AS logit_micro,
         CAST(least(1000000, (dot // n_tokens + 1000000) // 4) AS BIGINT)
           AS score_micro,
         least(1000000, (dot // n_tokens + 1000000) // 4) > 500000 AS pred,
         label
  FROM sc)"""


_T15_SQL = f"""
WITH {_t15_ctes()}
SELECT doc_id, n_tokens, logit_micro, score_micro, pred, label
FROM cls
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


def _curation_task_builder(spark, root, state):
    """One SparkTask factory shared by the curation DAGs (f12 here, f13
    in corpus8) so the task wiring — execution body, overwrite output,
    state/store locations — exists once."""
    from projectone_spark.task import SparkTask

    def task(name, body, fn, inputs, out_table):
        b = SparkTask.builder.setName(name)
        for inp in inputs:
            b = b.setInput(**inp)
        return (b.setExecution(name=fn, body=textwrap.dedent(body))
                .setOutput(name="out", table=out_table,
                           write_type="overwrite")
                .setStateLocation(state).setStoreLocation(root)
                .setSession(spark).create())

    return task


def _curation_inputs(sf_dir: str):
    """The corpus/benchmark split both curation DAGs read: doc_id % 97
    partitions documents into train-corpus and held-out benchmark."""
    corpus_in = {"name": "corpus", "path": f"{sf_dir}/documents.parquet",
                 "source": "parquet",
                 "read_options": {"filter": "doc_id % 97 <> 0"}}
    bench_in = {"name": "bench", "path": f"{sf_dir}/documents.parquet",
                "source": "parquet",
                "read_options": {"filter": "doc_id % 97 = 0"}}
    return corpus_in, bench_in


# the three curation stages f12 and f13 share — ONE definition, so a
# change to a stage's criterion propagates to both DAGs the same way
# their oracles share _d13_ctes/_t11_ctes/_bloom_ctes by construction
_DEDUP_BODY = """
    import pyspark.sql.functions as F
    from projectone_spark.functions.dedup import winnow_fingerprint_pairs
    def dedup_stage(corpus):
        pairs = winnow_fingerprint_pairs(corpus)
        drops = pairs.select(F.col("doc_id_b").alias("doc_id")).distinct()
        return corpus.join(drops, "doc_id", "left_anti")
"""

_QUALITY_BODY = """
    import pyspark.sql.functions as F
    from projectone_spark.functions.text import bigram_surprise
    def quality_stage(deduped):
        sur = bigram_surprise(deduped)
        thr = sur.agg(F.expr(
            "percentile_disc(0.5) WITHIN GROUP"
            " (ORDER BY surprise_micro)").cast("long").alias("__thr"))
        return (deduped
                .join(sur.select("doc_id", "surprise_micro"), "doc_id")
                .crossJoin(F.broadcast(thr))
                .filter(F.col("surprise_micro") <= F.col("__thr"))
                .drop("__thr"))
"""

_DECONTAM_BODY = """
    import pyspark.sql.functions as F
    from projectone_spark.functions.sampling import (
        bloom_doc_flags, bloom_exact_shingles, bloom_m_bits)
    def decontam_stage(quality, bench):
        # a gate that DROPS documents must pin the bloom's false-positive
        # rate: size the bitset off the benchmark's shingle count (the
        # benchmark is bounded by construction, so the count is a
        # train-time scalar and the bitset stays broadcast-small) — a
        # fixed 8 KiB bitset saturates once the eval suite grows and
        # silently drops the whole corpus
        m = bloom_m_bits(bloom_exact_shingles(bench).count())
        flags = bloom_doc_flags(quality, bench, m_bits=m)
        keep = (flags.filter(4 * F.col("__n_bl") <= 3 * F.col("__n_sh"))
                .select("doc_id"))
        return quality.join(keep, "doc_id", "left_semi")
"""


def _curation_stage_tasks(task, root, corpus_in, bench_in, prefix,
                          decontam_body=_DECONTAM_BODY):
    """Build the shared dedup -> quality -> decontam task chain writing
    dedup_out / quality_out / clean_out store tables. ``decontam_body``
    swaps the screen granularity (f12 gates on shingle-bloom
    containment; f13 gates on the GPT-3 13-gram screen) while the stage
    wiring stays one definition."""
    t_dedup = task(f"{prefix}_dedup", _DEDUP_BODY, "dedup_stage",
                   [corpus_in], "dedup_out")
    t_quality = task(
        f"{prefix}_quality", _QUALITY_BODY, "quality_stage",
        [{"name": "deduped", "path": f"{root}:dedup_out",
          "source": "store"}],
        "quality_out")
    t_decontam = task(
        f"{prefix}_decontam", decontam_body, "decontam_stage",
        [{"name": "quality", "path": f"{root}:quality_out",
          "source": "store"}, bench_in],
        "clean_out")
    return t_dedup, t_quality, t_decontam


def _f12_sql() -> str:
    """Composed oracle for the five-stage pipeline. Every stage reuses
    the fragment its standalone query uses (_d13_ctes, _t11_ctes,
    _bloom_ctes, p11's schedule recipe, p10's quantile binning), chained
    over survivor CTEs s1/s2/s3 — so a drift between f12 and any
    standalone stage oracle is impossible by construction."""
    return f"""
WITH corpus AS (SELECT * FROM documents WHERE doc_id % 97 <> 0),
{_d13_ctes("corpus")},
dd AS (
  SELECT DISTINCT pr.doc_id_b AS doc_id
  FROM pr JOIN nf na ON pr.doc_id_a = na.doc_id
          JOIN nf nb ON pr.doc_id_b = nb.doc_id
  WHERE 2 * n_shared >= na.n_fp + nb.n_fp - n_shared),
s1 AS (SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM dd)),
{_t11_ctes("s1")},
thr AS (SELECT quantile_disc(surprise_micro, 0.5) AS t FROM scored),
s2 AS (
  SELECT s1.*, sc.surprise_micro
  FROM s1 JOIN scored sc USING (doc_id) CROSS JOIN thr
  WHERE sc.surprise_micro <= thr.t),
{_bloom_ctes(sized=True)},
s3 AS (
  SELECT s2.* FROM s2 JOIN per_doc p USING (doc_id)
  WHERE 4 * p.nbl <= 3 * p.nsh),
d AS (SELECT doc_id, source,
             greatest(CAST(1 AS BIGINT), CAST(n_chars AS BIGINT) // 4) AS t
      FROM s3),
m AS (SELECT source, CAST(sum(t) AS BIGINT) AS gt,
             CAST(count(*) AS BIGINT) AS gn
      FROM d GROUP BY source),
s AS (SELECT CAST(sum(gt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS ns FROM m),
w2 AS (SELECT source, gt, gn,
              least(CAST(4000000 AS BIGINT),
                    (1000000 * ((total * 2) // ns)) // gt) AS em
       FROM m CROSS JOIN s),
c AS (SELECT d.doc_id, d.source, d.t, w2.em,
             em // 1000000
             + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                              1, 8)) AS BIGINT)
                         < ((em % 1000000) * 4294967296) // 1000000
               THEN 1 ELSE 0 END AS cp
      FROM d JOIN w2 USING (source)),
sched AS (
  SELECT source, CAST(min(em) AS BIGINT) AS epochs_micro,
         CAST(sum(cp) AS BIGINT) AS n_copies,
         CAST(sum(cp * t) AS BIGINT) AS tokens_out
  FROM c GROUP BY source),
q AS (SELECT quantile_disc(surprise_micro, 0.25) AS q1,
             quantile_disc(surprise_micro, 0.50) AS q2,
             quantile_disc(surprise_micro, 0.75) AS q3 FROM s3),
binned AS (
  SELECT source,
         (CASE WHEN surprise_micro > q.q1 THEN 1 ELSE 0 END
        + CASE WHEN surprise_micro > q.q2 THEN 1 ELSE 0 END
        + CASE WHEN surprise_micro > q.q3 THEN 1 ELSE 0 END) AS bin
  FROM s3 CROSS JOIN q),
bc AS (SELECT source,
         CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b0,
         CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b1,
         CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_b2,
         CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_b3
       FROM binned GROUP BY source),
n0 AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       FROM corpus GROUP BY source),
n1 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s1 GROUP BY source),
n2 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s2 GROUP BY source),
n3 AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM s3 GROUP BY source)
SELECT n0.source, n0.n_docs,
       n0.n_docs - COALESCE(n1.n, 0) AS n_dedup_dropped,
       COALESCE(n1.n, 0) - COALESCE(n2.n, 0) AS n_quality_dropped,
       COALESCE(n2.n, 0) - COALESCE(n3.n, 0) AS n_contam_dropped,
       COALESCE(n3.n, 0) AS n_survivors,
       COALESCE(sched.epochs_micro, 0) AS epochs_micro,
       COALESCE(sched.n_copies, 0) AS n_copies,
       COALESCE(sched.tokens_out, 0) AS tokens_out,
       COALESCE(bc.n_b0, 0) AS n_b0, COALESCE(bc.n_b1, 0) AS n_b1,
       COALESCE(bc.n_b2, 0) AS n_b2, COALESCE(bc.n_b3, 0) AS n_b3
FROM n0 LEFT JOIN n1 USING (source) LEFT JOIN n2 USING (source)
        LEFT JOIN n3 USING (source) LEFT JOIN sched USING (source)
        LEFT JOIN bc USING (source)
"""


@register("f12_curation_dag", _f12_sql(),
          doc="the FULL curation run as a five-task SparkTask DAG with "
              "store-table handoffs: winnowing near-dup removal (d13's "
              "operator) -> bigram-surprisal quality gate at the exact "
              "corpus median (t11) -> bloom decontamination at 3/4 "
              "containment (p09) -> data-constrained epoch schedule "
              "(p11) -> curriculum quartile binning (p10), with "
              "per-source drop/survivor/schedule/bin accounting "
              "oracle-checked and the stage-accounting identities "
              "(drops + survivors = docs; bins sum to survivors) "
              "asserted in-query",
          tags=("sampling", "text", "dedup", "dag", "llm", "pipeline"))
def f12_curation_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.task.dag import PipelineRunner, TaskNode

    configure(spark)
    root = scratch_dir(prefix="po_f12_store_")
    state = scratch_dir(prefix="po_f12_state_")
    task = _curation_task_builder(spark, root, state)
    corpus_in, bench_in = _curation_inputs(sf_dir)

    t_dedup, t_quality, t_decontam = _curation_stage_tasks(
        task, root, corpus_in, bench_in, prefix="f12")

    t_sched = task("f12_schedule", """
        from projectone_spark.functions.sampling import epoch_schedule
        def schedule_stage(clean):
            return epoch_schedule(clean)
    """, "schedule_stage",
        [{"name": "clean", "path": f"{root}:clean_out", "source": "store"}],
        "sched_out")

    t_account = task("f12_accounting", """
        import pyspark.sql.functions as F
        def accounting_stage(corpus, deduped, quality, clean, sched):
            def cnt(df, name):
                return df.groupBy("source").agg(
                    F.count(F.lit(1)).alias(name))
            q = clean.agg(*[
                F.expr(f"percentile_disc({p}) WITHIN GROUP"
                       " (ORDER BY surprise_micro)").cast("long")
                .alias(f"q{i}")
                for i, p in enumerate((0.25, 0.50, 0.75), start=1)])
            binned = (clean.crossJoin(F.broadcast(q))
                      .select("source",
                              ((F.col("surprise_micro") > F.col("q1"))
                               .cast("int")
                               + (F.col("surprise_micro") > F.col("q2"))
                               .cast("int")
                               + (F.col("surprise_micro") > F.col("q3"))
                               .cast("int")).alias("bin")))
            bc = binned.groupBy("source").agg(*[
                F.sum(F.when(F.col("bin") == b, 1).otherwise(0))
                .cast("bigint").alias(f"n_b{b}") for b in range(4)])
            z = F.lit(0).cast("bigint")
            return (cnt(corpus, "n_docs")
                    .join(cnt(deduped, "__n1"), "source", "left")
                    .join(cnt(quality, "__n2"), "source", "left")
                    .join(cnt(clean, "__n3"), "source", "left")
                    .join(sched.select("source", "epochs_micro",
                                       "n_copies", "tokens_out"),
                          "source", "left")
                    .join(bc, "source", "left")
                    .select(
                        "source", "n_docs",
                        (F.col("n_docs") - F.coalesce("__n1", z))
                        .alias("n_dedup_dropped"),
                        (F.coalesce("__n1", z) - F.coalesce("__n2", z))
                        .alias("n_quality_dropped"),
                        (F.coalesce("__n2", z) - F.coalesce("__n3", z))
                        .alias("n_contam_dropped"),
                        F.coalesce("__n3", z).alias("n_survivors"),
                        F.coalesce("epochs_micro", z).alias("epochs_micro"),
                        F.coalesce("n_copies", z).alias("n_copies"),
                        F.coalesce("tokens_out", z).alias("tokens_out"),
                        F.coalesce("n_b0", z).alias("n_b0"),
                        F.coalesce("n_b1", z).alias("n_b1"),
                        F.coalesce("n_b2", z).alias("n_b2"),
                        F.coalesce("n_b3", z).alias("n_b3")))
    """, "accounting_stage",
        [corpus_in,
         {"name": "deduped", "path": f"{root}:dedup_out", "source": "store"},
         {"name": "quality", "path": f"{root}:quality_out",
          "source": "store"},
         {"name": "clean", "path": f"{root}:clean_out", "source": "store"},
         {"name": "sched", "path": f"{root}:sched_out", "source": "store"}],
        "f12_final")

    runs = PipelineRunner(spark).run([
        TaskNode("f12_dedup", t_dedup.config),
        TaskNode("f12_quality", t_quality.config, depends_on=["f12_dedup"]),
        TaskNode("f12_decontam", t_decontam.config,
                 depends_on=["f12_quality"]),
        TaskNode("f12_schedule", t_sched.config,
                 depends_on=["f12_decontam"]),
        TaskNode("f12_accounting", t_account.config,
                 depends_on=["f12_schedule"]),
    ])
    bad = {n: r.error for n, r in runs.items() if r.status != "SUCCESS"}
    check(not bad, f"f12 DAG tasks failed: {bad}")

    out = (TableStore(root).read(spark, "f12_final")
           .select("source", "n_docs", "n_dedup_dropped",
                   "n_quality_dropped", "n_contam_dropped", "n_survivors",
                   "epochs_micro", "n_copies", "tokens_out",
                   "n_b0", "n_b1", "n_b2", "n_b3")
           .localCheckpoint(eager=True))  # the checks below and the
    # returned frame must not each re-read the store table
    rows = out.collect()  # bounded: one row per source
    check(len(rows) > 0, "f12 produced no sources")
    for r in rows:
        check(r["n_dedup_dropped"] + r["n_quality_dropped"]
              + r["n_contam_dropped"] + r["n_survivors"] == r["n_docs"],
              f"stage accounting does not sum for {r['source']}: {r}")
        check(r["n_b0"] + r["n_b1"] + r["n_b2"] + r["n_b3"]
              == r["n_survivors"],
              f"curriculum bins do not sum to survivors for "
              f"{r['source']}: {r}")
        check(r["n_copies"] >= r["n_survivors"] * (r["epochs_micro"]
                                                   // 1_000_000),
              f"schedule copies below the whole-epoch floor for "
              f"{r['source']}: {r}")
    return out



#: the word-13-gram md5 digest of a token-array column named ``toks``
#: (12-ahead slice == 13 consecutive words) — ONE definition shared by
#: the p14 / f13 / f14 oracles so the gram width cannot drift
_GRAM13_H = "md5(array_to_string(toks[i:i+12], ' '))"


def _gram13_digest_sql(cols: str, src: str) -> str:
    """DISTINCT 13-gram digests of ``src`` (a relation exposing
    ``toks``), optionally carrying ``cols`` alongside each digest."""
    pre = f"{cols}, " if cols else ""
    return (f"SELECT DISTINCT {pre}{_GRAM13_H} AS h\n"
            f"  FROM {src}, unnest(range(1, greatest(len(toks) - 12, 0) + 1))"
            f" AS u(i)")


_P14_SQL = f"""WITH c AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents
           WHERE doc_id % 97 <> 0),
b AS (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 97 = 0),
bg AS ({_gram13_digest_sql("", "b")}),
cg AS ({_gram13_digest_sql("doc_id, source", "c")})
SELECT cg.doc_id, cg.source,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN bg.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dirty,
       sum(CASE WHEN bg.h IS NOT NULL THEN 1 ELSE 0 END) > 0 AS dirty
FROM cg LEFT JOIN bg ON cg.h = bg.h
GROUP BY cg.doc_id, cg.source
"""


@register("p14_ngram_decontamination", _P14_SQL,
          doc="GPT-3-style 13-gram benchmark decontamination (Brown et "
              "al. 2020, Appendix C): a corpus document is dirty when it "
              "shares ANY word 13-gram with the benchmark split — the "
              "token-level twin of the shingle screens (p09/d12), "
              "catching verbatim quotation with near-zero false "
              "positives; grams are row-local-distinct, carried as md5 "
              "digests, and the benchmark side broadcasts",
          tags=("sampling", "dedup", "text", "llm"))
def p14_ngram_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import token_ngram_contamination

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return token_ngram_contamination(corpus, bench)

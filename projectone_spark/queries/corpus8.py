"""Corpus operators added in round 8 (registry tail):

- t16: production-scale BPE encode — the Arrow-batched ``mapInPandas``
  vocabulary stage t14's 256-merge guard promises, proven EQUAL to the
  Catalyst expression chain in-query (both engines encode the same
  vocabulary frame; the multiset difference must be empty) with every
  corpus-sized part of the plan unchanged;
- t17: quality-classifier threshold calibration — a precision/recall/F1
  sweep over score cutoffs on t15's held-out scores, exact integer
  micro-units, cumulative-count monotonicity asserted in-query;
- d14: variable-length repeated-substring detection — the distributed
  chained-gram-run approximation of ExactSubstr dedup (Lee et al. 2022)
  at the production ≥50-token threshold, extending d10's fixed-8-gram
  machinery with positions and one per-document run-coalescing window;
- f13: the flagship extended to actual TRAINING BATCHES — curate
  (winnow dedup → surprisal gate, f12's shared stage bodies → GPT-3
  13-gram decontamination, p14's screen at the production granularity)
  then train a BPE tokenizer ON the clean corpus, encode with the Arrow
  vocabulary stage, and pack token counts into fixed-length sequences,
  with the packing identity Σ tokens_in = tokens_packed + tail_waste
  asserted in-query and per-source accounting oracle-checked;
- d15: the APPLY step of ExactSubstr — token-interval union of d14's
  flagged runs (running-max merge), per-document removed/kept counts;
- t18: exact ROC-AUC by the Mann-Whitney rank-sum identity — the
  threshold-free companion to t17;
- e15: Gonzalez farthest-first k-center seeding, every pick adjudicated
  against a fully unrolled per-seed oracle;
- p15: score-proportional deterministic sampling (the CCNet/DataComp
  soft quality filter) via the engine-portable md5 uniform.

Same exactness discipline as corpus4-7: integer arithmetic end-to-end,
float division only as a single final correctly-rounded IEEE op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.functions import multiset_diff_count
from projectone_spark.queries import check, load, register
from projectone_spark.queries._sql_fragments import _NORM, _TOKS
from projectone_spark.queries.corpus5 import _d13_ctes, _t11_ctes, _t12_ctes
from projectone_spark.queries.corpus7 import (
    _GRAM13_H,
    _N_MERGES,
    _gram13_digest_sql,
    _t14_apply_ctes,
    _t14_sql,
    _t15_ctes,
)


@register("t16_bpe_encode_arrow", _t14_sql(),
          doc="production-scale BPE encode (the Arrow-batched vocabulary "
              "stage t14's 256-merge guard names): the merge chain runs "
              "as one mapInPandas stage over the DISTINCT-word "
              "vocabulary — each Arrow batch applies every rule as a "
              "C-speed str.replace pass over a joined blob, so the form "
              "scales to 30k-100k-rule tokenizer tables where a codegen "
              "expression tree cannot — while every corpus-sized part "
              "of the plan (ONE scan into the checkpointed (doc, word) "
              "count, one vocabulary equi-join back) is unchanged; the "
              "pandas stage is proven bit-for-bit EQUAL to the "
              "expression chain in-query before its result is used, and "
              "the oracle is t14's training+apply chain",
          tags=("text", "tokenizer", "llm", "arrow"))
def t16_bpe_encode_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import (
        bpe_doc_word_counts,
        bpe_fold,
        bpe_train_merges_from_counts,
        bpe_vocab_encode,
    )

    docs = load(spark, sf_dir, "documents")
    # ONE corpus tokenize scan (r12): training folds the checkpointed
    # (doc, word) counts the encode pipeline already computes
    wf = bpe_doc_word_counts(docs)
    # bounded model state: n_merges rows (same driver-collect class as t14)
    rules = bpe_train_merges_from_counts(wf, n_merges=_N_MERGES).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in rules]
    vocab = wf.select("__w").distinct()
    e_arrow = (bpe_vocab_encode(vocab, merges, engine="arrow")
               .localCheckpoint(eager=False))
    # the equivalence gate runs at the VOCABULARY level (bounded), not
    # over the corpus fold: the two engines must produce the identical
    # multiset of (word, len, nsym) rows — both exceptAll directions
    # union into ONE symmetric-difference job
    e_expr = bpe_vocab_encode(vocab, merges, engine="expr") \
        .localCheckpoint(eager=False)
    check(multiset_diff_count(e_arrow, e_expr) == 0,
          "arrow vocabulary encode diverges from the expression chain")
    return bpe_fold(wf, e_arrow)


_STEP = 50_000


def _t17_sql(step: int = _STEP) -> str:
    n_cuts = 1_000_000 // step + 1
    return f"""
WITH {_t15_ctes()},
bk AS (
  -- explicit negative-bucket floor mirroring the Spark side: DuckDB's
  -- // TRUNCATES toward zero (-7 // 2 = -3), it does not floor, so a
  -- negative score must be floored by hand or the oracle would count
  -- it as predicted positive at cutoff 0, violating score >= c
  SELECT CASE WHEN score_micro >= 0 THEN score_micro // {step}
              ELSE -((-score_micro + {step - 1}) // {step}) END AS b,
         label, CAST(count(*) AS BIGINT) AS n
  FROM cls GROUP BY 1, 2),
ct AS (
  SELECT CAST(coalesce(sum(CASE WHEN label THEN n END), 0) AS BIGINT) AS pos,
         CAST(coalesce(sum(CASE WHEN NOT label THEN n END), 0) AS BIGINT)
           AS neg
  FROM bk),
ks AS (SELECT CAST(unnest(range(0, {n_cuts})) AS BIGINT) AS k),
agg AS (
  SELECT ks.k,
         CAST(coalesce(sum(CASE WHEN bk.label THEN bk.n END), 0) AS BIGINT)
           AS tp,
         CAST(coalesce(sum(CASE WHEN NOT bk.label THEN bk.n END), 0)
              AS BIGINT) AS fp
  FROM ks LEFT JOIN bk ON bk.b >= ks.k
  GROUP BY ks.k)
SELECT CAST(k * {step} AS BIGINT) AS cutoff_micro, tp, fp,
       CAST(pos - tp AS BIGINT) AS fn,
       CAST(neg - fp AS BIGINT) AS tn,
       CASE WHEN tp + fp > 0
            THEN CAST((1000000 * tp) // (tp + fp) AS BIGINT) END
         AS precision_micro,
       CASE WHEN pos > 0 THEN CAST((1000000 * tp) // pos AS BIGINT) END
         AS recall_micro,
       CASE WHEN tp + fp + pos > 0
            THEN CAST((2000000 * tp) // (tp + fp + pos) AS BIGINT) END
         AS f1_micro
FROM agg CROSS JOIN ct
"""


@register("t17_classifier_calibration", _t17_sql(),
          doc="quality-classifier threshold calibration (pairs with t15 "
              "the way e08 pairs with e04): a precision/recall/F1 sweep "
              "over a fixed micro-unit cutoff grid on the held-out "
              "scores — ONE corpus-sized (score-bucket, label) "
              "aggregate, then everything folds the bounded bucket "
              "frame; exact integer micro-unit ratios, and the "
              "cumulative-count monotonicity (tp/fp non-increasing in "
              "the cutoff) plus the confusion identities (tp+fn = pos, "
              "fp+tn = neg per row) asserted in-query",
          tags=("text", "quality", "llm"))
def t17_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.text import (
        classifier_calibration,
        linear_token_classifier,
    )

    scored = linear_token_classifier(
        load(spark, sf_dir, "documents"),
        label=F.col("lang") == "en",
        train=F.col("doc_id") % 7 == 0)
    out = classifier_calibration(scored, step=_STEP) \
        .localCheckpoint(eager=True)  # the gate below and the returned
    # frame must not each replay the corpus-sized scoring pipeline
    rows = sorted(out.collect(), key=lambda r: r["cutoff_micro"])  # bounded:
    # one row per grid cutoff (21 at the default step)
    check(len(rows) == 1_000_000 // _STEP + 1, "calibration grid incomplete")
    pos, neg = rows[0]["tp"] + rows[0]["fn"], rows[0]["fp"] + rows[0]["tn"]
    for prev, cur in zip(rows, rows[1:]):
        check(cur["tp"] <= prev["tp"] and cur["fp"] <= prev["fp"],
              f"cumulative counts not monotone at {cur['cutoff_micro']}")
    for r in rows:
        check(r["tp"] + r["fn"] == pos and r["fp"] + r["tn"] == neg,
              f"confusion identities broken at {r['cutoff_micro']}")
    return out


_D14_N = 8
_D14_MIN_RUN = 50


def _d14_base_ctes(n: int = _D14_N) -> str:
    """The duplicated-position CTE chain (t/g/dup/dp/isl/np) both
    ExactSubstr-approximation oracles fold — mirrors
    ``functions/dedup._duplicate_position_frames``."""
    return f"""t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (
  SELECT DISTINCT doc_id, i AS pos,
         array_to_string(toks[i:i+{n - 1}], ' ') AS gram
  FROM t, unnest(range(1, greatest(len(toks) - {n - 1}, 0) + 1)) AS u(i)),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
dp AS (SELECT DISTINCT doc_id, pos FROM g
       WHERE gram IN (SELECT gram FROM dup)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS i
  FROM dp),
np AS (SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_positions
       FROM g GROUP BY doc_id)"""


def _d14_sql(n: int = _D14_N, min_run: int = _D14_MIN_RUN) -> str:
    return f"""
WITH {_d14_base_ctes(n)},
runs AS (
  SELECT doc_id, CAST(count(*) + {n - 1} AS BIGINT) AS rtok
  FROM isl GROUP BY doc_id, i),
fl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs,
         CAST(max(rtok) AS BIGINT) AS max_run_tokens,
         CAST(sum(rtok) AS BIGINT) AS run_tokens
  FROM runs WHERE rtok >= {min_run} GROUP BY doc_id),
nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_positions
       FROM dp GROUP BY doc_id)
SELECT np.doc_id, np.n_positions,
       CAST(coalesce(nd.n_dup_positions, 0) AS BIGINT) AS n_dup_positions,
       CAST(coalesce(fl.n_runs, 0) AS BIGINT) AS n_runs,
       CAST(coalesce(fl.max_run_tokens, 0) AS BIGINT) AS max_run_tokens,
       CAST(coalesce(fl.run_tokens, 0) AS BIGINT) AS run_tokens,
       coalesce(fl.n_runs, 0) = 0 AS keep
FROM np LEFT JOIN nd USING (doc_id) LEFT JOIN fl USING (doc_id)
"""


@register("d14_duplicate_runs", _d14_sql(),
          doc="variable-length repeated-substring detection — the "
              "chained-gram-run approximation of ExactSubstr dedup (Lee "
              "et al. 2022 §4.1) at the production ≥50-token threshold: "
              "a position is duplicated when its word 8-gram occurs ≥2 "
              "times anywhere in the corpus (self-repeats included), "
              "and maximal consecutive duplicated positions coalesce "
              "into runs via one per-document window; per-document "
              "position/run/span accounting and the keep verdict are "
              "oracle-checked",
          tags=("dedup", "text", "llm"))
def d14_duplicate_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import duplicate_run_stats

    return duplicate_run_stats(load(spark, sf_dir, "documents"),
                               n=_D14_N, min_run_tokens=_D14_MIN_RUN)


_SEQ_LEN = 512


def _f13_sql() -> str:
    """Composed oracle: f12's dedup + quality fragments reused verbatim
    (drift with the standalone stage oracles is impossible by
    construction), then the p14-granularity 13-gram dirty set gating
    s3, then t12's training CTEs and t14's apply CTEs retargeted at s3
    (the tokenizer is trained ON the clean corpus), then p03's
    prefix-sum packing recipe per source."""
    return f"""
WITH corpus AS MATERIALIZED (
  SELECT * FROM documents WHERE doc_id % 97 <> 0),
{_d13_ctes("corpus")},
dd AS (
  SELECT DISTINCT pr.doc_id_b AS doc_id
  FROM pr JOIN nf na ON pr.doc_id_a = na.doc_id
          JOIN nf nb ON pr.doc_id_b = nb.doc_id
  WHERE 2 * n_shared >= na.n_fp + nb.n_fp - n_shared),
s1 AS MATERIALIZED (
  SELECT * FROM corpus WHERE doc_id NOT IN (SELECT doc_id FROM dd)),
{_t11_ctes("s1")},
thr AS (SELECT quantile_disc(surprise_micro, 0.5) AS t FROM scored),
s2 AS MATERIALIZED (
  SELECT s1.*
  FROM s1 JOIN scored sc USING (doc_id) CROSS JOIN thr
  WHERE sc.surprise_micro <= thr.t),
g13b AS ({_gram13_digest_sql(
    "", "(SELECT {0} AS toks FROM documents WHERE doc_id %% 97 = 0) b".replace("%%", "%").format(_TOKS))}),
dirty13 AS (
  SELECT DISTINCT c.doc_id
  FROM (SELECT doc_id, {_TOKS} AS toks FROM s2) c,
       unnest(range(1, greatest(len(toks) - 12, 0) + 1)) AS u(i)
  WHERE {_GRAM13_H} IN (SELECT h FROM g13b)),
s3 AS MATERIALIZED (
  SELECT s2.* FROM s2
  WHERE doc_id NOT IN (SELECT doc_id FROM dirty13)),
{_t12_ctes(_N_MERGES, "s3")},
{_t14_apply_ctes(_N_MERGES, "s3")},
pk AS (
  SELECT s3.source, agg.doc_id, agg.n_bpe_tokens AS toks,
         CAST(floor((sum(agg.n_bpe_tokens)
                       OVER (PARTITION BY s3.source ORDER BY agg.doc_id
                             ROWS UNBOUNDED PRECEDING) - agg.n_bpe_tokens)
                    / {float(_SEQ_LEN)}) AS BIGINT) AS bin
  FROM agg JOIN s3 USING (doc_id)),
bins AS (
  SELECT source, bin, CAST(sum(toks) AS BIGINT) AS bin_tokens
  FROM pk GROUP BY source, bin),
per_src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(bin_tokens // {_SEQ_LEN}) AS BIGINT) AS n_seqs,
         CAST(sum(bin_tokens % {_SEQ_LEN}) AS BIGINT) AS tail_tokens
  FROM bins GROUP BY source),
toks_in AS (
  SELECT source, CAST(sum(toks) AS BIGINT) AS tokens_in
  FROM pk GROUP BY source),
surv AS (SELECT source, CAST(count(*) AS BIGINT) AS n_survivors
         FROM s3 GROUP BY source)
SELECT surv.source, surv.n_survivors,
       CAST(coalesce(toks_in.tokens_in, 0) AS BIGINT) AS tokens_in,
       CAST(coalesce(per_src.n_bins, 0) AS BIGINT) AS n_bins,
       CAST(coalesce(per_src.n_seqs, 0) AS BIGINT) AS n_seqs,
       CAST(coalesce(per_src.n_seqs, 0) * {_SEQ_LEN} AS BIGINT)
         AS tokens_packed,
       CAST(coalesce(per_src.tail_tokens, 0) AS BIGINT) AS tail_tokens
FROM surv LEFT JOIN toks_in USING (source) LEFT JOIN per_src USING (source)
"""


_NGRAM_DECONTAM_BODY = """
    import pyspark.sql.functions as F
    from projectone_spark.functions.sampling import (
        token_ngram_contamination)
    def decontam_stage(quality, bench):
        # the GPT-3 13-gram screen (p14's operator): drop a document iff
        # it shares ANY word 13-gram with the benchmark. f12's shingle-
        # bloom containment gate is the wrong granularity for a FILTER
        # when corpus and benchmark share a sentence pool — short
        # shingles flag everything; verbatim 13-grams flag only real
        # leakage. Docs with < 13 tokens have no grams and pass
        # vacuously (the anti-join keeps them).
        flags = token_ngram_contamination(quality, bench, n=13)
        dirty = flags.filter(F.col("dirty")).select("doc_id")
        return quality.join(dirty, "doc_id", "left_anti")
"""


@register("f13_training_batches", _f13_sql(),
          doc="the curation flagship extended to actual TRAINING "
              "BATCHES, as a five-task SparkTask DAG with store-table "
              "handoffs: winnowing near-dup removal -> bigram-surprisal "
              "median gate (f12's stages 1-2, shared bodies) -> GPT-3 "
              "13-gram decontamination (p14's screen — the production "
              "granularity; a shingle-containment gate drops everything "
              "once the corpus shares a sentence pool with the split) "
              "-> BPE tokenizer trained ON the clean corpus and applied "
              "through the Arrow vocabulary stage (t16's engine) -> "
              "prefix-sum packing of encoded token counts into "
              "512-token sequences (p03's recipe per source); "
              "per-source survivor/token/sequence accounting is "
              "oracle-checked and the packing identity "
              "tokens_in = tokens_packed + tail_waste asserted in-query",
          tags=("sampling", "text", "dedup", "dag", "llm", "pipeline",
                "tokenizer"))

def f13_training_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.queries.corpus7 import (
        _curation_inputs,
        _curation_stage_tasks,
        _curation_task_builder,
    )
    from projectone_spark.session import configure, scratch_dir
    from projectone_spark.store import TableStore
    from projectone_spark.task.dag import PipelineRunner, TaskNode

    configure(spark)
    root = scratch_dir(prefix="po_f13_store_")
    state = scratch_dir(prefix="po_f13_state_")
    task = _curation_task_builder(spark, root, state)
    corpus_in, bench_in = _curation_inputs(sf_dir)

    # stages 1-2 are f12's by construction (shared bodies, the same way
    # the oracle reuses f12's CTE fragments); stage 3 swaps in the
    # 13-gram screen
    t_dedup, t_quality, t_decontam = _curation_stage_tasks(
        task, root, corpus_in, bench_in, prefix="f13",
        decontam_body=_NGRAM_DECONTAM_BODY)

    t_encode = task("f13_encode", """
        from projectone_spark.functions.text import (
            bpe_doc_word_counts, bpe_fold, bpe_train_merges_from_counts,
            bpe_vocab_encode)
        def encode_stage(clean):
            # ONE corpus tokenize scan (r12): training folds the
            # checkpointed (doc, word) counts the encode reuses
            wf = bpe_doc_word_counts(clean)
            # bounded model state: the trained rule table (8 rows here;
            # the Arrow engine is the 30k-rule production path)
            rules = bpe_train_merges_from_counts(wf, n_merges=8).collect()
            merges = [(r["left_sym"], r["right_sym"]) for r in rules]
            enc = bpe_vocab_encode(wf.select("__w").distinct(), merges,
                                   engine="arrow")
            return (bpe_fold(wf, enc)
                    .join(clean.select("doc_id", "source"), "doc_id"))
    """, "encode_stage",
        [{"name": "clean", "path": f"{root}:clean_out", "source": "store"}],
        "encode_out")

    t_pack = task("f13_pack", """
        import pyspark.sql.functions as F
        from projectone_spark.functions.sampling import pack_sequences
        def pack_stage(enc, clean):
            packed = pack_sequences(enc, "n_bpe_tokens", 512,
                                    ["source"], "doc_id")
            bins = (packed.groupBy("source", "bin")
                    .agg(F.sum("n_bpe_tokens").alias("bin_tokens")))
            per_src = bins.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_bins"),
                F.sum(F.expr("bin_tokens div 512")).alias("n_seqs"),
                F.sum(F.expr("bin_tokens % 512")).alias("tail_tokens"))
            toks = enc.groupBy("source").agg(
                F.sum("n_bpe_tokens").alias("tokens_in"))
            surv = clean.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_survivors"))
            z = F.lit(0).cast("bigint")
            return (surv.join(toks, "source", "left")
                    .join(per_src, "source", "left")
                    .select("source", "n_survivors",
                            F.coalesce("tokens_in", z).alias("tokens_in"),
                            F.coalesce("n_bins", z).alias("n_bins"),
                            F.coalesce("n_seqs", z).alias("n_seqs"),
                            (F.coalesce("n_seqs", z) * 512)
                            .alias("tokens_packed"),
                            F.coalesce("tail_tokens", z)
                            .alias("tail_tokens")))
    """, "pack_stage",
        [{"name": "enc", "path": f"{root}:encode_out", "source": "store"},
         {"name": "clean", "path": f"{root}:clean_out", "source": "store"}],
        "f13_final")

    runs = PipelineRunner(spark).run([
        TaskNode("f13_dedup", t_dedup.config),
        TaskNode("f13_quality", t_quality.config, depends_on=["f13_dedup"]),
        TaskNode("f13_decontam", t_decontam.config,
                 depends_on=["f13_quality"]),
        TaskNode("f13_encode", t_encode.config, depends_on=["f13_decontam"]),
        TaskNode("f13_pack", t_pack.config, depends_on=["f13_encode"]),
    ])
    bad = {n: r.error for n, r in runs.items() if r.status != "SUCCESS"}
    check(not bad, f"f13 DAG tasks failed: {bad}")

    out = (TableStore(root).read(spark, "f13_final")
           .select("source", "n_survivors", "tokens_in", "n_bins",
                   "n_seqs", "tokens_packed", "tail_tokens")
           .localCheckpoint(eager=True))  # the checks below and the
    # returned frame must not each re-read the store table
    rows = out.collect()  # bounded: one row per source
    check(len(rows) > 0, "f13 produced no sources")
    for r in rows:
        check(r["tokens_in"] == r["tokens_packed"] + r["tail_tokens"],
              f"packing identity broken for {r['source']}: {r}")
        check(r["tokens_packed"] == r["n_seqs"] * _SEQ_LEN,
              f"sequence accounting broken for {r['source']}: {r}")
        check(r["tokens_in"] == 0 or r["n_bins"] >= 1,
              f"tokens without bins for {r['source']}: {r}")
    return out


def _d15_sql(n: int = _D14_N, min_run: int = _D14_MIN_RUN) -> str:
    """d14's duplicated-position chain plus the exact token-interval
    union: runs carry their start, intervals [start, start+rtok-1]
    merge by the running-max-end window, and the union size per doc is
    what the removal cuts."""
    return f"""
WITH {_d14_base_ctes(n)},
runs AS (
  SELECT doc_id, CAST(min(pos) AS BIGINT) AS st,
         CAST(count(*) + {n - 1} AS BIGINT) AS rtok
  FROM isl GROUP BY doc_id, i
  HAVING count(*) + {n - 1} >= {min_run}),
iv AS (SELECT doc_id, st, st + rtok - 1 AS en FROM runs),
mk AS (
  SELECT doc_id, st, en,
         CASE WHEN st > coalesce(max(en) OVER (
                PARTITION BY doc_id ORDER BY st
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nw
  FROM iv),
gr AS (
  SELECT doc_id, st, en,
         sum(nw) OVER (PARTITION BY doc_id ORDER BY st
                       ROWS UNBOUNDED PRECEDING) AS grp
  FROM mk),
cov AS (SELECT doc_id, grp, max(en) - min(st) + 1 AS c
        FROM gr GROUP BY doc_id, grp),
rem AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS tokens_removed
        FROM cov GROUP BY doc_id),
nr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs
       FROM runs GROUP BY doc_id)
SELECT np.doc_id,
       CAST(np.n_positions + {n - 1} AS BIGINT) AS n_tokens,
       CAST(coalesce(nr.n_runs, 0) AS BIGINT) AS n_runs,
       CAST(coalesce(rem.tokens_removed, 0) AS BIGINT) AS tokens_removed,
       CAST(np.n_positions + {n - 1} - coalesce(rem.tokens_removed, 0)
            AS BIGINT) AS tokens_kept
FROM np LEFT JOIN nr USING (doc_id) LEFT JOIN rem USING (doc_id)
"""


@register("d15_duplicate_run_removal", _d15_sql(),
          doc="the APPLY step of ExactSubstr dedup (Lee et al. 2022 "
              "remove the repeated spans, not the documents — dropping "
              "whole docs distorts the length distribution): d14's "
              "flagged runs become token intervals, overlapping "
              "intervals merge by the running-max-end window (one more "
              "bounded per-document pass), and the per-document "
              "removed/kept token accounting is oracle-checked; pairs "
              "d14 the way t14's encode pairs t12's training",
          tags=("dedup", "text", "llm"))
def d15_duplicate_run_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import duplicate_run_removal

    return duplicate_run_removal(load(spark, sf_dir, "documents"),
                                 n=_D14_N, min_run_tokens=_D14_MIN_RUN)


def _t18_sql() -> str:
    return f"""
WITH {_t15_ctes()},
b AS (
  SELECT score_micro AS s,
         CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS BIGINT) AS nn
  FROM cls GROUP BY score_micro),
c AS (
  SELECT s, np, nn,
         coalesce(sum(nn) OVER (ORDER BY s ROWS BETWEEN UNBOUNDED
                                PRECEDING AND 1 PRECEDING), 0) AS nb
  FROM b)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       CAST(count(*) AS BIGINT) AS n_scores,
       CAST(sum(np * (2 * nb + nn)) AS BIGINT) AS two_u,
       CASE WHEN sum(np) > 0 AND sum(nn) > 0
            THEN CAST((1000000 * sum(np * (2 * nb + nn)))
                      // (2 * sum(np) * sum(nn)) AS BIGINT) END AS auc_micro
FROM c
"""


@register("t18_roc_auc", _t18_sql(),
          doc="exact ROC-AUC of the t15 classifier's held-out scores by "
              "the Mann-Whitney rank-sum identity with tie correction "
              "(2U = sum over distinct scores of npos*(2*neg_below + "
              "nneg)) — the threshold-free companion to t17's "
              "fixed-grid sweep: ONE corpus-sized aggregate onto the "
              "micro-unit-bounded distinct-score frame, then a "
              "cumulative window over that bounded frame only; exact "
              "integers until one closing truncating division",
          tags=("text", "quality", "llm"))
def t18_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.text import (
        linear_token_classifier,
        roc_auc_exact,
    )

    scored = linear_token_classifier(
        load(spark, sf_dir, "documents"),
        label=F.col("lang") == "en",
        train=F.col("doc_id") % 7 == 0)
    return roc_auc_exact(scored)


_E15_K = 8


def _e15_sql(k: int = _E15_K) -> str:
    """Unrolled farthest-first oracle (the e14 unroll technique): one
    argmax CTE level per seed, squared distances folded sequentially in
    double exactly as the Spark side's scan-side least() chain."""
    from projectone_spark.queries._embed_sql import _E_DBL

    def sq(a: str, b: str) -> str:
        return (f"list_aggregate(list_transform(range(1, len({a}) + 1),"
                f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')")

    parts = [f"""WITH v AS (SELECT vec_id, {_E_DBL} AS e FROM embeddings),
s0 AS (SELECT vec_id, e FROM v ORDER BY vec_id LIMIT 1)"""]
    srcs = ["s0"]
    for i in range(1, k):
        dists = [sq("v.e", f"{s}.e") for s in srcs]
        d = dists[0] if len(dists) == 1 else f"least({', '.join(dists)})"
        joins = " CROSS JOIN ".join(srcs)
        parts.append(f""",
s{i} AS (
  SELECT v.vec_id, v.e, {d} AS d
  FROM v CROSS JOIN {joins}
  ORDER BY d DESC, v.vec_id LIMIT 1)""")
        srcs.append(f"s{i}")
    sel = ["SELECT CAST(0 AS BIGINT) AS seed_rank, vec_id,"
           " CAST(NULL AS DOUBLE) AS dist_sq FROM s0"]
    sel += [f"SELECT CAST({i} AS BIGINT), vec_id, d FROM s{i}"
            for i in range(1, k)]
    parts.append("\n" + "\nUNION ALL\n".join(sel))
    return "".join(parts)


@register("e15_farthest_first_seeds", _e15_sql(),
          doc="Gonzalez farthest-first traversal (k-center seeding, the "
              "deterministic limit of k-means++ D^2 sampling) — pairs "
              "e14's Lloyd refinement the way seeding pairs training: "
              "k-1 rounds of ONE corpus scan against a scan-side "
              "least() of literal squared-distance folds (chosen seeds "
              "are k-bounded driver rows), each round collecting one "
              "argmax row with ties to the lowest id; every pick and "
              "its selection distance oracle-checked against a fully "
              "unrolled per-seed CTE chain",
          tags=("embeddings", "clustering", "ann", "llm"))
def e15_farthest_first_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.embeddings import kmeans_farthest_first

    return kmeans_farthest_first(load(spark, sf_dir, "embeddings"),
                                 k=_E15_K)


def _p15_sql(scale: int = 1_000_000, salt: str = "qws") -> str:
    return f"""
WITH {_t15_ctes()}
SELECT doc_id, score_micro,
       CAST(('0x' || substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)),
                            1, 8)) AS BIGINT) * {scale}
         < score_micro * 4294967296 AS kept
FROM cls
"""


@register("p15_quality_weighted_sample", _p15_sql(),
          doc="score-proportional deterministic sampling — the SOFT "
              "quality filter (CCNet/DataComp/FineWeb recipe: sample by "
              "classifier score instead of a hard cutoff, so "
              "mid-quality text is down-weighted, not eliminated): "
              "every document kept with probability exactly "
              "score/scale via the engine-portable md5 uniform of "
              "salt:id, all exact BIGINT arithmetic, scan-side, no RNG "
              "state — every per-document verdict oracle-checked, and "
              "the clamp identities (score<=0 never kept, "
              "score>=scale always kept) asserted in-query",
          tags=("sampling", "quality", "llm"))
def p15_quality_weighted_sample(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import quality_weighted_sample
    from projectone_spark.functions.text import linear_token_classifier

    scored = linear_token_classifier(
        load(spark, sf_dir, "documents"),
        label=F.col("lang") == "en",
        train=F.col("doc_id") % 7 == 0)
    out = (quality_weighted_sample(scored)
           .select("doc_id", "score_micro", "kept")
           .localCheckpoint(eager=True))  # the clamp gates below and
    # the returned frame must not each replay the scoring pipeline
    bad = out.filter(
        ((F.col("score_micro") <= 0) & F.col("kept"))
        | ((F.col("score_micro") >= 1_000_000) & ~F.col("kept"))).count()
    check(bad == 0, f"{bad} documents violate the sampling clamp")
    return out


def _p16_sql(scale: int = 1_000_000, en: int = 1, ed: int = 1) -> str:
    """Mirror of functions/sampling.doremi_reweight: per-domain mean
    unigram surprisal (t10's micro-units), clipped excess over the
    corpus mean, linear multiplicative-weights tilt, largest-remainder
    apportionment onto the exact ``scale`` grid. HUGEINT is DuckDB's
    twin of Spark's DECIMAL(38,0) lane; every `//` operand is
    non-negative, so truncation == floor in both engines."""
    return f"""
WITH toks AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
       FROM toks GROUP BY source, term),
voc AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM voc),
dom AS (
  SELECT tf.source, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         CAST(sum(CAST(tf.tf AS HUGEINT)
                  * (({scale}::BIGINT * tot.n) // voc.c)) AS HUGEINT) AS s
  FROM tf JOIN voc USING (term) CROSS JOIN tot
  GROUP BY tf.source),
d1 AS (
  SELECT source, n_tokens, s,
         CAST((2 * s + n_tokens) // (2 * n_tokens) AS BIGINT)
           AS mean_surprise_micro,
         CAST(sum(n_tokens) OVER () AS BIGINT) AS t_all,
         CAST(sum(s) OVER () AS HUGEINT) AS s_all
  FROM dom),
d2 AS (
  SELECT *, CAST((2 * s_all + t_all) // (2 * t_all) AS BIGINT) AS ref_micro
  FROM d1),
d3 AS (
  SELECT *, greatest(0, mean_surprise_micro - ref_micro) AS excess_micro
  FROM d2),
d4 AS (
  SELECT *,
         (CAST(excess_micro AS HUGEINT) * {2 * en * scale}
          + {ed} * ref_micro) // (2::HUGEINT * {ed} * ref_micro) AS rel
  FROM d3),
d5 AS (SELECT *, CAST(n_tokens AS HUGEINT) * ({scale} + rel) AS w FROM d4),
aw AS (
  SELECT *, sum(w) OVER () AS wtot,
         (w * {scale}) // sum(w) OVER () AS wflo,
         (w * {scale}) % sum(w) OVER () AS wrem
  FROM d5),
aw2 AS (
  SELECT *, {scale} - sum(wflo) OVER () AS wdef,
         row_number() OVER (ORDER BY wrem DESC, source) AS wrnk
  FROM aw),
aw3 AS (
  SELECT *, CAST(wflo + CASE WHEN wrnk <= wdef THEN 1 ELSE 0 END AS BIGINT)
           AS weight_micro
  FROM aw2),
ab AS (
  SELECT *,
         (CAST(n_tokens AS HUGEINT) * {scale}) // t_all AS bflo,
         (CAST(n_tokens AS HUGEINT) * {scale}) % t_all AS brem
  FROM aw3),
ab2 AS (
  SELECT *, {scale} - sum(bflo) OVER () AS bdef,
         row_number() OVER (ORDER BY brem DESC, source) AS brnk
  FROM ab),
ab3 AS (
  SELECT *, CAST(bflo + CASE WHEN brnk <= bdef THEN 1 ELSE 0 END AS BIGINT)
           AS baseline_micro
  FROM ab2)
SELECT source, n_tokens, mean_surprise_micro, ref_micro, excess_micro,
       baseline_micro, weight_micro,
       CASE WHEN baseline_micro > 0
            THEN CAST((2 * weight_micro * {scale}::BIGINT + baseline_micro)
                      // (2 * baseline_micro) AS DOUBLE) / {scale}
            END AS boost
FROM ab3
"""


@register("p16_doremi_reweight", _p16_sql(),
          doc="DoReMi domain-mixture reweighting step (Xie et al. 2023) "
              "in exact integer arithmetic: per-domain mean unigram "
              "surprisal (t10's micro-units) as the loss proxy, clipped "
              "excess over the corpus-wide reference, the linear "
              "multiplicative-weights twin of the exponentiated-"
              "gradient tilt (same fixed point, no transcendental "
              "floats), and largest-remainder apportionment so both the "
              "tilted weights and the token-share baseline sum to "
              "EXACTLY one million micro-units — the apportionment "
              "identities asserted in-query; one corpus scan, every "
              "later stage domain- or vocabulary-bounded",
          tags=("sampling", "mixture", "doremi", "llm"))
def p16_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import doremi_reweight

    out = (doremi_reweight(load(spark, sf_dir, "documents"),
                           group_col="source", eta=(1, 1))
           .localCheckpoint(eager=True))  # the grid checks below and the
    # returned frame must not each replay the corpus aggregation
    sums = out.agg(F.sum("weight_micro").alias("w"),
                   F.sum("baseline_micro").alias("b")).first()
    check(sums["w"] == 1_000_000 and sums["b"] == 1_000_000,
          f"apportionment grids broken: weights={sums['w']} "
          f"baseline={sums['b']}")
    return out


def _f14_sql() -> str:
    """Mirror of f14: the three gate recipes composed verbatim from
    their own oracles — t09's Gopher verdict body (corpus2), t10's
    surprisal chain + f11's quantile_disc median gate (corpus4's
    _surprisal_ctes), and p14's 13-gram digest screen (corpus7) — over
    the shared doc_id % 97 benchmark split."""
    from projectone_spark.queries.corpus2 import (
        _GOPHER_KEEP_SQL,
        _gopher_metric_sql,
    )
    from projectone_spark.queries.corpus4 import _surprisal_ctes

    return f"""
WITH {_surprisal_ctes(" WHERE doc_id % 97 <> 0")},
thr AS (SELECT quantile_disc(surprise_micro, 0.5) AS t FROM scored),
gt AS (SELECT doc_id, {_NORM} AS norm, {_TOKS} AS toks
       FROM documents WHERE doc_id % 97 <> 0),
gm AS (
  {_gopher_metric_sql("gt")}),
gv AS (
  SELECT doc_id, {_GOPHER_KEEP_SQL} AS g_keep
  FROM gm),
cb AS (SELECT {_TOKS} AS toks FROM documents WHERE doc_id % 97 = 0),
bg AS ({_gram13_digest_sql("", "cb")}),
cg AS ({_gram13_digest_sql("doc_id", "gt")}),
cd AS (
  SELECT cg.doc_id,
         sum(CASE WHEN bg.h IS NOT NULL THEN 1 ELSE 0 END) > 0 AS dirty
  FROM cg LEFT JOIN bg ON cg.h = bg.h
  GROUP BY cg.doc_id),
j AS (
  SELECT gv.g_keep, s.surprise_micro <= thr.t AS q_keep,
         COALESCE(NOT cd.dirty, TRUE) AS c_clean, s.n_tokens
  FROM scored s JOIN gv USING (doc_id)
       LEFT JOIN cd USING (doc_id) CROSS JOIN thr)
SELECT g_keep, q_keep, c_clean,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens
FROM j GROUP BY 1, 2, 3
"""


@register("f14_filter_ablation", _f14_sql(),
          doc="curation-filter ablation matrix (the RefinedWeb/Gopher "
              "dataset-paper attribution table): every corpus document "
              "gets three independent gate verdicts — Gopher rule "
              "battery (t09), unigram-surprisal ≤ the exact corpus "
              "median (t10 + percentile_disc, the CCNet keep), and "
              "13-gram benchmark decontamination (p14) — and the 2^3 "
              "verdict combinations report doc/token mass, so marginal "
              "and overlapping filter effects are read off directly "
              "(docs dropped ONLY by quality vs by quality AND "
              "contamination); each verdict is scan-side or reuses its "
              "operator's probed plan, the combine is two equi-joins "
              "on doc_id, and the matrix identity Σ n_docs = corpus "
              "count is asserted in-query",
          tags=("sampling", "text", "quality", "llm", "pipeline"))
def f14_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import token_ngram_contamination
    from projectone_spark.functions.text import gopher_rules, unigram_surprise

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    sur = unigram_surprise(corpus)
    # exact discrete median, cast back to the BIGINT lane (f11's recipe)
    thr = sur.agg(F.expr("percentile_disc(0.5) WITHIN GROUP "
                         "(ORDER BY surprise_micro)")
                  .cast("long").alias("__thr"))
    g = (gopher_rules(corpus.select("doc_id", "text"))
         .select("doc_id", F.col("keep").alias("g_keep")))
    # docs shorter than 13 tokens emit no grams and are clean by
    # definition — the left join + coalesce mirrors the oracle
    c = (token_ngram_contamination(corpus, bench)
         .select("doc_id", F.col("dirty").alias("__dirty")))
    j = (sur.join(g, "doc_id")
         .join(c, "doc_id", "left")
         .crossJoin(F.broadcast(thr))
         .select((F.col("surprise_micro") <= F.col("__thr")).alias("q_keep"),
                 F.col("g_keep"),
                 F.coalesce(~F.col("__dirty"), F.lit(True)).alias("c_clean"),
                 F.col("n_tokens")))
    out = (j.groupBy("g_keep", "q_keep", "c_clean")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("n_tokens"))
           .localCheckpoint(eager=True))  # the identity check below and
    # the returned frame must not each replay the three gate pipelines
    total = out.agg(F.sum("n_docs")).first()[0]
    # the partition identity's right-hand side is ONE scan-side count of
    # tokenizable docs, NOT sur.count(): counting the scan avoids
    # replaying the whole surprisal fold for a number one cheap pass
    # gives — while the size() predicate keeps the identity exact even
    # for a document that tokenizes to nothing (such a doc has no sur
    # row, so a bare count-star would hard-fail the partition check on
    # data the matrix correctly never saw)
    from projectone_spark.functions.text import tokens

    want = corpus.filter(F.size(tokens("text")) > 0).count()
    check(total == want,
          f"ablation matrix does not partition the corpus: {total} != {want}")
    return out

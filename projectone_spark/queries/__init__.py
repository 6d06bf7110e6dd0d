"""Query registry — the driver-facing inventory of implemented operators.

Each entry pairs a Spark DataFrame implementation with (where expressible) a
DuckDB-dialect oracle SQL string computing the identical result on the same
parquet tables. The driver's correctness gate runs both at sf=0.01 and
hash-compares values, so:

- every computed column is aliased identically in both engines,
- doubles are rounded to fixed decimals in both engines,
- orderings that feed a LIMIT carry explicit tie-breaks,
- timestamps are emitted at microsecond precision in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = True  # include in bench.py timing loop


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = (),
             bench: bool = True):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc,
                                   tags=tags, bench=bench)
        return fn

    return wrap


def check(cond: bool, msg: object = "in-query adjudication failed") -> None:
    """In-query adjudication gate. Unlike a bare ``assert``, this raises
    under ``python -O`` too, so an adjudicated property can never silently
    stop being proven."""
    if not cond:
        raise AssertionError(msg() if callable(msg) else msg)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Scan one driver-provided parquet table (column pruning/pushdown apply).

    Applies the engine's runtime confs (UTC session timezone, AQE) so results
    are identical no matter which session invokes the query, and normalizes
    the `events` table's ``ts`` column to TIMESTAMP whatever physical type
    the file carries:

    - ``timestamp[us]`` without timezone reads as TIMESTAMP_NTZ; the session
      timezone is UTC so a plain cast to TIMESTAMP is value-identical and
      makes ``unix_micros``/windowing work.
    - legacy ``int64`` nanos (Spark has no TIMESTAMP(NANOS) reader) reads
      ns-as-long under the legacy conf, then truncates to micros exactly
      like DuckDB does.
    """
    from projectone_spark.session import configure

    configure(spark)
    if table == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        dtype = dict(df.dtypes).get("ts")
        import pyspark.sql.functions as F

        if dtype == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif dtype == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


#: The driver adjudicates only the first 50 registry slots per round, so
#: slot order is managed EXPLICITLY here rather than emerging from module
#: import order. Rotation policy (documented in QUERIES.md): every slot
#: must carry an oracle; queries that have never had a driver correctness
#: row take priority over queries proven green in earlier rounds (whose
#: evidence lives in CORRECTNESS_r{1..3}.json and stays continuously
#: re-verified by tests/test_oracle_parity.py over the FULL registry).
#:
#: Round-6 prefix. Three groups:
#:
#: 1. Five regression ANCHORS from the multi-round-proven core
#:    (s02/s07/s10/st09 have 3–4 green rounds, p04 has 2). Rotated OUT
#:    this round (2+ green rounds each, still locally parity-checked
#:    every pytest run): s09, p03, s12/s14/s16/s18/s20/s22, q35, x01.
#: 2. The 18 round-5 first-green rows kept for a second adjudication
#:    (task/DAG lifecycle f01–f05, corpus quality t09/d10/p07/p08,
#:    incremental LSH d11, centroid classify e07, OData streams o02/o03,
#:    streaming MERGE dedup st12, TPC-H shapes q38–q40, composition d12).
#: 3. The 10 queries that have NEVER had a driver row (added in round 5
#:    after the r5 prefix froze): JDBC custom-SQL pushdown j02, OData
#:    OAuth2 o04, Avro encode round-trip f06, post-task cleanup f07,
#:    event bus f08, file-path CDC f09, expectation gates v01, IVF/PQ
#:    exact-oracle adjudications e08/e09, skew salting q41 — plus the
#:    new-in-round-6 queries appended at the end of this group.
#: 4. a01/a02/m05, converted this round from no-oracle tail entries to
#:    exact-oracle adjudications (sketch bounds asserted in-query, exact
#:    columns oracle-checked; dhash grouping vs closed-form class oracle),
#:    plus third-look fillers from the r4 cohort (2 green rounds each;
#:    rotated out this round: s11, s13, s15, then t08/o01/j01/d09/p06/
#:    st11/st10 — each with 2+ green rounds — as the in-round additions
#:    t10/e10/p09/st13/e11/f11/p10 landed)
#:    using the remaining slots — fillers are first to give way to new
#:    queries.
_DRIVER_PREFIX: tuple[str, ...] = (
    # round-12 rotation: the two new queries — e23 (quantizer
    # retrain-and-swap, the index lifecycle's last verb) and e24 (the
    # persisted-artifact recall audit) — take the slots of two 6-green
    # anchors whose families stay driver-covered by in-prefix siblings:
    # e05 (in-query PQ funnel; the PQ family is covered by the
    # persisted e21 and audited by e24) and e10 (incremental IVF
    # maintenance; the maintenance family is covered by e20/st15/st17/
    # st18). e25 (the keyed-fetch serving shape under the e19 oracle)
    # takes the slot of t11 (bigram surprisal, 6 greens; the
    # surprisal/LM family stays driver-covered by the in-prefix
    # t19/t20 and p12). All three stay locally parity-checked every
    # pytest run.
    "e23_quantizer_retrain_swap", "e24_persisted_index_recall_audit",
    "e25_keyed_fetch_search",
    # round-11 cohort, kept for its SECOND adjudication (the r11
    # verdict's item 2):
    # round-11 rotation: the three new index-lifecycle queries (e20
    # drop-maintenance, e21 persisted PQ, e22 pinned open) take the
    # slots of three 4-green r7 anchors — q42/q43 (TPC-H Q2/Q11; the
    # TPC-H family stays driver-covered by the in-prefix q44/q45) and
    # t14 (BPE encode; the tokenizer family stays driver-covered by the
    # in-prefix t16/f13/t21). All three stay locally parity-checked
    # every pytest run.
    "e20_index_drop_maintenance", "e21_persisted_pq_search",
    "e22_pinned_index_search",
    # st18 (streaming maintenance INTERLEAVED with the e20 drop — the
    # full production loop on one artifact) takes the slot of t15
    # (linear classifier, 4 driver greens; the classifier family stays
    # driver-covered by the in-prefix t17/t18/st16):
    "st18_stream_drop_maintenance",
    # new-in-round-7 (took the f02/f03/f05/d10/d11/d12 slots — 2 driver
    # greens each), kept for their SECOND adjudication per the r7 brief:
    "f12_curation_dag",
    "e14_kmeans_lloyd", "p14_ngram_decontamination",
    "s23_zorder_skipping",
    # new-in-round-8: Arrow-batched production BPE encode, classifier
    # threshold calibration + exact ROC-AUC, ExactSubstr-style duplicate
    # run detection AND removal, k-center seeding, and the flagship
    # extended to packed training batches — taking the slots of the
    # seven most-proven remaining anchors (p07/p08/e07/o02 with 3 driver
    # greens each, then o03/st12 at 3 greens and e09 at 2 with its
    # funnel family still covered by e04/e05/e08/e12/e13; every rotated
    # query stays locally parity-checked every pytest run):
    "t16_bpe_encode_arrow", "t17_classifier_calibration",
    "d14_duplicate_runs", "f13_training_batches",
    "d15_duplicate_run_removal",
    "t18_roc_auc",
    "e15_farthest_first_seeds",
    # (e08 — 2 greens, its IVF family still driver-covered by
    # e04/e05/e10/e12/e13 — gave its slot to the soft quality filter)
    "p15_quality_weighted_sample",
    # round-9 rotation: the three new queries take the slots of three
    # 3-green anchors whose operator families stay driver-covered by
    # in-prefix siblings — f07 (task lifecycle: f12/f13 and the new f15
    # run the full SparkTask machinery), e11 (embedding
    # cluster-then-prune: e14/e15 adjudicate the kmeans family), st13
    # (streaming standing-index fold: st14 and the new st15 are the
    # same proof pattern over bloom/SQ8 state). All three rotated-out
    # queries stay locally parity-checked every pytest run.
    "f15_model_lifecycle", "t19_unigram_lm", "st15_stream_sq8_index",
    # second round-9 batch — the persisted-model APPLY closures: t20
    # (unigram corpus encode under the saved t19 model) takes t10's
    # slot (unigram surprisal, 3 driver greens; the unigram family
    # stays driver-covered by t11/t19/t20 in-prefix), e18 (IVF search
    # under the saved quantizer, exact-KNN oracle) takes e04's slot
    # (IVF production shape, 3 driver greens; the IVF/ANN family stays
    # driver-covered by e05/e10/e12/e13/e16/e17/e18 in-prefix). Both
    # rotated-out anchors stay locally parity-checked every pytest run.
    "t20_unigram_encode", "e18_persisted_ivf_search",
    # round-10 rotation: the two new lifecycle queries take the slots of
    # two 4-green anchors — f06 (avro/schema-registry: 4 driver greens,
    # its task surface stays driver-covered by the in-prefix f12/f13/f15
    # DAG flagships) and v02 (stage-metrics accounting: 4 driver greens,
    # and the metrics listener is dogfooded by every ×100 probe). Both
    # stay locally parity-checked every pytest run.
    "e19_index_open_and_search", "f16_model_version_pinning",
    # st17 (streaming maintenance of the e19 artifact) takes the slot of
    # o04 (OAuth2 OData read, 4 driver greens; the OData family stays
    # locally parity-checked every pytest run):
    "st17_stream_index_maintenance",
    # never driver-adjudicated (new in r5 tail / new in r6):
    "j02_jdbc_query_pushdown",
    "f08_event_handlers",
    "f09_file_path_cdc", "v01_row_expectations",
    "q41_skew_salted_pipeline", "f10_stream_multi_output_task",
    # (e05/e10 — 6 driver greens each — gave their slots to the r12
    # additions at the top of this tuple)
    "p09_bloom_contamination", "f11_curation_pipeline",
    # (p10 — 3 driver greens, ordering/sampling family still driver-
    # covered by p12/p13/p15/p16 in-prefix — gave its slot to the CCNet
    # perplexity-tercile bucketing)
    "p17_ccnet_buckets",
    # second round-8 batch: scalar-int8 ANN funnel, the recall@k audit
    # over both quantized funnels, and the DoReMi mixture-reweighting
    # step — taking the third-look filler slots (a01/a02/m05, r4 cohort,
    # 3 driver greens each after r7's clean sheet; the sketch and
    # multimodal families stay locally parity-checked every pytest run):
    "e16_knn_sq8", "e17_ann_recall_audit", "p16_doremi_reweight",
    # (d13 — 2 greens, winnowing also adjudicated INSIDE the in-prefix
    # f12/f13 flagships — gave its slot to the LSH calibration audit)
    "d16_lsh_recall_audit",
    # (p11 — 2 greens, epoch scheduling also adjudicated INSIDE the
    # in-prefix f12/f13 flagships — gave its slot to the filter
    # ablation matrix)
    "f14_filter_ablation",
    # late-r6 additions took the last three filler slots (s17/s19/s21
    # rotated out — 2+ green rounds each, still parity-checked locally;
    # t11 — 6 greens — gave its slot to e25 in r12):
    # second late-r6 batch (s02/s10/st09 rotated out — 3+/2+ green
    # rounds each, the registry's most-proven rows):
    # (t12 — 3 driver greens, and its training chain is adjudicated
    # INSIDE five in-prefix composition oracles (t14/t16/f13/f15/t21)
    # — gave its slot to the tokenizer fertility audit)
    "t21_tokenizer_fertility", "p12_dsir_importance", "e12_knn_matryoshka",
    # third late-r6 batch (p04 rotated out — 2+ greens):
    # (st14 — 3 driver greens; the streaming-gate proof family stays
    # driver-covered by st15/st16 and the bloom screen's batch twin by
    # p09 — gave its slot to the streaming quality gate under
    # persisted classifier models)
    "st16_stream_quality_gate",
    # fourth late-r6 batch (q38/q39/q40 rotated out — 1 green each plus
    # the registry's most-proven family as siblings):
    "t13_bm25_retrieval", "e13_knn_binary_hamming",
    # (p13 — 3 driver greens, the budget-allocation family stays
    # driver-covered by p12/p15/p16/p17/p18 in-prefix — gave its slot
    # to the exact-isqrt temperature budget allocation)
    "p18_temperature_budget",
    # fifth late-r6 batch (f04/t09 rotated out — 1 green each, their
    # operator families stay driver-covered by in-prefix siblings:
    # f01-f03/f05/f06 exercise the schema-registry/task surface, and the
    # Gopher battery runs INSIDE f05 and f11):
    "q44_waiting_suppliers", "q45_dormant_customers",
)


def _ensure_loaded() -> None:
    """Import all query modules so their @register calls have run, then
    reorder the registry so ``_DRIVER_PREFIX`` holds the first 50 slots.

    Downstream consumers (the driver's correctness gate records a bounded
    prefix of the registry's insertion order) see the explicit prefix
    first, then every remaining query in module-import order. Since
    round 6 EVERY registered query carries an oracle (the last no-oracle
    entries — a01/a02 sketches, m05 dhash, e04/e05 production ANN — were
    converted to in-query-gated, oracle-checked adjudications), so any
    query may hold a prefix slot — enforced by
    test_harness_prefix_contract.
    """
    from projectone_spark.queries import (  # noqa: F401
        engine_ops,
        streaming,
        multimodal,
        sampling,
        text,
        analytics,
        dedup,
        analytics2,
        embeddings,
        engine_ops2,
        analytics3,
        multimodal2,
        corpus,
        streaming2,
        engine_ops3,
        connectors,
        pipelines,  # new-in-r4 tail: task/DAG lifecycle queries f01–f04
        corpus2,  # new-in-r4 tail: gopher rules, cross-doc ngrams, mixture
        embeddings2,  # new-in-r4 tail: centroid-classification confusion
        analytics4,  # new-in-r4 tail: TPC-H Q8/Q9 shapes
        corpus3,  # new-in-r5: composed dedup+contamination / quality+mixture
        corpus4,  # new-in-r6: unigram-surprisal quality scoring
        corpus5,  # late-r6: bigram surprisal, winnowing, epoch schedule
        corpus6,  # late-r6: BM25 retrieval
        corpus7,  # new-in-r7: BPE encode, fastText-style classifier
        corpus8,  # new-in-r8: arrow BPE, calibration, dup runs, batches
        corpus9,  # new-in-r9: model persistence lifecycle, unigram LM
        corpus10,  # new-in-r10: model version pinning / refresh semantics
        embeddings3,  # new-in-r12: quantizer retrain-and-swap, recall audit
    )

    ordered = {n: REGISTRY[n] for n in _DRIVER_PREFIX}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


__all__ = ["QuerySpec", "REGISTRY", "register", "load", "queries", "oracle_sql"]

"""Corpus quality queries added in round 6 (registry tail):

- t10: unigram-LM surprisal scoring (the CCNet-perplexity-filter shape
  with the corpus's own token distribution as the model);
- p09: bloom-filter decontamination screen (constant-size bitset
  membership, the Dolma/DataComp scale path), adjudicated against the
  exact broadcast-join verdict.

All arithmetic is exact-integer end-to-end (micro-unit inverse
frequencies / md5 double-hash bit positions, BIGINT sums), so the DuckDB
oracles are bit-identical by construction — same discipline as corpus2's
mixture masses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import load, register
from projectone_spark.queries._sql_fragments import _SHINGLES, _TOKS


def _surprisal_ctes(where: str = "") -> str:
    """The tok/tf/vocab/scored CTE chain mirroring
    ``functions/text.unigram_surprise`` — ONE definition shared by the
    t10 and f11 oracles so the recipe cannot drift between them
    (the _sql_fragments.py discipline, applied at CTE granularity)."""
    return f"""tok AS (
  SELECT doc_id, unnest({_TOKS}) AS term FROM documents{where}),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term),
vocab AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM vocab),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf.tf * ((1000000 * tot.n) // vocab.c)) AS BIGINT)
           AS surprise_micro
  FROM tf JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY tf.doc_id)"""


_T10_SQL = f"""
WITH {_surprisal_ctes()}
SELECT doc_id, n_tokens, surprise_micro,
       CAST((surprise_micro // (1000000 * n_tokens)) * 1000000
            + (2 * (surprise_micro % (1000000 * n_tokens)) + n_tokens)
              // (2 * n_tokens) AS DOUBLE) / 1000000.0
         AS surprise
FROM scored
"""


@register("t10_unigram_surprise", _T10_SQL,
          doc="CCNet-style quality scoring: per-document mean unigram "
              "surprisal against the corpus's own token distribution, in "
              "exact integer micro-units (no float summation anywhere — "
              "the one closing division is a single correctly-rounded "
              "IEEE op, bit-identical across engines)",
          tags=("text", "quality", "llm"))
def t10_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import unigram_surprise

    return unigram_surprise(load(spark, sf_dir, "documents"))


# Bloom probe mirror: Kirsch-Mitzenmacher double hashing over two 32-bit
# md5 halves, identical to functions/sampling.bloom_positions. The SQL
# "bit set" is the DISTINCT position set — membership in it is exactly the
# word/mask bit test the Spark side runs against the packed long array.
_H1 = "CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT)"
_H2 = "CAST(('0x' || substr(md5(s), 9, 8)) AS BIGINT)"


def _bloom_ctes(sized: bool = False) -> str:
    """The sh/bsh/bits/probe/per_doc CTE chain mirroring
    ``functions/sampling.bloom_doc_flags`` (benchmark = doc_id % 97 = 0,
    probe over the rest) — shared by the p09 and f11 oracles.
    ``sized=True`` mirrors the FPR-pinned form the curation DAGs filter
    with: ``m = bloom_m_bits(count(bsh))`` instead of the fixed 65536
    (``bm`` holds the scalar; the probe cross-joins it)."""
    if sized:
        bm = ("bm AS (SELECT greatest(64, 64 * ((16 * count(*) + 63)"
              " // 64)) AS m FROM bsh),\n")
        mod = "bm.m"
        bits_join = " CROSS JOIN bm"
    else:
        bm, mod, bits_join = "", "65536", ""
    return f"""sh AS (
  SELECT doc_id, source, unnest({_SHINGLES}) AS s FROM documents),
bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
{bm}bits AS (
  SELECT DISTINCT ({_H1} + i * {_H2}) % {mod} AS p
  FROM bsh CROSS JOIN (SELECT unnest([0, 1]) AS i){bits_join}),
probe AS (
  SELECT doc_id, source,
         s IN (SELECT s FROM bsh) AS ex,
         ({_H1} % {mod}) IN (SELECT p FROM bits)
           AND (({_H1} + {_H2}) % {mod}) IN (SELECT p FROM bits) AS bl
  FROM sh{bits_join} WHERE doc_id % 97 <> 0),
per_doc AS (
  SELECT doc_id, source,
         CAST(count(*) AS BIGINT) AS nsh,
         sum(CASE WHEN ex THEN 1 ELSE 0 END) AS nex,
         sum(CASE WHEN bl THEN 1 ELSE 0 END) AS nbl,
         sum(CASE WHEN ex AND NOT bl THEN 1 ELSE 0 END) AS nfn
  FROM probe GROUP BY doc_id, source)"""


_P09_SQL = f"""
WITH {_bloom_ctes()}
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN nex > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_exact,
       CAST(sum(CASE WHEN nbl > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_bloom,
       CAST(sum(nex) AS BIGINT) AS n_shingles_exact,
       CAST(sum(nbl) AS BIGINT) AS n_shingles_bloom,
       CAST(sum(nfn) AS BIGINT) AS n_false_negatives
FROM per_doc
GROUP BY source
"""


@register("p09_bloom_contamination", _P09_SQL,
          doc="bloom-filter decontamination screen (the Dolma/DataComp "
              "shape): the benchmark shingle set packs into a constant "
              "8 KiB bitset (md5 double-hashing, engine-portable) and "
              "the corpus probe is scan-side codegen with no join; the "
              "exact broadcast-join verdict runs alongside and the query "
              "proves in-query that the bloom has zero false negatives, "
              "with per-source exact + flagged counts oracle-checked",
          tags=("sampling", "dedup", "llm"))
def p09_bloom_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import bloom_contamination
    from projectone_spark.queries import check

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    # checkpoint the (tiny, per-source) result so the adjudication agg and
    # the returned DataFrame don't each re-run the corpus-wide probe
    out = bloom_contamination(corpus, bench).localCheckpoint(eager=True)
    fneg = (out.agg(F.sum("n_false_negatives").alias("n")).first()["n"]) or 0
    check(fneg == 0, f"bloom produced {fneg} false negatives "
                     "(impossible for a correct bloom filter)")
    return out


_F11_SQL = f"""
WITH {_surprisal_ctes(" WHERE doc_id % 97 <> 0")},
thr AS (SELECT quantile_disc(surprise_micro, 0.5) AS t FROM scored),
{_bloom_ctes()},
j AS (
  SELECT p.source, sc.n_tokens,
         sc.surprise_micro > thr.t AS q_drop,
         (sc.surprise_micro <= thr.t AND 4 * p.nbl > 3 * p.nsh) AS c_drop,
         (sc.surprise_micro <= thr.t AND 4 * p.nbl <= 3 * p.nsh) AS keep,
         (sc.surprise_micro <= thr.t AND 4 * p.nbl <= 3 * p.nsh
          AND 4 * p.nex > 3 * p.nsh) AS leaked
  FROM per_doc p JOIN scored sc USING (doc_id) CROSS JOIN thr)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN q_drop THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_dropped,
       CAST(sum(CASE WHEN c_drop THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contam_dropped,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
         AS tokens_survived,
       CAST(sum(CASE WHEN leaked THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
FROM j
GROUP BY source
"""


@register("f11_curation_pipeline", _F11_SQL,
          doc="end-to-end corpus curation composing the round's "
              "operators: unigram-surprisal quality gate at the exact "
              "corpus median (percentile_disc — the CCNet keep-the-"
              "fluent-half shape), then the bloom decontamination "
              "screen at 3/4 containment (4*flagged > 3*shingles — "
              "exact integer compare), with per-source drop/survivor/"
              "token accounting oracle-checked and the zero-leak "
              "property (no survivor is majority-contained in the "
              "benchmark by the EXACT join — guaranteed because the "
              "bloom's flagged set is a superset of the exact set) "
              "asserted in-query AND emitted as an oracle-checked "
              "column",
          tags=("sampling", "text", "dedup", "llm", "pipeline"))
def f11_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.sampling import bloom_doc_flags
    from projectone_spark.functions.text import unigram_surprise
    from projectone_spark.queries import check

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    sur = unigram_surprise(corpus)
    # percentile_disc picks an EXISTING surprise_micro but types it
    # DOUBLE; cast back to long so the gate compares exact BIGINTs like
    # the oracle (exact whenever surprise_micro < 2^53 — the same scale
    # knob that bounds the int64 envelope, see unigram_surprise)
    thr = sur.agg(F.expr("percentile_disc(0.5) WITHIN GROUP "
                         "(ORDER BY surprise_micro)")
                  .cast("long").alias("__thr"))
    flags = bloom_doc_flags(corpus, bench)
    j = (sur.join(flags, "doc_id")
         .crossJoin(F.broadcast(thr))
         .withColumn("q_drop", F.col("surprise_micro") > F.col("__thr"))
         .withColumn("c_drop",
                     ~F.col("q_drop")
                     & (4 * F.col("__n_bl") > 3 * F.col("__n_sh")))
         .withColumn("keep",
                     ~F.col("q_drop")
                     & (4 * F.col("__n_bl") <= 3 * F.col("__n_sh")))
         .withColumn("leaked",
                     ~F.col("q_drop")
                     & (4 * F.col("__n_bl") <= 3 * F.col("__n_sh"))
                     & (4 * F.col("__n_ex") > 3 * F.col("__n_sh"))))
    out = (j.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(F.col("q_drop"), 1).otherwise(0))
                .cast("bigint").alias("n_quality_dropped"),
                F.sum(F.when(F.col("c_drop"), 1).otherwise(0))
                .cast("bigint").alias("n_contam_dropped"),
                F.sum(F.when(F.col("keep"), 1).otherwise(0))
                .cast("bigint").alias("n_survivors"),
                F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
                .cast("bigint").alias("tokens_survived"),
                F.sum(F.when(F.col("leaked"), 1).otherwise(0))
                .cast("bigint").alias("n_leaked"))
           .localCheckpoint(eager=True))  # the leak gate and the returned
    # frame must not each re-run the corpus-wide pipeline
    n_leak = (out.agg(F.sum("n_leaked").alias("n")).first()["n"]) or 0
    check(n_leak == 0,
          f"{n_leak} 3/4-contained documents survived the bloom "
          "screen (impossible: the bloom's flagged set is a superset of "
          "the exact set)")
    return out


# t01's stats/quality SELECT, reused as a subquery (one definition).
from projectone_spark.queries.text import _T01_SQL  # noqa: E402

_P10_SQL = f"""
WITH s AS ({_T01_SQL}),
q AS (SELECT quantile_disc(quality, 0.25) AS q1,
             quantile_disc(quality, 0.50) AS q2,
             quantile_disc(quality, 0.75) AS q3 FROM s)
SELECT doc_id, quality,
       CAST((CASE WHEN quality > q.q1 THEN 1 ELSE 0 END
           + CASE WHEN quality > q.q2 THEN 1 ELSE 0 END
           + CASE WHEN quality > q.q3 THEN 1 ELSE 0 END) AS BIGINT) AS bin,
       md5(CAST(doc_id AS VARCHAR)) AS order_key
FROM s CROSS JOIN q
"""


@register("p10_curriculum_order", _P10_SQL,
          doc="curriculum training order without a global sort: documents "
              "bin into quality quartiles via three broadcast "
              "percentile_disc thresholds (scan-side compares — never an "
              "ntile window, which would total-order the corpus through "
              "one reducer) and carry a deterministic md5 order key; the "
              "writer range-partitions by (bin, order_key) so epoch "
              "order is reproducible and curriculum-sorted at any scale",
          tags=("sampling", "text", "llm"))
def p10_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from projectone_spark.functions.text import text_stats

    stats = text_stats(load(spark, sf_dir, "documents"))
    thr = stats.agg(
        *[F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY quality)")
          .alias(n)
          for p, n in ((0.25, "__q1"), (0.50, "__q2"), (0.75, "__q3"))])
    return (stats.select("doc_id", "quality")
            .crossJoin(F.broadcast(thr))
            .select("doc_id", "quality",
                    ((F.col("quality") > F.col("__q1")).cast("int")
                     + (F.col("quality") > F.col("__q2")).cast("int")
                     + (F.col("quality") > F.col("__q3")).cast("int"))
                    .cast("bigint").alias("bin"),
                    F.md5(F.col("doc_id").cast("string"))
                    .alias("order_key")))

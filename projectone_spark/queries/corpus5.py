"""Corpus operators added late in round 6 (registry tail):

- t11: bigram-LM surprisal — one Markov order above t10, the smallest
  model that sees word order (KenLM-lite, cf. CCNet's perplexity
  filter);
- d13: winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 —
  the MOSS local-copy detector) with stop-fingerprint capping and an
  exact integer similarity gate;
- p11: data-constrained epoch/repetition schedule (Muennighoff et al.
  2023) — token budget + epoch cap in exact micro-epoch integers;
- t12: BPE tokenizer training, first merge rules (Sennrich et al. 2016)
  — corpus scanned once for the word vocabulary, merges iterate on the
  vocabulary alone (oracle: one unrolled CTE level per merge);
- p12: DSIR-style importance weighting (Xie et al. 2023) — tf-weighted
  unigram likelihood ratios of the English-target model vs the raw
  corpus, both models from ONE vocabulary aggregate.

(e12, the Matryoshka funnel-retrieval twin of this cohort, lives with
the e-family in embeddings2.py.)

Same exactness discipline as corpus4: integer arithmetic end-to-end,
md5-derived hashes/uniforms (engine-portable), float division only as a
single final correctly-rounded IEEE op — so every oracle is
bit-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.queries import check, load, register
from projectone_spark.queries._sql_fragments import _NORM, _TOKS

def _t11_ctes(src: str = "documents") -> str:
    """The tok/bg/bf/bgv/pre/scored CTE chain mirroring
    ``functions/text.bigram_surprise`` over any doc_id+text relation —
    shared by the t11 and f12 oracles (the _surprisal_ctes discipline)."""
    return f"""tok AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(toks), 1)),
           i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1]))
           AS b
  FROM tok),
bf AS (
  SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY doc_id, b),
bgv AS (SELECT b, CAST(sum(tf) AS BIGINT) AS cbg FROM bf GROUP BY b),
pre AS (
  SELECT split_part(b, ' ', 1) AS p, CAST(sum(cbg) AS BIGINT) AS cp
  FROM bgv GROUP BY p),
scored AS (
  SELECT bf.doc_id,
         CAST(sum(bf.tf) AS BIGINT) AS n_bigrams,
         CAST(sum(bf.tf * ((1000000 * pre.cp) // bgv.cbg)) AS BIGINT)
           AS surprise_micro
  FROM bf JOIN bgv USING (b) JOIN pre ON split_part(bf.b, ' ', 1) = pre.p
  GROUP BY bf.doc_id)"""


_T11_SQL = f"""
WITH {_t11_ctes()}
SELECT doc_id, n_bigrams, surprise_micro,
       CAST((surprise_micro // (1000000 * n_bigrams)) * 1000000
            + (2 * (surprise_micro % (1000000 * n_bigrams)) + n_bigrams)
              // (2 * n_bigrams) AS DOUBLE) / 1000000.0
         AS surprise
FROM scored
"""


@register("t11_bigram_surprise", _T11_SQL,
          doc="bigram-LM surprisal scoring (KenLM-lite, one Markov order "
              "above t10): per-document mean inverse conditional bigram "
              "frequency in exact integer micro-units — word-order-"
              "scrambled or boilerplate text scores high even when its "
              "unigram mix looks fluent; one corpus scan, with the bigram "
              "vocabulary and prefix tables folding the doc-bigram "
              "aggregate",
          tags=("text", "quality", "llm"))
def t11_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import bigram_surprise

    return bigram_surprise(load(spark, sf_dir, "documents"))


def _d13_ctes(src: str = "documents") -> str:
    """The winnow chain's oracle mirror over any doc_id+text relation:
    positions/grams exactly as functions/dedup.winnow_fingerprints
    computes them (k=5, w=4; short docs yield one whole-text gram and
    one all-gram window; empty drop) — shared by the d13 and f12
    oracles."""
    return f"""n AS (SELECT doc_id, {_NORM} AS nm FROM {src}),
h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(nm) - 4, 1) + 1),
           i -> CAST(('0x' || substr(md5(substr(nm, CAST(i AS INTEGER), 5)),
                                     1, 8)) AS BIGINT)) AS hs
  FROM n WHERE length(nm) > 0),
fpt AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(hs) - 3, 1) + 1),
           j -> list_min(list_slice(hs, CAST(j AS INTEGER),
                                    CAST(j AS INTEGER) + 3))))) AS fp
  FROM h),
kept AS (
  SELECT doc_id, fp FROM fpt
  WHERE fp IN (SELECT fp FROM fpt GROUP BY fp HAVING count(*) <= 128)),
nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp
       FROM kept GROUP BY doc_id),
pr AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2)"""


_D13_SQL = f"""
WITH {_d13_ctes()}
SELECT doc_id_a, doc_id_b, n_shared,
       na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
       CAST((2000000 * n_shared + (na.n_fp + nb.n_fp - n_shared))
            // (2 * (na.n_fp + nb.n_fp - n_shared)) AS DOUBLE) / 1000000.0
         AS sim
FROM pr JOIN nf na ON pr.doc_id_a = na.doc_id
        JOIN nf nb ON pr.doc_id_b = nb.doc_id
WHERE 2 * n_shared >= na.n_fp + nb.n_fp - n_shared
"""


@register("d13_winnowing_neardups", _D13_SQL,
          doc="winnowing-fingerprint near-dup pairs (the MOSS algorithm, "
              "Schleimer et al. 2003): window-min sampling keeps ~2/(w+1) "
              "of gram hashes with a guaranteed hit for any shared run of "
              "k+w-1 chars; stop-fingerprint capping (df ≤ 128) bounds "
              "every join bucket, and the ≥½ similarity gate is an exact "
              "integer compare",
          tags=("dedup", "text", "llm"))
def d13_winnowing_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.dedup import winnow_fingerprint_pairs

    return winnow_fingerprint_pairs(load(spark, sf_dir, "documents"))


_P11_SQL = """
WITH d AS (
  SELECT doc_id, source,
         greatest(CAST(1 AS BIGINT), CAST(n_chars AS BIGINT) // 4) AS t
  FROM documents),
m AS (
  SELECT source, CAST(sum(t) AS BIGINT) AS gt,
         CAST(count(*) AS BIGINT) AS gn
  FROM d GROUP BY source),
s AS (SELECT CAST(sum(gt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS ns FROM m),
w AS (
  SELECT source, gt, gn,
         least(CAST(4000000 AS BIGINT),
               (1000000 * ((total * 2) // ns)) // gt) AS em
  FROM m CROSS JOIN s),
c AS (
  SELECT d.doc_id, d.source, d.t, w.em, w.gt, w.gn,
         em // 1000000
         + CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT)
                     < ((em % 1000000) * 4294967296) // 1000000
           THEN 1 ELSE 0 END AS cp
  FROM d JOIN w USING (source))
SELECT source,
       CAST(min(gn) AS BIGINT) AS n_docs,
       CAST(min(gt) AS BIGINT) AS tokens_in,
       CAST(min(em) AS BIGINT) AS epochs_micro,
       CAST(sum(cp) AS BIGINT) AS n_copies,
       CAST(sum(cp * t) AS BIGINT) AS tokens_out
FROM c GROUP BY source
"""


@register("p11_epoch_schedule", _P11_SQL,
          doc="data-constrained repetition schedule (Muennighoff et al. "
              "2023): a 2×-corpus token budget splits equally across "
              "sources, each source repeats up to the 4-epoch cap in "
              "exact micro-epoch integers with md5 stochastic rounding "
              "per doc; the schedule arithmetic is re-derived and "
              "re-checked in-query from the aggregate output",
          tags=("sampling", "llm"))
def p11_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.sampling import epoch_schedule

    out = (epoch_schedule(load(spark, sf_dir, "documents"))
           .localCheckpoint(eager=True))  # the adjudication below and the
    # returned frame must not each re-run the corpus aggregate
    rows = out.collect()  # bounded: one row per source
    check(len(rows) > 0, "epoch_schedule returned no sources — empty "
          "documents table; nothing to re-derive the schedule against")
    total = sum(r["tokens_in"] for r in rows)
    target = (total * 2) // len(rows)
    for r in rows:
        want = min(4_000_000, (1_000_000 * target) // r["tokens_in"])
        check(r["epochs_micro"] == want,
              f"schedule for {r['source']}: epochs_micro="
              f"{r['epochs_micro']}, re-derivation says {want}")
    return out


def _t12_ctes(n_merges: int = 8, src: str = "documents") -> str:
    """Unrolled DuckDB mirror of functions/text.bpe_train_merges over
    any doc_id+text relation ``src``: one CTE level per merge (pair
    counts -> argmax -> vocabulary rewrite), the same (count DESC, l, r)
    tie-break and the same left-to-right non-overlapping replace.
    DuckDB's range(1, n) is end-exclusive and empty for n <= 1, so
    one-symbol words contribute no pairs exactly like the Spark side's
    size >= 2 filter.

    Returns the WITH-body only (CTEs ``w``, ``v0``, then ``p{{i}}``/
    ``b{{i}}``/``v{{i}}`` per merge) so the t14 encode oracle — and
    f13's train-on-the-clean-corpus chain — can reuse the training
    chain verbatim, the _sql_fragments discipline."""
    parts = [f"""w AS (SELECT unnest({_TOKS}) AS w FROM {src}),
v0 AS MATERIALIZED (
  SELECT '__' || regexp_replace(w, '(.)', '\\1__', 'g') AS sym,
         CAST(count(*) AS BIGINT) AS wc
  FROM w WHERE w <> '' GROUP BY w)"""]
    for i in range(1, n_merges + 1):
        parts.append(f""",
p{i} AS (
  SELECT p.l AS l, p.r AS r, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (
    SELECT wc, unnest(list_transform(range(1, len(a)),
             j -> {{'l': a[j], 'r': a[j + 1]}})) AS p
    FROM (SELECT wc, list_slice(string_split(sym, '__'), 2,
                    len(string_split(sym, '__')) - 1) AS a FROM v{i - 1}) s
  ) t GROUP BY p.l, p.r),
b{i} AS (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l, r LIMIT 1),
v{i} AS MATERIALIZED (
  SELECT replace(sym, '_' || l || '__' || r || '_',
                 '_' || l || r || '_') AS sym, wc
  FROM v{i - 1} CROSS JOIN b{i})""")
    return "".join(parts)


def _t12_sql(n_merges: int = 8) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS BIGINT) AS step, l AS left_sym, r AS right_sym,"
        f" l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1))
    return "WITH " + _t12_ctes(n_merges) + "\n" + unions


@register("t12_bpe_merges", _t12_sql(),
          doc="BPE tokenizer training, first 8 merge rules (Sennrich et "
              "al. 2016): the corpus is scanned ONCE for the word-"
              "frequency vocabulary, then every merge iteration runs on "
              "the vocabulary alone (bounded by distinct words, not "
              "corpus size) with a one-row argmax collect per step; "
              "greedy left-to-right merges and the (count, pair) tie-"
              "break mirror the reference algorithm exactly",
          tags=("text", "tokenizer", "llm"))
def t12_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.text import bpe_train_merges

    return bpe_train_merges(load(spark, sf_dir, "documents"), n_merges=8)


_P12_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang = 'en' AS tgt, unnest({_TOKS}) AS term
  FROM documents),
tf AS (
  SELECT doc_id, tgt, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IS NOT NULL GROUP BY doc_id, tgt, term),
v AS (
  SELECT term, CAST(sum(tf) AS BIGINT) AS craw,
         CAST(sum(CASE WHEN tgt THEN tf ELSE 0 END) AS BIGINT) AS ctgt
  FROM tf GROUP BY term),
tot AS (SELECT CAST(sum(craw) AS BIGINT) AS nraw,
               CAST(sum(ctgt) AS BIGINT) AS ntgt FROM v),
sc AS (
  SELECT t.doc_id,
         bool_or(t.tgt) AS is_target,
         CAST(sum(t.tf) AS BIGINT) AS n_tokens,
         CAST(sum(t.tf * (CASE WHEN tot.ntgt = 0 THEN 0
               ELSE (((1000000 * v.ctgt) // v.craw) * tot.nraw) // tot.ntgt
               END)) AS BIGINT) AS dsir_micro
  FROM tf t JOIN v USING (term) CROSS JOIN tot
  GROUP BY t.doc_id)
SELECT doc_id, is_target, n_tokens, dsir_micro,
       CAST((dsir_micro // b) * 1000000
            + (2 * (dsir_micro % b) + n_tokens) // (2 * n_tokens)
            AS DOUBLE) / 1000000.0 AS dsir
FROM (SELECT *, 1000000 * n_tokens AS b FROM sc) g
"""


@register("p12_dsir_importance", _P12_SQL,
          doc="DSIR-style importance weighting (Xie et al. 2023): score "
              "every document by the tf-weighted unigram likelihood "
              "ratio of the English-target model vs the raw corpus, in "
              "exact integer micro-units (engine-identical stepwise "
              "div); one corpus scan builds BOTH models — the target "
              "flag rides the doc-term rows, so target counts are a "
              "conditional sum inside the single vocabulary aggregate",
          tags=("sampling", "quality", "llm"))
def p12_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from projectone_spark.functions.sampling import dsir_importance

    return dsir_importance(load(spark, sf_dir, "documents"),
                           target_col="lang", target_value="en")

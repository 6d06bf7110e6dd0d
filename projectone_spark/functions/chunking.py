"""Document chunking — fixed-token-budget overlapping chunks, the unit of
work every LLM training-data / embedding pipeline needs between "document"
and "model input".

Two equivalent implementations, both tested against each other and a
DuckDB oracle (query c01):

- ``chunk_expr``: pure Catalyst expressions (split → sequence of starts →
  transform/slice/concat_ws + posexplode) — JVM-side, codegen, the 100 TB
  path;
- ``ChunkDocs``: a Spark 4 **Python UDTF** (one input row → N chunk rows,
  lateral-joinable from SQL) — the user-extensible transform surface the
  reference's execution-function mechanism lacks (SURVEY §2.12: no
  pandas_udf/UDAF/UDTF anywhere in the reference).

Chunk rule (deterministic, engine-agnostic): tokens = text split on
whitespace runs, empties dropped; starts = 0, stride, 2·stride, … while
start < n_tokens (a document with no tokens yields no chunks); chunk i =
tokens[start : start + size] joined with single spaces.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


def chunk_expr(text: Column, size: int = 50, stride: int = 40):
    """array<struct<chunk_ix int, chunk string, n_tokens int>> — built-in
    expressions only."""
    toks = F.filter(F.split(text, r"\s+"), lambda t: t != "")
    n = F.size(toks)
    starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))) \
        .otherwise(F.array().cast("array<int>"))
    def mk(start, i):
        piece = F.slice(toks, start + 1, size)
        return F.struct(i.cast("int").alias("chunk_ix"),
                        F.concat_ws(" ", piece).alias("chunk"),
                        F.size(piece).cast("int").alias("n_tokens"))
    return F.transform(starts, mk)


def chunk_docs(df, id_col: str = "doc_id", text_col: str = "text",
               size: int = 50, stride: int = 40):
    """doc_id, chunk_ix, chunk, n_tokens — one row per chunk (posexplode of
    chunk_expr; no Python in the plan)."""
    chunks = chunk_expr(F.col(text_col), size, stride)
    return (df.select(F.col(id_col), F.explode(chunks).alias("c"))
            .select(id_col, "c.chunk_ix", "c.chunk", "c.n_tokens"))


class ChunkDocs:
    """Python UDTF equivalent (Spark 4 ``udtf``): register with

        from pyspark.sql.functions import udtf
        spark.udtf.register("chunk_docs", udtf(ChunkDocs,
            returnType="chunk_ix int, chunk string, n_tokens int"))

    then ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_docs(d.text, 50, 40) c``.
    Python runs per row here — prefer ``chunk_docs`` (expression form) on
    the hot path; the UDTF is the extensibility surface for logic that
    outgrows expressions (real tokenizers, sentence splitters).
    """

    def eval(self, text: str, size: int = 50, stride: int = 40):
        if text is None:
            return
        toks = [t for t in re.split(r"\s+", text) if t]
        for i, start in enumerate(range(0, len(toks), stride)):
            piece = toks[start:start + size]
            yield i, " ".join(piece), len(piece)

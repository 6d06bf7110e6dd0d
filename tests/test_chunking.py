"""Chunking: the expression form, the Python UDTF, and the DuckDB oracle
must all agree; edge cases (empty text, short docs, exact-boundary docs)
pinned explicitly."""

import pyspark.sql.functions as F
from pyspark.sql.functions import udtf

from projectone_spark.functions.chunking import ChunkDocs, chunk_docs

SF = "/root/testdata/sf0.001"


def test_expression_and_udtf_agree(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    expr_rows = sorted(map(tuple, chunk_docs(docs).collect()))

    spark.udtf.register("chunk_docs_udtf", udtf(
        ChunkDocs, returnType="chunk_ix int, chunk string, n_tokens int"))
    docs.createOrReplaceTempView("__chunk_docs")
    udtf_rows = sorted(map(tuple, spark.sql("""
        SELECT d.doc_id, c.chunk_ix, c.chunk, c.n_tokens
        FROM __chunk_docs d, LATERAL chunk_docs_udtf(d.text, 50, 40) c
    """).collect()))
    assert expr_rows == udtf_rows and len(expr_rows) > 0


def test_edge_cases(spark):
    rows = [(1, ""), (2, "   "), (3, "one two three"),
            (4, " ".join(f"t{i}" for i in range(50))),   # exactly one chunk
            (5, " ".join(f"t{i}" for i in range(41)))]   # start 40 → 1-token tail
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {(r["doc_id"], r["chunk_ix"]): (r["n_tokens"], r["chunk"])
           for r in chunk_docs(df).collect()}
    assert not any(k[0] in (1, 2) for k in got)       # no tokens → no chunks
    assert got[(3, 0)] == (3, "one two three")
    assert (4, 0) in got and (4, 1) in got            # starts 0 and 40
    assert got[(4, 1)][0] == 10
    assert got[(5, 1)] == (1, "t40")


def test_chunk_overlap_property(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    out = chunk_docs(docs, size=50, stride=40)
    # chunk i's tokens past the stride reappear at the head of chunk i+1
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], {})[r["chunk_ix"]] = r["chunk"].split(" ")
    checked = 0
    for chunks in by_doc.values():
        for ix, toks in chunks.items():
            nxt = chunks.get(ix + 1)
            if nxt:
                overlap = toks[40:]
                assert nxt[:len(overlap)] == overlap
                checked += 1
    assert checked > 0


def test_plan_is_jvm_only(spark):
    import contextlib
    import io

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        chunk_docs(docs).explain("formatted")
    assert "EvalPython" not in buf.getvalue()

"""OData Python DataSource tests against the offline mock transport:
schema-from-$metadata, paged partition planning, filter pushdown to
$filter, column projection, and incremental micro-batch streaming."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projectone_spark.sources.odata import (
    EqualTo,
    GreaterThan,
    MockODataTransport,
    ODataClient,
    ODataReader,
    StringStartsWith,
    translate_filter,
)

OPTS = {"url": "mock://svc", "entity": "Accounts",
        "transport": "projectone_spark.sources.odata:MockODataTransport",
        "rows_per_page": "7"}


@pytest.fixture(scope="module")
def odata_spark(spark):
    from projectone_spark.sources.odata import register

    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _read(odata_spark, **extra):
    r = odata_spark.read.format("odata")
    for k, v in {**OPTS, **extra}.items():
        r = r.option(k, v)
    return r.load()


def test_schema_from_metadata(odata_spark):
    df = _read(odata_spark)
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("Id", "bigint"), ("Name", "string"), ("Balance", "double"),
        ("Active", "boolean"), ("ModifiedOn", "timestamp")]


def test_full_scan_pages_across_partitions(odata_spark):
    df = _read(odata_spark)
    assert df.count() == 40
    # 40 rows / 7 per page → 6 partitions
    assert df.rdd.getNumPartitions() == 6
    assert sorted(r["Id"] for r in df.collect()) == list(range(40))


def test_filter_pushdown_reduces_partitions(odata_spark):
    df = _read(odata_spark).filter(F.col("Id") >= 35)
    rows = df.collect()
    assert sorted(r["Id"] for r in rows) == [35, 36, 37, 38, 39]
    # the pushed $filter shrinks $count → a single partition
    assert df.rdd.getNumPartitions() == 1


def test_string_pushdown_and_residual(odata_spark):
    df = _read(odata_spark).filter(
        F.col("Name").startswith("Account 00") & F.col("Active"))
    assert sorted(r["Id"] for r in df.collect()) == [1, 2, 4, 5, 7, 8]


def test_fields_projection(odata_spark):
    df = _read(odata_spark, fields="Name,Id")
    assert df.columns == ["Name", "Id"]
    assert df.count() == 40


def test_translate_filter_fragments():
    assert translate_filter(EqualTo(("Name",), "x")) == "Name eq 'x'"
    assert translate_filter(GreaterThan(("Id",), 3)) == "Id gt 3"
    assert (translate_filter(StringStartsWith(("Name",), "A"))
            == "startswith(Name,'A')")


def test_client_count_and_page_offline():
    client = ODataClient("mock://svc", "Accounts",
                         "projectone_spark.sources.odata:MockODataTransport")
    assert client.count() == 40
    assert client.count("Id ge 38") == 2
    page = client.page(0, 3, select=["Id", "Name"])
    assert [r["Id"] for r in page] == [0, 1, 2]


def test_stream_incremental_microbatches(odata_spark, tmp_path):
    df = (odata_spark.readStream.format("odata")
          .option("url", OPTS["url"]).option("entity", OPTS["entity"])
          .option("transport", OPTS["transport"])
          .option("incremental_field", "ModifiedOn")
          .load())
    q = (df.writeStream.format("memory").queryName("odata_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = odata_spark.table("odata_stream")
    assert got.count() == 40  # everything is newer than the 2000-01-01 epoch
    assert got.select(F.max("Id")).collect()[0][0] == 39


def test_oauth_token_flow_offline():
    """Client-credentials auth (reference ODataClient.scala:110-190):
    token fetched once, cached, sent as a Bearer header; the secure mock
    rejects unauthenticated requests."""
    import pytest

    from projectone_spark.sources.odata import OAuthSpec, ODataClient

    auth = OAuthSpec(
        "svc", "s3cret", "https://id.example",
        token_transport_spec="projectone_spark.sources.odata:MockTokenTransport")
    client = ODataClient(
        "mock://svc", "Accounts",
        "projectone_spark.sources.odata:MockSecureODataTransport", auth=auth)
    assert client.count() == 40  # authenticated request succeeds
    assert auth.access_token() == "tok-svc"
    t0 = auth._expiry
    client.count()
    assert auth._expiry == t0  # cached, not re-fetched per request

    anon = ODataClient(
        "mock://svc", "Accounts",
        "projectone_spark.sources.odata:MockSecureODataTransport")
    with pytest.raises(PermissionError, match="401"):
        anon.count()


def test_oauth_token_refresh_after_expiry():
    from projectone_spark.sources.odata import OAuthSpec

    auth = OAuthSpec(
        "svc", "s3cret", "https://id.example",
        token_transport_spec="projectone_spark.sources.odata:MockTokenTransport")
    auth.access_token()
    auth._expiry = 0.0  # force expiry
    assert auth.access_token() == "tok-svc"
    assert auth._expiry > 0.0  # refreshed


def test_oauth_repr_redacts_credentials():
    from projectone_spark.sources.odata import OAuthSpec

    auth = OAuthSpec("svc", "s3cret", "https://id.example")
    assert "s3cret" not in repr(auth) and "REDACTED" in repr(auth)


def test_authenticated_read_through_spark(odata_spark):
    """The full Spark path (driver planning + executor page reads) against
    the auth-enforcing mock: executors build their own client via pickle
    and re-fetch tokens, like the reference's per-JVM token cache."""
    df = (odata_spark.read.format("odata")
          .option("url", "mock://svc")
          .option("entity", "Accounts")
          .option("transport",
                  "projectone_spark.sources.odata:MockSecureODataTransport")
          .option("client_id", "svc")
          .option("client_secret", "s3cret")
          .option("identity_service", "https://id.example")
          .option("token_transport",
                  "projectone_spark.sources.odata:MockTokenTransport")
          .option("rows_per_page", "16")
          .load())
    assert df.count() == 40


def test_scan_cache_reuses_pushed_filters_upstream_behavior(odata_spark):
    """Documents a Spark 4.1 Python-DataSource sharp edge (upstream
    behavior, not ours): the JVM caches the planned scan per relation, so
    after a FILTERED query plans against a loaded DataFrame, an
    unfiltered re-use of that same DataFrame object reuses the cached
    filtered read function — rows are silently missing. Each planning
    with filters spawns a fresh reader (data_source_pushdown_filters.py
    worker), so differently-filtered queries stay correct; only the
    no-filter re-plan path hits the stale cache. A fresh load() is always
    clean — which is what our query registry does. If this test starts
    FAILING on a Spark upgrade, the upstream caching was fixed: delete
    the workaround ordering in queries/connectors.py::o01."""
    df = _read(odata_spark)
    assert df.count() == 40              # clean before any filtered plan
    assert df.filter(F.col("Id") >= 35).count() == 5
    assert df.count() == 5               # ← upstream stale-cache behavior
    assert _read(odata_spark).count() == 40  # fresh load is unaffected


def test_stream_rate_limit_slices_timestamp_bounded_windows():
    """max_rows_per_batch (reference ODataMicroStream rateLimit): each
    read() admits ~cap rows, extends to the incremental-timestamp boundary
    (rows sharing a timestamp never straddle batches), offsets advance
    monotonically, and the capped drain equals the uncapped read exactly,
    disjointly."""
    from pyspark.sql.types import StructType

    from projectone_spark.sources.odata import MockODataTransport, ODataClient, ODataStreamReader

    opts = {"url": OPTS["url"], "entity": OPTS["entity"],
            "transport": OPTS["transport"],
            "incremental_field": "ModifiedOn", "rows_per_page": "7",
            "max_rows_per_batch": "7"}
    schema = ODataClient(opts["url"], opts["entity"],
                         opts["transport"]).schema()
    capped = ODataStreamReader(dict(opts), schema)
    full = ODataStreamReader({k: v for k, v in opts.items()
                              if k != "max_rows_per_batch"}, schema)

    all_rows, _ = full.read(full.initialOffset())
    all_rows = list(all_rows)
    assert len(all_rows) == 40

    ts_idx = [f.name for f in schema.fields].index("ModifiedOn")
    offset = capped.initialOffset()
    batches, offsets = [], [offset["watermark"]]
    for _ in range(100):
        rows, offset = capped.read(offset)
        rows = list(rows)
        if not rows:
            assert offset["watermark"] == offsets[-1]  # drained: no advance
            break
        batches.append(rows)
        assert offset["watermark"] > offsets[-1]  # monotone watermark
        offsets.append(offset["watermark"])
        # timestamp-boundary extension keeps the overshoot below one
        # timestamp group's worth (mock: <=2 rows per ModifiedOn day)
        assert len(rows) <= 7 + 1
        # the new watermark IS the batch's max timestamp (offset = the
        # ISO string of the last admitted ModifiedOn)
        assert offsets[-1] == \
            max(r[ts_idx] for r in rows).isoformat() + "Z"
    else:
        raise AssertionError("stream never drained")

    assert len(batches) >= 5  # 40 rows / 7-row cap
    flat = [r for b in batches for r in b]
    assert len(flat) == len(set(flat)) == 40  # disjoint, complete
    assert sorted(flat) == sorted(all_rows)  # equals the uncapped read


def test_replay_between_offsets_is_deterministic():
    """readBetweenOffsets(start, end) must return exactly the committed
    (start, end] window even after the source grew past the committed
    end watermark (ADVICE r5: the old delegate-to-read(start) replay
    re-ran the rate-limit cut against CURRENT source state, so replaying
    a short drain batch after growth leaked rows beyond the committed
    end — breaking deterministic replay)."""
    from projectone_spark.sources.odata import GrowingMockTransport, ODataStreamReader

    opts = {"url": OPTS["url"], "entity": OPTS["entity"],
            "transport": "projectone_spark.sources.odata:GrowingMockTransport",
            "incremental_field": "ModifiedOn", "rows_per_page": "7",
            "max_rows_per_batch": "7"}
    schema = ODataClient(opts["url"], opts["entity"],
                         opts["transport"]).schema()
    reader = ODataStreamReader(dict(opts), schema)

    GrowingMockTransport.extra = 0
    try:
        committed = []  # [(start, end, rows)] — drain the whole timeline
        off = reader.initialOffset()
        for _ in range(100):
            rows, nxt = reader.read(off)
            rows = list(rows)
            if not rows:
                break
            committed.append((off, nxt, rows))
            off = nxt
        assert len(committed) >= 5  # 40 rows / 7-row cap
        # the final batch is a SHORT drain (< cap) — the exact shape the
        # old replay got wrong once the source grew
        assert len(committed[-1][2]) < 7

        # source grows BEYOND the last committed watermark (days 29+)
        GrowingMockTransport.extra = 6

        for s, e, original in committed:
            replayed = list(reader.readBetweenOffsets(s, e))
            assert sorted(replayed) == sorted(original), (s, e)
        # the growth is real: a fresh read from the last offset sees it
        fresh, _ = reader.read(off)
        assert len(list(fresh)) == 6
    finally:
        GrowingMockTransport.extra = 0

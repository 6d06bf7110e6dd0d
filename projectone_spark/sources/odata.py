"""OData connector as a Spark 4 Python DataSource.

Re-expresses the reference's Scala DSv2 connector
(``connectors/spark/scala/odata/``, SURVEY §2.1/§3.4) Spark-first:

- schema inferred from the ``$metadata`` EDMX document, EDM → Spark types
  per ``ODataHelper.scala`` (~143-160): Edm.String→string,
  Edm.Int32→integer, Edm.Int64→long, Edm.DateTimeOffset→timestamp,
  Edm.Decimal→double, Edm.Boolean→boolean, default string;
- filter pushdown to ``$filter`` for =, <>, <, <=, >, >=,
  startswith/endswith/contains (``ODataScan.scala:62-146``,
  ``ODataHelper.scala:36-57``); unsupported filters are returned to Spark
  for post-scan evaluation;
- column pruning via ``$select`` (``ODataScan.scala:148-163``) using the
  ``fields`` option (Python DS API has no prune hook yet);
- limit capping the partition count (``ODataScan.scala:165-170``);
- partition planning = ceil($count / rows_per_page) with the pushed filter
  applied to the count (``ODataScan.scala:205-250``) — each executor pages
  its own ``$skip/$top`` slice independently, so a 10M-row entity fans out
  across the cluster instead of serializing through the driver;
- micro-batch streaming over an incremental timestamp field
  (``ODataMicroStream.scala:33-479``): offsets are ISO timestamps of the
  incremental column (default ``ModifiedOn``, earliest ``2000-01-01`` —
  the reference's epoch 946684800000).

Transport is injectable (``transport`` option naming a
``module:callable``): the default uses ``urllib``; tests inject
:class:`MockODataTransport`, a picklable in-memory service, so the whole
pipeline (planning on the driver, paged reads on executors) runs offline.
"""

from __future__ import annotations

import json
import math
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    Not,
    SimpleDataSourceStreamReader,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EDM_TO_SPARK = {
    "Edm.String": StringType(),
    "Edm.Int32": IntegerType(),
    "Edm.Int64": LongType(),
    "Edm.DateTimeOffset": TimestampType(),
    "Edm.Decimal": DoubleType(),
    "Edm.Double": DoubleType(),
    "Edm.Boolean": BooleanType(),
}

DEFAULT_ROWS_PER_PAGE = 1000
DEFAULT_INCREMENTAL_FIELD = "ModifiedOn"  # reference DefaultODataVariables
DEFAULT_EARLIEST_TIME = "2000-01-01T00:00:00Z"  # epoch 946684800000


def _default_transport(url: str, headers: dict[str, str] | None = None
                       ) -> bytes:  # pragma: no cover - needs network
    from urllib.request import Request, urlopen

    with urlopen(Request(url, headers=headers or {}), timeout=60) as resp:
        return resp.read()


def _load_transport(spec: str | None):
    if not spec:
        return _default_transport
    module, _, attr = spec.partition(":")
    import importlib

    obj = getattr(importlib.import_module(module), attr)
    return obj() if isinstance(obj, type) else obj


def _default_token_transport(url: str, data: dict[str, str]) -> bytes:  # pragma: no cover - needs network
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    req = Request(url, data=urlencode(data).encode(),
                  headers={"Content-Type": "application/x-www-form-urlencoded"})
    with urlopen(req, timeout=60) as resp:
        return resp.read()


def _auth_from_options(options: dict) -> "OAuthSpec | None":
    """Build the OAuth spec from reader options when credentials are
    supplied (``client_id`` + ``client_secret`` + ``identity_service`` —
    the reference's required connection parameters); None = anonymous."""
    if not options.get("client_id"):
        return None
    return OAuthSpec(options["client_id"], options["client_secret"],
                     options["identity_service"],
                     options.get("token_transport"))


class OAuthSpec:
    """OAuth2 client-credentials token provider — the reference's
    ``ODataConnectionSpec`` (``ODataClient.scala:110-190``): POST
    ``{identity_service}/connect/token`` with
    ``grant_type=client_credentials``, cache the ``access_token`` until 30
    seconds before ``expires_in`` elapses, refresh on demand. The token
    transport is injectable like the data transport so auth is offline-
    testable; credentials never appear in ``repr`` (the reference redacts
    them the same way)."""

    def __init__(self, client_id: str, client_secret: str,
                 identity_service: str,
                 token_transport_spec: str | None = None):
        self.client_id = client_id
        self.client_secret = client_secret
        self.identity_service = identity_service.rstrip("/")
        self._spec = token_transport_spec
        self._transport = (_load_transport(token_transport_spec)
                           if token_transport_spec else _default_token_transport)
        self._token: str = ""
        self._expiry: float = 0.0

    def __reduce__(self):  # executors re-fetch their own token (as in ref)
        return (OAuthSpec, (self.client_id, self.client_secret,
                            self.identity_service, self._spec))

    def __repr__(self) -> str:
        return ("OAuthSpec(client_id=[REDACTED], client_secret=[REDACTED], "
                "identity_service=[REDACTED])")

    def access_token(self) -> str:
        import time

        if not self._token or time.time() > self._expiry:
            body = self._transport(
                f"{self.identity_service}/connect/token",
                {"grant_type": "client_credentials",
                 "client_id": self.client_id,
                 "client_secret": self.client_secret})
            payload = json.loads(body)
            self._token = payload["access_token"]
            self._expiry = time.time() + float(payload["expires_in"]) - 30
        return self._token


class ODataClient:
    """Driver/executor-side REST helper (reference ``ODataClient.scala``)."""

    def __init__(self, url: str, entity: str, transport_spec: str | None = None,
                 auth: OAuthSpec | None = None):
        self.base = url.rstrip("/")
        self.entity = entity
        self._transport_spec = transport_spec
        self._transport = _load_transport(transport_spec)
        self.auth = auth

    def __reduce__(self):  # picklable for executor-side partition readers
        return (ODataClient, (self.base, self.entity, self._transport_spec,
                              self.auth))

    def _accepts_headers(self) -> bool:
        import inspect

        try:
            fn = (self._transport.__call__
                  if not inspect.isfunction(self._transport)
                  and not inspect.ismethod(self._transport)
                  else self._transport)
            return len(inspect.signature(fn).parameters) >= 2
        except (TypeError, ValueError):  # builtins without signatures
            return False

    def _get(self, path: str) -> bytes:
        url = f"{self.base}/{path}"
        if self.auth is not None and self._accepts_headers():
            headers = {"Authorization": f"Bearer {self.auth.access_token()}"}
            return self._transport(url, headers)
        return self._transport(url)

    def schema(self, fields: list[str] | None = None) -> StructType:
        """Schema from $metadata (reference ``ODataTable.scala:56-75``)."""
        xml = self._get("$metadata").decode()
        root = ET.fromstring(xml)

        def _by_tag(elem: ET.Element, tag: str) -> list[ET.Element]:
            # Element.iter() has no namespace wildcard — match the local name
            return [e for e in elem.iter() if e.tag.split("}")[-1] == tag]

        props: list[StructField] = []
        for et in _by_tag(root, "EntityType"):
            if et.get("Name") not in (self.entity, self.entity.rstrip("s")):
                continue
            for prop in _by_tag(et, "Property"):
                name = prop.get("Name")
                if fields and name not in fields:
                    continue
                dt = EDM_TO_SPARK.get(prop.get("Type", ""), StringType())
                props.append(StructField(name, dt, True))
        if not props:
            raise ValueError(f"entity '{self.entity}' not found in $metadata")
        if fields:  # keep the caller's projection order
            order = {n: i for i, n in enumerate(fields)}
            props.sort(key=lambda f: order.get(f.name, 1 << 30))
        return StructType(props)

    def count(self, filter_expr: str | None = None) -> int:
        """$count with pushed filters (reference ``ODataClient.scala:276``)."""
        q = f"?$filter={filter_expr}" if filter_expr else ""
        return int(self._get(f"{self.entity}/$count{q}").decode().strip())

    def page(self, skip: int, top: int, *, filter_expr: str | None = None,
             select: list[str] | None = None,
             orderby: str | None = None) -> list[dict[str, Any]]:
        """One $skip/$top page (reference ``ODataClient.scala:352-405``)."""
        params = [f"$skip={skip}", f"$top={top}"]
        if filter_expr:
            params.append(f"$filter={filter_expr}")
        if select:
            params.append(f"$select={','.join(select)}")
        if orderby:
            params.append(f"$orderby={orderby}")
        body = self._get(f"{self.entity}?{'&'.join(params)}")
        return json.loads(body)["value"]


def translate_filter(f: Filter) -> str | None:
    """Spark Filter → OData $filter fragment (reference
    ``ODataHelper.scala:42-56``); None = not pushable."""
    def lit(v: Any) -> str:
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def col(path) -> str:
        return ".".join(path)

    if isinstance(f, EqualTo):
        return f"{col(f.attribute)} eq {lit(f.value)}"
    if isinstance(f, GreaterThan):
        return f"{col(f.attribute)} gt {lit(f.value)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{col(f.attribute)} ge {lit(f.value)}"
    if isinstance(f, LessThan):
        return f"{col(f.attribute)} lt {lit(f.value)}"
    if isinstance(f, LessThanOrEqual):
        return f"{col(f.attribute)} le {lit(f.value)}"
    if isinstance(f, StringStartsWith):
        return f"startswith({col(f.attribute)},{lit(f.value)})"
    if isinstance(f, StringEndsWith):
        return f"endswith({col(f.attribute)},{lit(f.value)})"
    if isinstance(f, StringContains):
        return f"contains({col(f.attribute)},{lit(f.value)})"
    if isinstance(f, Not) and isinstance(f.child, EqualTo):
        return f"{col(f.child.attribute)} ne {lit(f.child.value)}"
    return None


@dataclass
class ODataPartition(InputPartition):
    index: int
    skip: int
    top: int


class ODataReader(DataSourceReader):
    """Batch reader: pushdown + count-based partition planning
    (reference ``ODataScan.scala``)."""

    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self._schema = schema
        self.client = ODataClient(options["url"], options["entity"],
                                  options.get("transport"),
                                  auth=_auth_from_options(options))
        self.rows_per_page = int(options.get("rows_per_page",
                                             DEFAULT_ROWS_PER_PAGE))
        self.fields = [s.strip() for s in options["fields"].split(",")] \
            if options.get("fields") else None
        self.pushed: list[str] = []
        if options.get("predicates"):  # pre-parsed predicates option
            self.pushed.append(options["predicates"])
        self.limit: int | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            frag = translate_filter(f)
            if frag is None:
                yield f  # Spark evaluates it post-scan
            else:
                self.pushed.append(frag)

    def pushLimit(self, limit: int) -> None:  # pragma: no cover - api probe
        self.limit = limit

    @property
    def filter_expr(self) -> str | None:
        return " and ".join(self.pushed) if self.pushed else None

    def partitions(self) -> list[ODataPartition]:
        n = self.client.count(self.filter_expr)
        if self.limit is not None:
            n = min(n, self.limit)
        n_parts = max(1, math.ceil(n / self.rows_per_page))
        return [ODataPartition(i, i * self.rows_per_page,
                               min(self.rows_per_page,
                                   n - i * self.rows_per_page))
                for i in range(n_parts)]

    def read(self, partition: ODataPartition) -> Iterator[tuple]:
        # stable pagination needs a total order (reference orders by the
        # first key field); we order by all selected fields' first column
        select = [f.name for f in self._schema.fields]
        rows = self.client.page(partition.skip, partition.top,
                                filter_expr=self.filter_expr,
                                select=select,
                                orderby=self.options.get("orderby"))
        for r in rows:
            yield tuple(_coerce(r.get(f.name), f.dataType)
                        for f in self._schema.fields)


class ODataStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch incremental reads over the ``incremental_field``
    timestamp (reference ``ODataMicroStream.scala``): each batch covers
    ``(last_offset, next_watermark]``.

    ``max_rows_per_batch`` is the reference's rate limit
    (``ODataMicroStream.scala:33-479`` ``getDefaultReadLimit``/rateLimit):
    a batch admits roughly that many rows, then stops at the nearest
    incremental-timestamp boundary — rows sharing one timestamp never
    straddle two batches, because the offset is a timestamp watermark and
    the next batch's ``gt`` filter would otherwise skip the remainder.
    Unset (0) = drain everything available per batch."""

    def __init__(self, options: dict, schema: StructType):
        self.options = options
        self._schema = schema
        self.client = ODataClient(options["url"], options["entity"],
                                  options.get("transport"),
                                  auth=_auth_from_options(options))
        self.field = options.get("incremental_field", DEFAULT_INCREMENTAL_FIELD)
        self.earliest = options.get("earliest_time", DEFAULT_EARLIEST_TIME)
        self.rows_per_page = int(options.get("rows_per_page",
                                             DEFAULT_ROWS_PER_PAGE))
        self.max_rows = int(options.get("max_rows_per_batch", 0))

    def initialOffset(self) -> dict:
        return {"watermark": self.earliest}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["watermark"]
        filter_expr = f"{self.field} gt {lo}"
        n = self.client.count(filter_expr)
        rows: list[dict] = []
        for skip in range(0, n, self.rows_per_page):
            rows.extend(self.client.page(skip, self.rows_per_page,
                                         filter_expr=filter_expr,
                                         orderby=self.field))
            if self.max_rows and len(rows) > self.max_rows:
                # fetched past the admission cap AND past the boundary
                # timestamp → no more pages needed for this batch (pages
                # arrive ordered by the incremental field)
                if rows[-1][self.field] > rows[self.max_rows - 1][self.field]:
                    break
        if self.max_rows and len(rows) > self.max_rows:
            # cut at the timestamp boundary: keep every row sharing the
            # cap row's timestamp, drop rows strictly after it (ISO-8601
            # strings of one format order lexicographically = temporally)
            cut = rows[self.max_rows - 1][self.field]
            rows = [r for r in rows if r[self.field] <= cut]
        hi = max((r[self.field] for r in rows), default=lo)
        # a LIST, not a generator: Spark's prefetch cache copy.copy()s a
        # non-empty batch. EXCEPT when the offset did not advance (drained
        # source): that path next()-probes the value to confirm emptiness,
        # so it must be an (empty) iterator, not a list.
        out = [tuple(_coerce(r.get(f.name), f.dataType)
                     for f in self._schema.fields) for r in rows]
        if not out:
            return iter(out), {"watermark": hi}
        return out, {"watermark": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Failure-recovery replay of a COMMITTED batch: the offsets pin a
        # real (start, end] watermark window, so drain exactly that window
        # — no rate-limit cut, no dependence on how much the source has
        # grown since the original read (deterministic replay). Inherent
        # caveat shared by every timestamp-watermark CDC (incl. the
        # reference's ModifiedOn scheme): a row that arrives AFTER commit
        # carrying a timestamp <= end is indistinguishable from the
        # original window and will appear in a replay; rows beyond end —
        # the normal growth path — are excluded exactly.
        lo, hi = start["watermark"], end["watermark"]
        if hi <= lo:
            return iter(())
        filter_expr = f"{self.field} gt {lo} and {self.field} le {hi}"
        n = self.client.count(filter_expr)
        rows: list[dict] = []
        for skip in range(0, n, self.rows_per_page):
            rows.extend(self.client.page(skip, self.rows_per_page,
                                         filter_expr=filter_expr,
                                         orderby=self.field))
        return iter([tuple(_coerce(r.get(f.name), f.dataType)
                           for f in self._schema.fields) for r in rows])


def _coerce(v: Any, dt) -> Any:
    if v is None:
        return None
    if isinstance(dt, TimestampType) and isinstance(v, str):
        import datetime as _dt

        return _dt.datetime.fromisoformat(v.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    if isinstance(dt, (IntegerType, LongType)):
        return int(v)
    if isinstance(dt, DoubleType):
        return float(v)
    if isinstance(dt, BooleanType):
        return bool(v)
    return v


class ODataDataSource(DataSource):
    """``spark.read.format("odata")`` entry point. Required options:
    ``url``, ``entity`` (reference ``ODataSource.scala:55-66``)."""

    @classmethod
    def name(cls) -> str:
        return "odata"

    def schema(self) -> StructType:
        for opt in ("url", "entity"):
            if opt not in self.options:
                raise ValueError(f"odata source requires option '{opt}'")
        client = ODataClient(self.options["url"], self.options["entity"],
                             self.options.get("transport"),
                             auth=_auth_from_options(self.options))
        fields = [s.strip() for s in self.options["fields"].split(",")] \
            if self.options.get("fields") else None
        return client.schema(fields)

    def reader(self, schema: StructType) -> ODataReader:
        return ODataReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> ODataStreamReader:
        return ODataStreamReader(dict(self.options), schema)


def register(spark) -> None:
    """Register the connector: ``spark.read.format("odata")`` afterwards."""
    spark.dataSource.register(ODataDataSource)


# -- offline mock transport (tests / demos) ---------------------------------

class MockODataTransport:
    """Picklable in-memory OData service speaking just enough of the
    protocol for the connector: $metadata, $count, $skip/$top/$filter/
    $select/$orderby. Deterministic: 40 'Account' rows."""

    N = 40

    def _rows(self) -> list[dict[str, Any]]:
        return [{"Id": i,
                 "Name": f"Account {i:03d}",
                 "Balance": round(100.0 * i + 0.5, 2),
                 "Active": i % 3 != 0,
                 "ModifiedOn": f"2024-01-{1 + i % 28:02d}T00:00:00Z"}
                for i in range(self.N)]

    _METADATA = """<?xml version="1.0"?>
<edmx:Edmx xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx" Version="4.0">
 <edmx:DataServices>
  <Schema xmlns="http://docs.oasis-open.org/odata/ns/edm" Namespace="Mock">
   <EntityType Name="Account">
    <Property Name="Id" Type="Edm.Int64"/>
    <Property Name="Name" Type="Edm.String"/>
    <Property Name="Balance" Type="Edm.Decimal"/>
    <Property Name="Active" Type="Edm.Boolean"/>
    <Property Name="ModifiedOn" Type="Edm.DateTimeOffset"/>
   </EntityType>
  </Schema>
 </edmx:DataServices>
</edmx:Edmx>"""

    def __call__(self, url: str) -> bytes:
        path = url.split("://", 1)[-1].split("/", 1)[1]
        if path == "$metadata":
            return self._METADATA.encode()
        m = re.match(r"Accounts?(/\$count)?(?:\?(.*))?$", path)
        assert m, f"mock: unsupported url {url}"
        params = dict(p.split("=", 1) for p in (m.group(2) or "").split("&") if p)
        rows = self._filter(self._rows(), params.get("$filter"))
        if m.group(1):  # $count
            return str(len(rows)).encode()
        if "$orderby" in params:
            rows.sort(key=lambda r: r[params["$orderby"].split()[0]])
        else:
            rows.sort(key=lambda r: r["Id"])
        skip = int(params.get("$skip", 0))
        top = int(params.get("$top", len(rows)))
        rows = rows[skip:skip + top]
        if "$select" in params:
            keep = params["$select"].split(",")
            rows = [{k: r[k] for k in keep} for r in rows]
        return json.dumps({"value": rows}).encode()

    def _filter(self, rows: list[dict], expr: str | None) -> list[dict]:
        if not expr:
            return rows
        out = rows
        for clause in expr.split(" and "):
            out = [r for r in out if self._eval(r, clause.strip())]
        return out

    def _eval(self, row: dict, clause: str) -> bool:
        fn = re.match(r"(startswith|endswith|contains)\((\w+),'(.*)'\)", clause)
        if fn:
            hay = str(row[fn.group(2)])
            needle = fn.group(3)
            return {"startswith": hay.startswith(needle),
                    "endswith": hay.endswith(needle),
                    "contains": needle in hay}[fn.group(1)]
        m = re.match(r"(\w+) (eq|ne|gt|ge|lt|le) (.*)", clause)
        assert m, f"mock: unsupported filter {clause}"
        field, op, raw = m.groups()
        val: Any = raw
        if raw.startswith("'"):
            val = raw.strip("'")
        elif raw in ("true", "false"):
            val = raw == "true"
        else:
            try:
                val = int(raw)
            except ValueError:
                try:
                    val = float(raw)
                except ValueError:
                    pass
        have = row[field]
        return {"eq": have == val, "ne": have != val, "gt": str(have) > str(val)
                if isinstance(have, str) else have > val,
                "ge": have >= val, "lt": have < val, "le": have <= val}[op]


class GrowingMockTransport(MockODataTransport):
    """Mock service whose row count can be grown mid-run (class-level so
    the spec-loaded instance and the caller share state) — models a live
    source that keeps ingesting between a batch's commit and its
    failure-recovery replay. Growth lands strictly AFTER the base
    timeline (days 29+), the case the replay contract must exclude."""

    extra = 0  # rows 40..40+extra-1, on days after the base timeline

    def _rows(self) -> list[dict[str, Any]]:
        rows = super()._rows()
        for i in range(self.N, self.N + type(self).extra):
            rows.append({"Id": i, "Name": f"Account {i:03d}",
                         "Balance": round(100.0 * i + 0.5, 2),
                         "Active": True,
                         "ModifiedOn": f"2024-01-{29 + (i - self.N) % 3:02d}"
                                       f"T00:00:00Z"})
        return rows


class MockTokenTransport:
    """Offline identity service: issues a deterministic bearer token for
    the client-credentials grant (600s lifetime)."""

    def __call__(self, url: str, data: dict[str, str]) -> bytes:
        assert url.endswith("/connect/token"), url
        assert data["grant_type"] == "client_credentials"
        token = f"tok-{data['client_id']}"
        return json.dumps({"access_token": token, "expires_in": 600}).encode()


class MockSecureODataTransport(MockODataTransport):
    """The mock service with auth enforced: every request must carry the
    Bearer token MockTokenTransport issues, else 401 — proves the
    connector's token flow end-to-end offline."""

    def __call__(self, url: str, headers: dict[str, str] | None = None) -> bytes:
        auth = (headers or {}).get("Authorization", "")
        if not (auth.startswith("Bearer tok-")):
            raise PermissionError(f"401 unauthorized for {url}")
        return super().__call__(url)

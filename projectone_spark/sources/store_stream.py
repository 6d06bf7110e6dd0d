"""The TableStore as a Structured Streaming SOURCE — parity with Delta's
``spark.readStream.table(...)`` (the reference reads streams from Delta
tables, ``core/sources/delta_source.py:19-30`` with
``source_extract_type="stream"``).

Implemented as a Spark 4 Python DataSource with a partition-based stream
reader:

- offsets are manifest versions (``{"version": n}``) — exactly Delta's
  reservoir of commit versions;
- each micro-batch plans ONE InputPartition per data file added in the
  version range, so executors read files in parallel with pyarrow and the
  driver only ever touches manifest metadata;
- append commits stream their added files as inserts; data-changing
  commits (delete/update/merge/compact/optimize/restore) RAISE unless
  ``skipChangeCommits=true`` — Delta's exact contract for streaming from a
  mutated table.

Scale: the per-batch planning cost is O(files added), read cost is the new
files only, and rate is boundable upstream via the trigger. Partitioned
tables would need path-derived partition columns attached per file; that
is not wired yet, so they are rejected loudly.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_CHANGE_OPS = {"delete", "update", "merge", "compact", "optimize",
               "restore", "overwrite", "selective_overwrite"}


def _manifests(root: str, table: str) -> dict[int, dict]:
    tdir = os.path.join(root, table)
    out: dict[int, dict] = {}
    if not os.path.isdir(tdir):
        return out
    for fn in os.listdir(tdir):
        if fn.startswith("_manifest_v") and fn.endswith(".json"):
            with open(os.path.join(tdir, fn)) as f:
                m = json.load(f)
            out[m["version"]] = m
    return out


def _files_of(m: dict) -> list[str]:
    """Every data file of a snapshot (from recorded entries, else a walk)."""
    entries = [f["path"] for f in (m.get("files") or [])]
    if entries:
        return entries
    out = []
    for d in m["dirs"]:
        for dirpath, _, files in os.walk(d):
            for fn in sorted(files):
                if fn.endswith(".parquet"):
                    out.append(os.path.join(dirpath, fn))
    return out


class StoreFilePartition(InputPartition):
    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


class StoreChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        opts = {k.lower(): v for k, v in options.items()}
        self.root = opts["root"]
        self.table = opts["table"]
        self.skip_change_commits = (
            str(opts.get("skipchangecommits", "false")).lower() == "true")
        start = opts.get("startingversion")
        self._initial = int(start) if start is not None else -1

    def initialOffset(self) -> dict:
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        ms = _manifests(self.root, self.table)
        return {"version": max(ms) if ms else -1}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        ms = _manifests(self.root, self.table)
        parts: list[InputPartition] = []
        for v in range(start["version"] + 1, end["version"] + 1):
            m = ms.get(v)
            if m is None:
                continue
            if m["partition_by"]:
                raise ValueError(
                    f"streaming from hive-partitioned table "
                    f"'{self.table}' is not supported")
            prev = ms.get(v - 1)
            if m["operation"] != "append" and prev is not None:
                if self.skip_change_commits:
                    continue
                raise ValueError(
                    f"version {v} of '{self.table}' is a "
                    f"'{m['operation']}' commit; streaming sources only "
                    f"support appends — set skipChangeCommits=true to "
                    f"ignore data-changing commits (Delta's contract)")
            seen = set(_files_of(prev)) if prev is not None else set()
            for p in _files_of(m):
                if p not in seen:
                    parts.append(StoreFilePartition(p, v))
        return parts

    def read(self, partition: StoreFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        # Arrow RecordBatches, not per-row tuples: the reader stays
        # zero-copy from parquet decode to Spark ingestion
        yield from pq.ParquetFile(partition.path).iter_batches()

    def commit(self, end: dict) -> None:
        pass


class StoreChangesDataSource(DataSource):
    """``spark.readStream.format("store_changes").option("root", ...)
    .option("table", ...).load()``"""

    @classmethod
    def name(cls) -> str:
        return "store_changes"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        ms = _manifests(self.options["root"], self.options["table"])
        if not ms:
            raise FileNotFoundError(
                f"table '{self.options['table']}' does not exist under "
                f"{self.options['root']}")
        files = _files_of(ms[max(ms)])
        if not files:
            raise ValueError(
                f"table '{self.options['table']}' has no data files to "
                f"infer a schema from")
        return from_arrow_schema(pq.ParquetFile(files[0]).schema_arrow,
                                 prefer_timestamp_ntz=True)

    def streamReader(self, schema: StructType) -> StoreChangesStreamReader:
        return StoreChangesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(StoreChangesDataSource)


def stream_from_store(spark, store, table: str, *,
                      skip_change_commits: bool = False,
                      starting_version: int | None = None):
    """Convenience: a streaming DataFrame of rows appended to a store
    table (Delta ``readStream.table`` parity)."""
    register(spark)
    r = (spark.readStream.format("store_changes")
         .option("root", store.root).option("table", table))
    if skip_change_commits:
        r = r.option("skipChangeCommits", "true")
    if starting_version is not None:
        r = r.option("startingVersion", str(starting_version))
    return r.load()

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
files only, and rate is boundable upstream via the trigger. Hive-
partitioned tables stream with their partition columns reattached per file
as typed constants (pyarrow's hive inference — the same types a batch read
discovers).
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
    def __init__(self, path: str, version: int, base_dir: str):
        self.path = path
        self.version = version
        self.base_dir = base_dir


def _arrow_schema(m: dict):
    """Arrow schema of a snapshot, hive partition columns included and
    TYPED (pyarrow's hive partitioning inference — the same types a batch
    ``spark.read.parquet(dir)`` discovers)."""
    import pyarrow.dataset as pads

    if not m["partition_by"]:
        import pyarrow.parquet as pq

        files = _files_of(m)
        if not files:
            raise ValueError("no data files to infer a schema from")
        return pq.ParquetFile(files[0]).schema_arrow
    return pads.dataset(m["dirs"][0], format="parquet",
                        partitioning="hive").schema


class StoreChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        opts = {k.lower(): v for k, v in options.items()}
        self.root = opts["root"]
        self.table = opts["table"]
        self.skip_change_commits = (
            str(opts.get("skipchangecommits", "false")).lower() == "true")
        start = opts.get("startingversion")
        self._initial = int(start) if start is not None else -1
        ms = _manifests(self.root, self.table)
        if not ms:
            raise FileNotFoundError(f"table '{self.table}' does not exist")
        self._schema = _arrow_schema(ms[max(ms)])  # pickled to executors

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
                    base = next(d for d in m["dirs"]
                                if p.startswith(d + os.sep))
                    parts.append(StoreFilePartition(p, v, base))
        return parts

    def read(self, partition: StoreFilePartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        from projectone_spark.store.skipping import partition_values

        # Arrow RecordBatches, not per-row tuples: the reader stays
        # zero-copy from parquet decode to Spark ingestion
        rel = os.path.relpath(partition.path, partition.base_dir)
        pvals = partition_values(rel)
        for batch in pq.ParquetFile(partition.path).iter_batches():
            if not pvals:
                yield batch
                continue
            # attach hive partition columns as typed constants, emitting
            # columns in the declared schema's order
            arrays, names = [], []
            for f in self._schema:
                if f.name in pvals:
                    sc = pa.scalar(pvals[f.name]).cast(f.type)
                    arrays.append(pa.repeat(sc, batch.num_rows))
                    names.append(f.name)
                elif f.name in batch.schema.names:
                    arrays.append(batch.column(f.name))
                    names.append(f.name)
            yield pa.RecordBatch.from_arrays(arrays, names)

    def commit(self, end: dict) -> None:
        pass


class StoreChangesDataSource(DataSource):
    """``spark.readStream.format("store_changes").option("root", ...)
    .option("table", ...).load()``"""

    @classmethod
    def name(cls) -> str:
        return "store_changes"

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        ms = _manifests(self.options["root"], self.options["table"])
        if not ms:
            raise FileNotFoundError(
                f"table '{self.options['table']}' does not exist under "
                f"{self.options['root']}")
        return from_arrow_schema(_arrow_schema(ms[max(ms)]),
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

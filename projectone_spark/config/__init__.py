"""Pydantic config contracts — the engine's JSON surface.

Keeps the reference's contract shape (``core/schemas/input.py:17-44``,
``execution.py:9-37``, ``output.py:13-36``, ``sources.py:77-233``,
``refresh.py:6-11``) so existing task specs translate directly, while the
execution semantics behind them are the Spark-first implementations in
``sources``/``writers``/``cdc``/``task``.
"""

from __future__ import annotations

from typing import Any, Literal

from pydantic import BaseModel, Field, field_validator, model_validator

from projectone_spark.config.data_objects import (  # noqa: F401 (re-export)
    SchemaObject,
    Table,
    TableColumn,
    View,
)

WriteType = Literal["append", "overwrite", "selective_overwrite",
                    "scd1", "scd2", "scd3", "custom"]
SourceType = Literal["table", "file", "stream"]
ExtractType = Literal["batch", "stream"]


class ReadOptions(BaseModel):
    """Subset of the reference ReadOptions (``core/schemas/sources.py``)."""

    model_config = {"extra": "allow"}

    source_schema: str | None = None  # DDL string, validated like sources.py:114-133
    filter: str | None = None
    options: dict[str, Any] = Field(default_factory=dict)

    @field_validator("source_schema")
    @classmethod
    def _validate_ddl(cls, v: str | None) -> str | None:
        if v is not None:
            from projectone_spark.features import parse_ddl

            parse_ddl(v)  # raises on invalid DDL
        return v


class Feature(BaseModel):
    model_config = {"extra": "allow"}
    name: str


class CdcConfig(BaseModel):
    """Attribute CDC config (reference change feature, features.py:~109)."""

    attribute: str
    value_type: Literal["integer", "date", "timestamp"] = "timestamp"
    backfill_start: Any | None = None
    backfill_end: Any | None = None


class SparkInput(BaseModel):
    """Reference SparkInput (``core/schemas/input.py:17-44``)."""

    name: str
    path: str | None = None
    table: str | None = None
    source: str = "parquet"  # format: csv/parquet/json/delta/jdbc/kafka/odata
    source_type: SourceType = "file"
    source_extract_type: ExtractType = "batch"
    read_options: ReadOptions = Field(default_factory=ReadOptions)
    features: list[Feature] = Field(default_factory=list)
    cdc: CdcConfig | None = None

    @model_validator(mode="after")
    def _path_or_table(self) -> "SparkInput":
        if self.path is None and self.table is None:
            raise ValueError(f"input '{self.name}' needs a path or a table")
        return self


class SparkExecution(BaseModel):
    """Reference SparkExecution (``core/schemas/execution.py:9-37``):
    a named function sourced from a module path, a source-code body, or a
    file path."""

    name: str
    module: str | None = None
    body: str | None = None
    file: str | None = None
    extra_arguments: dict[str, Any] = Field(default_factory=dict)

    @model_validator(mode="after")
    def _one_source(self) -> "SparkExecution":
        if sum(x is not None for x in (self.module, self.body, self.file)) != 1:
            raise ValueError(
                f"execution '{self.name}': exactly one of module/body/file required")
        return self


class WriteOptions(BaseModel):
    """Reference WriteOptions subset (``core/schemas/sources.py:201-233``)."""

    model_config = {"extra": "allow"}

    partition_by: str | None = None          # comma-separated
    key_attributes: str | None = None        # merge keys, comma-separated
    data_attributes: str | None = None
    column_attributes: str | None = None     # scd3 tracked columns
    deduplicate_onkeys: bool = False
    history_tracking_col: str | None = None  # scd2 event-time validity
    fix_duplicates_by_key: bool = False
    generate_record_upsert_columns: bool = False
    rename_metadata_columns: dict[str, str] | None = None
    active_record_value_mapping: dict[str, str] | None = None
    replace_where: str | None = None
    partition_values: dict[str, list] | None = None
    # reference WriteExtraOptions (sources.py:137-199) completion:
    persist_dataset: bool = False        # DISK_ONLY persist pre-write
    stage_results: bool = False          # localCheckpoint pre-write
    exclude_data_columns: str | None = None  # data cols = all minus these
    # merge-condition pruning conjuncts; this engine's analogue is the
    # partition-pruned merge (writers._partition_prune) so a non-empty
    # list turns partition_prune on (the reference spells it 'paritition')
    use_paritition_column_in_merge: list[str] | None = None
    use_key_attributes_in_merge: bool = False  # subsumed by key-hash join
    history_start_tracking_value: str | None = None
    history_start_tracking_value_type: str | None = None

    def split(self, attr: str) -> list[str] | None:
        v = getattr(self, attr)
        return [c.strip() for c in v.split(",")] if v else None


class StreamTrigger(BaseModel):
    """Reference StreamTrigger (``core/schemas/sources.py:88-110``)."""

    once: bool | None = None
    available_now: bool | None = None
    processing_time: str | None = None

    def to_kwargs(self) -> dict[str, Any]:
        if self.processing_time:
            return {"processingTime": self.processing_time}
        if self.once:
            return {"once": True}
        return {"availableNow": True}  # reference default


class SparkOutput(BaseModel):
    """Reference SparkOutput (``core/schemas/output.py:13-36``)."""

    name: str
    table: str | None = None
    path: str | None = None
    sink: str = "store"
    write_type: WriteType = "append"
    write_options: WriteOptions = Field(default_factory=WriteOptions)
    trigger: StreamTrigger = Field(default_factory=StreamTrigger)
    checkpoint_location: str | None = None
    constraints: list[tuple[str, list[str]]] = Field(default_factory=list)
    #: create-object-if-missing pre-write feature (reference
    #: ``features.py:223-244``): a Table contract materialized before the
    #: first write, with generated/identity/default columns applied
    create_table: "Table | None" = None

    @property
    def target(self) -> str:
        return self.table or self.path or self.name


#: reference DateFormatTypes (``core/schemas/__init__.py:82-87``)
DATE_FORMATS = {"date": "%Y-%m-%d", "timestamp": "%Y-%m-%dT%H:%M:%S",
                "date_integer": "%Y%m%d"}


class RefreshPolicy(BaseModel):
    """Reference refresh policy (``core/schemas/refresh.py:6-60``).

    ``range_start``/``range_end`` are the RUNTIME window (computed at task
    start unless given): non-backfill runs roll forward from the previous
    run's persisted end (state ``pipeline_load_timestamp``) — or
    ``start_value`` on the first run — to now; backfill uses the explicit
    ``start_value``/``end_value`` pair (reference ``context.py:60-87``).
    """

    type: Literal["full", "incremental", "backfill", "stream"] = "full"
    interval: Literal["day", "week", "month", "year"] = "day"
    start_value: str | None = None
    end_value: str | None = None
    format: Literal["date", "timestamp", "date_integer"] = "timestamp"
    range_start: Any | None = None
    range_end: Any | None = None

    @model_validator(mode="after")
    def _default_range(self) -> "RefreshPolicy":
        # reference refresh.py validator: explicit values seed the range
        if self.range_start is None:
            self.range_start = self.start_value
        if self.range_end is None:
            self.range_end = self.end_value
        return self

    def resolve_range(self, previous_end: str | None = None) -> tuple[str | None, str | None]:
        """Compute the run's (range_start, range_end) — reference
        ``context.get_range_values``. Non-backfill: start = previous run's
        end (or ``start_value``, or now on a cold start), end = now, both
        rendered in ``format``. Backfill: the explicit pair unchanged."""
        from datetime import datetime

        if self.type == "backfill":
            self.range_start, self.range_end = self.start_value, self.end_value
            return self.range_start, self.range_end
        fmt = DATE_FORMATS[self.format]
        now = datetime.now().strftime(fmt)
        self.range_start = previous_end or self.start_value or now
        self.range_end = now
        return self.range_start, self.range_end


class TaskConfig(BaseModel):
    """One Spark task = inputs → execution → outputs (the core design
    contract, projectoneflow README)."""

    name: str
    inputs: list[SparkInput]
    execution: SparkExecution | None = None  # None → identity passthrough
    outputs: list[SparkOutput]
    refresh_policy: RefreshPolicy = Field(default_factory=RefreshPolicy)
    spark_config: dict[str, str] = Field(default_factory=dict)
    state_location: str | None = None
    store_location: str | None = None
    secrets: dict[str, dict[str, str]] = Field(default_factory=dict)
    #: persist per-stage task metrics (run/CPU/GC time, shuffle, spill,
    #: peak memory) per output write to the task's state logs — the
    #: reference's scheduler-listener harness
    #: (``core/observability/spark_listener.py:99-180``)
    observe_stages: bool = False

    @model_validator(mode="after")
    def _stream_consistency(self) -> "TaskConfig":
        # reference stream validation (task.py:239-266)
        any_stream = any(i.source_extract_type == "stream" for i in self.inputs)
        if any_stream and self.refresh_policy.type != "stream":
            raise ValueError("stream inputs require refresh_policy.type='stream'")
        if any_stream and len(self.outputs) not in (1, len(self.inputs)):
            raise ValueError("#outputs must equal #inputs (or 1) for stream tasks")
        if self.observe_stages and self.refresh_policy.type == "stream":
            # only the batch write path snapshots per-stage metrics; a
            # silent no-op here would break the field's promise
            raise ValueError("observe_stages is only supported for batch "
                             "tasks (stream writes have no per-output job "
                             "group to snapshot)")
        return self

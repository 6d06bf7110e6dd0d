"""Catalog data-object contracts: Schema / Table / View / Volume.

Reference shapes (``core/schemas/data_objects.py:6-180``): a Table declares
columns (type, nullability, comment, generated expression, identity,
default), format, partition/cluster columns, location, properties, tags.
The reference materializes these via ``DeltaTable.createIfNotExists``
(``core/utils/delta.py:84-133``); here they materialize through
TableStore (``store.create_if_not_exists``) with generated/identity
columns applied write-side by :mod:`projectone_spark.writers.columns`.
"""

from __future__ import annotations

from typing import Any

from pydantic import BaseModel, Field, model_validator


class TableColumn(BaseModel):
    """Reference ``TableColumnSchema`` (``data_objects.py:28-61``)."""

    name: str
    type: str = "string"  # Spark DDL type
    nullable: bool = True
    comment: str | None = None
    generated_expr: str | None = None  # delta.generationExpression analogue
    identity: bool = False             # forced long, start/step metadata
    identity_start: int = 1
    identity_step: int = 1
    default: Any | None = None

    @model_validator(mode="after")
    def _identity_is_long(self) -> "TableColumn":
        if self.identity:
            self.type = "bigint"  # reference forces LongType
        if self.identity and self.generated_expr:
            raise ValueError(f"column '{self.name}': identity and "
                             "generated_expr are mutually exclusive")
        return self


class Table(BaseModel):
    """Reference ``Table`` (``data_objects.py:63-97``)."""

    name: str
    columns: list[TableColumn] = Field(default_factory=list)
    format: str = "parquet"
    partition_by: list[str] = Field(default_factory=list)
    cluster_by: list[str] = Field(default_factory=list)
    location: str | None = None
    properties: dict[str, str] = Field(default_factory=dict)
    comment: str | None = None
    tags: dict[str, str] = Field(default_factory=dict)

    def ddl(self) -> str:
        """The declared schema as a Spark DDL string."""
        return ", ".join(f"{c.name} {c.type}" for c in self.columns)


class View(BaseModel):
    """Reference ``View`` (``data_objects.py:99-110``)."""

    name: str
    query: str
    comment: str | None = None


class SchemaObject(BaseModel):
    """Reference ``Schema`` (catalog.schema, ``data_objects.py:6-26``)."""

    catalog: str = "main"
    name: str
    comment: str | None = None
    tables: list[Table] = Field(default_factory=list)
    views: list[View] = Field(default_factory=list)

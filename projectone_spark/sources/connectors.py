"""Gated connector wrappers: kafka / excel / delta.

Each keeps the reference's option surface but degrades with an explicit
error when the runtime dependency (kafka-sql jar, delta-spark, an xlsx
reader) is absent in this environment — the Spark-side call shape is the
production one.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(RuntimeError):
    """The connector's runtime dependency is not on this cluster."""


def _kafka_options(bootstrap_servers: str, topic: str, *,
                   starting_offsets: str = "earliest",
                   fail_on_data_loss: bool = False,
                   sasl_username: str | None = None,
                   sasl_password: str | None = None,
                   options: dict[str, Any] | None = None) -> dict[str, str]:
    """Option map identical to the reference's KafkaSource
    (``core/sources/kafka_source.py:13-60``), including SASL_SSL auth."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if sasl_username is not None:
        opts.update({
            "kafka.security.protocol": "SASL_SSL",
            "kafka.sasl.mechanism": "PLAIN",
            "kafka.sasl.jaas.config":
                "org.apache.kafka.common.security.plain.PlainLoginModule "
                f'required username="{sasl_username}" '
                f'password="{sasl_password}";',
        })
    opts.update({k: str(v) for k, v in (options or {}).items()})
    return opts


def read_kafka_batch(spark: SparkSession, bootstrap_servers: str, topic: str,
                     **kw: Any) -> DataFrame:
    """Batch Kafka read (``kafka_source.py:174-248``)."""
    opts = _kafka_options(bootstrap_servers, topic, **kw)
    try:
        return spark.read.format("kafka").options(**opts).load()
    except Exception as e:  # pragma: no cover - jar not present here
        raise ConnectorUnavailable(
            "kafka connector needs spark-sql-kafka on the classpath") from e


def read_kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str,
                      **kw: Any) -> DataFrame:
    """Streaming Kafka read (``kafka_source.py:13-60``)."""
    opts = _kafka_options(bootstrap_servers, topic, **kw)
    try:
        return spark.readStream.format("kafka").options(**opts).load()
    except Exception as e:  # pragma: no cover - jar not present here
        raise ConnectorUnavailable(
            "kafka connector needs spark-sql-kafka on the classpath") from e


def write_kafka(df: DataFrame, bootstrap_servers: str, topic: str,
                *, checkpoint: str | None = None) -> Any:
    """Kafka sink (``kafka_source.py:104-153``): df must carry
    ``key``/``value`` binary or string columns."""
    try:
        if df.isStreaming:
            w = (df.writeStream.format("kafka")
                 .option("kafka.bootstrap.servers", bootstrap_servers)
                 .option("topic", topic))
            if checkpoint:
                w = w.option("checkpointLocation", checkpoint)
            return w.start()
        return (df.write.format("kafka")
                .option("kafka.bootstrap.servers", bootstrap_servers)
                .option("topic", topic).save())
    except ConnectorUnavailable:
        raise
    except Exception as e:  # pragma: no cover - jar not present here
        raise ConnectorUnavailable(
            "kafka connector needs spark-sql-kafka on the classpath") from e


def read_excel(spark: SparkSession, path: str, *, sheet_name: str | int = 0,
               header: int = 0, schema: str | None = None) -> DataFrame:
    """Excel read (reference ``ExcelSource``, ``file_source.py:1014-1136``):
    prefers the com.crealytics spark-excel format, falls back to
    driver-side pandas (the reference's SFTP/SharePoint path does the
    same pandas → createDataFrame hop)."""
    try:
        reader = (spark.read.format("com.crealytics.spark.excel")
                  .option("dataAddress", f"'{sheet_name}'!A{header + 1}")
                  .option("header", "true"))
        if schema:
            reader = reader.schema(schema)
        return reader.load(path)
    except Exception:
        pass
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet_name, header=header)
    except ImportError as e:  # pragma: no cover - engine not present
        raise ConnectorUnavailable(
            "excel read needs the spark-excel jar or pandas+openpyxl") from e
    return (spark.createDataFrame(pdf, schema=schema) if schema
            else spark.createDataFrame(pdf))


def read_delta(spark: SparkSession, path: str | None = None,
               table: str | None = None, *,
               streaming: bool = False,
               read_change_feed: bool = False,
               starting_version: int | None = None,
               ending_version: int | None = None,
               options: dict[str, Any] | None = None) -> DataFrame:
    """Delta read incl. Change Data Feed options
    (``delta_source.py:19-45``). Needs delta-spark on the cluster."""
    try:
        import delta  # noqa: F401
    except ImportError as e:
        raise ConnectorUnavailable(
            "delta connector needs the delta-spark package; this engine's "
            "TableStore provides the equivalent versioned-table substrate") from e
    reader = (spark.readStream if streaming else spark.read).format("delta")
    if read_change_feed:
        reader = reader.option("readChangeFeed", "true")
        if starting_version is not None:
            reader = reader.option("startingVersion", str(starting_version))
        if ending_version is not None:
            reader = reader.option("endingVersion", str(ending_version))
    for k, v in (options or {}).items():
        reader = reader.option(k, str(v))
    return reader.table(table) if table else reader.load(path)

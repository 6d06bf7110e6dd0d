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


def _xlsx_col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27: spreadsheet column letters to 0-based index."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _localname(tag: str) -> str:
    # Element.iter() does not accept the `{*}` namespace wildcard; strip it
    return tag.split("}")[-1]


def read_xlsx_stdlib(path: str, *, sheet_name: str | int = 0,
                     header: int = 0) -> tuple[list[str], list[list]]:
    """Minimal dependency-free xlsx reader (zipfile + xml.etree — xlsx IS
    zipped SpreadsheetML). Covers the subset the reference's ExcelSource
    consumes (``file_source.py:1014-1136``): shared/inline strings, numbers,
    booleans, cached formula values, a header row, sparse cells. Returns
    ``(columns, rows)`` with None for gaps — small driver-side config/dim
    files only, exactly like the reference's pandas hop.
    """
    import zipfile
    from xml.etree import ElementTree as ET

    with zipfile.ZipFile(path) as z:
        # workbook: sheet name -> relationship id -> worksheet part
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rid_attr = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
                    "relationships}id")
        sheets = [(el.get("name"), el.get(rid_attr))
                  for el in wb.iter() if _localname(el.tag) == "sheet"]
        if not sheets:
            raise ValueError(f"{path}: workbook has no sheets")
        if isinstance(sheet_name, int):
            name, rid = sheets[sheet_name]
        else:
            match = [s for s in sheets if s[0] == sheet_name]
            if not match:
                raise ValueError(f"{path}: no sheet named {sheet_name!r}")
            name, rid = match[0]
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(
            el.get("Target") for el in rels.iter()
            if _localname(el.tag) == "Relationship" and el.get("Id") == rid)
        part = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"

        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter():
                if _localname(si.tag) == "si":
                    shared.append("".join(
                        t.text or "" for t in si.iter()
                        if _localname(t.tag) == "t"))

        ws = ET.fromstring(z.read(part))
        grid: list[list] = []
        for row in ws.iter():
            if _localname(row.tag) != "row":
                continue
            cells: list = []
            for c in row:
                if _localname(c.tag) != "c":
                    continue
                ref, ctype = c.get("r", ""), c.get("t", "n")
                idx = _xlsx_col_index(ref) if ref else len(cells)
                v = None
                for child in c:
                    ln = _localname(child.tag)
                    if ln == "v":
                        v = child.text
                    elif ln == "is":  # inline string
                        v = "".join(t.text or "" for t in child.iter()
                                    if _localname(t.tag) == "t")
                if v is not None and ctype == "s":
                    v = shared[int(v)]
                elif v is not None and ctype == "b":
                    v = v == "1"
                elif v is not None and ctype == "n":
                    v = float(v)
                while len(cells) < idx:
                    cells.append(None)
                cells.append(v)
            grid.append(cells)

    if len(grid) <= header:
        return [], []
    width = max(len(r) for r in grid)
    grid = [r + [None] * (width - len(r)) for r in grid]
    cols = [str(c) if c is not None else f"col{i}"
            for i, c in enumerate(grid[header])]
    return cols, grid[header + 1:]


def read_excel(spark: SparkSession, path: str, *, sheet_name: str | int = 0,
               header: int = 0, schema: str | None = None) -> DataFrame:
    """Excel read (reference ``ExcelSource``, ``file_source.py:1014-1136``):
    prefers the com.crealytics spark-excel format, falls back to
    driver-side pandas (the reference's SFTP/SharePoint path does the
    same pandas → createDataFrame hop), and finally to the dependency-free
    stdlib parser so the source works on clusters with neither the jar nor
    openpyxl."""
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
        return (spark.createDataFrame(pdf, schema=schema) if schema
                else spark.createDataFrame(pdf))
    except ImportError:
        pass  # no openpyxl: use the stdlib parser
    cols, rows = read_xlsx_stdlib(path, sheet_name=sheet_name, header=header)
    if schema:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame([tuple(r) for r in rows], schema=cols)


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


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters (0→A, 25→Z, 26→AA)."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def write_xlsx_stdlib(path: str, columns: list[str], rows: list[list],
                      sheet_name: str = "Sheet1") -> None:
    """Minimal dependency-free xlsx writer — the export mirror of
    :func:`read_xlsx_stdlib` (xlsx IS zipped SpreadsheetML). Strings write
    as inline strings, ints/floats as numbers, booleans as t="b", None as
    a gap; one sheet, header row first. Small driver-side dim/report
    files only — the same scope as the reference's Excel surface."""
    import zipfile
    from xml.sax.saxutils import escape, quoteattr

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f"{escape(str(v))}</t></is></c>")

    body = []
    for ri, row in enumerate([list(columns)] + [list(r) for r in rows],
                             start=1):
        cells = "".join(cell(ri, ci, v) for ci, v in enumerate(row))
        body.append(f'<row r="{ri}">{cells}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             f'<worksheet xmlns="{ns}"><sheetData>'
             + "".join(body) + "</sheetData></worksheet>")
    ct = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
          '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
          '<Default Extension="xml" ContentType="application/xml"/>'
          '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
          '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
          '</Types>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                 '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
                 '</Relationships>')
    wb = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
          f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
          f'<sheets><sheet name={quoteattr(sheet_name)} sheetId="1" r:id="rId1"/></sheets></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
               '</Relationships>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)

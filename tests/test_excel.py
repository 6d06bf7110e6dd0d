"""Excel source: the dependency-free fallback must actually parse xlsx.

The fixture is written with stdlib zipfile — xlsx is zipped SpreadsheetML —
so this exercises real parsing (shared strings, inline strings, numbers,
booleans, sparse cells, multiple sheets) offline, with neither the
spark-excel jar nor openpyxl present.
"""

from __future__ import annotations

import zipfile

import pytest

from projectone_spark.sources.connectors import read_excel, read_xlsx_stdlib

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="dims" sheetId="1" r:id="rId1"/>
<sheet name="extra" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""

_SHARED = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">
<si><t>region</t></si><si><t>population</t></si>
<si><t>EMEA</t></si><si><t>APAC</t></si>
</sst>"""

# header row + 3 data rows: shared strings, numbers, a boolean, a sparse
# row (C skipped), and an inline string
_SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
 <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
 <c r="C1" t="inlineStr"><is><t>active</t></is></c>
</row>
<row r="2">
 <c r="A2" t="s"><v>2</v></c><c r="B2"><v>410.5</v></c>
 <c r="C2" t="b"><v>1</v></c>
</row>
<row r="3">
 <c r="A3" t="s"><v>3</v></c><c r="B3"><v>2300</v></c>
</row>
<row r="4">
 <c r="A4" t="inlineStr"><is><t>AMER</t></is></c><c r="B4"><v>997</v></c>
 <c r="C4" t="b"><v>0</v></c>
</row>
</sheetData>
</worksheet>"""

_SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
<row r="2"><c r="A2"><v>42</v></c></row>
</sheetData>
</worksheet>"""


@pytest.fixture()
def xlsx_path(tmp_path):
    p = tmp_path / "dims.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/sharedStrings.xml", _SHARED)
        z.writestr("xl/worksheets/sheet1.xml", _SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", _SHEET2)
    return str(p)


def test_stdlib_parser_values(xlsx_path):
    cols, rows = read_xlsx_stdlib(xlsx_path)
    assert cols == ["region", "population", "active"]
    assert rows == [["EMEA", 410.5, True],
                    ["APAC", 2300.0, None],
                    ["AMER", 997.0, False]]


def test_stdlib_parser_sheet_by_name_and_index(xlsx_path):
    by_name = read_xlsx_stdlib(xlsx_path, sheet_name="extra")
    by_idx = read_xlsx_stdlib(xlsx_path, sheet_name=1)
    assert by_name == by_idx == (["k"], [[42.0]])
    with pytest.raises(ValueError, match="no sheet named"):
        read_xlsx_stdlib(xlsx_path, sheet_name="nope")


def test_read_excel_dataframe_roundtrip(spark, xlsx_path):
    df = read_excel(spark, xlsx_path,
                    schema="region string, population double, active boolean")
    got = sorted(tuple(r) for r in df.collect())
    assert got == [("AMER", 997.0, False),
                   ("APAC", 2300.0, None),
                   ("EMEA", 410.5, True)]


def test_read_excel_infers_columns(spark, xlsx_path):
    df = read_excel(spark, xlsx_path)
    assert df.columns == ["region", "population", "active"]
    assert df.count() == 3


def test_kafka_option_map_matches_reference():
    """The option surface the reference's KafkaSource builds
    (kafka_source.py:13-60), including SASL_SSL auth — constructible and
    assertable offline even though the jar is absent here."""
    from projectone_spark.sources.connectors import _kafka_options

    opts = _kafka_options("b1:9092,b2:9092", "events",
                          starting_offsets="latest",
                          fail_on_data_loss=True,
                          sasl_username="svc",
                          sasl_password="pw",
                          options={"maxOffsetsPerTrigger": 10000})
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["subscribe"] == "events"
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "PLAIN"
    assert 'username="svc"' in opts["kafka.sasl.jaas.config"]
    assert 'password="pw";' in opts["kafka.sasl.jaas.config"]
    assert opts["maxOffsetsPerTrigger"] == "10000"


def test_kafka_option_map_no_auth():
    from projectone_spark.sources.connectors import _kafka_options

    opts = _kafka_options("b:9092", "t")
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "false"
    assert "kafka.security.protocol" not in opts


def test_write_xlsx_stdlib_roundtrip(tmp_path):
    """The export mirror: write real xlsx with the stdlib writer, read it
    back with the stdlib parser — types, gaps, unicode, booleans."""
    from projectone_spark.sources.connectors import write_xlsx_stdlib

    path = str(tmp_path / "out.xlsx")
    write_xlsx_stdlib(path, ["name", "n", "ratio", "ok"],
                      [["naïve <&> 'quote'", 7, 2.5, True],
                       ["gap", None, -1.25, False],
                       ["", 0, 0.0, True]])
    cols, rows = read_xlsx_stdlib(path)
    assert cols == ["name", "n", "ratio", "ok"]
    assert rows[0] == ["naïve <&> 'quote'", 7.0, 2.5, True]
    assert rows[1] == ["gap", None, -1.25, False]
    assert rows[2] == ["", 0.0, 0.0, True]


def test_col_letter_past_z():
    from projectone_spark.sources.connectors import _col_letter

    assert [_col_letter(i) for i in (0, 25, 26, 27, 51, 52, 701, 702)] == \
        ["A", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA"]

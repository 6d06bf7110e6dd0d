"""CLI + file-client tests."""

from __future__ import annotations

import json
import os
import zipfile

import pytest

from projectone_spark.sources.file_clients import (
    LocalFileClient,
    NoSourceData,
    modified_files_cdc,
    save_file_cdc,
)
from projectone_spark.store import TableStore
from projectone_spark.store.state import StateStore
from projectone_spark.task.cli import main

SCHEMA = "id long, name string, offset long"
BASE = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]


def test_cli_validate_and_run(spark, tmp_path, capsys):
    src = str(tmp_path / "src")
    spark.createDataFrame(BASE, SCHEMA).write.parquet(src)
    cfg = {
        "name": "cli_t",
        "inputs": [{"name": "src", "path": src, "source": "parquet"}],
        "outputs": [{"name": "out", "table": "target",
                     "write_type": "overwrite"}],
        "state_location": str(tmp_path / "state"),
        "store_location": str(tmp_path / "store"),
    }
    cfg_path = tmp_path / "task.json"
    cfg_path.write_text(json.dumps(cfg))

    assert main(["validate", "-c", str(cfg_path)]) == 0
    assert main(["run", "-c", str(cfg_path)]) == 0
    got = TableStore(str(tmp_path / "store")).read(spark, "target")
    assert got.count() == 3


def test_cli_validate_reports_errors(tmp_path, capsys):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"name": "x", "inputs": [{"name": "i"}],
                               "outputs": []}))
    with pytest.raises(SystemExit) as e:
        main(["validate", "-c", str(bad)])
    assert e.value.code == 2
    assert "config error" in capsys.readouterr().err


def test_local_client_glob_and_zip(tmp_path):
    (tmp_path / "a.csv").write_text("x")
    (tmp_path / "b.csv").write_text("y")
    (tmp_path / "c.txt").write_text("z")
    client = LocalFileClient()
    got = client.list(str(tmp_path / "*.csv"))
    assert [os.path.basename(f.path) for f in got] == ["a.csv", "b.csv"]

    zp = tmp_path / "arch.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("inner/d.csv", "1,2\n")
    out = client.extract_zip(str(zp), str(tmp_path / "ex"))
    assert out == [str(tmp_path / "ex" / "inner/d.csv")]
    assert client.get(out[0]) == b"1,2\n"


def test_modified_files_cdc_window(tmp_path):
    state = StateStore(str(tmp_path / "state"))
    client = LocalFileClient()
    f1 = tmp_path / "f1.csv"
    f1.write_text("1")
    os.utime(f1, (100, 100))

    files, wm = modified_files_cdc(client, str(tmp_path / "*.csv"),
                                   state, "inp", now_epoch=200)
    assert files == [str(f1)] and wm == 200
    save_file_cdc(state, "inp", wm)

    # nothing new in the window → NoSourceData, watermark unchanged
    with pytest.raises(NoSourceData):
        modified_files_cdc(client, str(tmp_path / "*.csv"), state, "inp",
                           now_epoch=300)

    f2 = tmp_path / "f2.csv"
    f2.write_text("2")
    os.utime(f2, (250, 250))
    files, wm = modified_files_cdc(client, str(tmp_path / "*.csv"),
                                   state, "inp", now_epoch=300)
    assert files == [str(f2)]

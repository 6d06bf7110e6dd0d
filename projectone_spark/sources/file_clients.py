"""Remote/local file clients + file-arrival CDC.

Reference surface (``core/sources/file_source.py:49-560``): a FileClient
interface with list/walk/glob/fetch/delete, SFTP (paramiko) and SharePoint
(msal/Graph) implementations, wildcard resolution, zip extraction, and the
``file_path_cdc_feed`` mode — read only files modified inside
``(prev_run_ts, now]``, persisting epoch watermarks
(``file_source.py:727-813``).

Local filesystem is fully implemented (it is also the semantics oracle);
SFTP/SharePoint keep the interface but raise ``ConnectorUnavailable``
without their client libraries — driver-side ingestion edges, exactly as
in the reference (no Spark primitive fetches from SFTP).
"""

from __future__ import annotations

import glob as _glob
import os
import time
import zipfile
from dataclasses import dataclass

from projectone_spark.sources.connectors import ConnectorUnavailable
from projectone_spark.store.state import StateStore


class NoSourceData(Exception):
    """Zero files in the CDC window (reference ``NoSourceData``)."""


@dataclass
class FileInfo:
    path: str
    size: int
    modified_epoch: float


class LocalFileClient:
    """The reference FileClient surface over the local/driver filesystem."""

    def list(self, pattern: str) -> list[FileInfo]:
        """Wildcard glob resolution (reference resolves ``*``/``?`` globs
        before handing paths to Spark)."""
        out = []
        for p in sorted(_glob.glob(pattern, recursive=True)):
            if os.path.isfile(p):
                st = os.stat(p)
                out.append(FileInfo(p, st.st_size, st.st_mtime))
        return out

    def walk(self, root: str) -> list[FileInfo]:
        out = []
        for dirpath, _, files in os.walk(root):
            for fn in sorted(files):
                p = os.path.join(dirpath, fn)
                st = os.stat(p)
                out.append(FileInfo(p, st.st_size, st.st_mtime))
        return out

    def get(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def delete(self, path: str) -> None:
        os.remove(path)

    def extract_zip(self, zip_path: str, target_dir: str,
                    members: list[str] | None = None) -> list[str]:
        """Zip extraction (reference ``extract_zip_file``,
        ``core/utils/__init__.py``): returns extracted file paths."""
        os.makedirs(target_dir, exist_ok=True)
        with zipfile.ZipFile(zip_path) as zf:
            names = members or zf.namelist()
            zf.extractall(target_dir, members=names)
        return [os.path.join(target_dir, n) for n in names]


class SFTPClient:  # pragma: no cover - needs paramiko + a server
    """SFTP client (reference ``file_source.py:424-560``)."""

    def __init__(self, host: str, username: str, password: str | None = None,
                 port: int = 22):
        try:
            import paramiko  # noqa: F401
        except ImportError as e:
            raise ConnectorUnavailable(
                "SFTP ingestion needs the paramiko package") from e
        raise ConnectorUnavailable("SFTP transport not configured in this build")


class SharepointClient:  # pragma: no cover - needs msal + a tenant
    """SharePoint/Graph client (reference ``file_source.py:264-422``)."""

    def __init__(self, site_url: str, client_id: str, client_secret: str):
        try:
            import msal  # noqa: F401
        except ImportError as e:
            raise ConnectorUnavailable(
                "SharePoint ingestion needs the msal package") from e
        raise ConnectorUnavailable(
            "SharePoint transport not configured in this build")


def modified_files_cdc(client: LocalFileClient, pattern: str,
                       state: StateStore, input_name: str,
                       *, now_epoch: float | None = None
                       ) -> tuple[list[str], float]:
    """``file_path_cdc_feed`` (reference ``file_source.py:727-813``):
    return files modified in ``(prev_watermark, now]`` and the new
    watermark to persist AFTER a successful run. Raises ``NoSourceData``
    when the window is empty (reference behavior — the task skips the
    read and keeps its state)."""
    key = f"{input_name}_file_cdc_value"
    prev = state.get_value(key, folder="sources", default=0.0)
    now_epoch = now_epoch if now_epoch is not None else time.time()
    files = [f.path for f in client.list(pattern)
             if prev < f.modified_epoch <= now_epoch]
    if not files:
        raise NoSourceData(f"no files in ({prev}, {now_epoch}] for {pattern}")
    return files, now_epoch


def save_file_cdc(state: StateStore, input_name: str, watermark: float) -> int:
    return state.set(f"{input_name}_file_cdc_value", watermark, folder="sources")

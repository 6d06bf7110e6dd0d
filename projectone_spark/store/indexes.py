"""Persisted ANN-index lifecycle over the :class:`TableStore` — the
level above :mod:`store.models`: an INDEX is a corpus-sized code table
plus the small models that interpret it, saved together under one name
and opened cold by a search task that never rebuilds anything.

The model lifecycle (f15/e18) persists the *quantizer* — the bounded
trained state — but a production ANN deployment persists the whole
*index*: at 100 TB the code table is the 4-16x-compressed artifact the
search actually scans, and rebuilding it per query (what e16/e18 do
in-query) would cost a full raw-corpus scan per search. ``save_index``
writes the parts; ``open_index`` validates and hands back everything a
search needs; appends to the code table keep the stamp (incremental
maintenance — the st15 streaming shape — is an append stream, exactly
like model-table appends).

Reference parity: the reference's store is its only durability
primitive (``core/storage/table_store.py``); derived artifacts larger
than driver memory are always tables. An index here is three tables —
``{name}`` (codes, corpus-sized), ``{name}__centroids`` and
``{name}__bounds`` (kind-stamped models, bounded) — bound together by
the code table's manifest ``index`` stamp, which names its parts so a
cold open cannot pair a code table with the wrong quantizer.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from projectone_spark.store import TableStore
from projectone_spark.store.models import load_model, save_model

#: index kind -> {part name -> model kind}. The code table's required
#: columns are checked structurally from params (dims -> packed words).
INDEX_KINDS: dict[str, dict[str, str]] = {
    # IVF routing over scalar-int8 codes: FAISS IndexIVFScalarQuantizer.
    # codes table: (vec_id, cell, w00..w{ceil(dims/4)-1:02d}) — cell from
    # the centroids part, packed words from sq8_pack_words under the
    # bounds part.
    "ivf_sq8": {"centroids": "ivf_centroids", "bounds": "sq8_bounds"},
}


def _code_columns(kind: str, params: dict) -> set[str]:
    """Columns the code table of ``kind`` must carry under ``params``."""
    if kind == "ivf_sq8":
        dims = int(params["dims"])
        n_words = (dims + 3) // 4
        return {"vec_id", "cell", *(f"w{j:02d}" for j in range(n_words))}
    raise ValueError(f"unknown index kind {kind!r}; known: "
                     f"{sorted(INDEX_KINDS)}")


@dataclass(frozen=True)
class OpenedIndex:
    """Everything a cold search task needs: the corpus-sized code frame
    and the bounded, kind-validated model parts (already store-read —
    callers broadcast them; they are model state, never corpus-sized)."""
    codes: DataFrame
    parts: dict[str, DataFrame]
    kind: str
    params: dict
    version: int


def save_index(store: TableStore, spark: SparkSession, name: str,
               kind: str, codes: DataFrame, parts: dict[str, DataFrame],
               params: dict,
               partition_by: list[str] | None = None) -> int:
    """Persist a full index: each part through ``save_model`` (kind per
    ``INDEX_KINDS``) as ``{name}__{part}``, then the code table as
    ``{name}`` with the ``index`` manifest stamp naming its parts. The
    stamp rides the code table's atomic manifest publish (the save_model
    crash-window discipline), and carries across appends — incremental
    maintenance keeps a valid, openable index. Returns the code table's
    committed version.

    ``partition_by=["cell"]`` is the production layout for ``ivf_sq8``:
    the search's probed-cell set collapses to literal partition filters
    (``search_ivf_sq8_index(prune_cells=True)``), so a query reads
    ~nprobe/n_cells of the code table's FILES, not just its rows —
    at 100 TB the difference between scanning the whole 4x-compressed
    index and scanning two cells of it. Incremental appends inherit the
    table's partitioning (the store validates the match)."""
    part_kinds = INDEX_KINDS.get(kind)
    if part_kinds is None:
        raise ValueError(f"unknown index kind {kind!r}; known: "
                         f"{sorted(INDEX_KINDS)}")
    missing_parts = set(part_kinds) - set(parts)
    if missing_parts:
        raise ValueError(f"index kind {kind!r} requires parts "
                         f"{sorted(part_kinds)}, missing "
                         f"{sorted(missing_parts)}")
    required = _code_columns(kind, params)
    missing = required - set(codes.columns)
    if missing:
        raise ValueError(
            f"code table for index kind {kind!r} is missing required "
            f"columns {sorted(missing)} (has {codes.columns})")
    part_tables = {}
    for part, model_kind in part_kinds.items():
        part_tables[part] = f"{name}__{part}"
        save_model(store, spark, part_tables[part], model_kind,
                   parts[part], params={"index": name, **params})
    return store.overwrite(
        spark, codes, name, partition_by=partition_by,
        manifest_extra={"index": {"kind": kind, "params": dict(params),
                                  "parts": part_tables}})


def open_index(store: TableStore, spark: SparkSession, name: str,
               kind: str | None = None) -> OpenedIndex:
    """Open a persisted index cold: validate the ``index`` stamp (and
    ``kind`` if given), load every part through ``load_model`` (each
    part's model kind re-validated), and structurally re-check the code
    table's columns — a code table whose contents were replaced by a
    plain writer, or paired with a missing/mismatched part, fails loudly
    before a search can return silently-wrong neighbors."""
    m = store.manifest(name)
    if m is None:
        raise FileNotFoundError(
            f"index table '{name}' does not exist in {store.root}")
    meta = m.get("index")
    if meta is None:
        raise ValueError(
            f"store table '{name}' carries no index metadata — it was "
            f"written by a plain writer, not save_index")
    if kind is not None and meta.get("kind") != kind:
        raise ValueError(f"index '{name}' holds kind {meta.get('kind')!r}, "
                         f"caller expected {kind!r}")
    ikind, params = meta["kind"], dict(meta.get("params") or {})
    codes = store.read(spark, name)
    required = _code_columns(ikind, params)
    missing = required - set(codes.columns)
    if missing:
        raise ValueError(
            f"index '{name}' (kind {ikind!r}) code table no longer "
            f"carries required columns {sorted(missing)} — its contents "
            f"were replaced by a non-save_index writer")
    parts = {}
    for part, model_kind in INDEX_KINDS[ikind].items():
        table = (meta.get("parts") or {}).get(part, f"{name}__{part}")
        frame, pmeta = load_model(store, spark, table, kind=model_kind)
        if pmeta.get("params", {}).get("index") != name:
            raise ValueError(
                f"index part '{table}' (kind {model_kind!r}) was saved "
                f"for index {pmeta.get('params', {}).get('index')!r}, "
                f"not {name!r} — refusing to pair it")
        parts[part] = frame
    return OpenedIndex(codes=codes, parts=parts, kind=ikind, params=params,
                       version=int(m["version"]))


__all__ = ["INDEX_KINDS", "OpenedIndex", "save_index", "open_index"]

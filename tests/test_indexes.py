"""Persisted-index lifecycle (store/indexes.py): save/open round-trips,
kind and part-pairing validation, stamp survival across incremental
maintenance, and the pack/unpack + probe primitives behind the ivf_sq8
search path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from projectone_spark.functions.embeddings import (
    assign_cell,
    build_ivf_sq8_codes,
    probe_cells,
    search_ivf_sq8_index,
    seed_centroids,
    sq8_bounds,
    sq8_codes,
    sq8_pack_words,
    sq8_unpack_words,
)
from projectone_spark.queries import load
from projectone_spark.store import TableStore
from projectone_spark.store.indexes import open_index, save_index
from projectone_spark.store.models import centroids_to_frame
from tests.conftest import SF_DIR


def _store(tmp_path) -> TableStore:
    return TableStore(str(tmp_path / "store"))


def _built(spark, tmp_path, name="idx"):
    emb = load(spark, SF_DIR, "embeddings")
    seeds = seed_centroids(emb, k=4)
    cents = [(i, c) for i, (_, c) in enumerate(seeds)]
    bounds = sq8_bounds(emb, dims=64).localCheckpoint(eager=True)
    codes = build_ivf_sq8_codes(emb, cents, bounds, dims=64)
    store = _store(tmp_path)
    save_index(store, spark, name, "ivf_sq8", codes,
               parts={"centroids": centroids_to_frame(
                          spark, [c for _, c in cents]),
                      "bounds": bounds},
               params={"dims": 64, "n_cells": 4},
               partition_by=["cell"])  # the production prunable layout
    return store, emb, cents, bounds


def test_pack_unpack_roundtrip_and_tail_word(spark):
    """pack -> unpack is an identity, including a dims % 4 != 0 tail
    word (missing bytes pack as zero, the slice drops them again)."""
    for dims in (64, 6):
        df = spark.createDataFrame(
            [([i % 256 for i in range(1, dims + 1)],)],
            f"code array<int>")
        packed = df.select(*[w.alias(f"w{j:02d}") for j, w in enumerate(
            sq8_pack_words(F.col("code"), dims))])
        back = packed.select(sq8_unpack_words(dims).alias("code")).first()
        assert back["code"] == [i % 256 for i in range(1, dims + 1)], dims


def test_probe_cells_matches_assign_cell_at_nprobe_1(spark):
    emb = load(spark, SF_DIR, "embeddings").limit(50)
    cents = [(i, c) for i, (_, c) in enumerate(seed_centroids(emb, k=4))]
    both = emb.select(
        assign_cell(F.col("embedding"), cents).alias("a"),
        probe_cells(F.col("embedding"), cents, 1)[0].alias("p"),
        F.size(probe_cells(F.col("embedding"), cents, 3)).alias("n"))
    rows = both.collect()
    assert all(r["a"] == r["p"] for r in rows)
    assert all(r["n"] == 3 for r in rows)
    with pytest.raises(ValueError, match="at least one centroid"):
        probe_cells(F.col("embedding"), [], 1)
    with pytest.raises(ValueError, match="nprobe"):
        probe_cells(F.col("embedding"), cents, 0)


def test_save_open_round_trip_validates_everything(spark, tmp_path):
    store, emb, cents, _ = _built(spark, tmp_path)
    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    assert idx.kind == "ivf_sq8" and idx.params["dims"] == 64
    assert idx.codes.count() == emb.count()
    assert sorted(idx.parts) == ["bounds", "centroids"]
    # kind mismatch / absent / plain table all fail loudly
    with pytest.raises(ValueError, match="holds kind"):
        open_index(store, spark, "idx", kind="nonsense")
    with pytest.raises(FileNotFoundError):
        open_index(store, spark, "absent")
    store.overwrite(spark, emb.select("vec_id"), "plain")
    with pytest.raises(ValueError, match="no index metadata"):
        open_index(store, spark, "plain")


def test_save_index_validates_parts_and_columns(spark, tmp_path):
    store = _store(tmp_path)
    emb = load(spark, SF_DIR, "embeddings")
    cents = [(i, c) for i, (_, c) in enumerate(seed_centroids(emb, k=4))]
    bounds = sq8_bounds(emb, dims=64)
    codes = build_ivf_sq8_codes(emb, cents, bounds, dims=64)
    cf = centroids_to_frame(spark, [c for _, c in cents])
    with pytest.raises(ValueError, match="unknown index kind"):
        save_index(store, spark, "i", "nonsense", codes,
                   {"centroids": cf, "bounds": bounds}, {"dims": 64})
    with pytest.raises(ValueError, match="missing"):
        save_index(store, spark, "i", "ivf_sq8", codes,
                   {"centroids": cf}, {"dims": 64})
    with pytest.raises(ValueError, match="missing required columns"):
        save_index(store, spark, "i", "ivf_sq8", codes.drop("w03"),
                   {"centroids": cf, "bounds": bounds}, {"dims": 64})


def test_index_stamp_survives_append_not_overwrite(spark, tmp_path):
    """Incremental maintenance is an append stream (the st15 shape) —
    the stamp must ride it; a plain overwrite replaces the contents and
    must strip it (the save_model discipline one level up)."""
    store, emb, cents, bounds = _built(spark, tmp_path)
    delta = build_ivf_sq8_codes(
        emb.filter(F.col("vec_id") % 7 == 0)
           .withColumn("vec_id", F.col("vec_id") + 1_000_000),
        cents, bounds, dims=64)
    store.append(spark, delta, "idx")
    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    assert idx.codes.count() == emb.count() + delta.count()
    store.overwrite(spark, emb.select("vec_id"), "idx")
    with pytest.raises(ValueError, match="no index metadata|no longer"):
        open_index(store, spark, "idx")


def test_open_index_rejects_foreign_parts(spark, tmp_path):
    """A part table saved for ANOTHER index must refuse to pair — a
    code table scored under the wrong quantizer returns silently-wrong
    neighbors, the exact failure the name-binding exists to stop."""
    store, emb, cents, bounds = _built(spark, tmp_path, name="one")
    _built(spark, tmp_path / "x", name="two")
    # simulate a mispaired part: point 'one' at a part saved for 'two'
    two = TableStore(str(tmp_path / "x" / "store"))
    frame = two.read(spark, "two__bounds")
    from projectone_spark.store.models import save_model

    save_model(store, spark, "one__bounds", "sq8_bounds", frame,
               params={"index": "two", "dims": 64})
    with pytest.raises(ValueError, match="refusing to pair"):
        open_index(store, spark, "one")


def test_search_from_persisted_index_matches_fresh_funnel(spark, tmp_path):
    """Cold search from the persisted artifact equals the same funnel
    over freshly-built frames bit-for-bit (parquet round-trips ints and
    doubles exactly)."""
    store, emb, cents, bounds = _built(spark, tmp_path)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    idx = open_index(store, spark, "idx", kind="ivf_sq8")
    from projectone_spark.store.models import centroids_from_model

    loaded = [(i, c) for i, c in enumerate(
        centroids_from_model(idx.parts["centroids"]))]
    cold = search_ivf_sq8_index(
        idx.codes, loaded, idx.parts["bounds"].localCheckpoint(eager=True),
        emb, queries, k=3, nprobe=2, shortlist=10, dims=64)
    fresh = search_ivf_sq8_index(
        build_ivf_sq8_codes(emb, cents, bounds, dims=64), cents, bounds,
        emb, queries, k=3, nprobe=2, shortlist=10, dims=64)
    assert sorted(map(tuple, cold.collect())) \
        == sorted(map(tuple, fresh.collect()))
    assert cold.count() > 0

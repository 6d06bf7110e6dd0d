"""DoReMi reweighting step: apportionment exactness, tilt direction,
fixed-point and validation properties."""

import pyspark.sql.functions as F
import pytest

from projectone_spark.functions.sampling import doremi_reweight

from tests.conftest import SF_DIR as SF


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_doremi_grids_sum_exactly(spark):
    out = doremi_reweight(_docs(spark), group_col="source").collect()
    assert sum(r["weight_micro"] for r in out) == 1_000_000
    assert sum(r["baseline_micro"] for r in out) == 1_000_000
    assert all(r["weight_micro"] >= 0 and r["baseline_micro"] >= 0
               for r in out)


def test_doremi_tilt_direction(spark):
    """Every positive-excess domain outboosts every zero-excess domain
    (factor 1 + η·excess/ref is 1 at zero excess, larger otherwise —
    normalization rescales all shares by the same ratio, so only the
    PAIRWISE ordering is guaranteed, not boost ≥ 1 for small excess),
    and the max-excess domain always gains vs its token-share baseline
    (its factor is the maximum, hence above the weighted average)."""
    out = doremi_reweight(_docs(spark), group_col="source").collect()
    hard = [r for r in out if r["excess_micro"] > 0]
    easy = [r for r in out if r["excess_micro"] == 0]
    assert hard and easy  # the fixture data has a tilt
    assert min(r["boost"] for r in hard) > max(r["boost"] for r in easy)
    hardest = max(out, key=lambda r: r["excess_micro"])
    assert hardest["boost"] > 1.0
    assert hardest["weight_micro"] > hardest["baseline_micro"]
    # weights are zero-sum on the grid: someone must pay for the boost
    assert any(r["weight_micro"] < r["baseline_micro"] for r in easy)


def test_doremi_uniform_fixed_point(spark):
    """A corpus where every domain has identical token distribution has
    zero excess everywhere — weights must equal the token-share
    baseline exactly (DoReMi's fixed point)."""
    rows = [(i, "a b c d", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = doremi_reweight(df, group_col="source").collect()
    assert all(r["excess_micro"] == 0 for r in out)
    assert all(r["weight_micro"] == r["baseline_micro"] for r in out)
    # 3 equal domains: 333333/333333/333334 by the remainder rule
    assert sorted(r["weight_micro"] for r in out) == [333333, 333333, 333334]


def test_doremi_eta_scales_tilt(spark):
    """A larger eta tilts harder: the hardest domain's weight is
    monotone in eta."""
    out1 = {r["source"]: r["weight_micro"]
            for r in doremi_reweight(_docs(spark), group_col="source",
                                     eta=(1, 1)).collect()}
    out4 = {r["source"]: r["weight_micro"]
            for r in doremi_reweight(_docs(spark), group_col="source",
                                     eta=(4, 1)).collect()}
    exc = {r["source"]: r["excess_micro"]
           for r in doremi_reweight(_docs(spark), group_col="source").collect()}
    hardest = max(exc, key=exc.get)
    assert exc[hardest] > 0
    assert out4[hardest] > out1[hardest]


def test_doremi_validates_eta(spark):
    with pytest.raises(ValueError, match="eta must be a positive rational"):
        doremi_reweight(_docs(spark), eta=(0, 1))
    with pytest.raises(ValueError, match="eta must be a positive rational"):
        doremi_reweight(_docs(spark), eta=(1, -2))


def test_doremi_zero_baseline_domain_boost_null(spark):
    """A domain whose token share floors to 0 grid units must report
    boost NULL, not abort — ANSI Spark would raise DIVIDE_BY_ZERO
    without the guard (the DuckDB oracle's CASE WHEN twin)."""
    rows = [(0, " ".join(f"w{i}" for i in range(50)), "big"),
            (1, "solo", "tiny")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r["source"]: r for r in
           doremi_reweight(df, group_col="source", scale=10).collect()}
    assert out["tiny"]["baseline_micro"] == 0
    assert out["tiny"]["boost"] is None
    assert out["big"]["boost"] is not None
    assert out["big"]["weight_micro"] + out["tiny"]["weight_micro"] == 10

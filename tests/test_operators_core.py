"""Core operator tests: filters, rebin, normalize, fold, sessionize.

Validation model per SURVEY.md §5: deterministic synthetic fixtures with
known injected structure + independent NumPy recomputation.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from miletos_spark.datagen import sinusoid_mixture
from miletos_spark.operators import (
    fold,
    mask_time_windows,
    median_normalize,
    quality_mask,
    rebin,
    sessionize,
    sigma_clip,
    white_light,
)


@pytest.fixture(scope="module")
def lc(spark):
    return sinusoid_mixture(spark, n=2000, span_days=10.0).cache()


def test_quality_mask_drops_nan(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0, 0), (1.0, float("nan"), 0), (2.0, 2.0, 1)],
        "time double, value double, quality int",
    )
    out = quality_mask(df).collect()
    assert len(out) == 1 and out[0]["time"] == 0.0


def test_mask_time_windows(lc):
    masked = mask_time_windows(lc, [(2.0, 3.0), (8.0, 9.0)])
    times = [r["time"] for r in masked.select("time").collect()]
    assert all(not (2.0 <= t <= 3.0 or 8.0 <= t <= 9.0) for t in times)
    assert len(times) < lc.count()


def test_rebin_matches_numpy(lc):
    pdf = lc.select("time", "value", "stdv").toPandas().sort_values("time")
    delt = 0.5
    t0 = pdf["time"].min()
    out = rebin(lc, delt, t0=t0).orderBy("bin").toPandas()
    bins = np.floor((pdf["time"].to_numpy() - t0) / delt).astype(int)
    for _, row in out.iterrows():
        sel = pdf["value"].to_numpy()[bins == row["bin"]]
        assert row["n"] == len(sel)
        assert row["value"] == pytest.approx(sel.mean(), rel=1e-9)
        errs = pdf["stdv"].to_numpy()[bins == row["bin"]]
        expect_stdv = math.sqrt(
            (math.sqrt((errs**2).sum()) / len(sel)) ** 2 + sel.std() ** 2
        )
        assert row["stdv"] == pytest.approx(expect_stdv, rel=1e-6)


def test_median_normalize(lc):
    out = median_normalize(lc, group_cols=("inst", "chunk"))
    med = out.agg(F.expr("percentile(value, 0.5)")).first()[0]
    assert med == pytest.approx(1.0, abs=1e-9)


def test_white_light(spark):
    rows = [(0.0, e, float(e), 0.1, "RelativeFlux", "JWST", 0) for e in range(1, 5)]
    df = spark.createDataFrame(
        rows, "time double, ener int, value double, stdv double, kind string, inst string, chunk int"
    )
    out = white_light(df).collect()
    assert len(out) == 1
    assert out[0]["value"] == pytest.approx(2.5)
    assert out[0]["stdv"] == pytest.approx(math.sqrt(4 * 0.01) / 4)
    assert out[0]["ener"] == 0


def test_fold_phase_range(lc):
    out = fold(lc, period=2.5, epoch=0.3).select("phase").toPandas()["phase"]
    assert ((out > -0.5) & (out <= 0.5)).all()
    # spot-check the formula on one row
    row = fold(lc, period=2.5, epoch=0.3).select("time", "phase").first()
    expect = ((row["time"] - 0.3) % 2.5) / 2.5
    if expect > 0.5:
        expect -= 1.0
    assert row["phase"] == pytest.approx(expect, abs=1e-12)


def test_sessionize_counts_gaps(spark):
    times = [0.0, 0.01, 0.02, 1.0, 1.01, 5.0]
    df = spark.createDataFrame([(t,) for t in times], "time double")
    out = sessionize(df, gap=0.1).orderBy("time").collect()
    assert [r["region"] for r in out] == [0, 0, 0, 1, 1, 2]


def test_sessionize_bucketed_matches_plain(spark):
    """The distributed prefix-sum path must agree with the plain
    single-window path exactly — including breaks that straddle bucket
    boundaries, empty buckets, duplicate timestamps, and multiple
    groups."""
    import random

    rng = random.Random(7)
    rows = []
    for g in ("a", "b"):
        t = 0.0
        for i in range(400):
            # mix of sub-gap steps, exact-gap edges, and big jumps
            t += rng.choice([0.01, 0.05, 0.0, 0.3, 2.7])
            rows.append((g, t, i))
    df = spark.createDataFrame(rows, "grp string, time double, rid long")
    kw = dict(
        gap=0.1, time_col="time", group_cols=("grp",),
        order_cols=("time", "rid"),
    )
    plain = sessionize(df, **kw).select("grp", "rid", "region")
    for width in (0.25, 1.0, 10.0):
        bucketed = sessionize(df, **kw, bucket_width=width).select(
            "grp", "rid", "region"
        )
        assert bucketed.exceptAll(plain).count() == 0
        assert plain.exceptAll(bucketed).count() == 0


def test_sessionize_bucketed_no_series_wide_sort(spark):
    """Plan shape: no window partitioned on group_cols alone — every
    sort key includes the time bucket, so partition size is bounded by
    one bucket regardless of series length."""
    df = spark.createDataFrame(
        [("a", float(i), i) for i in range(10)], "grp string, time double, rid long"
    )
    out = sessionize(
        df, gap=0.1, time_col="time", group_cols=("grp",),
        order_cols=("time", "rid"), bucket_width=1.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    specs = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
        if "grp" in m.group(1)
    ]
    assert specs, "expected group-keyed window specs in the plan"
    for spec in specs:
        # EVERY window over the group must involve the bucket key: the
        # local window partitions on (grp, _skt); the per-bucket-summary
        # offsets window partitions on grp but ORDERS by _skt. A spec
        # mentioning grp with no _skt anywhere is the series-wide sort
        # this path exists to eliminate.
        assert "_skt" in spec, f"series-wide window spec: {spec}"


def test_sigma_clip_removes_outliers(spark):
    vals = [0.0] * 100 + [50.0]
    df = spark.createDataFrame([(float(i), v) for i, v in enumerate(vals)], "time double, value double")
    out = sigma_clip(df, max_iter=3)
    assert out.count() == 100
    assert out.agg(F.max("value")).first()[0] == 0.0


def test_visibility_culmination_and_airmass(spark):
    """M11 sanity: a target at dec == observer latitude culminates at
    ~90 deg altitude sometime in a sidereal day; airmass is always
    >= 1 where defined; the Sun spends part of a 24 h grid below the
    horizon and part above at a mid-latitude site."""
    from pyspark.sql import functions as F

    from miletos_spark.operators.visibility import (
        visibility_grid,
        visibility_summary,
    )

    lat = 28.3
    targets = spark.createDataFrame(
        [("zenith", 123.4, lat), ("southpole", 10.0, -89.0)],
        "name string, ra_deg double, dec_deg double",
    )
    curve = visibility_grid(
        targets, jd0=2460310.5, n_steps=289, step_hours=1.0 / 12.0,
        lat_deg=lat,
    ).cache()
    summ = {
        r["name"]: r
        for r in visibility_summary(curve, ("name",)).collect()
    }
    # near a zenith pass altitude falls ~linearly with hour angle, so a
    # 5-minute grid can miss the true 90 deg peak by up to ~0.6 deg
    assert summ["zenith"]["peak_alt_deg"] > 89.3
    # circumpolar-from-the-south target never rises at +28 latitude
    assert summ["southpole"]["peak_alt_deg"] < 0.0
    assert summ["southpole"]["n_observable"] == 0
    am = curve.agg(F.min("airmass")).first()[0]
    assert am >= 1.0
    sun = curve.filter(F.col("name") == "zenith").agg(
        F.min("sun_alt_deg"), F.max("sun_alt_deg")
    ).first()
    assert sun[0] < -18.0 and sun[1] > 0.0
    curve.unpersist()


def test_halo_chunked_windows_bit_equal(spark):
    """Halo chunking (time-range band + row-index median) must be
    BIT-identical to the unpartitioned window — including at chunk
    boundaries, irregular cadence, and frames clipped at the data
    edges. This is the exactness contract that lets the orchestrator
    parallelize pooled-series windows."""
    from miletos_spark.operators.windows import (
        rolling_median,
        rolling_percentile_band,
    )

    # irregular cadence: gaps, bursts, rows landing exactly on chunk
    # edges (t = k*0.5 for several k)
    n = 4000
    t = (
        F.col("id") * 0.003
        + F.when(F.col("id") % 7 == 0, 0.25).otherwise(0.0)
        + F.floor(F.col("id") / 500) * 0.5
    )
    df = (
        spark.range(n)
        .select(t.alias("time"))
        .withColumn("value", F.sin(F.col("time") * 13.0) + F.col("time"))
        .cache()
    )

    plain_b = rolling_percentile_band(df, 0.04)
    halo_b = rolling_percentile_band(df, 0.04, halo_chunk=0.5)
    cols = ["time", "band_lo", "band_med", "band_hi", "detect_metric"]
    assert sorted(map(tuple, plain_b.select(cols).collect())) == sorted(
        map(tuple, halo_b.select(cols).collect())
    )

    plain_m = rolling_median(df, 10, time_col="time")
    halo_m = rolling_median(df, 10, time_col="time", halo_chunk_rows=256)
    assert sorted(map(tuple, plain_m.select("time", "roll_med").collect())) \
        == sorted(map(tuple, halo_m.select("time", "roll_med").collect()))

    # invalid halo parameters fail loudly, not wrongly
    with pytest.raises(ValueError, match="halo_chunk"):
        rolling_percentile_band(df, 0.04, halo_chunk=0.01)
    with pytest.raises(ValueError, match="halo_chunk_rows"):
        rolling_median(df, 10, halo_chunk_rows=20)

"""Property-based invariants (hypothesis) for the reshaping operators —
the recover-what-you-injected strategy generalized to random inputs
(SURVEY.md §5: the reference has no property tests; we add them)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from miletos_spark.operators.fold import fold
from miletos_spark.operators.rebin import rebin

TIMES = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    min_size=3, max_size=40, unique=True,
)
SLOW = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(times=TIMES, period=st.floats(min_value=0.1, max_value=50.0))
@SLOW
def test_fold_phase_in_range(spark, times, period):
    df = spark.createDataFrame([(t,) for t in times], "time double")
    rows = fold(df, period=period, epoch=times[0], phase_center=0.0,
                time_col="time").collect()
    for r in rows:
        assert -0.5 < r["phase"] <= 0.5
        # phase is consistent with the defining congruence
        recon = (r["time"] - times[0]) / period - r["phase"]
        assert abs(recon - round(recon)) < 1e-6


@given(times=TIMES, delt=st.floats(min_value=0.5, max_value=30.0))
@SLOW
def test_rebin_conserves_count_and_mean(spark, times, delt):
    df = (
        spark.createDataFrame([(t,) for t in times], "time double")
        .withColumn("value", F.sin(F.col("time")))
        .withColumn("stdv", F.lit(1.0))
    )
    out = rebin(df, delt=delt).collect()
    assert sum(r["n"] for r in out) == len(times)
    # weighted mean of bin means == global mean
    total = sum(r["value"] * r["n"] for r in out)
    global_mean = sum(math.sin(t) for t in times) / len(times)
    assert total / len(times) == pytest.approx(global_mean, abs=1e-9)
    # bins are half-open and non-overlapping: every sample's bin index
    # matches floor((t - t0)/delt)
    t0 = min(times)
    bins = {r["bin"] for r in out}
    for t in times:
        assert math.floor((t - t0) / delt) in bins


@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=4, max_size=30,
    )
)
@SLOW
def test_simhash_identical_texts_collide(spark, vals):
    # SimHash is deterministic: identical token multisets -> identical
    # fingerprints (the defining dedup property)
    from miletos_spark.pipeline.dedup import simhash_64

    text = " ".join(f"w{abs(int(v))}" for v in vals)
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    fps = [r["simhash"] for r in simhash_64(df).collect()]
    assert fps[0] == fps[1]

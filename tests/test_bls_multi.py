"""P2 multi-signal BLS: recover two injected transits sequentially."""

import pytest
from pyspark.sql import functions as F

from miletos_spark.search.bls import bls_multi_signal, trial_table

P1, D1 = 3.0, 0.04   # period days, depth
P2, D2 = 5.0, 0.02
DCYC = 0.05          # transit duration / period


@pytest.fixture(scope="module")
def two_transits(spark):
    n, span = 6000, 30.0
    df = spark.range(n).select((F.col("id") * (span / n)).alias("time"))

    def box(t, period, epoch):
        p = F.lit(float(period))
        ph = ((t - F.lit(float(epoch))) % p + p) % p / p
        return (ph < DCYC / 2.0) | (ph >= 1.0 - DCYC / 2.0)

    t = F.col("time")
    value = (
        F.lit(1.0)
        - F.when(box(t, P1, 1.0), F.lit(D1)).otherwise(0.0)
        - F.when(box(t, P2, 2.5), F.lit(D2)).otherwise(0.0)
        + F.randn(11) * 0.002
    )
    return df.withColumn("value", value).cache()


def test_multi_signal_recovers_both(spark, two_transits):
    trials = trial_table(
        spark, p_min=2.0, p_max=8.0, span_days=30.0, osam=4.0,
        n_dcyc=2, dcyc_min=0.05,
    )
    # threshold on the POST-PROCESSED spectrum statistic (sgnl/local
    # noise): on this 45-period grid the 0.02-depth signal scores ~3,
    # far above the ~|1| noise-only background but below the reference's
    # production cut of 7.1 (which assumes its osam=10 grids)
    found = bls_multi_signal(
        two_transits, trials, max_signals=3, snr_threshold=2.5
    )
    assert len(found) >= 2
    periods = sorted(f["period"] for f in found[:2])
    # grid resolution: df = 1/(osam*span) = 1/120 in frequency
    assert abs(1 / periods[0] - 1 / P1) < 2 / 120.0
    assert abs(1 / periods[1] - 1 / P2) < 2 / 120.0
    # the deeper signal is found first
    assert found[0]["depth"] > found[1]["depth"]

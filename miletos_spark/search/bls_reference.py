"""P4 — alternate BLS backends (miletos/main.py:5424-5427, 5654-5693).

The reference can swap its hand-rolled BLS for
`astropy.timeseries.BoxLeastSquares`. Here the alternate backend
cross-validates the phase-bucket `bls_search`: astropy when the library
exists, else a faithful NumPy implementation of the same classic
algorithm (Kovács, Zucker & Mazeh 2002): per period, fold and sort by
phase, then scan every (start-phase, duration) box with cumulative
sums and score the signal residue.

Spark seam: the trial periods cross-join the series and
`applyInPandas` fits one period per group — each task holds one folded
copy, the cluster parallelizes across the period grid. This is the
validation path, not the scale path (the phase-bucket search shuffles
only bucket aggregates; this one shuffles a folded copy per period —
fine for a cross-check grid, wasteful for a dense survey scan).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - astropy not in the baked image
    from astropy.timeseries import BoxLeastSquares  # type: ignore

    HAVE_ASTROPY = True
except ImportError:
    BoxLeastSquares = None
    HAVE_ASTROPY = False


def _numpy_bls_one_period(t, y, period: float, durations: Sequence[float]):
    """Best box for one period: returns (power, depth, epoch_frac,
    dura_frac). Kovács+2002 signal residue SR = s²/(r(1-r)) maximized
    over every (start sample, duration)."""
    import numpy as np

    n = len(t)
    phase = np.sort(np.mod(t, period) / period)
    order = np.argsort(np.mod(t, period) / period, kind="stable")
    yy = (y - y.mean())[order]
    # doubled arrays handle boxes wrapping past phase 1
    ph2 = np.concatenate([phase, phase + 1.0])
    cum = np.concatenate([[0.0], np.cumsum(np.concatenate([yy, yy]))])
    best = (-np.inf, 0.0, 0.0, durations[0])
    for d in durations:
        j = np.searchsorted(ph2, phase + d, side="left")
        i = np.arange(n)
        s = cum[j] - cum[i]
        cnt = j - i
        r = cnt / n
        ok = (cnt > 0) & (cnt < n)
        with np.errstate(divide="ignore", invalid="ignore"):
            sr = np.where(ok, s * s / (r * (1.0 - r) * n), -np.inf)
        k = int(np.argmax(sr))
        if sr[k] > best[0]:
            depth = -s[k] / (cnt[k] * (1.0 - r[k]))
            best = (float(sr[k]), float(depth), float(phase[k]), float(d))
    return best


def _tls_one_period(
    t,
    y,
    period: float,
    durations: Sequence[float],
    ingress_frac: float = 0.3,
    n_bins: int = 256,
):
    """Best trapezoid-template match for one period — the TLS idea
    (Hippke & Heller 2019: realistic transit shape instead of a box),
    reduced to a trapezoid limb approximation on a binned phase grid
    (miletos/main.py:5424-5427 backend-swap seam). Returns
    (power, depth, epoch_frac, dura_frac); power = Δχ² of the
    least-squares template amplitude, epoch_frac = start-bin phase."""
    import numpy as np

    phase = np.mod(t, period) / period
    b = np.minimum((phase * n_bins).astype(np.int64), n_bins - 1)
    cnt = np.bincount(b, minlength=n_bins).astype(float)
    yy = y - y.mean()
    sm = np.bincount(b, weights=yy, minlength=n_bins)
    cnt2 = np.concatenate([cnt, cnt])
    sm2 = np.concatenate([sm, sm])  # doubled: windows wrap past phase 1
    best = (-np.inf, 0.0, 0.0, float(durations[0]))
    for d in durations:
        w = max(int(round(d * n_bins)), 3)
        ing = min(max(int(round(ingress_frac * w)), 1), w // 2)
        k = np.arange(w)
        shape = np.minimum(
            np.minimum((k + 0.5) / ing, (w - k - 0.5) / ing), 1.0
        )
        num = np.zeros(n_bins)
        den = np.zeros(n_bins)
        for j in range(w):  # w ≤ ~30: cheap sliding correlation
            num += sm2[j : j + n_bins] * shape[j]
            den += cnt2[j : j + n_bins] * shape[j] ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            power = np.where(den > 0, num * num / den, -np.inf)
        s = int(np.argmax(power))
        if power[s] > best[0]:
            best = (
                float(power[s]),
                float(-num[s] / den[s]),
                s / n_bins,
                float(d),
            )
    return best


def tls_search(
    df: DataFrame,
    periods: Sequence[float],
    durations: Sequence[float] = (0.02, 0.05, 0.1),
    ingress_frac: float = 0.3,
    n_bins: int = 256,
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """TLS-style trapezoid-template search over a period grid; same
    Spark seam and output schema as `bls_alt_backend` (one folded copy
    per period via applyInPandas — the validation path, not the dense-
    survey scale path)."""
    import pandas as pd

    spark = df.sparkSession
    trials = spark.createDataFrame(
        [(float(p),) for p in periods], "period double"
    )
    joined = df.select(
        F.col(time_col).alias("t"), F.col(value_col).alias("y")
    ).crossJoin(F.broadcast(trials))
    durs = [float(d) for d in durations]

    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        period = float(key[0])
        t = pdf["t"].to_numpy(dtype=float)
        y = pdf["y"].to_numpy(dtype=float)
        power, depth, epoch_frac, dura_frac = _tls_one_period(
            t, y, period, durs, ingress_frac=ingress_frac, n_bins=n_bins
        )
        return pd.DataFrame(
            [[period, power, depth, epoch_frac, dura_frac,
              "tls-trapezoid"]],
            columns=[
                "period", "power", "depth", "epoch_frac", "dura_frac",
                "backend",
            ],
        )

    return joined.groupBy("period").applyInPandas(
        fit,
        schema=(
            "period double, power double, depth double, "
            "epoch_frac double, dura_frac double, backend string"
        ),
    )


def bls_alt_backend(
    df: DataFrame,
    periods: Sequence[float],
    durations: Sequence[float] = (0.02, 0.05, 0.1),
    time_col: str = "time",
    value_col: str = "value",
) -> DataFrame:
    """Run the alternate BLS over a period grid; one row per period:
    (period, power, depth, epoch_frac, dura_frac, backend). The best
    row's period should agree with `bls_search`'s best within grid
    resolution — the cross-validation contract tested in
    tests/test_search.py."""
    import pandas as pd

    spark = df.sparkSession
    trials = spark.createDataFrame([(float(p),) for p in periods], "period double")
    joined = df.select(
        F.col(time_col).alias("t"), F.col(value_col).alias("y")
    ).crossJoin(F.broadcast(trials))

    durs = [float(d) for d in durations]
    backend = "astropy" if HAVE_ASTROPY else "numpy"

    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        period = float(key[0])
        t = pdf["t"].to_numpy(dtype=float)
        y = pdf["y"].to_numpy(dtype=float)
        o = np.argsort(t)
        t, y = t[o], y[o]
        if HAVE_ASTROPY:  # pragma: no cover - not in the baked image
            model = BoxLeastSquares(t, y)
            res = model.power([period], [d * period for d in durs])
            k = int(res.power.argmax())
            row = [
                period, float(res.power[k]), float(res.depth[k]),
                float(np.mod(res.transit_time[k], period) / period),
                float(res.duration[k] / period), backend,
            ]
        else:
            power, depth, epoch_frac, dura_frac = _numpy_bls_one_period(
                t, y, period, durs
            )
            row = [period, power, depth, epoch_frac, dura_frac, backend]
        return pd.DataFrame(
            [row],
            columns=[
                "period", "power", "depth", "epoch_frac", "dura_frac",
                "backend",
            ],
        )

    return joined.groupBy("period").applyInPandas(
        fit,
        schema=(
            "period double, power double, depth double, "
            "epoch_frac double, dura_frac double, backend string"
        ),
    )

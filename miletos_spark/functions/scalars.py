"""§2.8 scalar functions: math / date-time / binning helpers.

The reference's scalar surface is NumPy ufuncs + astropy.time
conversions (miletos/main.py:2098-2105, 7456-7459); here every helper
is a column expression built from Spark built-ins (JVM-side,
codegen'd). The heavier astropy surface (JD↔ISO) reduces to the fixed
affine relation between Julian Date and Unix epoch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# JD 2440587.5 == 1970-01-01T00:00:00Z
JD_UNIX_EPOCH = 2440587.5


def posmod(x: Column, p: Column | float) -> Column:
    """Non-negative modulo ((x % p) + p) % p — NumPy `%` semantics on
    negatives (phase math everywhere in the reference)."""
    pl = F.lit(p) if not isinstance(p, Column) else p
    return ((x % pl) + pl) % pl


def jd_from_unix_seconds(sec: Column) -> Column:
    """Unix epoch seconds → Julian Date (astropy.time.Time('unix')→jd)."""
    return sec / 86400.0 + F.lit(JD_UNIX_EPOCH)


def unix_seconds_from_jd(jd: Column) -> Column:
    """Julian Date → Unix epoch seconds."""
    return (jd - F.lit(JD_UNIX_EPOCH)) * 86400.0


def iso_from_epoch_us(us: Column) -> Column:
    """Epoch microseconds → ISO timestamp string (second precision),
    timezone-FREE (the transit-time listing conversion,
    miletos/main.py:2098-2105).

    Built on TIMESTAMP_NTZ arithmetic rather than
    date_format(timestamp_micros(us)) so the rendered wall clock is
    identical under any session timezone (the driver's session conf is
    not ours to set). floor(us/1e6) is exact-safe: us < 2^53 so the
    division is correctly rounded, and any non-integer quotient is
    ≥1e-6 away from an integer while the rounding error is ~2e-7.
    """
    epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    secs = F.floor(us / F.lit(1_000_000))
    return F.date_format(
        epoch_ntz
        + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs.cast("double")),
        "yyyy-MM-dd HH:mm:ss",
    )


def digitize(x: Column, edges: list[float]) -> Column:
    """np.digitize(x, edges) with right-open bins: index of the first
    edge greater than x (0 = below all edges, len(edges) = above all) —
    a chain of comparisons, codegen-friendly for small edge lists
    (miletos/main.py:5089, 5716, 6862)."""
    out: Column = F.lit(0)
    for e in edges:
        out = out + (x >= F.lit(float(e))).cast("int")
    return out

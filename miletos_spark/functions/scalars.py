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
    UTC session timezone (the transit-time listing conversion,
    miletos/main.py:2098-2105)."""
    return F.date_format(F.timestamp_micros(us), "yyyy-MM-dd HH:mm:ss")


def digitize(x: Column, edges: list[float]) -> Column:
    """np.digitize(x, edges) with right-open bins: index of the first
    edge greater than x (0 = below all edges, len(edges) = above all) —
    a chain of comparisons, codegen-friendly for small edge lists
    (miletos/main.py:5089, 5716, 6862)."""
    out: Column = F.lit(0)
    for e in edges:
        out = out + (x >= F.lit(float(e))).cast("int")
    return out

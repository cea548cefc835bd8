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


PREALIGN_DECIMALS = 12


def quantize(col: Column, decimals: int = 6) -> Column:
    """Tie-immune cross-engine fixed-point quantization.

    `round()` is NOT cross-engine-safe: a bin mean like 40.6303125
    (2-decimal inputs over a power-of-two count) sits EXACTLY on the
    6-decimal tie, the two engines deliver it as doubles 1 ulp apart
    (Spark's double→decimal cast is shortest-repr, DuckDB's is the
    exact binary expansion; decimal→double casts differ again), and
    the tie then breaks differently. Two explicit steps fix both
    layers:

    1. pre-align at 12 decimals: floor(x·1e12 + 0.5)/1e12 — the
       combined input-ulp + multiply rounding error is ~1e-2 of a
       boundary step there, while every terminating bin mean (sums of
       ≤3-decimal values over 2^a·5^b counts, a+b ≤ 10) has digit 0 at
       the 12th place, so BOTH engines floor to the same integer and
       emerge with the IDENTICAL double;
    2. quantize that shared double at the target precision — identical
       inputs through identical IEEE ops give identical outputs, so
       however the 6-decimal tie breaks, it breaks the same way.

    Same op sequence in the SQL twin `quantize_sql`."""
    pa = float(10 ** PREALIGN_DECIMALS)
    s = float(10 ** decimals)
    aligned = F.floor(col * F.lit(pa) + F.lit(0.5)) / F.lit(pa)
    return F.floor(aligned * F.lit(s) + F.lit(0.5)) / F.lit(s)


def quantize_sql(expr: str, decimals: int = 6) -> str:
    """DuckDB twin of `quantize` — same op order, same literals."""
    pa = float(10 ** PREALIGN_DECIMALS)
    s = float(10 ** decimals)
    aligned = f"(floor(({expr}) * {pa!r} + 0.5) / {pa!r})"
    return f"(floor({aligned} * {s!r} + 0.5) / {s!r})"


def digitize(x: Column, edges: list[float]) -> Column:
    """np.digitize(x, edges) with right-open bins: index of the first
    edge greater than x (0 = below all edges, len(edges) = above all) —
    a chain of comparisons, codegen-friendly for small edge lists
    (miletos/main.py:5089, 5716, 6862)."""
    out: Column = F.lit(0)
    for e in edges:
        out = out + (x >= F.lit(float(e))).cast("int")
    return out

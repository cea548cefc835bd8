"""miletos_spark — a PySpark-native time-series analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference pipeline (tansudaylan/miletos, an astrophysics time-series
analysis package) re-expressed as idiomatic Spark DataFrame/SQL operators,
designed for 100 TB-scale long-format tables.

Data model (SURVEY.md §1.4): the reference's `(numbtime, numbener, 3)`
NumPy cube becomes a long-format DataFrame with one row per
(time, ener) sample::

    time   DOUBLE   -- float days (BJD) or epoch seconds
    ener   INT      -- energy/wavelength bin (0 = white light)
    value  DOUBLE   -- median-normalized relative flux / RV
    stdv   DOUBLE   -- 1-sigma uncertainty
    kind   STRING   -- 'RelativeFlux' | 'RelativeVelocity'
    inst   STRING   -- instrument label
    chunk  INT      -- sector / pointing id

Sub-packages:
    sources    -- readers/sinks (S1–S12 of SURVEY.md §2.1)
    operators  -- filters, rebin, normalize, windows, sessionize, fold
    search     -- Lomb-Scargle, BLS, outlier-period, flare finders (P1–P7)
    model      -- forward model, likelihood, inference UDFs (M1–M8)
    pipeline   -- beyond-reference LLM-data ops: dedup, similarity, text
    streaming  -- Structured Streaming ingest analogs (§2.12)
    datagen    -- deterministic fixtures B1–B5 (FIXTURES.md)
"""

__version__ = "0.1.0"

from miletos_spark.session import get_spark  # noqa: F401

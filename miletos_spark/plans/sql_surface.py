"""SURVEY §2.4 — the SQL surface: drive the engine from `spark.sql`.

The reference is a Python-API-only engine; its §2.4 note is that
grouping sets / rollup (and everything else Catalyst knows) come free
once a SQL surface is exposed. This module is that surface:

- `register_views` publishes every testdata table as a temp view under
  its own name, plus `events_days` — the long-format series view
  (event_id, user_id, event_type, value, t, t_sec, t_us) that the
  operator queries consume. The time columns come from the
  schema-branching epoch helpers, so the views absorb the
  nanos/NTZ/TIMESTAMP parquet flavors once and every SQL query is
  engine-agnostic from there.
- `SQL_QUERIES` holds Spark-SQL-only twins of registry window queries
  (same column names, same rounding). Each is verified row-identical
  to its DataFrame-API twin — which the driver hash-checks against
  the DuckDB oracle — so the SQL surface passes the same oracles by
  transitivity (tests/test_sql_surface.py).

A user can therefore `register_views(spark, sf_dir)` and run any of
these (or their own SQL) with `spark.sql(...)`; window partitioning
conventions (bounded day-chunk keys, event_id tiebreaks) are inherited
from the view, not re-derived per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata table plus the `events_days` long-format
    series view. Returns the registered view names."""
    from miletos_spark.plans.driver_queries import _ev_days
    from miletos_spark.schema import load_table

    names = []
    for t in TABLES:
        # tolerate only a MISSING table (partial sf dir); an unreadable
        # one must fail here, not as "table not found" at query time.
        # Narrowed on the error CLASS, not a local os.path probe, so
        # remote sf dirs (hdfs://, s3a://) keep working
        try:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        except Exception as ex:
            msg = str(ex)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                continue
            raise
        names.append(t)
    _ev_days(spark, sf_dir).createOrReplaceTempView("events_days")
    names.append("events_days")
    return names


# Spark-SQL twins of registry queries (same names, columns, rounding).
SQL_QUERIES: dict[str, str] = {
    # W1 — centered rolling std per bounded (event_type, day) chunk
    "rolling_std_events": """
SELECT event_id,
       round(stddev_samp(value) OVER (
         PARTITION BY event_type, floor(t_sec / 86400.0)
         ORDER BY t_sec, event_id
         ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 6) AS roll_std
FROM events_days
""",
    # W3 — rolling percentile band over a ±1 h TIME range; one
    # array-percentile window evaluation for all three bands
    "flare_band_events": """
WITH b AS (
  SELECT event_id, value,
         percentile(value, array(0.05D, 0.5D, 0.95D)) OVER (
           PARTITION BY event_type, floor(t_sec / 86400.0)
           ORDER BY t_sec
           RANGE BETWEEN 3600.0 PRECEDING AND 3600.0 FOLLOWING) AS band
  FROM events_days
)
SELECT event_id,
       round(band[0], 6) AS band_lo,
       round(band[1], 6) AS band_med,
       round(band[2], 6) AS band_hi,
       round((value - band[1]) / nullif(band[2] - band[0], 0.0), 6)
         AS detect_metric
FROM b
""",
    # W7 — largest-gap locator per user (lag + max_by)
    "largest_gap_events": """
WITH g AS (
  SELECT user_id, t_sec,
         t_sec - lag(t_sec) OVER (PARTITION BY user_id ORDER BY t_sec)
           AS gap
  FROM events_days
)
SELECT user_id, round(max(gap), 6) AS max_gap,
       round(max_by(t_sec, gap), 6) AS gap_end_time
FROM g GROUP BY user_id
""",
    # §2.4 — ROLLUP subtotals, the "free once SQL is exposed" case
    "rollup_pricing": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n,
       grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
}


def run_sql(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Register the views and run the named SQL-only query."""
    register_views(spark, sf_dir)
    return spark.sql(SQL_QUERIES[name])

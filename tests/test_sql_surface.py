"""SURVEY §2.4 SQL surface: each Spark-SQL-only twin must be
row-identical to its DataFrame-API registry twin — which the driver
hash-checks against the DuckDB oracle — so the SQL surface passes the
same oracles by transitivity."""

import pytest

from miletos_spark.plans.driver_queries import QUERIES
from miletos_spark.plans.sql_surface import (
    SQL_QUERIES,
    register_views,
    run_sql,
)


def _canon(df):
    return sorted(
        tuple(r[c] for c in sorted(df.columns)) for r in df.collect()
    )


@pytest.mark.parametrize("name", sorted(SQL_QUERIES))
def test_sql_twin_matches_dataframe_twin(spark, sf_dir, name):
    got = run_sql(spark, sf_dir, name)
    want = QUERIES[name](spark, sf_dir)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got) == _canon(want)  # exact, not approximate


def test_register_views_covers_all_tables(spark, sf_dir):
    names = register_views(spark, sf_dir)
    assert "events" in names and "events_days" in names
    assert spark.sql("SELECT count(*) FROM events_days").first()[0] > 0
    # the long view exposes the engine-agnostic time axes
    cols = set(spark.table("events_days").columns)
    assert {"t", "t_sec", "t_us", "event_type", "value"} <= cols

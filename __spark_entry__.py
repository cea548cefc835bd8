"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (BLS transit search on the
events series at sf0.001); `queries()`/`oracle_sql()` expose the
operator registry from `miletos_spark.plans.driver_queries`, where each
Spark implementation is paired with a DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: find the strongest periodic box signal in the sf0.001
    events series (SURVEY.md §7.2 minimum slice: read → filter →
    fold/bucket → aggregate → top-k)."""
    from pyspark.sql import functions as F

    from miletos_spark.plans.driver_queries import _bls_trials, _ev_days
    from miletos_spark.search.bls import bls_best, bls_search

    ev = _ev_days(spark, "/root/testdata/sf0.001")
    trials = spark.createDataFrame(
        _bls_trials(), "period double, dcyc double, off double"
    )
    spec = bls_search(ev, trials, time_col="t", value_col="value", t_ref=0.0)
    return bls_best(spec, min_in=3)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from miletos_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from miletos_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)

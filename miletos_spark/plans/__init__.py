"""Driver-facing query plans: each declared operator from SURVEY.md §2
paired with its ANSI-SQL DuckDB oracle (the t2 correctness gate)."""

from miletos_spark.plans.driver_queries import QUERIES, ORACLES  # noqa: F401

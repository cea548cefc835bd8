"""Deterministic synthetic fixtures B1–B5 (FIXTURES.md §B)."""

from miletos_spark.datagen.fixtures import (  # noqa: F401
    sinusoid_mixture,
    transit_injected,
    flare_injected,
)

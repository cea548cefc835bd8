from miletos_spark.sources.readers import (
    available_chunks,
    read_lightcurve_table,
    read_series_csv,
    read_tess_fits,
)
from miletos_spark.sources.sinks import memoize_parquet, upsert_results, write_stage

__all__ = [
    "read_series_csv",
    "read_lightcurve_table",
    "read_tess_fits",
    "available_chunks",
    "write_stage",
    "upsert_results",
    "memoize_parquet",
]

from miletos_spark.sources.crossmatch import cone_search, crossmatch_closest
from miletos_spark.sources.photometry import (
    aperture_photometry,
    finite_photometry,
)
from miletos_spark.sources.readers import (
    angular_separation_deg,
    available_chunks,
    read_lightcurve_table,
    read_magnitude_series,
    read_series_csv,
    read_tess_fits,
    read_ztf_cone,
)
from miletos_spark.sources.sinks import (
    export_fit_bundle,
    memoize_parquet,
    upsert_results,
    write_stage,
)

__all__ = [
    "read_series_csv",
    "read_lightcurve_table",
    "read_magnitude_series",
    "read_tess_fits",
    "read_ztf_cone",
    "angular_separation_deg",
    "available_chunks",
    "cone_search",
    "crossmatch_closest",
    "aperture_photometry",
    "finite_photometry",
    "write_stage",
    "upsert_results",
    "memoize_parquet",
    "export_fit_bundle",
]

from miletos_spark.model.forward import (
    flare_model,
    orbital_phase,
    phase_curve_components,
    phase_curve_total,
    rv_model,
    step_baseline,
    transit_model,
    trapezoid_depth,
)
from miletos_spark.model.likelihood import depth_fit_closed_form, gaussian_loglik
from miletos_spark.model.features import derived_features, percentile_summary
from miletos_spark.model.infer import fit_transit_groups
from miletos_spark.model.secondary import (
    albedo_recirc_fit,
    brightness_temp_fit,
    sample_albedo_groups,
)

__all__ = [
    "transit_model",
    "orbital_phase",
    "phase_curve_total",
    "phase_curve_components",
    "flare_model",
    "rv_model",
    "step_baseline",
    "trapezoid_depth",
    "gaussian_loglik",
    "depth_fit_closed_form",
    "derived_features",
    "percentile_summary",
    "fit_transit_groups",
    "brightness_temp_fit",
    "albedo_recirc_fit",
    "sample_albedo_groups",
]

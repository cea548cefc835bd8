"""Relational/time-series operators (SURVEY.md §2.2–§2.10).

Each operator is a pure DataFrame -> DataFrame function built from Spark
built-ins (JVM-side, whole-stage codegen); pandas UDFs appear only in
detrend (spline/GP fits, §2.10 X2).
"""

from miletos_spark.operators.filters import (  # noqa: F401
    quality_mask,
    mask_time_windows,
    finite_guard,
    sigma_clip,
    value_sanity,
)
from miletos_spark.operators.rebin import rebin  # noqa: F401
from miletos_spark.operators.normalize import (  # noqa: F401
    median_normalize,
    white_light,
)
from miletos_spark.operators.windows import (  # noqa: F401
    rolling_std,
    rolling_median,
    rolling_percentile_band,
)
from miletos_spark.operators.sessionize import (  # noqa: F401
    sessionize,
    cluster_triggers,
)
from miletos_spark.operators.fold import fold, phase_bins, transit_flag  # noqa: F401
from miletos_spark.operators.detrend import (  # noqa: F401
    clip_detrend_loop,
    gp_detrend,
    median_detrend,
    spline_detrend,
)
from miletos_spark.operators.interp import interp_to_grid  # noqa: F401
from miletos_spark.operators.asof import asof_join  # noqa: F401
from miletos_spark.operators.rebin import rebin_by_count  # noqa: F401
from miletos_spark.operators.windows import largest_gap  # noqa: F401
from miletos_spark.operators.scale import (  # noqa: F401
    salted_agg,
    salted_join,
    write_bucketed,
)
from miletos_spark.operators.visibility import (  # noqa: F401
    visibility_grid,
    visibility_summary,
)

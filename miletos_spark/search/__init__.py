"""Period-search / signal-analysis operators (SURVEY.md §2.9, P1–P7)."""

from miletos_spark.search.lombscargle import lomb_scargle, freq_grid  # noqa: F401
from miletos_spark.search.bls import bls_search, bls_best  # noqa: F401
from miletos_spark.search.outlier_period import outlier_period_search  # noqa: F401
from miletos_spark.search.flare import flare_outlier_search  # noqa: F401

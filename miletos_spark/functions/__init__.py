from miletos_spark.functions.scalars import (
    digitize,
    iso_from_epoch_us,
    jd_from_unix_seconds,
    posmod,
    unix_seconds_from_jd,
)

__all__ = [
    "posmod",
    "digitize",
    "jd_from_unix_seconds",
    "unix_seconds_from_jd",
    "iso_from_epoch_us",
]

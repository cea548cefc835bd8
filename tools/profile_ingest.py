"""Phase-level profiler for the bench ingest landings (optimization
round instrumentation, guide §1): times each landing's sub-phases so
the optimization targets the measured cost, not the guessed one.

Usage: python tools/profile_ingest.py <sf_dir> [landing ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from miletos_spark.session import get_spark  # noqa: E402

_T0 = [time.perf_counter()]


def mark(label: str) -> None:
    now = time.perf_counter()
    print(f"  {now - _T0[0]:7.2f}s  {label}", flush=True)
    _T0[0] = now


def main() -> None:
    sf_dir = sys.argv[1]
    only = set(sys.argv[2:])
    spark = get_spark(app_name="miletos_profile_ingest")

    from miletos_spark.pipeline import landing as L

    def want(name: str) -> bool:
        return not only or name in only

    if want("ivf"):
        print("== land_ivf_index ==")
        _T0[0] = time.perf_counter()
        L.land_ivf_index(spark, sf_dir, overwrite=True)
        mark("total")

    if want("ivfpq"):
        print("== land_ivfpq_index (16) ==")
        _T0[0] = time.perf_counter()
        L.land_ivfpq_index(spark, sf_dir, overwrite=True)
        mark("total")

    if want("ivfpq256"):
        print("== land_ivfpq_index (256) ==")
        _T0[0] = time.perf_counter()
        L.land_ivfpq_index(spark, sf_dir, n_centroids=256, overwrite=True)
        mark("total")

    if want("pq"):
        print("== land_pq_index ==")
        _T0[0] = time.perf_counter()
        L.land_pq_index(spark, sf_dir, overwrite=True)
        mark("total")

    if want("dedup"):
        print("== land_dedup_index ==")
        _T0[0] = time.perf_counter()
        L.land_dedup_index(spark, sf_dir, overwrite=True)
        mark("total")

    if want("semdedup"):
        print("== land_ivf2_index_auto ==")
        _T0[0] = time.perf_counter()
        L.land_ivf2_index_auto(spark, sf_dir, divisor=16, overwrite=True)
        mark("total")

    if want("embedding"):
        print("== land_embedding_index ==")
        _T0[0] = time.perf_counter()
        L.land_embedding_index(spark, sf_dir, overwrite=True)
        mark("total")


if __name__ == "__main__":
    main()

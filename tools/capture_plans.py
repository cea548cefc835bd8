"""Capture `.explain("formatted")` for named registry queries into
plans/<tag>/<query>_<suffix>.txt (optimization-round evidence, guide
§1/§7.2: the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <sf_dir> <out_dir> <suffix> q1 [q2 ...]

Streaming-drain rows materialize their stream at construction time; the
captured plan is the plan of the RETURNED (batch) DataFrame — for those
rows the interesting evidence is the batch tail (the drained result is
bounded), plus the construction wall time, which is printed alongside.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from miletos_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="miletos_capture_plans")

    from miletos_spark.plans.driver_queries import QUERIES
    from miletos_spark.schema import load_table

    for tbl in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).count()

    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        build_s = time.perf_counter() - t0
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            fh.write(f"-- construction wall: {build_s:.2f}s\n")
            fh.write(plan)
        print(f"# wrote {path} (construction {build_s:.2f}s)",
              file=sys.stderr)


if __name__ == "__main__":
    main()

"""Run registry queries under an explicit SparkSession config and print
canonical results as JSON (floats via repr, so last-ulp differences show).

Used by tests/test_determinism.py to assert that query output is
bit-identical across radically different session configs (shuffle
partition count, AQE, arrow, broadcast thresholds) — the conditions the
driver's own session may differ in. Usage:

    python tools/determinism_check.py SF_DIR QUERY [QUERY ...] \
        --conf spark.sql.shuffle.partitions=7 --conf ...
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_rows(rows: list[dict]) -> list[list]:
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0.0:
                return "0.0"
            return repr(v)
        return v

    out = [
        [norm(r[k]) for k in sorted(r.keys())] for r in rows
    ]
    return sorted(out, key=repr)


def main() -> None:
    args = sys.argv[1:]
    confs: dict[str, str] = {}
    rest: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            confs[k] = v
            i += 2
        else:
            rest.append(args[i])
            i += 1
    sf_dir, names = rest[0], rest[1:]

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(
        confs.pop("master", "local[8]")
    ).appName("determinism_check").config("spark.ui.enabled", "false")
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from miletos_spark.plans.driver_queries import QUERIES

    result = {}
    for name in names:
        rows = [r.asDict() for r in QUERIES[name](spark, sf_dir).collect()]
        result[name] = canon_rows(rows)
    print(json.dumps(result, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()

"""Driver-mimic: run every `queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB at the same sf dir; compare row count,
column names, and order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as e
from miletos_spark.schema import TESTDATA_TABLES
from miletos_spark.session import get_spark


def canon(rows: list[dict]) -> list[tuple]:
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0.0:
                return 0.0  # -0.0 == 0.0
            return v
        return v

    out = []
    for r in rows:
        out.append(tuple(norm(r[k]) for k in sorted(r.keys())))
    return sorted(out, key=repr)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            cols = [d[0] for d in cur.description]
            drows = [dict(zip(cols, row)) for row in cur.fetchall()]
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue

        scols = sorted(srows[0].keys()) if srows else sorted(sdf.columns)
        dcols = sorted(cols)
        if scols != dcols:
            print(f"FAIL {name}: column mismatch spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        cs, cd = canon(srows), canon(drows)
        if cs != cd:
            bad = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {bad}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

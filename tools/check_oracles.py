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

# trained-table oracles (bpe_train_encode) freeze their training
# corpus to the COMPARE sf dir: export it from argv BEFORE the entry
# import builds ORACLES (defaults to the driver's sf0.01)
_sf_arg = next((a for a in sys.argv[1:] if os.path.isdir(a)), None)
if _sf_arg:
    os.environ.setdefault(
        "SPARK_GRAFT_ORACLE_SF_DIR", os.path.abspath(_sf_arg)
    )

import duckdb
import numpy as np

import __spark_entry__ as e
from miletos_spark.schema import TESTDATA_TABLES
from miletos_spark.session import get_spark


def canon(rows: list[dict]) -> list[tuple]:
    """Dtype-sensitive canonicalization mirroring the driver's hash.

    The driver hashes representation, not Python equality: Spark BIGINT
    13 vs DuckDB HUGEINT-as-float64 13.0 is a FAIL there even though
    13 == 13.0 in Python. Tag every value with its concrete type so the
    local check reproduces exactly that behavior (round-3 lesson: a
    `==`-based canon let 7 dtype mismatches through for two rounds).
    """

    def norm(v):
        if isinstance(v, np.generic):
            v = v.item()
        elif isinstance(v, np.ndarray):
            v = list(v)
        if isinstance(v, float):
            if math.isnan(v):
                return ("float", "NaN")
            if v == 0.0:
                # Driver hashes representation: -0.0 != +0.0 there
                # (r07 albedo_recirc lesson — Spark round() normalizes
                # the sign, DuckDB round() preserves it). Tag copysign
                # so the local sweep reproduces the driver verdict.
                return ("float", 0.0, math.copysign(1.0, v))
            return ("float", v)
        if isinstance(v, list):
            # The DRIVER's pandas canonicalizer cannot hash list cells
            # (sort_values raises 'unhashable type: list' — r05
            # near_dup_clusters err). Converting to tuples here would
            # pass locally while the driver errors, so REJECT instead:
            # serialize array columns (concat_ws / string_agg) before
            # registering a query in the driver window.
            raise TypeError(
                "array-typed output column: the driver canon cannot "
                "hash list cells — serialize to a string "
                "(concat_ws / string_agg) instead"
            )
        return (type(v).__name__, v)

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
            # toPandas, mirroring the DuckDB fetchdf below: the driver
            # compares pandas-to-pandas, where a NULL in a double
            # column is NaN on BOTH engines (collect() would give None
            # on the Spark side only — false alarms), while an all-
            # non-null BIGINT stays int64 so the int-vs-float dtype
            # trap is still caught.
            spdf = sdf.toPandas()
            srows = spdf.to_dict("records")
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            # fetchdf, not fetchall: the driver fetches through pandas,
            # where DuckDB HUGEINT (sum over INTEGER) lands as float64.
            # fetchall would hand back Python ints and mask exactly the
            # dtype mismatch the driver hash flags.
            ddf = con.execute(oracles[name]).fetchdf()
            cols = list(ddf.columns)
            drows = ddf.to_dict("records")
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue

        scols = sorted(spdf.columns)
        dcols = sorted(cols)
        if scols != dcols:
            print(f"FAIL {name}: column mismatch spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        try:
            cs, cd = canon(srows), canon(drows)
        except TypeError as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
            continue
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

"""As-of join: backward semantics, equality matches, tolerance nulling."""

from miletos_spark.operators.asof import asof_join


def _rows(df):
    return {r["id"]: (r["time_asof"], r["v_asof"]) for r in df.collect()}


def test_asof_backward_and_equality(spark):
    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 5.0), (3, "a", 10.0), (4, "b", 2.0)],
        "id long, g string, time double",
    )
    right = spark.createDataFrame(
        [("a", 1.0, 100.0), ("a", 4.0, 200.0), ("a", 11.0, 300.0),
         ("b", 3.0, 400.0)],
        "g string, time double, v double",
    )
    out = asof_join(left, right, time_col="time", by_cols=("g",),
                    value_cols=("v",), suffix="_asof")
    got = _rows(out)
    assert got[1] == (1.0, 100.0)    # exact-time match allowed
    assert got[2] == (4.0, 200.0)    # latest preceding
    assert got[3] == (4.0, 200.0)    # 11.0 is in the future -> skipped
    assert got[4] == (None, None)    # b's only view is later


def test_asof_tolerance(spark):
    left = spark.createDataFrame([(1, 10.0)], "id long, time double")
    right = spark.createDataFrame([(1.0, 7.0)], "time double, v double")
    near = asof_join(left, right, time_col="time", value_cols=("v",),
                     tolerance=20.0, suffix="_asof")
    far = asof_join(left, right, time_col="time", value_cols=("v",),
                    tolerance=5.0, suffix="_asof")
    assert _rows(near)[1] == (1.0, 7.0)
    assert _rows(far)[1] == (None, None)   # 9 units stale > 5 tolerance

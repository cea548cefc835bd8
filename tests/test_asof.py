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


def test_crossmatch_zones_equals_bruteforce_no_crossjoin(spark):
    """S4 zones crossmatch: same nearest neighbor as brute force, and
    the plan contains no cartesian/nested-loop join."""
    from pyspark.sql import functions as F

    from miletos_spark.sources.crossmatch import crossmatch_closest
    from miletos_spark.sources.readers import angular_separation_deg

    cat = spark.createDataFrame(
        [(i, 10.0 + (i % 13) / 500.0, -5.0 + (i // 13) / 500.0)
         for i in range(200)],
        "cat_id long, ra double, dec double",
    )
    tgt = spark.createDataFrame(
        [(j, 10.0 + (j % 13) / 500.0 + 3e-4, -5.0 + (j * 3 % 15) / 500.0 + 2e-4)
         for j in range(40)],
        "tgt_id long, ra double, dec double",
    )
    out = crossmatch_closest(cat, tgt, radius_deg=0.004)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # brute force reference
    sep = angular_separation_deg(
        F.col("cra"), F.col("cdec"), F.col("tra"), F.col("tdec")
    )
    brute = (
        tgt.select(F.col("tgt_id"), F.col("ra").alias("tra"), F.col("dec").alias("tdec"))
        .crossJoin(cat.select(F.col("cat_id"), F.col("ra").alias("cra"), F.col("dec").alias("cdec")))
        .withColumn("sep", F.round(sep, 9))
        .filter(F.col("sep") <= 0.004)
        .groupBy("tgt_id")
        .agg(F.min(F.struct("sep", "cat_id")).alias("b"))
        .select("tgt_id", F.col("b.cat_id").alias("cat_id"), F.col("b.sep").alias("sep_deg"))
    )
    got = {r["tgt_id"]: (r["cat_id"], r["sep_deg"]) for r in out.collect()}
    want = {r["tgt_id"]: (r["cat_id"], r["sep_deg"]) for r in brute.collect()}
    assert got == want and len(want) > 0

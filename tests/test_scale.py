"""Scale strategies: bucketed joins plan shuffle-free; salted
aggregation/join match their unsalted results exactly."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from miletos_spark.operators.scale import salted_agg, salted_join, write_bucketed


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # tables land in the session's spark-warehouse dir (gitignored)
    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("va")
    )
    b = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3.0).alias("vb")
    )
    write_bucketed(a, "bk_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bk_b", ["k"], n_buckets=8, sort_cols=["k"])
    # disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan          # bucketing paid the shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_salted_agg_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise("cold").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"])
        for r in salted_agg(
            df, ["k"], {"s": "sum(v)", "c": "count(*)"}, n_salt=8
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = spark.range(5000).select(
        F.when(F.col("id") % 5 < 4, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("row"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = big.join(small, "k").agg(
        F.count("*").alias("n"), F.sum("dim").alias("s")
    ).first()
    salted = salted_join(big, small, "k", n_salt=8).agg(
        F.count("*").alias("n"), F.sum("dim").alias("s")
    ).first()
    assert (salted["n"], salted["s"]) == (plain["n"], plain["s"])

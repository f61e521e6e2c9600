"""Real bloom pruning (J6, BloomIndex.java:75-131 analog): hash parity with
Spark's own xxhash64, no false negatives, sane fpp, and the pre-join
map-side prune visible in the plan with an unchanged result."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from miru_spark.functions import bloom as B


def test_xxhash64_matches_spark_jvm(spark):
    """The numpy kernel is bit-for-bit Spark's F.xxhash64 on longs — the
    pin that keeps a future all-JVM probe path position-identical."""
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [rng.integers(-(2**62), 2**62, 500, dtype=np.int64), np.array([0, 1, -1, 2**62], np.int64)]
    )
    df = spark.createDataFrame([(int(v),) for v in vals], "x long")
    jvm = np.array([r[0] for r in df.select(F.xxhash64("x")).collect()], np.int64)
    ours = B.xxhash64_long(vals, 42).view(np.int64)
    assert (jvm == ours).all()


def test_sizing_formulas():
    # BloomIndex.java:64-73 values
    m = B.optimal_num_bits(1000, 0.01)
    assert 9000 < m < 10000  # ~9.6 bits/key at 1% fpp
    assert B.optimal_num_hashes(1000, m) == 7


def test_no_false_negatives_and_fpp(spark):
    rng = np.random.default_rng(7)
    keys = rng.choice(2**40, size=5000, replace=False).astype(np.int64)
    df = spark.createDataFrame([(int(v),) for v in keys], "k long").repartition(4)
    bl = B.build_bloom(df, "k", expected_items=5000, fpp=0.01)
    assert bl.might_contain_np(keys).all()  # never a false negative
    probe = rng.choice(2**40, size=20000, replace=False).astype(np.int64)
    probe = np.setdiff1d(probe, keys)
    fp = bl.might_contain_np(probe).mean()
    assert fp < 0.03  # ~1% target with slack


def test_bloom_prune_join_plan_and_result(spark, sf_dir):
    from miru_spark.operators import relational as rel

    res = rel.bloom_prune_join(spark, sf_dir)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "pythonUDF" in plan  # map-side probe filter
    # bloom is correctness-transparent: identical to the unpruned plan
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_totalprice") > 495000.0)
        .select("o_custkey")
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    plain = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("c_mktsegment")
    )
    assert [tuple(r) for r in res.collect()] == [tuple(r) for r in plain.collect()]

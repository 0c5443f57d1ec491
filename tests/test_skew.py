"""AQE skew-join behavior, pinned with a seeded-skew fixture.

The engine's 100 TB skew story is two-layered: explicit salting
(operators/skew.py, oracle-gated) and AQE's runtime skew-join split
(session.py turns it on). This test proves the AQE layer actually fires
on a skewed join in this engine configuration — if an upgrade or config
change silently disabled it, the hot-key partition would quietly go back
to a single straggler task at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# AQE only splits partitions that exceed skewedPartitionThresholdInBytes
# AND the median-based factor; defaults target 256 MB partitions, so the
# test shrinks the thresholds instead of building a multi-GB fixture.
_SKEW_CONF = {
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_skew_join_split_fires(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        # Seeded skew: key 0 carries 200k rows, 1999 tail keys carry ~50.
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(100_000).select(
            (F.col("id") % 1999 + 1).alias("k"), F.col("id").alias("v")
        )
        big = hot.unionAll(tail)
        dim = spark.range(2000).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("w")
        )
        joined = big.join(dim, "k")
        # Execute THIS DataFrame's QueryExecution (count() would build a
        # separate one and leave this plan unfinalized under AQE).
        assert len(joined.collect()) == 300_000

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, "AQE must finalize the plan"
        assert "skew=true" in plan, (
            "AQE skew-join split did not fire on a 200k-row hot key; "
            "the skewJoin config path is broken:\n" + plan
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_spreads_hot_key(spark, sf_dir):
    """The explicit salting rewrite must place a hot key's rows on
    multiple distinct salt values — the property that caps any one
    reducer's share at 1/SALT_N regardless of AQE."""
    from nrg_etl_airflow_spark_emr_spark.operators.skew import SALT_N

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salts = (
        li.select(
            "l_orderkey",
            F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT_N)).alias("salt"),
        )
        .groupBy("l_orderkey")
        .agg(F.countDistinct("salt").alias("n_salts"), F.count(F.lit(1)).alias("n"))
    )
    # A key with n rows covers SALT_N*(1-(1-1/SALT_N)^n) salts in
    # expectation under a uniform hash. Derive the threshold from each
    # key's ACTUAL n instead of a fixed SALT_N/2 cut: at sf0.001 most
    # orders have ~SALT_N lineitems, at sf0.01 the distribution is the
    # same but a fixed cut at n >= SALT_N sits right at the knee of the
    # coverage curve and fails on sampling noise (observed 3.93 vs 4.0
    # at sf0.01). Comparing observed vs per-key expectation is scale-free.
    row = (
        salts.filter(F.col("n") >= 2)
        .agg(
            F.avg("n_salts").alias("observed"),
            F.avg(
                SALT_N * (1 - F.pow(F.lit(1 - 1 / SALT_N), F.col("n")))
            ).alias("expected"),
        )
        .collect()[0]
    )
    assert row.observed and row.observed > 0.8 * row.expected

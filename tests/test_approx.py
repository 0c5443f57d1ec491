"""Approximate-aggregate error bounds (rows-only op in the driver gate)."""

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    rows = all_specs()["approx_sketches"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_orders - r.exact_orders) / max(r.exact_orders, 1)
        assert rel_err < 0.05, (r.l_returnflag, r.approx_orders, r.exact_orders)
        assert r.median_price_approx > 0

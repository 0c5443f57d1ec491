"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's named query catalog
(``nrg_etl_airflow_spark_emr_spark.plans.catalog``). The driver's verify
runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = all_specs()
    return specs["flagship_revenue_by_month"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: s.builder for name, s in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI twin for every SQL-expressible query."""
    return {name: s.oracle for name, s in all_specs().items() if s.oracle is not None}

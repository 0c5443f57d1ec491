"""Partition-scoped upsert: last-wins merge, untouched partitions
physically unmodified, idempotent under replay."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import upsert_partitioned


def _seed(spark, path):
    rows = [
        # (id, value, day)
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-01"),
        (3, "c", "2024-01-02"),
        (4, "d", "2024-01-03"),
    ]
    df = spark.createDataFrame(rows, ["id", "value", "day"])
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def _state(spark, path):
    # Partition discovery types day= back as DATE; normalize to str.
    return {
        (r.id): (r.value, str(r.day))
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_merges_and_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [(2, "b2", "2024-01-01"), (5, "e", "2024-01-02")], ["id", "value", "day"]
    )
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    assert _state(spark, path) == {
        1: ("a", "2024-01-01"),
        2: ("b2", "2024-01-01"),  # updated in place
        3: ("c", "2024-01-02"),
        4: ("d", "2024-01-03"),
        5: ("e", "2024-01-02"),  # appended
    }


def test_upsert_leaves_untouched_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-03/*.parquet")
    }
    assert before
    updates = spark.createDataFrame([(2, "b2", "2024-01-01")], ["id", "value", "day"])
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-03/*.parquet")
    }
    assert after == before, "partition 2024-01-03 must not be rewritten"


def test_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [(2, "b2", "2024-01-01"), (5, "e", "2024-01-02")], ["id", "value", "day"]
    )
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    first = _state(spark, path)
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    assert _state(spark, path) == first

    # Row counts exact: no duplicates snuck in.
    assert spark.read.parquet(path).count() == 5


def test_upsert_empty_updates_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    empty = spark.createDataFrame([], "id INT, value STRING, day STRING")
    upsert_partitioned(spark, path, empty, ["id"], ["day"])
    assert len(_state(spark, path)) == 4

"""Snapshot-isolation mechanics (operators/formats.py
snk_snapshot_timetravel) and CDC classification (pipelines/upsert.py
upsert_cdc_diff): the properties the value-hash oracle cannot see —
old versions must be BYTE-stable under later commits, and the diff's
change classes must match the underlying order history.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.sources import load_table


def _parquet_files(path: str) -> list[str]:
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def _digest(files: list[str]) -> str:
    h = hashlib.md5()
    for f in files:
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_manifest_pinned_read_is_byte_stable(spark, sf_dir, tmp_path):
    """A later commit writes NEW files only: the v1 manifest's files are
    bit-identical afterwards and a v1 reader gets the same rows —
    snapshot isolation without a table format."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    c1 = str(tmp_path / "commit1")
    orders.filter(F.col("o_orderdate") < "1996-01-01").write.parquet(c1)
    v1 = _parquet_files(c1)
    before_bytes = _digest(v1)
    before_rows = spark.read.parquet(*v1).count()

    c2 = str(tmp_path / "commit2")
    orders.filter(F.col("o_orderdate") >= "1996-01-01").write.parquet(c2)

    assert _digest(v1) == before_bytes, "commit2 must not touch v1's files"
    assert spark.read.parquet(*v1).count() == before_rows
    # v2 = manifest union; rollback = drop the new files from the manifest.
    v2 = v1 + _parquet_files(c2)
    assert spark.read.parquet(*v2).count() == orders.count()


def test_cdc_diff_classes_match_order_history(spark, sf_dir):
    """insert ⇔ the customer's first order falls in [T1, T2); update ⇔
    orders exist before T1 AND the last-order key changed; 'unchanged'
    never appears in the diff."""
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        _CDC_T1,
        _CDC_T2,
        upsert_cdc_diff,
    )

    diff = upsert_cdc_diff(spark, sf_dir).cache()
    assert diff.filter(F.col("change_type") == "unchanged").count() == 0
    inserts = diff.filter(F.col("change_type") == "insert")
    assert inserts.filter(F.col("old_orderkey").isNotNull()).count() == 0

    orders = load_table(spark, sf_dir, "orders")
    pre_t1 = (
        orders.filter(F.col("o_orderdate") < _CDC_T1)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    # No insert-classified customer may have any order before T1.
    assert inserts.join(pre_t1, "custkey", "inner").count() == 0
    # Every update-classified customer must have one.
    updates = diff.filter(F.col("change_type") == "update")
    assert updates.join(pre_t1, "custkey", "left_anti").count() == 0
    # And the diff covers exactly the customers whose first order in
    # [T1, T2) or whose last order changed — every diff row has a new
    # state from [T1, T2).
    window_orders = (
        orders.filter(
            (F.col("o_orderdate") >= _CDC_T1) & (F.col("o_orderdate") < _CDC_T2)
        )
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    assert diff.join(window_orders, "custkey", "left_anti").count() == 0
    diff.unpersist()

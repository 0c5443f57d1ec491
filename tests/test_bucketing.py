"""Bucketed-table co-located join (SURVEY.md §7 'partitioning & shuffle'):
pre-bucketing both join sides on the key eliminates the per-query shuffle
entirely — at 100 TB this converts every repeated fact-fact join from a
full-network exchange into a local merge. Verified structurally (no
Exchange in the executed plan) and by result equality with the plain join.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.sources import load_table

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    for name, df, key, sub in (
        ("b_lineitem", li, "l_orderkey", "li"),
        ("b_orders", od, "o_orderkey", "od"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", str(tmp_path / sub))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    t1, t2 = bucketed_tables
    joined = spark.table(t1).join(
        spark.table(t2), F.col("l_orderkey") == F.col("o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "both sides bucketed on the join key: the join must be shuffle-free"
    )
    # and it computes the same thing as the plain (shuffling) join
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    expected = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
    assert joined.count() == expected


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    agg = spark.table(t1).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "aggregation on the bucket key reuses the bucketing, no shuffle"
    )


def test_reap_stale_dirs_age_and_ownership(tmp_path, monkeypatch):
    """The bt_*/rt_* reaper works by filesystem listing + age, never via
    the catalog (which cannot see dead apps' tables under the in-memory
    catalog): old foreign dirs go, fresh ones and the current app's stay."""
    import os
    import time

    import nrg_etl_airflow_spark_emr_spark.operators.formats as fmts

    monkeypatch.setattr(fmts.tempfile, "gettempdir", lambda: str(tmp_path))
    old = time.time() - fmts._REAP_AGE_S - 60
    for name, stale in (
        ("rt_deadapp_csv_x", True),       # foreign + old -> reaped
        ("bt_bq_orders_feedc0de", True),  # foreign + old -> reaped
        ("rt_liveapp_csv_x", True),       # current app, old -> kept
        ("rt_otherapp_csv_x", False),     # foreign but fresh -> kept
        ("rt_hbapp_csv_x", True),         # foreign + old, FRESH heartbeat -> kept
        ("unrelated_dir", True),          # old but not rt_/bt_ -> kept
    ):
        d = tmp_path / name
        d.mkdir()
        if stale:
            os.utime(d, (old, old))
    # hbapp ran a formats op recently: its heartbeat protects its stale
    # dir (the held-DataFrame case). A dead app's STALE heartbeat
    # protects nothing and is itself removed.
    (tmp_path / "hb_hbapp").write_text("x")
    (tmp_path / "hb_deadapp").write_text("x")
    os.utime(tmp_path / "hb_deadapp", (old, old))
    fmts._reap_stale_dirs("liveapp")
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == [
        "hb_hbapp",
        "hb_liveapp",  # written by the call itself
        "rt_hbapp_csv_x",
        "rt_liveapp_csv_x",
        "rt_otherapp_csv_x",
        "unrelated_dir",
    ]


def test_drop_dangling_bucketed_tables(spark, tmp_path):
    """A bq_* catalog entry whose bt_* data dir no longer exists is
    provably dead and must be dropped; entries with live dirs and the
    current app's own entries survive. (Simulated in-session: the
    in-memory catalog plays the role of the shared metastore.)"""
    import os
    import shutil
    import tempfile

    import nrg_etl_airflow_spark_emr_spark.operators.formats as fmts

    tmp_root = tempfile.gettempdir()
    dead, live = "bq_probe_deadapp_x", "bq_probe_liveapp_x"
    for name in (dead, live):
        path = os.path.join(tmp_root, f"bt_{name}")
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            spark.range(3)
            .write.option("path", path)
            .mode("overwrite")
            .saveAsTable(name)
        )
    shutil.rmtree(os.path.join(tmp_root, f"bt_{dead}"), ignore_errors=True)
    try:
        fmts._drop_dangling_bucketed_tables(spark, own_safe="thisapp")
        names = {tb.name for tb in spark.catalog.listTables()}
        assert dead not in names, "entry with reaped dir must be dropped"
        assert live in names, "entry with a live dir must survive"
    finally:
        for name in (dead, live):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(os.path.join(tmp_root, f"bt_{name}"), ignore_errors=True)

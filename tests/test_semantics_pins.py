"""Documented-semantics pins on crafted mini-fixtures.

The DuckDB oracle gate proves Spark == SQL, but a bug SHARED by both
sides is invisible to it (round 4's kurtosis was off by exactly n with
both engines agreeing). These tests re-derive the documented boundary
behavior of the semantics-heavy operators from hand-built inputs where
the expected answer is computed by hand, not by another engine.

Pattern: write a tiny parquet star into tmp_path and hand it to the
catalog builder as sf_dir — works for ANY builder without refactoring.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs


def _mini_sf(tmp_path, spark, **tables) -> str:
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


def _ts(h: int, m: int = 0, s: int = 0, us: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 10, h, m, s, us)


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, u, et, 1.0, "{}") for i, (u, et, ts) in enumerate(rows)],
        _EV_SCHEMA,
    )


def test_funnel_window_boundaries(tmp_path, spark):
    """Doc: click must land within 24h of the FIRST view (strictly after,
    boundary INCLUSIVE), purchase within 7d of that qualifying click."""
    day = datetime.timedelta
    rows = [
        # user 1: click exactly at v + 24h -> counts; purchase exactly at
        # c + 7d -> counts.
        (1, "view", _ts(0)),
        (1, "click", _ts(0) + day(hours=24)),
        (1, "purchase", _ts(0) + day(hours=24) + day(days=7)),
        # user 2: click 1us past the 24h window -> depth stays 1.
        (2, "view", _ts(0)),
        (2, "click", _ts(0) + day(hours=24) + day(microseconds=1)),
        # user 3: click at the same instant as the view (not strictly
        # after) -> excluded.
        (3, "view", _ts(0)),
        (3, "click", _ts(0)),
        # user 4: a click BEFORE the first view never qualifies, and the
        # window anchors at the FIRST view even when a later view would
        # put a click in range.
        (4, "click", _ts(1)),
        (4, "view", _ts(2)),
        (4, "view", _ts(3)),
        (4, "click", _ts(2) + day(hours=25)),  # in range of view#2 only
    ]
    sf = _mini_sf(tmp_path, spark, events=_events(spark, rows))
    out = {
        r.user_id: r.depth
        for r in all_specs()["events_funnel_windowed"].builder(spark, sf).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 4: 1}


def test_cdc_deletes_window_boundaries(tmp_path, spark):
    """Doc: active = order in [T - 365d, T). An order exactly AT the
    snapshot date is outside its window; one exactly at T - 365d is
    inside. T1 = 1996-01-01, T2 = 1997-06-01."""
    T1 = datetime.datetime(1996, 1, 1)
    T2 = datetime.datetime(1997, 6, 1)
    day = datetime.timedelta
    rows = [
        # (orderkey, custkey, orderdate)
        (1, 100, T1 - day(days=365)),        # first us of window 1 -> active@T1 only -> delete
        (2, 200, T1),                        # exactly T1 -> NOT in window 1...
        (3, 200, T2 - day(days=1)),          # ...but in window 2 -> insert
        (4, 300, T1 - day(days=1)),          # active@T1
        (5, 300, T2 - day(days=2)),          # active@T2, later order -> update
        (6, 400, T1 - day(days=10)),         # in window 1 AND...
        # ...no window-2 order: delete
    ]
    orders = spark.createDataFrame(
        [(k, c, "O", 10.0, d, "1-URGENT") for k, c, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = _mini_sf(tmp_path, spark, orders=orders)
    out = {
        r.custkey: (r.change_type, r.old_orderkey, r.new_orderkey)
        for r in all_specs()["upsert_cdc_deletes"].builder(spark, sf).collect()
    }
    assert out == {
        100: ("delete", 1, None),
        200: ("insert", None, 3),
        300: ("update", 4, 5),
        400: ("delete", 6, None),
    }


def test_group_mode_tie_prefers_earliest_value(tmp_path, spark):
    """Doc: ties -> earliest value, deterministically."""
    d1 = datetime.datetime(1995, 1, 1)
    d2 = datetime.datetime(1995, 1, 2)
    li = spark.createDataFrame(
        [("A", d2), ("A", d1), ("A", d2), ("A", d1), ("B", d2)],
        "l_returnflag string, l_shipdate timestamp",
    )
    sf = _mini_sf(tmp_path, spark, lineitem=li)
    out = {
        r.l_returnflag: (r.mode_shipdate, r.mode_count)
        for r in all_specs()["a16_group_mode"].builder(spark, sf).collect()
    }
    assert out == {"A": (d1, 2), "B": (d2, 1)}


def test_time_bucket_boundaries(tmp_path, spark):
    """Doc: bucket = origin + floor((ts - origin)/W)*W — the bucket START
    is inclusive, and a pre-origin event floors to the bucket that
    CONTAINS it (origin - W), never the one after."""
    from nrg_etl_airflow_spark_emr_spark.operators.scalar_funcs import (
        TB_ORIGIN,
        TB_WIDTH_US,
    )

    origin = datetime.datetime.fromisoformat(TB_ORIGIN)
    w = datetime.timedelta(microseconds=TB_WIDTH_US)
    us1 = datetime.timedelta(microseconds=1)
    rows = [
        (1, "click", origin),            # first us of bucket 0
        (2, "click", origin + w - us1),  # last us of bucket 0
        (3, "click", origin + w),        # first us of bucket 1
        (4, "click", origin - us1),      # pre-origin -> bucket -1
    ]
    sf = _mini_sf(tmp_path, spark, events=_events(spark, rows))
    epoch = lambda dt: int(dt.timestamp() * 1_000_000)
    out = {}
    for r in all_specs()["f15_time_bucket"].builder(spark, sf).collect():
        out[r.bucket_us] = r.n_events
    assert out == {
        epoch(origin): 2,
        epoch(origin + w): 1,
        epoch(origin - w): 1,
    }

"""Edge semantics of the temporal operators on literal frames (SURVEY.md
§5.2): ties, boundaries, and no-match cases that the fixture data only
hits by accident are pinned here explicitly."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.operators.temporal import (
    RANGE_WINDOW_US,
    SESSION_GAP_US,
    asof_join,
    range_join,
    sessionize,
)


def _ts(minute: int, micro: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(
        minutes=minute, microseconds=micro
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_asof_tie_and_no_match(spark):
    ev = _events(
        spark,
        [
            (1, 1, "view", _ts(5)),       # same ts as purchase 10 → matches
            (2, 1, "view", _ts(5)),       # tie: higher view id wins
            (3, 1, "view", _ts(7)),       # AFTER the purchase → ignored
            (10, 1, "purchase", _ts(5)),
            (20, 2, "purchase", _ts(9)),  # user 2 has no views → NULLs
        ],
    )
    out = {
        r.purchase_id: (r.view_id, r.view_ts_us)
        for r in asof_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "view"),
        ).collect()
    }
    assert out[10][0] == 2, "at equal ts the view counts, and the higher id wins"
    assert out[20] == (None, None), "no prior view → typed NULLs"


def test_asof_picks_latest_not_first(spark):
    ev = _events(
        spark,
        [
            (1, 1, "view", _ts(1)),
            (2, 1, "view", _ts(3)),
            (10, 1, "purchase", _ts(4)),
        ],
    )
    out = asof_join(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "view"),
    ).collect()
    assert out[0].view_id == 2


def test_range_join_boundaries(spark):
    base = _events(
        spark,
        [
            (1, 1, "error", _ts(0)),
            (2, 1, "click", _ts(0)),                  # delta 0 → excluded (strict >)
            (3, 1, "click", _ts(10)),                 # exactly +window → included (<=)
            (4, 1, "click", _ts(10, 1)),              # just past → excluded
            (5, 2, "click", _ts(5)),                  # other user → excluded
        ],
    )
    ev = base.select("event_id", "user_id", "event_type", F.unix_micros("ts").alias("us"))
    out = range_join(ev.filter(F.col("event_type") == "error"), ev)
    got = {(r.error_id, r.follow_id): r.delta_us for r in out.collect()}
    assert got == {(1, 3): RANGE_WINDOW_US}


def test_sessionize_gap_boundary(spark):
    gap_min = SESSION_GAP_US // 60_000_000
    ev = _events(
        spark,
        [
            (1, 1, "click", _ts(0)),
            (2, 1, "click", _ts(gap_min)),       # gap == threshold → SAME session
            (3, 1, "click", _ts(2 * gap_min + 1)),  # gap > threshold → new session
        ],
    ).select("user_id", "ts", "event_id")
    out = sorted(
        (r.session_idx, r.n_events) for r in sessionize(ev).collect()
    )
    assert out == [(1, 2), (2, 1)], "strict > starts a new session; == does not"

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


def test_nearest_asof_directions_ties_and_tolerance(spark):
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import nearest_asof_join

    ev = _events(
        spark,
        [
            # user 1: equidistant tie (views 2min before AND after) -> backward
            (1, 1, "view", _ts(8)),
            (2, 1, "view", _ts(12)),
            (10, 1, "purchase", _ts(10)),
            # user 2: only a forward view, inside tolerance
            (3, 2, "view", _ts(25)),
            (20, 2, "purchase", _ts(20)),
            # user 3: nearest is forward (1min) vs backward (5min)
            (4, 3, "view", _ts(35)),
            (5, 3, "view", _ts(41)),
            (30, 3, "purchase", _ts(40)),
            # user 4: both candidates exist but out of the 30-min tolerance
            (6, 4, "view", _ts(0)),
            (7, 4, "view", _ts(200)),
            (40, 4, "purchase", _ts(100)),
            # user 5: equal-ts view counts as BACKWARD (never forward)
            (8, 5, "view", _ts(50)),
            (50, 5, "purchase", _ts(50)),
        ],
    )
    out = {
        r.purchase_id: (r.view_id, r.delta_us, r.direction)
        for r in nearest_asof_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "view"),
        ).collect()
    }
    two_min = 2 * 60 * 1_000_000
    assert out[10] == (1, -two_min, "b"), "equidistant tie prefers backward"
    assert out[20] == (3, 5 * 60 * 1_000_000, "f"), "forward-only match"
    assert out[30] == (5, 60 * 1_000_000, "f"), "nearer forward beats farther backward"
    assert out[40] == (None, None, None), "out-of-tolerance -> NULLs, row preserved"
    assert out[50] == (8, 0, "b"), "equal ts is a backward (at-or-before) match"


def test_nearest_asof_equal_ts_id_tiebreaks(spark):
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import nearest_asof_join

    ev = _events(
        spark,
        [
            # two views at the SAME backward instant: highest id wins
            (1, 1, "view", _ts(9)),
            (2, 1, "view", _ts(9)),
            (10, 1, "purchase", _ts(10)),
            # two views at the SAME forward instant: lowest id wins
            (3, 2, "view", _ts(21)),
            (4, 2, "view", _ts(21)),
            (20, 2, "purchase", _ts(20)),
        ],
    )
    out = {
        r.purchase_id: r.view_id
        for r in nearest_asof_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "view"),
        ).collect()
    }
    assert out[10] == 2, "backward equal-ts tie -> highest view id"
    assert out[20] == 3, "forward equal-ts tie -> lowest view id"


def _intervals(spark, rows, id_name, s_name, e_name):
    return spark.createDataFrame(
        rows, f"{id_name} long, user_id long, {s_name} long, {e_name} long"
    )


def test_interval_overlap_touching_disjoint_and_multibucket(spark):
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import (
        interval_overlap_join,
    )

    W = 1000
    left = _intervals(
        spark,
        [
            (1, 1, 100, 2100),     # spans 3 buckets
            (2, 1, 5000, 5100),
            (3, 2, 0, 10),
        ],
        "a_id", "as_", "ae",
    )
    right = _intervals(
        spark,
        [
            (10, 1, 1500, 2600),   # overlaps a1 across buckets 1-2 -> ONE row
            (11, 1, 2100, 2200),   # touches a1's endpoint -> overlap 0 counts
            (12, 1, 5101, 5200),   # disjoint from a2 by 1us -> no row
            (13, 2, 11, 20),       # disjoint from a3 (closed: 10 < 11)
        ],
        "b_id", "bs", "be",
    )
    out = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_overlap_join(left, right, W).collect()
    }
    assert out == {(1, 10): 600, (1, 11): 0}, out


def test_time_weighted_avg_hand_case(spark):
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import time_weighted_avg

    rows = [
        # user 1: value 2.00 held 10us, value 4.00 held 30us, final row drops
        (1, 1, "x", _ts(0, 0), 2.00),
        (2, 1, "x", _ts(0, 10), 4.00),
        (3, 1, "x", _ts(0, 40), 99.0),
        # user 2: single event -> no interval -> no output row
        (4, 2, "x", _ts(0, 0), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    out = {r.user_id: r for r in time_weighted_avg(df).collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r.n_intervals, r.span_us) == (2, 40)
    assert r.twap_cents == (200 * 10 + 400 * 30) / 40.0


def test_semi_additive_pack_guard(spark, tmp_path):
    """The packed-MAX modulus is a shared formula (Spark and the DuckDB
    oracle pack identically), so an out-of-slot reading would make both
    engines agree on a WRONG last-reading with no hash mismatch to flag
    it. The builder must therefore hard-fail on slot escape (ADVICE r4)
    — and accept the exact slot boundary."""
    import pytest

    from nrg_etl_airflow_spark_emr_spark.operators.temporal import (
        SEMI_ADD_CENTS_SLOT,
        events_semi_additive_balance,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    # Boundary-valid frame: cents = SLOT - 1 must pass and win the MAX.
    ok_dir = tmp_path / "ok"
    spark.createDataFrame(
        [
            (1, _ts(0), 1, "reading", 1.00, "{}"),
            (2, _ts(5), 1, "reading", (SEMI_ADD_CENTS_SLOT - 1) / 100.0, "{}"),
        ],
        schema,
    ).write.parquet(str(ok_dir / "events.parquet"))
    rows = events_semi_additive_balance(spark, str(ok_dir)).collect()
    assert len(rows) == 1
    assert rows[0].total_balance_cents == SEMI_ADD_CENTS_SLOT - 1

    # Out-of-slot frame: cents = SLOT escapes into the event_id digits.
    bad_dir = tmp_path / "bad"
    spark.createDataFrame(
        [
            (1, _ts(0), 1, "reading", 1.00, "{}"),
            (2, _ts(5), 1, "reading", SEMI_ADD_CENTS_SLOT / 100.0, "{}"),
        ],
        schema,
    ).write.parquet(str(bad_dir / "events.parquet"))
    with pytest.raises(Exception, match="pack slot escape"):
        events_semi_additive_balance(spark, str(bad_dir)).collect()


def test_time_weighted_avg_survives_int64_overflow_regime(spark):
    """Regression pin for the round-5 cast-order fix (ADVICE r4): the
    weighted numerator must widen cents to decimal BEFORE multiplying by
    the holding interval. cents=1e7 ($100k at the default scale) held
    for 30 days is cents*dt ~= 2.6e19 > 2^63 — the pre-fix int64 product
    raised under ANSI mode; the widened product is exact."""
    from nrg_etl_airflow_spark_emr_spark.operators.temporal import time_weighted_avg

    day_us = 86_400 * 10**6
    rows = [
        (1, 1, "x", _ts(0), 100_000.0),  # cents = 1e7
        (2, 1, "x", _ts(0, 0) + datetime.timedelta(days=30), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    r = time_weighted_avg(df).collect()[0]
    assert r.span_us == 30 * day_us
    assert r.twap_cents == 10_000_000.0, "exact: one reading held the whole span"

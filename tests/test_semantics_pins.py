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
    # Naive datetimes are UTC here (session tz is pinned UTC): make the
    # expected epochs explicit-UTC so the test passes on any host TZ.
    epoch = lambda dt: int(
        dt.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    out = {}
    for r in all_specs()["f15_time_bucket"].builder(spark, sf).collect():
        out[r.bucket_us] = r.n_events
    assert out == {
        epoch(origin): 2,
        epoch(origin + w): 1,
        epoch(origin - w): 1,
    }


def test_cooccurrence_radius_and_order(tmp_path, spark):
    """Doc: forward-ordered pairs within radius 2 — distance 1 and 2
    count, distance 3 does not, and (w1, w2) keeps text order."""
    docs = spark.createDataFrame(
        # "a b a b a", positions a1 b2 a3 b4 a5 -> per doc:
        # d1: ab(1,2), ba(2,3), ab(3,4), ba(4,5); d2: aa(1,3), bb(2,4), aa(3,5)
        [(1, "a b a b a", "en", "s", 9)] * 5,  # 5 copies -> every pair_n >= 5
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("doc_id", F.monotonically_increasing_id())
    sf = _mini_sf(tmp_path, spark, documents=docs)
    out = {
        (r.w1, r.w2): r.pair_n
        for r in all_specs()["text_cooccurrence_pmi"].builder(spark, sf).collect()
    }
    assert out == {
        ("a", "b"): 10,  # (1,2),(3,4) at d1 x5 docs
        ("b", "a"): 10,  # (2,3),(4,5) at d1 x5
        ("a", "a"): 10,  # (1,3),(3,5) at d2 x5
        ("b", "b"): 5,   # (2,4) at d2 x5
    }, out


def test_gini_extremes(tmp_path, spark):
    """Doc: 0 = uniform, ->1 = winner-takes-all. Exact hand values:
    uniform gini = 0; single-owner gini = (n-1)/n."""
    sup = spark.createDataFrame(
        [(i, f"s{i}", 0 if i < 4 else 1, 0.0) for i in range(8)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    # nation 0: four suppliers, equal revenue. nation 1: one supplier
    # owns everything, three earn a cent.
    li_rows = [(i, 100.0) for i in range(4)]
    li_rows += [(4, 396.97), (5, 0.01), (6, 0.01), (7, 0.01)]
    li = spark.createDataFrame(
        [(k, 1, 1.0, price) for k, price in li_rows],
        "l_suppkey long, l_orderkey long, l_quantity double, l_extendedprice double",
    )
    sf = _mini_sf(tmp_path, spark, supplier=sup, lineitem=li)
    out = {
        r.s_nationkey: r.gini
        for r in all_specs()["a13_gini_concentration"].builder(spark, sf).collect()
    }
    assert out[0] == 0.0
    # cents: [39697, 1, 1, 1]; sorted asc [1,1,1,39697]; S=39700, n=4
    # G = (2*(1*1+2*1+3*1+4*39697) - 5*39700) / (4*39700)
    expected = (2 * (1 + 2 + 3 + 4 * 39697) - 5 * 39700) / (4 * 39700)
    assert abs(out[1] - expected) < 1e-15 and out[1] > 0.74


def test_chisquare_independent_table_has_zero_contrib(tmp_path, spark):
    """Doc: contribution = (obs*n - row*col)^2 / (n^2*row*col). For a
    perfectly independent 2x2 table every cell's contribution is 0."""
    rows = (
        [("1-URGENT", "O")] * 20 + [("1-URGENT", "F")] * 30
        + [("2-HIGH", "O")] * 40 + [("2-HIGH", "F")] * 60
    )
    orders = spark.createDataFrame(
        [(i, 1, st, 1.0, datetime.datetime(1995, 1, 1), pr)
         for i, (pr, st) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = _mini_sf(tmp_path, spark, orders=orders)
    out = all_specs()["a12_chisquare_cells"].builder(spark, sf).collect()
    assert len(out) == 4
    for r in out:
        assert r.chi2_contrib == 0.0 and r.expected == r.obs


def test_skew_kurtosis_match_numpy_moments(tmp_path, spark):
    """The factor-n regression test: the standardized moments must equal
    numpy's population m3/m2^1.5 and m4/m2^2 on integer data — computed
    by a THIRD implementation, not the shared Spark/DuckDB formula."""
    import numpy as np

    rng = np.random.default_rng(11)
    q = rng.integers(1, 51, size=500).astype(float)
    li = spark.createDataFrame(
        [("A", float(v)) for v in q],
        "l_returnflag string, l_quantity double",
    )
    sf = _mini_sf(tmp_path, spark, lineitem=li)
    r = all_specs()["a17_skew_kurtosis"].builder(spark, sf).collect()[0]
    m = q.mean()
    m2 = ((q - m) ** 2).mean()
    m3 = ((q - m) ** 3).mean()
    m4 = ((q - m) ** 4).mean()
    assert abs(r.skewness - m3 / m2**1.5) < 1e-9
    assert abs(r.kurtosis - m4 / m2**2) < 1e-9


def test_exact_corr_matches_numpy(tmp_path, spark):
    """Third-implementation check for a8 (same escape class as the
    kurtosis bug): Pearson r and OLS slope vs numpy on integer data."""
    import numpy as np

    rng = np.random.default_rng(5)
    qty = rng.integers(1, 51, size=400).astype(float)
    price = (qty * 37 + rng.integers(0, 1000, size=400)).astype(float) / 100.0
    li = spark.createDataFrame(
        [("A", float(q), float(p)) for q, p in zip(qty, price)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    sf = _mini_sf(tmp_path, spark, lineitem=li)
    r = all_specs()["a8_exact_corr"].builder(spark, sf).collect()[0]
    x = np.floor(qty)
    y = np.floor(price * 100)
    want_r = np.corrcoef(x, y)[0, 1]
    want_beta = np.cov(x, y, bias=True)[0, 1] / x.var()
    assert abs(r.corr_qty_price - want_r) < 1e-9
    assert abs(r.beta_cents_per_unit - want_beta) < 1e-6


def test_exact_percentiles_match_numpy_linear(tmp_path, spark):
    """a6's quartiles use the p*(n-1) linear interpolation both engines
    share — pin it against numpy's 'linear' method as the third
    implementation."""
    import numpy as np

    rng = np.random.default_rng(6)
    vals = rng.integers(0, 10_000, size=31).astype(float) / 100.0
    li = spark.createDataFrame(
        [("A", float(v)) for v in vals],
        "l_returnflag string, l_quantity double",
    )
    sf = _mini_sf(tmp_path, spark, lineitem=li)
    row = all_specs()["a6_exact_percentiles"].builder(spark, sf).collect()[0]
    got = [row.q25, row.q50, row.q75]
    want = list(np.percentile(vals, [25, 50, 75], method="linear"))
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, want)), (got, want)


def test_winsorized_mean_clamps_at_exact_band(tmp_path, spark):
    """a15: values exactly AT p05/p95 stay; outside values clamp TO the
    band edge (not dropped — the count is preserved)."""
    import numpy as np

    vals = [float(v) for v in range(1, 22)]  # 1..21, n=21 -> p05=2.0, p95=20.0
    li = spark.createDataFrame(
        [("A", v) for v in vals],
        "l_returnflag string, l_extendedprice double",
    )
    sf = _mini_sf(tmp_path, spark, lineitem=li)
    r = all_specs()["a15_winsorized_mean"].builder(spark, sf).collect()[0]
    assert (r.p05, r.p95) == (2.0, 20.0)
    clamped = np.clip(vals, 2.0, 20.0)
    assert r.n_rows == 21
    assert abs(r.winsorized_mean - clamped.mean()) < 1e-9


def test_twap_matches_numpy_weighting(tmp_path, spark):
    """events_time_weighted_avg vs a numpy re-derivation on random data:
    value holds until the next event, final reading drops, cents
    fixed-pointing before weighting."""
    import numpy as np

    rng = np.random.default_rng(7)
    ts_us = np.sort(rng.integers(0, 10**9, size=40))
    vals = rng.integers(1, 10_000, size=40).astype(float) / 100.0
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(microseconds=int(u)), 1, "x", float(v), "{}")
        for i, (u, v) in enumerate(zip(ts_us, vals))
    ]
    ev = spark.createDataFrame(rows, _EV_SCHEMA)
    sf = _mini_sf(tmp_path, spark, events=ev)
    r = all_specs()["events_time_weighted_avg"].builder(spark, sf).collect()[0]
    cents = np.floor(vals * 100)
    dt = np.diff(ts_us)
    want = (cents[:-1] * dt).sum() / dt.sum()
    assert r.n_intervals == 39 and r.span_us == int(dt.sum())
    assert abs(r.twap_cents - want) < 1e-9


def test_dau_wau_hand_case(tmp_path, spark):
    """events_dau_wau: WAU at day D counts distinct users active in the
    trailing 7 days INCLUDING D; a user active exactly 7 days earlier
    has rolled out."""
    d = lambda n: datetime.datetime(2024, 1, 1) + datetime.timedelta(days=n)
    rows = [
        (1, "click", d(0)),
        (2, "click", d(0)),
        (1, "click", d(6)),   # day 6: window [0..6] still holds user 2
        (3, "click", d(7)),   # day 7: window [1..7] -> users 1 (d6), 3
    ]
    sf = _mini_sf(tmp_path, spark, events=_events(spark, rows))
    rows_by_day = {
        tuple(r)[0]: r
        for r in all_specs()["events_dau_wau"].builder(spark, sf).collect()
    }
    days = sorted(rows_by_day)
    assert len(days) == 3
    r0, r6, r7 = (rows_by_day[k] for k in days)
    assert (r0.dau, r0.wau) == (2, 2)
    assert (r6.dau, r6.wau) == (1, 2), (
        "user 2's day-0 activity is still inside the 7-day window at day 6"
    )
    assert (r7.dau, r7.wau) == (1, 2), (
        "day 0 rolls out at day 7; users 1 (day 6) and 3 remain"
    )


def test_retention_cohorts_hand_case(tmp_path, spark):
    """events_retention_cohorts: cohort = ISO-Monday week of FIRST
    activity; a user active in its cohort week and two weeks later
    produces rows at those two weeks only — never the silent week
    between."""
    monday = datetime.datetime(2024, 1, 1)  # a Monday
    wk = datetime.timedelta(days=7)
    rows = [
        (1, "click", monday),
        (1, "click", monday + 2 * wk),
        (2, "click", monday + wk + datetime.timedelta(days=3)),
    ]
    sf = _mini_sf(tmp_path, spark, events=_events(spark, rows))
    out = all_specs()["events_retention_cohorts"].builder(spark, sf).collect()
    trips = sorted(tuple(r) for r in out)
    w0 = monday.date()
    w1 = (monday + wk).date()

    def norm(v):
        return v.date() if hasattr(v, "date") else v

    got = sorted((norm(a), norm(b), int(c)) for a, b, c in trips)
    assert got == [
        (w0, 0, 1),  # user 1 active in its cohort week
        (w0, 2, 1),  # ...and at offset 2 (the silent week 1 absent)
        (w1, 0, 1),  # user 2's cohort week
    ], got


def test_udtf_word_offsets_hand_case(tmp_path, spark):
    """f17's UDTF semantics pinned by hand: running char offsets under
    single-space splitting (empty tokens from leading/double spaces keep
    their zero-length slot, matching string_split), NULL text emits no
    rows, and the 8-word cap is applied inside eval."""
    docs = spark.createDataFrame(
        [
            (1, "ab c", "en", "s", 4),
            (2, None, "en", "s", 0),
            (3, " x", "en", "s", 2),  # leading space -> empty word at pos 1
            (4, "a b c d e f g h i j", "en", "s", 19),  # capped at 8
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = _mini_sf(tmp_path, spark, documents=docs)
    out = all_specs()["f17_udtf_word_offsets"].builder(spark, sf)
    rows = {(r.doc_id, r.pos): (r.word, r.char_start, r.char_end) for r in out.collect()}
    assert rows[(1, 1)] == ("ab", 0, 2)
    assert rows[(1, 2)] == ("c", 3, 4)
    assert not any(d == 2 for d, _ in rows)
    assert rows[(3, 1)] == ("", 0, 0)
    assert rows[(3, 2)] == ("x", 1, 2)
    assert max(p for d, p in rows if d == 4) == 8
    assert rows[(4, 8)] == ("h", 14, 15)

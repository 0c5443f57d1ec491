"""applyInPandas grouped-map operator vs an independent Python
recurrence: the EWMA must match y_t = α·x_t + (1-α)·y_{t-1} exactly for
every user, in time order."""

from __future__ import annotations

from nrg_etl_airflow_spark_emr_spark.operators.grouped import EWMA_ALPHA
from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
from nrg_etl_airflow_spark_emr_spark.sources import load_table


def test_ewma_matches_reference_recurrence(spark, sf_dir):
    out = all_specs()["events_user_ewma"].builder(spark, sf_dir)
    rows = out.collect()

    src = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    ).collect()

    # Independent reference: plain-Python recurrence per user in
    # (ts, event_id) order — no pandas, so a pandas.ewm misuse (adjust=True,
    # wrong alpha) cannot cancel out.
    by_user: dict[int, list] = {}
    for r in sorted(src, key=lambda r: (r.user_id, r.ts, r.event_id)):
        by_user.setdefault(r.user_id, []).append(r)
    want = {}
    for uid, evs in by_user.items():
        y = None
        for r in evs:
            y = r.value if y is None else EWMA_ALPHA * r.value + (1 - EWMA_ALPHA) * y
            want[r.event_id] = y

    assert len(rows) == len(src)
    for r in rows:
        assert abs(r.ewma - want[r.event_id]) < 1e-9, (
            f"event {r.event_id}: {r.ewma} != {want[r.event_id]}"
        )


def test_ewma_plan_shuffles_once_on_user(spark, sf_dir):
    df = all_specs()["events_user_ewma"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange") == 1, "grouped map must shuffle exactly once"

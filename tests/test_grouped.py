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


def test_ewma_kernel_exact_on_constant_runs():
    """Regression for the pandas .ewm() constant-series short-circuit:
    pandas keeps ewma == value bit-exactly on equal-valued runs while the
    plain recurrence lands 1 ulp off (0.7*3+0.3*3 = 2.9999999999999996).
    The kernel must follow the PLAIN recurrence exactly — that is the
    sequence the recursive-CTE oracle replays."""
    import pandas as pd

    from nrg_etl_airflow_spark_emr_spark.operators.grouped import _ewma_group

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 4,
            "event_id": [1, 2, 3, 4],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]),
            "value": [3.0, 3.0, 5.0, 5.0],
        }
    )
    got = list(_ewma_group(pdf)["ewma"])
    beta = 1.0 - EWMA_ALPHA
    y = 3.0
    want = [y]
    for x in [3.0, 5.0, 5.0]:
        y = beta * y + EWMA_ALPHA * x
        want.append(y)
    assert got == want  # EXACT — no tolerance
    assert got[1] != 3.0, "constant-run short-circuit crept back in"

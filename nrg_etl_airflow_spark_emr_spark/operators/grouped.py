"""Batch grouped-map custom operator (``applyInPandas``): per-user EWMA.

The engine's UDF policy (SURVEY.md §2.10) is built-ins first, Arrow-
batched Pandas only where column algebra genuinely can't express the
semantics. An exponentially-weighted moving average over each user's
time-ordered events is that case: the recurrence
``y_t = α·x_t + (1-α)·y_{t-1}`` is sequential state, and the closed-form
window rewrite needs ``(1-α)^(-j)`` terms that overflow for long
histories — so it earns the sanctioned grouped-map path.

Scale: ``groupBy(user_id).applyInPandas`` shuffles once on the key (same
exchange a groupBy pays); each group is one Arrow batch in one Python
worker, so memory is bounded by the largest single user's history, not
the partition. The streaming twin of this shape is
``running_user_totals`` (applyInPandasWithState, streaming/jobs.py).

No SQL oracle (rows-only driver check): exactness is pinned by
tests/test_grouped.py against an independent Python recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ._util import t

EWMA_ALPHA = 0.3

_OUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, ts TIMESTAMP, value DOUBLE, ewma DOUBLE"
)


def _ewma_group(pdf):
    import numpy as np

    # Explicit recurrence, NOT pandas .ewm(): pandas short-circuits the
    # update when the running average exactly equals the incoming value
    # (a constant-series guard in its Cython kernel), which diverges from
    # the plain y = (1-α)y + αx by 1 ulp on equal-valued runs — owning
    # the loop makes the float op sequence exactly the one the recursive-
    # CTE oracle replays, pandas-version-independent.
    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    vals = pdf["value"].to_numpy(dtype=np.float64)
    out = np.empty(len(vals), dtype=np.float64)
    y = 0.0
    beta = 1.0 - EWMA_ALPHA  # same double the oracle embeds via repr()
    for i in range(len(vals)):
        y = vals[i] if i == 0 else beta * y + EWMA_ALPHA * vals[i]
        out[i] = y
    pdf["ewma"] = out
    return pdf[["user_id", "event_id", "ts", "value", "ewma"]]


@register(
    "events_user_ewma",
    oracle=f"""
    WITH RECURSIVE o AS (
        SELECT user_id, event_id, ts, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    s AS (
        SELECT user_id, event_id, ts, value, rn, value AS ewma
        FROM o WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_id, o.ts, o.value, o.rn,
               (CAST({1 - EWMA_ALPHA} AS DOUBLE) * s.ewma
                + CAST({EWMA_ALPHA} AS DOUBLE) * o.value)
        FROM s JOIN o ON o.user_id = s.user_id AND o.rn = s.rn + 1
    )
    SELECT user_id, event_id, ts, value, ewma FROM s
    """,
    tags=("udf", "temporal"),
    doc=f"Per-user EWMA (α={EWMA_ALPHA}) over time-ordered events via "
    "applyInPandas — the sanctioned grouped-map custom-operator path for "
    "sequential-state recurrences. One shuffle on user_id; Arrow-batched; "
    "ties broken by event_id so the sequence is total-order deterministic. "
    "Oracle-gated bit-for-bit: the kernel owns the recurrence as an "
    "explicit float64 loop (NOT pandas .ewm(), whose Cython kernel "
    "short-circuits on constant runs and drifts 1 ulp from the plain "
    "recurrence), so the DuckDB recursive CTE replaying the identical "
    "fl((1-α)·y) + fl(α·x) sequence reproduces every double exactly — "
    "IEEE ops are deterministic given identical operand order.",
)
def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(_ewma_group, _OUT_SCHEMA)

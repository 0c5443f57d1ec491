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
    import pandas as pd  # noqa: F401 (worker-side import)

    pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
    pdf["ewma"] = pdf["value"].ewm(alpha=EWMA_ALPHA, adjust=False).mean()
    return pdf[["user_id", "event_id", "ts", "value", "ewma"]]


@register(
    "events_user_ewma",
    oracle=None,  # sequential recurrence; pinned by tests/test_grouped.py
    tags=("udf", "temporal"),
    doc=f"Per-user EWMA (α={EWMA_ALPHA}) over time-ordered events via "
    "applyInPandas — the sanctioned grouped-map custom-operator path for "
    "sequential-state recurrences. One shuffle on user_id; Arrow-batched; "
    "ties broken by event_id so the sequence is total-order deterministic.",
)
def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ev.groupBy("user_id").applyInPandas(_ewma_group, _OUT_SCHEMA)

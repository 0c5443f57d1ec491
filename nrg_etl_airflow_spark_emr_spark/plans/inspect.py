"""Programmatic physical-plan audit — the engine's introspection API.

The scale story (SCALE.md) is made of plan properties: how many shuffle
exchanges, which joins broadcast, whether filters reached the parquet
scan, whether any Python evaluation node crept in. ``audit()`` extracts
those properties from the executed plan as a typed summary so tooling
(scripts/gen_plan_report.py), tests (tests/test_plans.py), and users can
assert on plan shape without string-grepping Spark's plan dump
themselves.

Spark-first note: this reads ``queryExecution().executedPlan()``. Before
the query runs, that is the INITIAL adaptive plan (AQE may still
coalesce partitions or demote a sort-merge join to broadcast at
runtime) and whole-stage-codegen spans are not yet assigned —
``codegen_spans`` is 0. After an action has run, the same call returns
the FINAL adaptive plan with ``*(n)`` codegen markers; audit an executed
DataFrame when codegen coverage is the property under test.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class PlanAudit:
    """Typed summary of one query's executed physical plan."""

    shuffles: int                 # hash + range + round-robin exchanges
    broadcast_hash_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    nested_loop_joins: int        # BroadcastNestedLoopJoin — scale smell
    cartesian_products: int       # CartesianProduct — scale killer
    scans: int                    # parquet file scans
    pushed_filters: bool          # any scan with non-empty PushedFilters
    codegen_spans: int            # WholeStageCodegen regions
    python_nodes: int             # Arrow-batched Python evaluation nodes
    row_python_nodes: int         # row-at-a-time BatchEvalPython — banned
    plan: str = field(repr=False, default="")

    @property
    def joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.nested_loop_joins
            + self.cartesian_products
        )


def audit(df: DataFrame) -> PlanAudit:
    """Audit a DataFrame's executed physical plan (triggers planning only,
    not execution)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return audit_plan_string(plan)


def _distinct_shuffles(plan: str) -> int:
    """Count DISTINCT data-shuffle exchanges. Cached subtrees re-print
    their whole stored plan once per InMemoryTableScan reference, so a
    raw line count over-states a cache-using query (graph_pagerank's
    edge frame appears once per iteration); exchanges carry a stable
    ``plan_id``, so dedup by it and fall back to line counting only for
    lines without one (tests/test_plans.py's _shuffle_ids discipline)."""
    kinds = (
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange RoundRobinPartitioning",
    )
    ids: set[str] = set()
    bare = 0
    for line in plan.splitlines():
        if any(k in line for k in kinds):
            m = re.search(r"plan_id=(\d+)", line)
            if m:
                ids.add(m.group(1))
            else:
                bare += 1
    return len(ids) + bare


def audit_plan_string(plan: str) -> PlanAudit:
    return PlanAudit(
        shuffles=_distinct_shuffles(plan),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        shuffled_hash_joins=plan.count("ShuffledHashJoin"),
        nested_loop_joins=plan.count("BroadcastNestedLoopJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        scans=plan.count("Scan parquet"),
        pushed_filters=bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        # Codegen regions appear as "WholeStageCodegen (n)" in formatted
        # explain and as "*(n) Node" prefixes in the tree string.
        codegen_spans=len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
            | set(re.findall(r"\*\((\d+)\)", plan))
        ),
        python_nodes=len(
            re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", plan)
        ),
        row_python_nodes=len(re.findall(r"BatchEvalPython", plan)),
        plan=plan,
    )

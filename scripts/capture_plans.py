#!/usr/bin/env python3
"""Capture .explain('formatted') for named catalog queries into
plans/$SPARK_GRAFT_PLAN_ROUND/ (default r16).

Usage: python scripts/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  query:  catalog names; default = every bench-tagged query.

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.001 — plan SHAPE only;
AQE may re-plan at runtime, same caveat as PLANS.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
from nrg_etl_airflow_spark_emr_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    specs = all_specs()
    names = sys.argv[2:] or sorted(n for n, s in specs.items() if s.bench)
    for name in names:
        spark.catalog.clearCache()
        df = specs[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

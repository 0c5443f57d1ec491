#!/usr/bin/env python3
"""Benchmark harness: runs the headline (bench-tagged) catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + a count-style consume) after
one warm-up pass of the flagship to amortize JVM/session start.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
from nrg_etl_airflow_spark_emr_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="engine-bench")

    specs = {n: s for n, s in all_specs().items() if s.bench}

    # Full untimed warm-up pass: beyond parquet footers/session init, the
    # HOF-heavy dedup/similarity queries run interpreted expression trees
    # whose first execution pays JVM JIT compilation (measured 2-3× on the
    # first run, stable afterwards). Timing the steady state is what makes
    # round-over-round comparisons meaningful.
    for name in sorted(specs):
        spark.catalog.clearCache()
        specs[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = float("inf")
        for _ in range(reps):
            # Each rep is timed in isolation: several queries .cache()
            # intermediate frames, and Spark's cache manager substitutes any
            # matching plan fragment in LATER queries/reps, so leftover
            # caches both distort timings and build up memory pressure
            # across the run. clearCache() also forces each rep to re-plan
            # and re-execute from the parquet scan.
            spark.catalog.clearCache()
            start = time.perf_counter()
            df = specs[name].builder(spark, sf_dir)
            # Consume fully without driver-side materialization of wide rows.
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        # Min-of-reps: single-run timings at this fixture scale swing ±50%
        # with JIT/GC state (measured 22s vs 40s totals for identical code);
        # the minimum estimates the code's actual cost, which is what
        # round-over-round comparison needs.
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

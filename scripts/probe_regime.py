#!/usr/bin/env python3
"""Scale-regime probe: same-session interleaved timings + spill bytes
for a query subset across TWO scale factors (default sf1 vs sf10).

VERDICT r10 item 5: the sf1 zero-spill result is necessary but not
sufficient for the 100 TB claim — one more decade on the steepest
rampers tells whether the ramps stay sublinear and spill-free. This
harness reuses bench.py's spill probe and the bench_ab interleave
discipline (warm-up per (query, sf); reps alternated so host drift hits
both scale factors equally; min-of-reps for time, max-of-reps for
spill; cache cleared per rep).

Usage:
  python scripts/probe_regime.py Q [Q ...] [--a DIR] [--b DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_spill_probe, run_canary  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--a", default=".localdata/sf1")
    ap.add_argument("--b", default=".localdata/sf10")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    specs = all_specs()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="probe-regime")
    mark, measure = make_spill_probe(spark)
    sfs = {"a": args.a, "b": args.b}

    for q in args.queries:  # warm-up each (query, sf) once, untimed
        for d in sfs.values():
            spark.catalog.clearCache()
            specs[q].builder(spark, d).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {
        q: {k: {"reps": [], "spill_mem": 0, "spill_disk": 0} for k in sfs}
        for q in args.queries
    }
    for _ in range(args.reps):
        for q in args.queries:
            for k, d in sfs.items():
                spark.catalog.clearCache()
                marker = mark()
                t0 = time.perf_counter()
                specs[q].builder(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[q][k]["reps"].append(round(time.perf_counter() - t0, 3))
                sp = measure(marker)
                if sp is not None:
                    out[q][k]["spill_mem"] = max(out[q][k]["spill_mem"], sp[0])
                    out[q][k]["spill_disk"] = max(out[q][k]["spill_disk"], sp[1])
    spark.stop()

    res = {}
    for q, d in out.items():
        a_min, b_min = min(d["a"]["reps"]), min(d["b"]["reps"])
        res[q] = {
            "a_min": a_min,
            "b_min": b_min,
            "ramp": round(b_min / a_min, 2),
            "a_spill": [d["a"]["spill_mem"], d["a"]["spill_disk"]],
            "b_spill": [d["b"]["spill_mem"], d["b"]["spill_disk"]],
            "a_reps": d["a"]["reps"],
            "b_reps": d["b"]["reps"],
        }
    print(
        json.dumps(
            {
                "a": args.a,
                "b": args.b,
                "trusted_statistic": "min",
                **canary,
                **{f"{k}_end": v for k, v in run_canary().items()},
                "queries": res,
            }
        )
    )


if __name__ == "__main__":
    main()

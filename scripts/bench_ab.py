#!/usr/bin/env python3
"""Interleaved same-session A/B timing for catalog queries.

Usage:
  python scripts/bench_ab.py QUERY [QUERY ...] [--sf DIR] [--reps N]

Round-5 meta-finding (BASELINE.md): identical code+config+quiet canaries
produced 61-418s across sessions for heavy-shuffle queries on this host,
so cross-session timing deltas are uninterpretable for multi-second
work. The only comparison that carries signal is an INTERLEAVED
same-session A/B: alternate the compared queries rep by rep inside one
Spark session, so host drift hits every variant equally, and compare
mins/medians. This harness is that protocol:

- host canary (bench.run_canary) before the session and after it closes;
- one untimed warm-up pass per query (JIT, parquet footers);
- reps interleaved round-robin (q1 r0, q2 r0, ..., q1 r1, q2 r1, ...);
- cache cleared before every rep (same isolation rule as bench.py);
- per-query min / median / all reps printed as one JSON line.

Compare queries against each other (plan variants registered under
different names) or one query against itself across a code change by
running the harness once per checkout — in that case trust only the
canary-normalized mins, and prefer landing both variants in one tree.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_spill_probe, run_canary, run_spark_canary  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+", help="catalog query names")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    specs = all_specs()
    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="bench-ab")
    canary.update(run_spark_canary(spark))  # in-JVM session quality, start
    for q in args.queries:  # warm-up
        spark.catalog.clearCache()
        specs[q].builder(spark, args.sf).write.format("noop").mode("overwrite").save()

    mark, measure = make_spill_probe(spark)
    reps: dict[str, list[float]] = {q: [] for q in args.queries}
    spill: dict[str, list[int]] = {q: [0, 0] for q in args.queries}
    for _ in range(args.reps):
        for q in args.queries:  # interleaved: drift hits every query equally
            spark.catalog.clearCache()
            marker = mark()
            t0 = time.perf_counter()
            specs[q].builder(spark, args.sf).write.format("noop").mode("overwrite").save()
            reps[q].append(round(time.perf_counter() - t0, 3))
            sp = measure(marker) or (0, 0)
            # max over reps — the regime question is "does it EVER spill"
            spill[q] = [max(spill[q][0], int(sp[0])), max(spill[q][1], int(sp[1]))]
    spark_canary_end = {
        f"{k}_end": v for k, v in run_spark_canary(spark).items()
    }
    spark.stop()

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                # At the default reps=3 a load spike hitting one rep of
                # only one variant can still skew the median inside the
                # interleave; min is robust to one-sided spikes. Record
                # which statistic the protocol trusts so downstream
                # readers (BASELINE.md) never reach for the median.
                "trusted_statistic": "min",
                **canary,
                **spark_canary_end,
                **{f"{k}_end": v for k, v in run_canary().items()},
                "queries": {
                    q: {
                        "min": min(r),
                        "median": round(statistics.median(r), 3),
                        "reps": r,
                        "spill": spill[q],
                    }
                    for q, r in reps.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()

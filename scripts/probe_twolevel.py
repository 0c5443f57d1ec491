#!/usr/bin/env python3
"""Scale probe for the two-level embedding dedup router.

BASELINE.md round-11 regime probe, finding 1: dedup_embedding_ivf's
single-level fixture-rule assignment is O(n^2/MOD) — 37x wall and
219 GB spill at sf10. dedup_embedding_twolevel is the implemented
remedy; its scale law says sizing both levels at sqrt(n/c) holds
bucket occupancy at c with O(n*sqrt(n/c)) assignment work. This
harness measures that claim on the same fixtures, same session, same
discipline as scripts/probe_regime.py (warm-up per (query, sf),
interleaved reps, min-of-reps wall, max-of-reps spill, cache cleared
per rep, canary bracket):

- ``twolevel_sqrtk``: embedding_dedup_twolevel with k1 = k2 =
  isqrt(n / occupancy) per scale factor — the deployment sizing.
- ``single_level`` (unless --skip-single): the registered
  dedup_embedding_ivf, re-run so the A/B shares one host session.

Usage:
  python scripts/probe_twolevel.py [--a DIR] [--b DIR] [--reps N]
      [--occupancy C] [--skip-single] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_spill_probe, run_canary  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default=".localdata/sf1")
    ap.add_argument("--b", default=".localdata/sf10")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--occupancy", type=int, default=100)
    ap.add_argument("--skip-single", action="store_true")
    ap.add_argument("--out", default="bench_regime_twolevel.json")
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
        embedding_dedup_twolevel,
    )
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    specs = all_specs()
    spark = get_spark(app_name="probe-twolevel")
    mark, measure = make_spill_probe(spark)
    sfs = {"a": args.a, "b": args.b}

    ks: dict[str, int] = {}
    ns: dict[str, int] = {}
    for key, d in sfs.items():
        n = spark.read.parquet(os.path.join(d, "embeddings.parquet")).count()
        ns[key] = n
        ks[key] = max(2, math.isqrt(max(n // args.occupancy, 4)))

    def twolevel(key: str):
        return embedding_dedup_twolevel(
            spark, sfs[key], k1=ks[key], k2=ks[key], iters=2
        )

    def single(key: str):
        return specs["dedup_embedding_ivf"].builder(spark, sfs[key])

    queries = {"twolevel_sqrtk": twolevel}
    if not args.skip_single:
        queries["single_level"] = single

    for q, fn in queries.items():  # warm-up each (query, sf) once, untimed
        for key in sfs:
            spark.catalog.clearCache()
            fn(key).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {
        q: {k: {"reps": [], "spill_mem": 0, "spill_disk": 0} for k in sfs}
        for q in queries
    }
    for _ in range(args.reps):
        for q, fn in queries.items():
            for key in sfs:
                spark.catalog.clearCache()
                marker = mark()
                t0 = time.perf_counter()
                fn(key).write.format("noop").mode("overwrite").save()
                out[q][key]["reps"].append(round(time.perf_counter() - t0, 3))
                sp = measure(marker)
                if sp is not None:
                    out[q][key]["spill_mem"] = max(out[q][key]["spill_mem"], sp[0])
                    out[q][key]["spill_disk"] = max(out[q][key]["spill_disk"], sp[1])
    canary_end = run_canary()
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
    doc = {
        "a": args.a,
        "b": args.b,
        "n": ns,
        "k_per_level": ks,
        "occupancy": args.occupancy,
        "trusted_statistic": "min",
        **canary,
        **{f"{k}_end": v for k, v in canary_end.items()},
        "queries": res,
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()

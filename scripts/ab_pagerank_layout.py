#!/usr/bin/env python3
"""Interleaved A/B of graph_pagerank's edge-frame layout.

Drives the PRODUCTION core (operators/graph.py pagerank_frame) with only
its ``graph_layout`` parameter varying, so the repro always measures the
exact loop the registered query runs:

- checkpoint: localCheckpoint(eager=False)        (round-10 shape)
- cache:      repartition(src)+sortWithinPartitions+cache
- merge:      shuffle-merge-hinted deg join + cache (join output already
              partitioned AND sorted by src — no extra exchange/sort;
              the chosen production layout, BASELINE.md round-11)

Usage: python scripts/ab_pagerank_layout.py [--sf DIR] [--reps N] [--out F]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_spill_probe, run_canary  # noqa: E402

LAYOUTS = ("checkpoint", "cache", "merge")
# The committed evidence files (pr_layout_ab_sf01.json / _sf10.json) record
# the checkpoint layout under the key "old" (it was the round-10 production
# shape). Keep the OUTPUT key stable with that recorded evidence so a re-run
# diffs key-for-key; the pagerank_frame parameter value stays "checkpoint".
_OUT_KEY = {"checkpoint": "old"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="pr_layout_ab.json")
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.operators.graph import pagerank_frame
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    spark = get_spark(app_name="pr-layout-ab")
    mark, measure = make_spill_probe(spark)

    first = {
        lay: sorted(map(tuple, pagerank_frame(spark, args.sf, lay).collect()))
        for lay in LAYOUTS
    }  # warm-up doubles as a value-parity gate
    assert all(first[lay] == first["merge"] for lay in LAYOUTS), "variants diverge"
    spark.catalog.clearCache()

    out = {lay: {"reps": [], "spill_mem": 0, "spill_disk": 0} for lay in LAYOUTS}
    for _ in range(args.reps):
        for lay in LAYOUTS:
            spark.catalog.clearCache()
            marker = mark()
            t0 = time.perf_counter()
            pagerank_frame(spark, args.sf, lay).write.format("noop").mode(
                "overwrite"
            ).save()
            out[lay]["reps"].append(round(time.perf_counter() - t0, 3))
            sp = measure(marker)
            if sp is not None:
                out[lay]["spill_mem"] = max(out[lay]["spill_mem"], sp[0])
                out[lay]["spill_disk"] = max(out[lay]["spill_disk"], sp[1])
    canary_end = run_canary()
    spark.stop()

    doc = {
        "sf": args.sf,
        "trusted_statistic": "min",
        **canary,
        **{f"{k}_end": v for k, v in canary_end.items()},
        "layouts": {
            _OUT_KEY.get(lay, lay): {
                "min": min(d["reps"]),
                "reps": d["reps"],
                "spill": [d["spill_mem"], d["spill_disk"]],
            }
            for lay, d in out.items()
        },
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

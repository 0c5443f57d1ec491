#!/usr/bin/env python3
"""One-off interleaved A/B of graph_pagerank's edge-frame layout.

Variants (same iterations, same output):
- old:   localCheckpoint(eager=False)          (round-10 shape)
- cache: repartition(src)+sortWithinPartitions+cache
- merge: shuffle-merge-hinted deg join + cache (join output is already
         partitioned AND sorted by src — no extra exchange/sort)

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


def _pagerank(spark, sf_dir: str, layout: str):
    import pyspark.sql.functions as F

    from nrg_etl_airflow_spark_emr_spark.operators._util import t
    from nrg_etl_airflow_spark_emr_spark.operators.graph import PR_ITERS, PR_SCALE

    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    bi = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = bi.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    if layout == "old":
        graph = bi.join(deg, "src").localCheckpoint(eager=False)
    elif layout == "cache":
        graph = (
            bi.join(deg, "src")
            .repartition("src")
            .sortWithinPartitions("src")
            .cache()
        )
    elif layout == "merge":
        graph = bi.join(deg.hint("merge"), "src").cache()
    else:
        raise ValueError(layout)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(PR_SCALE).cast("long").alias("r")
    )
    for i in range(PR_ITERS):
        contrib = graph.join(ranks, graph.src == ranks.node).select(
            "dst", F.expr("r div outdeg").alias("c")
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(15 * PR_SCALE // 100) + F.expr("(85 * s) div 100"))
                .cast("long")
                .alias("r"),
            )
        )
        if i % 2 == 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("pagerank")).orderBy(
        F.col("pagerank").desc(), "node"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="pr_layout_ab.json")
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    spark = get_spark(app_name="pr-layout-ab")
    mark, measure = make_spill_probe(spark)
    layouts = ["old", "cache", "merge"]

    first = {
        lay: sorted(map(tuple, _pagerank(spark, args.sf, lay).collect()))
        for lay in layouts
    }  # warm-up doubles as a value-parity gate
    assert first["old"] == first["cache"] == first["merge"], "variants diverge"
    spark.catalog.clearCache()

    out = {lay: {"reps": [], "spill_mem": 0, "spill_disk": 0} for lay in layouts}
    for _ in range(args.reps):
        for lay in layouts:
            spark.catalog.clearCache()
            marker = mark()
            t0 = time.perf_counter()
            _pagerank(spark, args.sf, lay).write.format("noop").mode(
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
            lay: {
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

#!/usr/bin/env python3
"""Third-decade (sf100) spot probe of the scale-law-critical rows
(VERDICT r12 item 6).

sf10 validated the scale laws at the second decade; this harness runs
ONE more decade (1000 key-shifted sf0.1 copies — scripts/gen_sf1.py
with SPARK_GRAFT_SF_COPIES=1000) over the four rows whose laws carry
the 100 TB story, so the slope is either confirmed or the next regime
found:

- dedup_minhash_lsh            (banded candidates law, 4.3x/decade at sf10)
- text_line_dedup              (digest-shuffle law, 5.6x at sf10)
- qc_table_profile_approx      (relational HLL, O(cols * 1024) registers)
- two-level router             (build once at k1=k2=isqrt(n/occupancy);
                                the DAILY ops — search over the persisted
                                postings, one 1/10th-corpus increment —
                                are the rows the deployment pays)

Single rep per row (the sf10 protocol: regime classification reads the
decade-to-decade ramp measured back-to-back, not rep variance), spill
captured per step from the live AppStatusStore, numpy + in-JVM canaries
bracket the session (BASELINE.md round-12 split rule). If a step cannot
finish in this host's 128 GiB JVM, record WHICH step and why — that is
the finding, not a failure.

Usage:
  python scripts/probe_sf100.py [--sf DIR] [--occupancy C] [--out F]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import make_spill_probe, run_canary, run_spark_canary  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf100")
    ap.add_argument("--occupancy", type=int, default=100)
    ap.add_argument("--out", default="bench_regime_sf100.json")
    ap.add_argument("--rows", default="", help="comma filter: catalog names and/or 'twolevel'")
    ap.add_argument("--train-fraction", type=float, default=None,
                    help="two-level build trains on this hash-sample of the corpus")
    args = ap.parse_args()

    canary = run_canary()

    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.dedup import twolevel_pairs
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
    from nrg_etl_airflow_spark_emr_spark.session import get_spark
    from nrg_etl_airflow_spark_emr_spark.sources import ann_index as ai

    spark = get_spark(app_name="probe-sf100")
    canary.update(run_spark_canary(spark))
    mark, measure = make_spill_probe(spark)
    specs = all_specs()
    out: dict[str, dict] = {}
    work = tempfile.mkdtemp(prefix="sf100_probe_")

    def step(store: dict, name: str, fn) -> None:
        marker = mark()
        t0 = time.perf_counter()
        try:
            fn()
        except Exception as e:  # record the failing step — the finding
            store[name] = {"error": f"{type(e).__name__}: {e}"[:400]}
            raise
        wall = round(time.perf_counter() - t0, 3)
        sp = measure(marker) or (0, 0)
        store[name] = {"wall": wall, "spill": [int(sp[0]), int(sp[1])]}

    try:
        # Catalog rows, one rep each, bench.py's noop-write execution.
        only = {t for t in args.rows.split(",") if t}
        for q in ("dedup_minhash_lsh", "text_line_dedup", "qc_table_profile_approx"):
            if only and q not in only:
                continue
            row = out[q] = {}
            spark.catalog.clearCache()
            step(
                row,
                "wall",
                lambda q=q: specs[q]
                .builder(spark, args.sf)
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
            spark.catalog.clearCache()

        # Two-level router: build once at the deployment sizing, then the
        # daily ops — search and a 1/10th-corpus increment.
        if only and "twolevel" not in only:
            raise SystemExit(0)
        v = _vectors(spark, args.sf)
        base = v.filter(F.col("vec_id") % 10 != 0).cache()
        inc = v.filter(F.col("vec_id") % 10 == 0).select("vec_id", "fe", "nrm").cache()
        n = v.count()
        n_base = base.count()
        inc.count()
        k = max(2, math.isqrt(max(n_base // args.occupancy, 4)))
        tl = out["twolevel"] = {
            "n_vectors": n,
            "k_per_level": k,
            "train_fraction": args.train_fraction,
        }
        path = os.path.join(work, "tl")
        step(
            tl,
            "build",
            lambda: ai.write_twolevel_index(
                spark, args.sf, path, k, k, 2, vectors=base,
                train_fraction=args.train_fraction,
            ),
        )
        step(
            tl,
            "search",
            lambda: twolevel_pairs(ai.read_twolevel_index(spark, path)[2])
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
        step(tl, "increment", lambda: ai.upsert_twolevel_postings(spark, path, inc))
        _c1, _c2, tp = ai.read_twolevel_index(spark, path)
        tl["rows_exact"] = tp.count() == n
        spark.catalog.clearCache()
    finally:
        canary.update({f"{k}_end": v for k, v in run_spark_canary(spark).items()})
        spark.stop()
        canary.update({f"{k}_end": v for k, v in run_canary().items()})
        shutil.rmtree(work, ignore_errors=True)
        doc = {"sf": args.sf, "occupancy": args.occupancy, **canary, "results": out}
        with open(args.out, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(json.dumps(doc))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Scale probe for the index MAINTENANCE cycle (VERDICT r11 item 3).

The 40-row bench tier measures QUERIES; the build/upsert/stream-ingest/
compact/vacuum walls of the persisted indexes had never been measured
past bench scale. This harness runs the full lifecycle for each index
kind (IVF, PQ, two-level router) at two scale factors in ONE session
(host drift hits both equally), timing every step and capturing its
shuffle-spill bytes with bench.py's probes:

- corpus split: 80% base build, 10% batch upsert, 10% streaming ingest
  (staged to parquet untimed; the timed step is the availableNow drive);
- all three kinds run the FULL lifecycle — build, upsert, streaming
  ingest, compact, vacuum (the two-level router gained its stream and
  compaction surface in round 12); the router is sized at the
  deployment law k1 = k2 = isqrt(n / occupancy) like
  scripts/probe_twolevel.py, plus a search-only timing over the
  persisted postings;
- index directory bytes recorded per kind after vacuum (the PQ
  compression claim is checkable from the same artifact);
- canary brackets: numpy host pair at process start/end, in-JVM spark
  canary at session start/end (BASELINE.md round-12 split rule).

Single rep per step: lifecycle steps mutate index state, so repetition
would measure a different operation; regime classification reads the
sf-to-sf ramp of walls and spill measured back-to-back instead.

Usage:
  python scripts/probe_maintenance.py [--a DIR] [--b DIR]
      [--occupancy C] [--out bench_maintenance.json]
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


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default=".localdata/sf1")
    ap.add_argument("--b", default=".localdata/sf10")
    ap.add_argument("--occupancy", type=int, default=100)
    ap.add_argument("--out", default="bench_maintenance.json")
    args = ap.parse_args()

    canary = run_canary()

    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.session import get_spark
    from nrg_etl_airflow_spark_emr_spark.sources import ann_index as ai

    spark = get_spark(app_name="probe-maintenance")
    canary.update(run_spark_canary(spark))
    mark, measure = make_spill_probe(spark)
    sfs = {"a": args.a, "b": args.b}
    work = tempfile.mkdtemp(prefix="maint_probe_")
    out: dict[str, dict] = {}

    def step(store: dict, name: str, fn) -> None:
        marker = mark()
        t0 = time.perf_counter()
        fn()
        wall = round(time.perf_counter() - t0, 3)
        sp = measure(marker) or (0, 0)
        store[name] = {"wall": wall, "spill": [int(sp[0]), int(sp[1])]}

    try:
        for key, sfd in sfs.items():
            v = _vectors(spark, sfd)
            base = v.filter(F.col("vec_id") % 10 < 8).cache()
            up = (
                v.filter(F.col("vec_id") % 10 == 8)
                .select("vec_id", "fe", "nrm")
                .cache()
            )
            stream_slice = v.filter(F.col("vec_id") % 10 == 9).select(
                "vec_id", "fe", "nrm"
            )
            n = v.count()
            n_base = base.count()
            n_up = up.count()
            stage = os.path.join(work, f"stage_{key}")
            stream_slice.write.mode("overwrite").parquet(stage)
            schema = spark.read.parquet(stage).schema
            k = max(2, math.isqrt(max(n // args.occupancy, 4)))
            out[key] = {"sf_dir": sfd, "n_vectors": n, "k_per_level": k}

            ivf = out[key]["ivf"] = {}
            path = os.path.join(work, f"ivf_{key}")
            step(ivf, "build", lambda: ai.write_ivf_index(spark, sfd, path, vectors=base))
            step(ivf, "upsert", lambda: ai.upsert_ivf_postings(spark, path, up))
            step(
                ivf,
                "stream_ingest",
                lambda: ai.stream_ingest_ivf(
                    spark.readStream.schema(schema).parquet(stage),
                    path,
                    os.path.join(work, f"ck_ivf_{key}"),
                ).awaitTermination(),
            )
            step(ivf, "compact", lambda: ai.compact_ivf_index(spark, path))
            step(ivf, "vacuum", lambda: ai.vacuum_index(path))
            _c, p = ai.read_ivf_index(spark, path)
            ivf["rows_exact"] = p.count() == n
            ivf["index_bytes"] = _dir_bytes(path)

            pq = out[key]["pq"] = {}
            path = os.path.join(work, f"pq_{key}")
            step(pq, "build", lambda: ai.write_pq_index(spark, sfd, path, vectors=base))
            step(pq, "upsert", lambda: ai.upsert_pq_codes(spark, path, up))
            step(
                pq,
                "stream_ingest",
                lambda: ai.stream_ingest_pq(
                    spark.readStream.schema(schema).parquet(stage),
                    path,
                    os.path.join(work, f"ck_pq_{key}"),
                ).awaitTermination(),
            )
            step(pq, "compact", lambda: ai.compact_pq_index(spark, path))
            step(pq, "vacuum", lambda: ai.vacuum_index(path))
            _cb, codes, _nm = ai.read_pq_index(spark, path)
            pq["rows_exact"] = codes.select("vec_id").distinct().count() == n
            pq["index_bytes"] = _dir_bytes(path)

            tl = out[key]["twolevel"] = {}
            path = os.path.join(work, f"tl_{key}")
            step(
                tl,
                "build",
                lambda: ai.write_twolevel_index(
                    spark, sfd, path, k, k, 2, vectors=base
                ),
            )
            step(tl, "upsert", lambda: ai.upsert_twolevel_postings(spark, path, up))
            step(
                tl,
                "stream_ingest",
                lambda: ai.stream_ingest_twolevel(
                    spark.readStream.schema(schema).parquet(stage),
                    path,
                    os.path.join(work, f"ck_tl_{key}"),
                ).awaitTermination(),
            )
            step(tl, "compact", lambda: ai.compact_twolevel_index(spark, path))
            step(tl, "vacuum", lambda: ai.vacuum_index(path))
            # Search-only wall over the persisted postings — the
            # trainer-amortized path (inline twolevel pays build+search
            # every run; the artifact pays build once, then this).
            from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
                twolevel_pairs,
            )

            step(
                tl,
                "search",
                lambda: twolevel_pairs(ai.read_twolevel_index(spark, path)[2])
                .write.format("noop")
                .mode("overwrite")
                .save(),
            )
            _c1, _c2, tp = ai.read_twolevel_index(spark, path)
            tl["rows_exact"] = tp.count() == n
            tl["index_bytes"] = _dir_bytes(path)

            # MinHash dedup index (documents table: history slice =
            # doc_id % INCR_MOD != 0, the increment's signatures become
            # the upsert batch — the daily verdicts-to-history step).
            from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
                INCR_MOD,
                _signatures,
            )

            mh = out[key]["minhash"] = {}
            path = os.path.join(work, f"mh_{key}")
            step(mh, "build", lambda: ai.write_minhash_index(spark, sfd, path))
            incr = (
                _signatures(spark, sfd)
                .filter(F.col("doc_id") % INCR_MOD == 0)
                .cache()
            )
            n_incr = incr.count()
            step(mh, "upsert", lambda: ai.upsert_minhash_index(spark, path, incr))
            step(mh, "compact", lambda: ai.compact_minhash_index(spark, path))
            step(mh, "vacuum", lambda: ai.vacuum_index(path))
            sigs, _bands = ai.read_minhash_index(spark, path)
            n_docs = (
                spark.read.parquet(os.path.join(sfd, "documents.parquet")).count()
            )
            # Docs with zero shingles have no signature; compare against
            # the signature universe instead of the raw doc count.
            n_sig_all = _signatures(spark, sfd).count()
            mh["rows_exact"] = sigs.count() == n_sig_all
            mh["n_docs"] = n_docs
            mh["index_bytes"] = _dir_bytes(path)

            spark.catalog.clearCache()
    finally:
        canary.update(
            {f"{k}_end": v for k, v in run_spark_canary(spark).items()}
        )
        spark.stop()
        canary.update({f"{k}_end": v for k, v in run_canary().items()})
        shutil.rmtree(work, ignore_errors=True)

    doc = {"a": args.a, "b": args.b, "occupancy": args.occupancy, **canary, "results": out}
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()

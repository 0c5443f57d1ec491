#!/usr/bin/env python3
"""Per-query stage-level profile: run one catalog query under the noop sink
and print every stage newer than the start marker with duration, task count,
shuffle read/write bytes and spill — the guide §1 'which operator owns the
time' measurement without the UI.

Usage: python scripts/profile_query.py <query> [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
from nrg_etl_airflow_spark_emr_spark.session import get_spark


def _stages(sc):
    jvm = sc._jvm
    store = sc._jsc.sc().statusStore()
    return store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        sc._gateway.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"profile-{name}")
    sc = spark.sparkContext
    spec = all_specs()[name]

    # warm-up (JIT, parquet footers)
    spark.catalog.clearCache()
    spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    for rep in range(reps):
        spark.catalog.clearCache()
        seq = _stages(sc)
        marker = max(
            (seq.apply(i).stageId() for i in range(seq.size())), default=-1
        )
        t0 = time.perf_counter()
        spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        seq = _stages(sc)
        rows = []
        for i in range(seq.size()):
            s = seq.apply(i)
            if s.stageId() <= marker:
                continue
            try:
                sub = s.submissionTime().get()
                done = s.completionTime().get()
                dur = (done.getTime() - sub.getTime()) / 1000.0
            except Exception:
                dur = -1.0
            rows.append(
                (
                    s.stageId(),
                    dur,
                    s.numCompleteTasks(),
                    s.shuffleReadBytes(),
                    s.shuffleWriteBytes(),
                    s.memoryBytesSpilled(),
                    s.diskBytesSpilled(),
                    str(s.description().toString() if hasattr(s, "description") else ""),
                    str(s.name())[:90],
                )
            )
        rows.sort(key=lambda r: -r[1])
        print(f"\n=== rep {rep}: wall {wall:.3f}s, {len(rows)} stages ===")
        print(f"{'sid':>5} {'dur_s':>7} {'tasks':>5} {'shRead':>10} {'shWrite':>10} {'spillM':>8} {'spillD':>8}  name")
        for r in rows[:25]:
            print(
                f"{r[0]:>5} {r[1]:>7.3f} {r[2]:>5} {r[3]:>10} {r[4]:>10} {r[5]:>8} {r[6]:>8}  {r[8]}"
            )
        tot = sum(r[1] for r in rows if r[1] > 0)
        print(f"stage-duration sum {tot:.3f}s (overlapping; wall {wall:.3f}s)")
    spark.stop()


if __name__ == "__main__":
    main()

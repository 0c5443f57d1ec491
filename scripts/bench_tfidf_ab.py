#!/usr/bin/env python3
"""Interleaved same-session A/B: adaptive pair-budget df-cap vs the old
fixed df*16<=n cut for text_tfidf_topk_capped, plus the text_tfidf_pairs
anchor — the sf1 heavy-shuffle text tier whose cross-session timings the
round-5 meta-finding declared uninterpretable (61-418s swings under
quiet canaries; only same-session interleaving carries signal there).

Both variants are built IN ONE TREE from the shared cached weight frame:
the adaptive variant is the live catalog builder; the fixed variant
reconstructs the pre-round-7 rare filter (df * 16 <= n_docs) around the
same shortlist/re-rank stages. Candidate-pair volume (the pre-aggregation
row count of the rare-term self-join — the quantity the budget bounds) is
counted per variant in an untimed pass, so the wall-time delta can be
read against the pruning delta.

Usage:
  python scripts/bench_tfidf_ab.py [--sf DIR] [--reps N] [--skip-pairs]

Results land in BASELINE.md ("sf1 text-tier interleaved anchors").
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import run_canary  # noqa: E402


def build_fixed_cap(spark, sf_dir):
    """The pre-round-7 fixed-cut variant: identical shortlist + exact
    re-rank stages, rare filter = df * 16 <= n_docs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from nrg_etl_airflow_spark_emr_spark.operators import text as X

    w, norms, n_docs, dot_sum = X._tfidf_weights(spark, sf_dir)
    rare = w.filter(F.col("df") * 16 <= F.lit(n_docs))
    return _cap_tail(F, Window, X, w, norms, dot_sum, rare)


def _cap_tail(F, Window, X, w, norms, dot_sum, rare):
    ra = rare.select(F.col("doc_id").alias("doc_a"), "word", F.col("w").alias("wa"))
    rb = rare.select(F.col("doc_id").alias("doc_b"), "word", F.col("w").alias("wb"))
    cdots = (
        ra.join(rb, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(dot_sum("wa", "wb").alias("cdot"))
    )
    aw = Window.partitionBy("doc_a").orderBy(F.col("cdot").desc(), F.col("doc_b"))
    shortlist = (
        cdots.select("doc_a", "doc_b", F.row_number().over(aw).alias("arn"))
        .filter(F.col("arn") <= X.TFIDF_SHORTLIST)
        .select("doc_a", "doc_b")
    )
    wa_full = w.select(F.col("doc_id").alias("doc_a"), "word", F.col("w").alias("wa"))
    wb_full = w.select(F.col("doc_id").alias("doc_b"), "word", F.col("w").alias("wb"))
    dots = (
        shortlist.join(wa_full, "doc_a")
        .join(wb_full, ["doc_b", "word"])
        .groupBy("doc_a", "doc_b")
        .agg(dot_sum("wa", "wb").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cosine = F.col("dot").cast("double") / (
        F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))
    )
    win = Window.partitionBy("doc_a").orderBy(F.col("cosine").desc(), F.col("doc_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cosine.alias("cosine"))
        .select("doc_a", "doc_b", "cosine", F.row_number().over(win).alias("rn"))
        .filter(F.col("rn") <= X.TFIDF_TOPK)
    )


def candidate_pairs(spark, sf_dir, fixed: bool) -> int:
    """Pre-aggregation row count of the rare-term self-join (the shuffle
    volume the df threshold controls)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from nrg_etl_airflow_spark_emr_spark.operators import text as X

    w, _, n_docs, _ = X._tfidf_weights(spark, sf_dir)
    if fixed:
        rare = w.filter(F.col("df") * 16 <= F.lit(n_docs))
    else:
        bands = (
            w.select("word", "df").distinct().groupBy("df")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        cum = bands.select(
            "df",
            F.sum(F.expr("df * (df - 1) div 2") * F.col("cnt"))
            .over(Window.orderBy("df")).alias("cpairs"),
        )
        budget = F.lit(int(n_docs) * X.TFIDF_PAIR_BUDGET)
        thr = cum.agg(
            F.coalesce(
                F.max(F.when(F.col("cpairs") <= budget, F.col("df"))), F.min("df")
            ).alias("t")
        )
        rare = w.join(F.broadcast(thr), F.col("df") <= F.col("t")).drop("t")
    ra = rare.select(F.col("doc_id").alias("doc_a"), "word")
    rb = rare.select(F.col("doc_id").alias("doc_b"), "word")
    return (
        ra.join(rb, "word").filter(F.col("doc_a") < F.col("doc_b")).count()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=".localdata/sf1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-pairs", action="store_true",
                    help="skip the text_tfidf_pairs anchor (exact op)")
    args = ap.parse_args()

    canary = run_canary()

    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    specs = all_specs()
    spark = get_spark(app_name="bench-tfidf-ab")

    variants = {
        "capped_adaptive": lambda: specs["text_tfidf_topk_capped"].builder(
            spark, args.sf
        ),
        "capped_fixed16": lambda: build_fixed_cap(spark, args.sf),
    }
    if not args.skip_pairs:
        variants["tfidf_pairs_exact"] = lambda: specs["text_tfidf_pairs"].builder(
            spark, args.sf
        )

    # Untimed candidate-volume audit (the pruning the budget buys).
    cand = {
        "capped_adaptive": candidate_pairs(spark, args.sf, fixed=False),
        "capped_fixed16": candidate_pairs(spark, args.sf, fixed=True),
    }
    spark.catalog.clearCache()

    for name, build in variants.items():  # warm-up
        spark.catalog.clearCache()
        build().write.format("noop").mode("overwrite").save()

    reps: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(args.reps):
        for name, build in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            reps[name].append(round(time.perf_counter() - t0, 3))
    spark.stop()

    print(
        json.dumps(
            {
                "sf_dir": args.sf,
                "candidate_pairs": cand,
                "queries": {
                    n: {
                        "min": min(r),
                        "median": statistics.median(r),
                        "reps": r,
                    }
                    for n, r in reps.items()
                },
                "trusted_statistic": "min",
                **canary,
                **{f"{k}_end": v for k, v in run_canary().items()},
            }
        )
    )


if __name__ == "__main__":
    main()

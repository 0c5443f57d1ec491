#!/usr/bin/env python3
"""Measure the dedup_jaccard_prefix vs dedup_jaccard_pairs crossover on a
Zipfian-vocabulary corpus (the claim in operators/dedup.py's prefix
docstring: the prefix filter loses at fixture scale but wins when the
posting-pair volume sum(df^2) is dominated by a heavy head).

The fixture corpus (~50-word near-uniform vocabulary) has no Zipf head, so
the prefix filter's df-ordering overhead buys nothing there. This script
generates a deterministic heavy-tailed corpus — Zipf(s) over a larger
vocabulary, so a handful of head words appear in nearly every document
while the tail is rare — writes it as a documents.parquet slice, and times
both catalog builders bench-style (min of N after an untimed warm-up,
clearCache between reps). Run:

    python scripts/bench_zipf.py [--docs 5000] [--s 1.2] [--out /tmp/zipfcorpus]

Results are recorded in BASELINE.md ("Zipfian crossover" section).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import functions as F

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_corpus(out_dir: str, n_docs: int, s: float, seed: int = 7) -> str:
    """Write a Zipf(s) corpus: n_docs docs, ~120 tokens each, 10% of docs
    followed by a 90%-overlap mutated near-copy (so the join produces
    real pairs, like the fixture's seeded near-dups)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:05d}" for i in range(5000)])
    # Zipf ranks: p(k) ∝ 1/k^s over the vocab, normalized.
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = ranks**-s
    p /= p.sum()
    texts: list[str] = []
    doc_ids: list[int] = []
    i = 0
    while len(texts) < n_docs:
        n_tok = int(rng.integers(80, 160))
        toks = vocab[rng.choice(len(vocab), size=n_tok, p=p)]
        texts.append(" ".join(toks))
        doc_ids.append(i)
        i += 1
        if len(texts) < n_docs and rng.random() < 0.1:
            # Near-dup: resample 10% of positions.
            mut = toks.copy()
            kill = rng.random(n_tok) < 0.1
            mut[kill] = vocab[rng.choice(len(vocab), size=int(kill.sum()), p=p)]
            texts.append(" ".join(mut))
            doc_ids.append(i)
            i += 1
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["zipf"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=5000)
    ap.add_argument("--s", type=float, default=1.2)
    ap.add_argument("--out", default="/tmp/zipfcorpus")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from nrg_etl_airflow_spark_emr_spark.plans.catalog import spec
    from nrg_etl_airflow_spark_emr_spark.session import get_spark

    sf_dir = make_corpus(args.out, args.docs, args.s)
    spark = get_spark(app_name="zipf-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    names = ("dedup_jaccard_pairs", "dedup_jaccard_prefix")
    rows = {}
    for name in names:  # untimed warm-up (JIT)
        spark.catalog.clearCache()
        spec(name).builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    for name in names:
        best = float("inf")
        n_out = 0
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = spec(name).builder(spark, sf_dir)
            n_out = df.count()
            best = min(best, time.perf_counter() - t0)
        # Losslessness is a SET claim, not a count claim: hash the full
        # sorted (d1, d2) pair set so one dropped true pair plus one
        # spurious pair cannot cancel out.
        pair_hash = (
            spec(name)
            .builder(spark, sf_dir)
            .select(F.concat_ws(":", "d1", "d2").alias("p"))
            .agg(
                F.md5(F.concat_ws(",", F.array_sort(F.collect_list("p")))).alias("h")
            )
            .collect()[0]
            .h
        )
        rows[name] = (best, n_out, pair_hash)
    assert rows[names[0]][1:] == rows[names[1]][1:], (
        "prefix filter must be lossless (same pair SET, not just count): "
        + repr(rows)
    )
    print(
        f"zipf s={args.s} docs={args.docs}: "
        f"pairs {rows[names[0]][0]:.2f}s  prefix {rows[names[1]][0]:.2f}s  "
        f"(both {rows[names[0]][1]} output pairs)"
    )


if __name__ == "__main__":
    main()

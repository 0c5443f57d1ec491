#!/usr/bin/env python3
"""Generate an sf1 fixture set (10x sf0.1) for the scale-ramp benchmark.

Usage: python scripts/gen_sf1.py  [dst_dir]      (default .localdata/sf1)

The driver only ships sf0.001/0.01/0.1; the sf0.1 bench cannot separate
fixture-overhead floors (per-job scheduling, JIT) from real scaling
behavior, so this script synthesizes sf1 by KEY-SHIFTED REPLICATION of
sf0.1 — the TPC-H scaling model, where a larger scale factor means more
keys (customers, orders, users, documents) over the same time window and
dimension tables stay fixed:

- region/nation: copied verbatim (fixed dims at every TPC-H sf).
- customer/supplier/part/orders/lineitem: 10 copies with every entity key
  shifted by copy * (max_key + 1); foreign keys shift by the SAME modulus
  as their parent, so join fan-outs and per-key group sizes are exactly
  those of sf0.1 — 10x more groups, not 10x hotter keys.
- events: event_id/user_id shifted (10x users, same per-user activity —
  window/sessionize partitions scale in count, not in size).
- documents: doc_id shifted AND every whitespace token in copy i>0 gets a
  per-copy suffix (regexp `$1q{i}`): plain replication would make every
  document 9 exact twins, so the dedup/text tier would measure an
  artificial duplicate blow-up (LSH buckets of size 10, quadratic pair
  explosion) instead of corpus growth. Suffixing keeps each copy's
  internal similarity structure bit-identical to sf0.1 while making
  cross-copy vocabularies disjoint — Heaps-law-ish 10x vocabulary, the
  realistic shape for a 10x corpus. n_chars is recomputed to keep the QC
  invariant (length(text) == n_chars). Copy 0 is unchanged, so sf0.1 is
  an exact subset.
- embeddings: vec_id shifted AND copy i's vectors circularly rotated by i
  positions (norms and within-copy pairwise distances are exactly
  preserved; cross-copy vectors decorrelate). Plain copies made every
  vector 9 exact twins, which inflated dedup_embedding_ivf's within-cell
  pair counts into a measured 17x at sf1 — a duplicate blow-up artifact,
  not scaling. The 5 query vectors (vec_id < 5) stay in copy 0 unrotated.

Output layout matches the driver fixtures ({dst}/{table}.parquet), except
each ".parquet" is a directory of part files (spark.read.parquet handles
both; the sf1 set is bench-only — the DuckDB oracle gate stays at sf0.01).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from nrg_etl_airflow_spark_emr_spark.session import get_spark  # noqa: E402
from nrg_etl_airflow_spark_emr_spark.sources.tables import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF1_SRC", "/root/testdata/sf0.1")
# 10 -> sf1; 100 -> sf10 (round-11 regime probe). Keys shift per copy,
# so any copy count preserves the sf0.1 per-key group sizes.
COPIES = int(os.environ.get("SPARK_GRAFT_SF_COPIES", "10"))
# Optional resume filter: comma-separated table names to (re)generate.
# Empty = all tables. Lets a killed long run (sf100's 600M-row lineitem)
# resume without redoing finished tables.
ONLY = {t for t in os.environ.get("SPARK_GRAFT_TABLES", "").split(",") if t}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(repo, ".localdata", "sf1")
    spark = get_spark(app_name="gen-sf1")

    def modulus(name: str, col: str) -> int:
        return load_table(spark, SRC, name).agg(F.max(col)).collect()[0][0] + 1

    mods = {
        "c_custkey": modulus("customer", "c_custkey"),
        "s_suppkey": modulus("supplier", "s_suppkey"),
        "p_partkey": modulus("part", "p_partkey"),
        "o_orderkey": modulus("orders", "o_orderkey"),
        "event_id": modulus("events", "event_id"),
        "user_id": modulus("events", "user_id"),
        "doc_id": modulus("documents", "doc_id"),
        "vec_id": modulus("embeddings", "vec_id"),
    }
    # Foreign keys shift by their PARENT's modulus.
    shifts: dict[str, dict[str, int]] = {
        "customer": {"c_custkey": mods["c_custkey"]},
        "supplier": {"s_suppkey": mods["s_suppkey"]},
        "part": {"p_partkey": mods["p_partkey"]},
        "orders": {"o_orderkey": mods["o_orderkey"], "o_custkey": mods["c_custkey"]},
        "lineitem": {
            "l_orderkey": mods["o_orderkey"],
            "l_partkey": mods["p_partkey"],
            "l_suppkey": mods["s_suppkey"],
        },
        "events": {"event_id": mods["event_id"], "user_id": mods["user_id"]},
        "documents": {"doc_id": mods["doc_id"]},
        "embeddings": {"vec_id": mods["vec_id"]},
    }

    def write(name: str, df: DataFrame) -> None:
        path = os.path.join(dst, f"{name}.parquet")
        df.repartition(32).write.mode("overwrite").parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path}")

    for name in ("region", "nation"):
        if ONLY and name not in ONLY:
            continue
        write(name, load_table(spark, SRC, name))

    for name, cols in shifts.items():
        if ONLY and name not in ONLY:
            continue
        base = load_table(spark, SRC, name)
        dim = (
            len(base.select("embedding").first()[0]) if name == "embeddings" else 0
        )
        # Pattern bits are indexed j % n_bits over j < dim, so only
        # min(dim, 10) bits of the block number ever reach a sign:
        # blocks differing in higher bits would collide (ADVICE r13 —
        # the flat 1023*dim bound silently resurrected duplicate twins
        # for dim < 10). Budget = (2^n_bits - 1) * dim distinct
        # (rotation, pattern) transforms; for the dim=64 fixture this
        # is the same 1023*dim as before, bit-identical regeneration.
        n_bits = min(dim, 10) if dim else 0
        budget = (2**n_bits - 1) * dim
        if name == "embeddings" and COPIES - 1 >= budget:
            # Refuse past the budget rather than silently resurrect the
            # duplicate-twin artifact (BASELINE.md sf1 Finding 1).
            sys.exit(f"COPIES={COPIES} exceeds the {budget} transform budget")
        parts = []
        for i in range(COPIES):
            d = base
            for c, m in cols.items():
                d = d.withColumn(c, (F.col(c) + F.lit(i * m)).cast(dict(base.dtypes)[c]))
            if name == "documents" and i > 0:
                d = d.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"$1q{i}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            if name == "embeddings" and i > 0:
                # Copy i's orthogonal transform: circular rotation by
                # rot = i % dim composed with the per-BLOCK elementwise
                # sign pattern for block b = i // dim. Elementwise sign
                # flips are exactly orthogonal (<s.x, s.y> = <x, y>
                # since s_j^2 = 1), so norms and within-copy dots are
                # bit-preserved, same as rotation. Block 0 is identity
                # and block 1 global negation (the round-11 scheme —
                # sf1/sf10 fixtures regenerate bit-identically); blocks
                # >= 2 negate position j iff bit (j mod 10) of b is set.
                # Distinctness: copies share a transform only with the
                # same (rot, block), i.e. the same i — no cross-copy
                # exact twins up to 1023*dim copies (round 13, for the
                # sf100 third-decade probe).
                rot = i % dim
                b = i // dim
                rolled = (
                    F.concat(
                        F.slice("embedding", rot + 1, dim - rot),
                        F.slice("embedding", 1, rot),
                    )
                    if rot
                    else F.col("embedding")
                )
                if b == 1:
                    rolled = F.transform(rolled, lambda x: -x)
                elif b >= 2:
                    # j % n_bits (== j % 10 at the dim=64 fixture — the
                    # sf1/sf10/sf100 fixtures regenerate bit-identically)
                    # so every usable bit of b reaches a position even
                    # when dim < 10, matching the budget guard above.
                    signs = [1 - 2 * ((b >> (j % n_bits)) & 1) for j in range(dim)]
                    rolled = F.zip_with(
                        rolled,
                        F.array(*[F.lit(float(sg)) for sg in signs]),
                        lambda x, sg: x * sg,
                    )
                d = d.withColumn("embedding", rolled)
            parts.append(d)
        # Chunked union + append writes: a single COPIES-way union is one
        # Catalyst plan with COPIES branches — fine at 10-100, minutes of
        # analysis at 1000. Writing in <=100-branch chunks keeps plan
        # size bounded at any copy count (first chunk overwrites, the
        # rest append — same final layout).
        path = os.path.join(dst, f"{name}.parquet")
        for ci in range(0, len(parts), 100):
            chunk = parts[ci]
            for p in parts[ci + 1 : ci + 100]:
                chunk = chunk.unionAll(p)
            mode = "overwrite" if ci == 0 else "append"
            chunk.repartition(32).write.mode(mode).parquet(path)
        print(f"{name}: {spark.read.parquet(path).count()} rows -> {path}")

    spark.stop()


if __name__ == "__main__":
    main()

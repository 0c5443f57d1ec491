"""Skew-mitigation operators (SURVEY.md §7 'optimize for scale').

Two standard weapons for hot keys at 100 TB, both semantics-preserving
(oracle-gated against the plain formulation):

- **Two-phase salted aggregation** — append a random-free deterministic
  salt (hash-mod) to the group key, partially aggregate (key, salt), then
  re-aggregate by key. The first exchange spreads a hot key over SALT_N
  reducers; the second moves only SALT_N rows per key. For algebraic
  aggregates (sum/count/min/max) the rewrite is exact.
- **Salted join** — replicate the *small* side SALT_N times (explode a
  salt array), salt the big side's key deterministically, equi-join on
  (key, salt). Each hot key's rows land on SALT_N partitions instead of
  one. AQE's skew-join split (spark.sql.adaptive.skewJoin, on in
  session.py) does this adaptively at runtime; the explicit form is for
  when the planner must be forced (e.g. a skewed aggregation feeding a
  join, or non-AQE engines).

Salting uses hash(orderkey) mod SALT_N — deterministic, so the oracle is
just the unsalted query (results are provably identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ._util import sql_dsum, t

SALT_N = 8


@register(
    "skew_salted_agg",
    oracle=f"""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice", "total_price")}
    FROM lineitem
    GROUP BY l_suppkey
    """,
    tags=("agg", "skew"),
    doc="Two-phase salted aggregation by l_suppkey: partial agg on "
    f"(key, hash-mod-{SALT_N} salt), final agg on key. Exact for "
    "algebraic aggregates; the oracle is the plain single-phase groupBy. "
    "At scale this caps any one reducer's share of a hot key at 1/salt.",
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT_N))
    )
    partial = salted.groupBy("l_suppkey", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.floor(F.col("l_extendedprice") * 10000)).alias("pfp"),
    )
    return partial.groupBy("l_suppkey").agg(
        F.sum("pn").alias("n_items"),
        (F.sum("pfp").cast("double") / 10000).alias("total_price"),
    )


@register(
    "skew_salted_join",
    bench=True,
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority, COUNT(*) AS n_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderpriority
    """,
    tags=("join", "skew"),
    doc=f"Salted equi-join: lineitem's join key salted hash-mod-{SALT_N}, "
    "orders replicated across the salt domain (explode), join on "
    "(key, salt). Result provably equals the plain join (oracle). The "
    "replicated side grows ×salt — use when one side is dimension-sized "
    "or AQE skew split is unavailable; otherwise prefer AQE.",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.pmod(F.hash("l_orderkey", "l_linenumber"), F.lit(SALT_N)).alias("salt"),
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    replicated = orders.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT_N)]))
    )
    joined = li.join(
        replicated,
        (F.col("l_orderkey") == F.col("o_orderkey")) & (li["salt"] == replicated["salt"]),
    )
    return joined.groupBy("o_orderkey", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items")
    )


SKEW_TOPK = 10


@register(
    "qc_key_skew_audit",
    oracle=f"""
    WITH per_key AS (
        SELECT l_suppkey, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_suppkey
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
               COUNT(*) AS n_keys
        FROM per_key
    ), ranked AS (
        SELECT l_suppkey, cnt,
               CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_suppkey)
                    AS INTEGER) AS rank
        FROM per_key
    )
    SELECT rank, l_suppkey, cnt, n_keys, total_rows,
           CAST(cnt AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
           CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)
               / CAST(total_rows AS DOUBLE) AS hot_ratio
    FROM ranked CROSS JOIN tot
    WHERE rank <= {SKEW_TOPK}
    """,
    tags=("qc", "skew", "topk"),
    doc=f"Join-key skew audit — the diagnostic that DECIDES between the "
    "plain, salted, and AQE-split formulations before a 100 TB join: "
    f"the top-{SKEW_TOPK} heaviest l_suppkey values with each key's row "
    "count, corpus share, and hot_ratio (count / mean-count — 1.0 means "
    "perfectly uniform; salting pays off roughly when hot_ratio x "
    "mean-rows-per-key exceeds one task's worth of rows). One per-key "
    "hash aggregate (map-side partials) is the only data-sized shuffle; "
    "the totals are a second aggregate OVER THE KEY FRAME (never the "
    "corpus) broadcast onto the top-k, and the top-k itself is "
    "TakeOrdered over per-key counts. Shares are exact-integer ratios "
    "through one fixed IEEE expression.",
)
def qc_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    per_key = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = per_key.agg(
        F.sum("cnt").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = per_key.orderBy(F.col("cnt").desc(), "l_suppkey").limit(SKEW_TOPK)
    rw = Window.orderBy(F.col("cnt").desc(), "l_suppkey")
    ranked = top.select(
        F.row_number().over(rw).alias("rank"), "l_suppkey", "cnt"
    )
    cd, kd, td = (
        F.col("cnt").cast("double"),
        F.col("n_keys").cast("double"),
        F.col("total_rows").cast("double"),
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rank",
        "l_suppkey",
        "cnt",
        "n_keys",
        "total_rows",
        (cd / td).alias("share"),
        (cd * kd / td).alias("hot_ratio"),
    )

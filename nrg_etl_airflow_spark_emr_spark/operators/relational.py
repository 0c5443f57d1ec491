"""Core relational operators (SURVEY.md §2.1-2.4, §2.6): scans,
projections, filters, joins, aggregations, pivot, sort/limit.

Each reference operator (cited per-spec) is re-expressed as idiomatic
DataFrame code with a DuckDB oracle. The TPC-H-ish fixture tables stand in
for the reference's EIA/NOAA inputs (which are not committed in the
reference repo — SURVEY.md §6); the reference-shaped pipeline itself lives
in ``pipelines/nrg.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ._util import davg, dsum, sql_davg, sql_dsum, t

# ---------------------------------------------------------------------------
# Flagship + TPC-H-style multi-operator queries (SURVEY.md §7 M0)
# ---------------------------------------------------------------------------


@register(
    "flagship_revenue_by_month",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           o_orderpriority,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01'
    GROUP BY 1, 2, 3
    """,
    tags=("join", "agg", "flagship"),
    bench=True,
    doc="scan→filter→join→group-agg: revenue by order month & priority "
    "(SURVEY.md §7 M0 flagship; exercises S4, P2, J-inner, A-sum).",
)
def flagship_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") >= "1995-06-01")
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "o_orderpriority",
        )
        .agg(dsum(revenue, "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
    bench=True,
    doc="TPC-H Q1-shaped pricing summary: wide aggregate over the largest "
    "table; partial (map-side) aggregation makes this shuffle-light at scale.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-02")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        davg("l_discount", "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk", "tpch"),
    bench=True,
    doc="TPC-H Q3-shaped: selective dim filter → fact join → top-10 by "
    "revenue. Catalyst broadcasts the filtered customer side; the final "
    "sort+limit becomes TakeOrderedAndProject (no full sort).",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-01-01")
    lineitem = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-01-01")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        F.broadcast(customer)
        .join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY r_name, n_name
    """,
    tags=("join", "agg", "tpch"),
    bench=True,
    doc="TPC-H Q5-shaped 6-table star join: local-supplier revenue per "
    "nation. Dim tables broadcast; only the orders⋈lineitem join shuffles.",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    lineitem = t(spark, sf_dir, "lineitem")
    supplier = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey) & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(revenue, "revenue"))
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@register(
    "p1_rename_projection",
    oracle="""
    SELECT c_custkey AS customer_id,
           c_name AS customer_name,
           c_nationkey AS nation_id,
           c_acctbal AS account_balance,
           c_mktsegment AS market_segment
    FROM customer
    """,
    tags=("projection",),
    doc="Renaming projection (SURVEY.md P1; reference nrg_sql_queries.py:2-18 "
    "maps raw backticked EIA headers to snake_case).",
)
def p1_rename_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_nationkey").alias("nation_id"),
        F.col("c_acctbal").alias("account_balance"),
        F.col("c_mktsegment").alias("market_segment"),
    )


@register(
    "p2_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day
    FROM orders
    """,
    tags=("projection", "datetime"),
    doc="Date-part extraction (SURVEY.md P2; reference "
    "nrg_sql_queries.py:19-20,27-28 EXTRACT(MONTH|YEAR FROM TO_DATE(...))).",
)
def p2_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
    )


@register(
    "p3_timestamp_parts",
    oracle="""
    SELECT event_id,
           CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS ev_hour,
           CAST(EXTRACT(DAY FROM ts) AS INTEGER) AS ev_day,
           CAST(EXTRACT(WEEK FROM ts) AS INTEGER) AS ev_week,
           CAST(EXTRACT(MONTH FROM ts) AS INTEGER) AS ev_month,
           CAST(EXTRACT(YEAR FROM ts) AS INTEGER) AS ev_year,
           CAST(EXTRACT(DOW FROM ts) + 1 AS INTEGER) AS ev_dayofweek
    FROM events
    """,
    tags=("projection", "datetime"),
    doc="Six timestamp parts (SURVEY.md P3; reference nrg_sql_queries.py:37-42 "
    "— with the B5 format bug fixed). Spark dayofweek is 1=Sunday; DuckDB "
    "DOW is 0=Sunday, hence the +1 in the oracle.",
)
def p3_timestamp_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.hour("ts").alias("ev_hour"),
        F.dayofmonth("ts").alias("ev_day"),
        F.weekofyear("ts").alias("ev_week"),
        F.month("ts").alias("ev_month"),
        F.year("ts").alias("ev_year"),
        F.dayofweek("ts").alias("ev_dayofweek"),
    )


@register(
    "p6_isin_filter",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("filter",),
    doc="IN-list filter (SURVEY.md P6; reference nrg_etl.py:62 .isin(list)). "
    "Literal list is fine; the driver-collected variant is replaced by a "
    "broadcast semi-join in j2_semi_join.",
)
def p6_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


@register(
    "p8_inequality_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_tax, l_discount
    FROM lineitem
    WHERE l_tax != l_discount
    """,
    tags=("filter",),
    doc="Column-vs-column inequality predicate (SURVEY.md P8; reference "
    "nrg_sql_queries.py:71 net_generation != sum_of_parts). NULL rows are "
    "excluded by SQL 3-value logic in both engines.",
)
def p8_inequality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_tax") != F.col("l_discount"))
        .select("l_orderkey", "l_linenumber", "l_tax", "l_discount")
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------

EVENT_TYPES = ["signup", "click", "purchase", "error", "view"]


@register(
    "a1_pivot_max",
    oracle="""
    SELECT user_id,
           MAX(CASE WHEN event_type = 'signup' THEN value END) AS signup,
           MAX(CASE WHEN event_type = 'click' THEN value END) AS click,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           MAX(CASE WHEN event_type = 'error' THEN value END) AS "error",
           MAX(CASE WHEN event_type = 'view' THEN value END) AS "view"
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "pivot"),
    doc="groupBy+pivot+max long→wide reshape (SURVEY.md A1; reference "
    "nrg_etl.py:61-65 pivots GHCN parameter_id). Explicit value list avoids "
    "the extra distinct-scan job — at 100 TB that scan would read the whole "
    "fact table once more.",
)
def a1_pivot_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .max("value")
    )


@register(
    "a2_distinct_projection",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    tags=("agg",),
    doc="SELECT DISTINCT dedup projection (SURVEY.md A2; reference "
    "nrg_sql_queries.py:2,35). Hash-aggregate, partial+final.",
)
def a2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@register(
    "a3_count_rows",
    oracle="""
    SELECT 'lineitem' AS tbl, COUNT(*) AS n_rows FROM lineitem
    UNION ALL SELECT 'orders' AS tbl, COUNT(*) AS n_rows FROM orders
    UNION ALL SELECT 'customer' AS tbl, COUNT(*) AS n_rows FROM customer
    """,
    tags=("agg", "qc"),
    doc="COUNT(*) scalar aggregates (SURVEY.md A3; reference rows_count "
    "builder nrg_sql_queries.py:58 — with bug B1 fixed). Parquet count "
    "is metadata-only: no column read.",
)
def a3_count_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = [
        t(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("tbl"), "n_rows"
        )
        for name in ("lineitem", "orders", "customer")
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    return out


@register(
    "a4_null_audit",
    oracle="""
    SELECT COUNT(*) AS n_null
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    """,
    tags=("agg", "qc"),
    doc="IS NULL audit count (SURVEY.md A4/P7; reference "
    "nrg_sql_queries.py:48-55 null checks — bug B3 trailing-semicolon "
    "fixed). The left join manufactures NULLs deterministically.",
)
def a4_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .filter(F.col("o_orderkey").isNull())
        .agg(F.count(F.lit(1)).alias("n_null"))
    )


@register(
    "a5_consistency_totals",
    oracle=f"""
    SELECT COUNT(*) AS n_inconsistent FROM (
        SELECT o_orderkey, o_totalprice,
               {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")}
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_totalprice
    ) WHERE ABS(o_totalprice - sum_charge) > 0.01
    """,
    tags=("agg", "qc"),
    doc="Total-vs-sum-of-parts consistency audit (SURVEY.md A5; reference "
    "net_gen_qc nrg_sql_queries.py:63-72: reported total != sum of 9 fuel "
    "parts). Here: o_totalprice vs the sum of its line charges.",
)
def a5_consistency_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    charge = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    per_order = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(dsum(charge, "sum_charge"))
    )
    return per_order.filter(F.abs(F.col("o_totalprice") - F.col("sum_charge")) > 0.01).agg(
        F.count(F.lit(1)).alias("n_inconsistent")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@register(
    "j1_left_outer_join",
    oracle="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           MAX(o_totalprice) AS max_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    tags=("join",),
    doc="LEFT OUTER equi-join (SURVEY.md J1; reference "
    "nrg_sql_queries.py:29-30 weather⟕locations). Unmatched left rows "
    "produce NULLs → COUNT(col) skips them, MAX is NULL.",
)
def j1_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"), F.max("o_totalprice").alias("max_price"))
    )


@register(
    "j2_semi_join",
    oracle="""
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
    tags=("join",),
    doc="Broadcast LEFT SEMI join (SURVEY.md J2) — the scale-safe "
    "replacement for the reference's driver-collected IN-list "
    "(nrg_etl.py:47,62 .rdd.flatMap().collect() → .isin). The whole "
    "lifecycle stays in one Catalyst plan; no driver OOM at 100 TB.",
)
def j2_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    lineitem = t(spark, sf_dir, "lineitem")
    return part.join(
        lineitem, part.p_partkey == lineitem.l_partkey, "left_semi"
    ).select("p_partkey", "p_name", "p_brand")


@register(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
    """,
    tags=("join",),
    doc="LEFT ANTI join (absent in reference, SURVEY.md §2.3 gap-fill): "
    "customers with no URGENT orders. Scoped to urgent because every "
    "fixture customer has some order — an unscoped anti join is "
    "vacuously empty at every SF and would prove nothing.",
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = t(spark, sf_dir, "customer")
    urgent = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j4_full_outer_join",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
    FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nk = s.nk
    """,
    tags=("join",),
    doc="FULL OUTER join of two aggregates (absent in reference, "
    "SURVEY.md §2.3 gap-fill): customer vs supplier presence per nation.",
)
def j4_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full_outer").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"), "n_cust", "n_supp"
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@register(
    "s1_top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("topk",),
    doc="ORDER BY + LIMIT (absent in reference — SURVEY.md §2.6). Spark "
    "rewrites to TakeOrderedAndProject: per-partition heap + driver merge, "
    "no global sort. Unique-key tiebreak makes the row set deterministic.",
)
def s1_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
    doc="TPC-H Q6 shape: pure filter + scalar aggregate — the canonical "
    "pushdown showcase (all three predicates reach the parquet reader; "
    "row-group stats skip non-1994 data entirely at scale).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1994-01-01")
            & (F.col("l_shipdate") < "1995-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q14_promo_share",
    oracle=f"""
    SELECT p_type,
           COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "type_revenue")}
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_type
    """,
    tags=("join", "agg"),
    doc="TPC-H Q14 shape: fact-to-part join + per-type revenue. part is "
    "dimension-sized → broadcast hash join, no fact shuffle; the groupBy "
    "shuffles only (p_type, partial sums).",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net"),
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n_items"), dsum("net", "type_revenue"))
    )


@register(
    "j7_cross_join",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
    tags=("join",),
    doc="Explicit Cartesian product (region × nation) — completes the "
    "§2.3 join-type inventory. Only ever sane when one side is tiny and "
    "broadcast (BroadcastNestedLoopJoin); anything else at scale is a "
    "bug, which is why Spark gates implicit cross joins behind "
    "crossJoin()/CROSS JOIN syntax.",
)
def j7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    return region.crossJoin(F.broadcast(nation)).select("r_name", "n_name")


# --- Bloom-filter runtime prefilter -----------------------------------------

BLOOM_BITS = 1 << 16   # 65536 bits = 1024 longs = 8 KB broadcast
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_HASHES = 3


def bloom_build(keys: DataFrame, key: str) -> list[int]:
    """Distributed Bloom-filter build over a key column: each key sets
    BLOOM_HASHES bit positions (xxhash64 with distinct seeds mod
    BLOOM_BITS); positions aggregate into 64-bit words via bit_or, so the
    driver only ever sees <= BLOOM_WORDS rows no matter how large the
    build side is. Returns the dense word array."""
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(BLOOM_BITS))
                for s in range(BLOOM_HASHES)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()
    )
    dense = [0] * BLOOM_WORDS
    for r in words:
        dense[r.word] = r.mask
    return dense


def bloom_might_contain(dense: list[int], key_sql: str) -> "F.Column":
    """Probe-side predicate: all BLOOM_HASHES bits set in the broadcast
    word array. The 8 KB array ships as a plan literal (same budget class
    as broadcast k-means centroids). ``key_sql`` is the probe key as a
    SQL expression string."""
    arr = F.lit(dense)
    checks = []
    for s in range(BLOOM_HASHES):
        pos = f"pmod(xxhash64({key_sql}, {s}), {BLOOM_BITS})"
        word = F.element_at(arr, F.expr(f"CAST({pos} / 64 AS INT)") + 1)
        bit = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))")
        checks.append(word.bitwiseAND(bit) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


@register(
    "j8_bloom_semijoin",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity
    FROM lineitem
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_orderkey = l_orderkey
                    AND o_orderpriority = '1-URGENT')
    ORDER BY l_orderkey, l_partkey, l_quantity
    """,
    tags=("join", "bloom", "runtime-filter"),
    doc="Semi join with an explicit Bloom runtime filter (the pattern "
    "behind Spark's own InjectRuntimeFilter, expressed as an operator): "
    "build an 8 KB Bloom bitmap over urgent-order keys with a fully "
    "distributed bit_or aggregation (<= 1024 words cross the driver "
    "regardless of build-side cardinality), prefilter the probe scan "
    "with 3 literal-array bit tests, then run the exact left_semi join "
    "on the survivors only. At 100 TB the probe side drops most of its "
    "rows BEFORE the shuffle exchange — the exact join afterwards only "
    "pays for Bloom false positives (~2% at these parameters). "
    "Semantics are identical to the plain semi join, which is exactly "
    "what the oracle checks.",
)
def j8_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    urgent = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    dense = bloom_build(urgent, "o_orderkey")
    lineitem = t(spark, sf_dir, "lineitem")
    prefiltered = lineitem.filter(bloom_might_contain(dense, "l_orderkey"))
    return (
        prefiltered.join(
            urgent, prefiltered.l_orderkey == urgent.o_orderkey, "left_semi"
        )
        .select("l_orderkey", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
    )


@register(
    "j9_nullsafe_join",
    oracle="""
    WITH l AS (
        SELECT NULLIF(o_orderpriority, '1-URGENT') AS pr_key,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(FLOOR(o_totalprice * 10000) AS BIGINT)) AS DOUBLE) / 10000
                   AS total_price
        FROM orders GROUP BY 1
    ),
    r AS (
        SELECT NULLIF(o_orderpriority, '1-URGENT') AS pr_key,
               COUNT(DISTINCT o_custkey) AS n_custs
        FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
    )
    SELECT l.pr_key, l.n_orders, l.total_price, r.n_custs
    FROM l FULL OUTER JOIN r ON l.pr_key IS NOT DISTINCT FROM r.pr_key
    """,
    tags=("join",),
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM) — completes the "
    "§2.3 join-type inventory's equality semantics. The key is made "
    "genuinely nullable (NULLIF folds 1-URGENT to NULL), so the NULL "
    "groups on both sides MUST pair up — a plain equi-join would drop "
    "them. Spark plans EqualNullSafe as a hashable join key (coalesce-"
    "tagged internally), so this stays a hash join on aggregated inputs, "
    "not a BNLJ — the shape survives scale exactly like j4.",
)
def j9_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    key = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pr_key")
    left = orders.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )
    right = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(key)
        .agg(F.count_distinct("o_custkey").alias("n_custs"))
    )
    return left.join(right, left.pr_key.eqNullSafe(right.pr_key), "full_outer").select(
        left.pr_key, "n_orders", "total_price", "n_custs"
    )

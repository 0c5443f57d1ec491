"""Shared helpers for operator builders.

Centralizes the oracle-parity conventions documented in
``plans/catalog.py`` so every operator sums/compares identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from ..sources import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a fixture table with determinism conf applied to the session."""
    tune(spark)
    return load_table(spark, sf_dir, name)


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan so CPU-heavy per-row stages use every core.

    Small fixture tables arrive as 1-2 parquet splits, serializing
    expression-heavy stages (shingling, hashing, mapInPandas) onto one
    task. At 100 TB the scan already yields thousands of splits and this
    is a no-op (guarded by partition count), so the round-robin shuffle
    cost is only ever paid when the input is tiny relative to the compute.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def explode_unpushed(df: DataFrame, arr: Column, alias: str, *keep: str) -> DataFrame:
    """``explode`` that defeats InferFiltersFromGenerate pushdown.

    Plain ``explode(expr)`` makes Catalyst infer ``size(expr) > 0`` and
    push it below any exchange with ``expr`` substituted in — for an
    expensive array expression (shingling) that inlines the whole
    construction into the narrow pre-``spread`` scan stage, serializing it
    onto one core AND computing it twice (measured 8× slowdown on the
    documents fixture). ``explode_outer`` infers no filter; the null
    filter on the *generated* attribute cannot be pushed below the
    Generate, so it runs post-exchange where it belongs.

    Semantics match ``explode`` unless the array itself contains null
    elements (explode emits them, this drops them) — fine for all callers
    here (shingles/tokens are concat/split products, never null).
    """
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


# Fixed-point summation scale: 4 decimal digits.
#
# Why floor-based fixed point instead of DECIMAL casts: rounding a double to
# a decimal hits tie cases (the scaled double can land exactly on .5) and
# Spark/DuckDB resolve them with *different algorithms*, so DECIMAL-cast
# sums diverge by ±1 ulp-of-scale on large inputs. FLOOR(x * 10^s) has no
# tie case — it is bit-deterministic for any IEEE double — and the integer
# sum is exact and order-insensitive in both engines. Headroom: |x|·10^4
# must stay < 2^63 / n_rows; at 10^10 rows that allows |x| < ~9×10^4 per
# row-group partial — fine for money-scale values at 100 TB.
SCALE = 4
FACTOR = 10**SCALE


def fixed(col: Column | str, scale: int = SCALE) -> Column:
    """Exact fixed-point representation: FLOOR(x · 10^scale) as BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10**scale))


def dsum(col: Column | str, alias: str, scale: int = SCALE) -> Column:
    """Order-insensitive, engine-portable double sum via fixed point."""
    return (F.sum(fixed(col, scale)).cast("double") / (10**scale)).alias(alias)


def davg(col: Column | str, alias: str, scale: int = SCALE) -> Column:
    """Deterministic average: exact fixed-point sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(fixed(c, scale)).cast("double") / (10**scale) / F.count(c)).alias(alias)


# SQL-side twins of dsum/davg for oracle strings.
def sql_dsum(expr: str, alias: str, scale: int = SCALE) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {10**scale}) AS BIGINT)) AS DOUBLE)"
        f" / {10**scale} AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = SCALE) -> str:
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {10**scale}) AS BIGINT)) AS DOUBLE)"
        f" / {10**scale} / COUNT({expr}) AS {alias}"
    )

"""Named query catalog — the engine's public query surface.

Every operator from SURVEY.md §2 (plus the beyond-reference extensions)
registers itself here as a ``QuerySpec``: a Spark builder
``(spark, sf_dir) -> DataFrame`` paired with an ANSI-SQL oracle that DuckDB
runs on the same parquet tables. The driver's correctness gate
(``__spark_entry__.py``) is a thin view over this registry.

Oracle-parity rules (SURVEY.md §7 hard-part f):
- Alias every computed column identically in the Spark builder and the SQL.
- Sum doubles through DECIMAL(p,4): per-row double arithmetic is IEEE-
  deterministic in both engines; casting to scale-4 decimal before SUM makes
  the aggregation exact and order-insensitive, then CAST back to DOUBLE.
  (Scale 4 ⇒ no representable .00005 ties, so rounding mode never matters.)
- Cast EXTRACT results to INTEGER (DuckDB returns BIGINT, Spark INT).
- Make every top-k/window ordering total with a unique-key tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

# Operator modules that self-register specs on import.
_MODULES = (
    "nrg_etl_airflow_spark_emr_spark.operators.relational",
    "nrg_etl_airflow_spark_emr_spark.operators.analytic",
    "nrg_etl_airflow_spark_emr_spark.operators.scalar_funcs",
    "nrg_etl_airflow_spark_emr_spark.operators.advanced",
    "nrg_etl_airflow_spark_emr_spark.operators.temporal",
    "nrg_etl_airflow_spark_emr_spark.operators.tpch",
    "nrg_etl_airflow_spark_emr_spark.operators.skew",
    "nrg_etl_airflow_spark_emr_spark.operators.graph",
    "nrg_etl_airflow_spark_emr_spark.operators.grouped",
    "nrg_etl_airflow_spark_emr_spark.operators.kmeans",
    "nrg_etl_airflow_spark_emr_spark.pipelines.corpus",
    "nrg_etl_airflow_spark_emr_spark.pipelines.training",
    "nrg_etl_airflow_spark_emr_spark.operators.dedup",
    "nrg_etl_airflow_spark_emr_spark.operators.similarity",
    "nrg_etl_airflow_spark_emr_spark.operators.text",
    "nrg_etl_airflow_spark_emr_spark.operators.multimodal",
    "nrg_etl_airflow_spark_emr_spark.streaming.batch_equiv",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags, bench=bench
        )
        return fn

    return deco


def _load() -> None:
    import importlib

    for mod in _MODULES:
        importlib.import_module(mod)


def all_specs() -> dict[str, QuerySpec]:
    """Load all operator modules and return the full registry."""
    _load()
    return dict(_REGISTRY)


def spec(name: str) -> QuerySpec:
    _load()
    return _REGISTRY[name]

"""Generic readers / writers (SURVEY.md §2.1 S1-S7).

The reference reads gzipped header CSVs with no schema (all-string,
reference: dags/scripts/spark/nrg_etl.py:20-24), headerless CSVs with an
explicit StructType (nrg_etl.py:49-59), and writes Hive-partitioned parquet
(nrg_etl.py:37,72). Re-expressed here with declared schemas and
scale-safe writer defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan (gzip auto-detected from extension), SURVEY.md S1-S3.

    With ``schema=None`` reproduces the reference's header-derived
    all-string read (nrg_etl.py:24); passing a StructType matches the
    weather read (nrg_etl.py:59).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_parquet_table(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering parquet scan (SURVEY.md S4; nrg_qc.py:21,24)."""
    return spark.read.parquet(path)


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink (SURVEY.md S5/S6; nrg_etl.py:37,72).

    ``partitionOverwriteMode=dynamic`` so a re-run replaces only the
    partitions it produced — at 100 TB a static overwrite of the whole
    table root is unacceptable.
    """
    writer = df.write.mode(mode).option("partitionOverwriteMode", "dynamic")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)

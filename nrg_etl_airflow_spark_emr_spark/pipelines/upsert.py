"""Idempotent upsert (merge) into partitioned parquet — the incremental-
load half of the reference's 'tables-as-contracts' pipeline semantics.

The reference only full-overwrites partitions (nrg_etl.py:37,72); real
daily pipelines receive late/corrected rows and must merge them into an
existing table without rewriting it wholesale. Plain parquet has no ACID
MERGE (that's Delta/Iceberg territory — SURVEY.md §1.1 flags them as the
100 TB upgrade), but dynamic partition overwrite gives the same effect
when the merge is scoped per partition:

1. find the partitions the updates touch (tiny distinct on the updates),
2. read ONLY those partitions from the target (partition pruning),
3. anti-join old rows on the key, union the updates (last-wins),
4. write back with ``partitionOverwriteMode=dynamic`` — untouched
   partitions are never read or rewritten.

Cost scales with the touched partitions, not the table: a daily
increment into a year-partitioned 100 TB table reads/writes only the
affected days. Idempotent: re-running the same increment converges to
the same state (the anti-join drops the previous copy).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_partitioned(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """Merge ``updates`` (last-wins on ``key_cols``) into the partitioned
    parquet table at ``target_path``, rewriting only touched partitions.

    ``updates`` must carry the partition columns; a key may move between
    partitions only if both its old and new partition appear in the
    updates' partition set (standard restriction for partition-scoped
    merge — cross-partition moves need a delete increment for the old
    partition or a table-format MERGE).
    """
    touched = [r.asDict() for r in updates.select(*partition_cols).distinct().collect()]
    if not touched:
        return

    # Partition-pruned read of the existing rows in touched partitions.
    part_pred = reduce(
        lambda a, b: a | b,
        [
            reduce(lambda x, y: x & y, [F.col(c) == row[c] for c in partition_cols])
            for row in touched
        ],
    )
    existing = spark.read.parquet(target_path).filter(part_pred)

    # Last-wins merge: drop existing rows whose key reappears in updates.
    merged = existing.join(
        updates.select(*key_cols).distinct(), on=key_cols, how="left_anti"
    ).unionByName(updates)

    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(target_path)
    )

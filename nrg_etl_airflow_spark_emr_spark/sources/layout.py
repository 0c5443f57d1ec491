"""Data-layout operators: range-sorted writes, file compaction, and
target-size sizing — the storage-side half of the 100 TB design.

The reference writes Hive-partitioned parquet and nothing else
(nrg_etl.py:37,72). At 100 TB the *layout inside* each partition decides
scan cost as much as the partitioning itself:

- **Range-sorted writes** (`write_sorted_parquet`): repartitionByRange on
  the sort key + sortWithinPartitions before writing gives every output
  file a narrow min/max band on that key. Parquet stores per-row-group
  column statistics, so a pushed-down range predicate skips whole row
  groups / files without reading data pages — the poor man's clustered
  index. (Same machinery a Z-order gives multi-column; single-key range
  sort is the 80% case and needs no custom writer.)
- **Compaction** (`compact_parquet`): streaming/incremental sinks and
  over-parallel writes leave many small files; small files at 100 TB mean
  listing storms and per-file open overhead dominating scan time.
  Rewrite to ceil(bytes / target) files. AQE cannot do this for you on
  the *write* side — coalesce explicitly.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``sort_cols``.

    ``repartitionByRange`` samples the key distribution and assigns
    contiguous key ranges to partitions (so files don't overlap on the
    key); ``sortWithinPartitions`` orders rows inside each file (so row
    groups within a file don't overlap either). Result: a filter on the
    leading sort column prunes to the few row groups whose [min, max]
    band intersects the predicate.
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def dir_bytes(path: str) -> int:
    """Total bytes of the data files under a parquet directory."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a (possibly many-small-files) parquet dir into
    ceil(bytes/target) files; returns the file count written.

    Uses the *compressed on-disk* size to pick the count — the right
    basis, since the target is on-disk file size. coalesce (not
    repartition): compaction must not pay a full shuffle, it only
    narrows parallelism on the write.
    """
    n = max(1, math.ceil(dir_bytes(path) / target_file_bytes))
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(out_path)
    return n

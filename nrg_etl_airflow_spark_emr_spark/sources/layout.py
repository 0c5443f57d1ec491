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


def _zvalue(a, b, bits: int = 8):
    """Morton (Z-order) interleave of two normalized int columns as a
    pure column expression: bit i of ``a`` lands at 2i, of ``b`` at 2i+1.
    JVM-side integer math — no UDF. Inputs MUST already be scaled to
    [0, 2^bits): interleaving raw keys of unequal magnitude lets the
    wider key's high bits dominate the curve and degenerates to a
    single-key sort (normalization is what makes Z-order work)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(F.col(a) if isinstance(a, str) else a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(F.col(b) if isinstance(b, str) else b, i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(abit.cast("long"), 2 * i) + F.shiftleft(bbit.cast("long"), 2 * i + 1)
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Morton curve of two key columns.

    Single-key range sort (``write_sorted_parquet``) gives perfect
    pruning on one column and none on the other; Z-order trades a little
    of the first for useful min/max locality on BOTH — each file covers a
    small square of the (a, b) key space instead of a thin full-width
    stripe. The standard multi-dim clustering for 100 TB scan pruning
    (what Delta's OPTIMIZE ZORDER BY does), here as plain column algebra:
    normalize both keys to 2^bits equal-width buckets (one min/max agg —
    the only driver round-trip), interleave, range-partition and sort by
    z, drop it. Equal-width normalization assumes roughly uniform keys;
    under heavy skew switch the bucketing to approxQuantile boundaries
    (equal-depth), the curve math is unchanged.
    """
    from pyspark.sql import functions as F

    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    n = 1 << bits

    def bucket(col: str, lo, hi):
        span = max(int(hi) - int(lo) + 1, 1)
        return F.least(
            F.lit(n - 1),
            ((F.col(col) - F.lit(int(lo))).cast("long") * n / span).cast("long"),
        )

    zcol = "__z"
    (
        df.withColumn("__ba", bucket(col_a, lo_a, hi_a))
        .withColumn("__bb", bucket(col_b, lo_b, hi_b))
        .withColumn(zcol, _zvalue(F.col("__ba"), F.col("__bb"), bits))
        .repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop("__ba", "__bb", zcol)
        .write.mode(mode)
        .parquet(path)
    )

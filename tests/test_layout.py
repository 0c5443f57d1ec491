"""Data-layout operators: sorted writes must produce pruning-capable
row-group statistics; compaction must hit the target file count.

The row-group assertions read parquet footers directly with pyarrow —
the same statistics Spark's vectorized reader uses to skip row groups
when a pushed-down predicate misses a [min, max] band.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from nrg_etl_airflow_spark_emr_spark.sources import load_table
from nrg_etl_airflow_spark_emr_spark.sources.layout import (
    compact_parquet,
    dir_bytes,
    write_sorted_parquet,
)


def _key_bands(path: str, col: str):
    """[(min, max)] of ``col`` per (file, row group) under ``path``."""
    bands = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            bands.append((st.min, st.max))
    return bands


def test_sorted_write_produces_disjoint_key_bands(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_sorted")
    orders = load_table(spark, sf_dir, "orders")
    write_sorted_parquet(orders, out, ["o_orderkey"], n_files=4)

    bands = _key_bands(out, "o_orderkey")
    assert len(bands) >= 4
    # Range-clustered: sorted by min, each band must start after the
    # previous one ends — so any key-range predicate intersects O(1)
    # bands instead of all of them.
    bands.sort()
    for (_, prev_max), (next_min, _) in zip(bands, bands[1:]):
        assert next_min > prev_max

    # Round-trip integrity.
    assert spark.read.parquet(out).count() == orders.count()


def test_unsorted_write_bands_overlap(spark, sf_dir, tmp_path):
    """Control: the same data written with a round-robin repartition has
    overlapping bands — the pruning win comes from the sort, not parquet."""
    out = str(tmp_path / "orders_unsorted")
    load_table(spark, sf_dir, "orders").repartition(4).write.parquet(out)
    bands = sorted(_key_bands(out, "o_orderkey"))
    overlaps = sum(
        1 for (_, pmax), (nmin, _) in zip(bands, bands[1:]) if nmin <= pmax
    )
    assert overlaps > 0


def test_pruned_scan_reads_fewer_rows(spark, sf_dir, tmp_path):
    """A narrow range predicate over the sorted layout must scan fewer
    rows than the table holds (row-group skipping visible in the scan
    metric), and still return exact results."""
    out = str(tmp_path / "orders_sorted")
    orders = load_table(spark, sf_dir, "orders")
    write_sorted_parquet(orders, out, ["o_orderkey"], n_files=4)

    lo, hi = 10, 50
    df = spark.read.parquet(out).filter(f"o_orderkey BETWEEN {lo} AND {hi}")
    expected = orders.filter(f"o_orderkey BETWEEN {lo} AND {hi}").count()
    assert df.count() == expected

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(o_orderkey" in plan


def test_compaction_hits_target_count(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    # Fragment: write with absurd parallelism → many small files.
    load_table(spark, sf_dir, "orders").repartition(16).write.parquet(frag)
    n_frag = len(glob.glob(f"{frag}/*.parquet"))
    assert n_frag >= 16

    # Compact to ~half the total size per file → expect 2 files.
    target = max(1, dir_bytes(frag) // 2)
    n = compact_parquet(spark, frag, out, target_file_bytes=target)
    assert n == 2
    assert len(glob.glob(f"{out}/*.parquet")) == n
    assert spark.read.parquet(out).count() == load_table(spark, sf_dir, "orders").count()


def test_zorder_bounds_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order must give bounded min/max bands on BOTH keys, where a
    single-key sort leaves the second key full-width in every file."""
    from nrg_etl_airflow_spark_emr_spark.sources.layout import write_zordered_parquet

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    n_files = 8
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    write_zordered_parquet(li, zpath, "l_orderkey", "l_partkey", n_files=n_files)
    write_sorted_parquet(li, spath, ["l_orderkey"], n_files=n_files)

    def mean_width(path, col):
        bands = _key_bands(path, col)
        return sum(hi - lo for lo, hi in bands) / len(bands)

    full_o = mean_width(spath, "l_orderkey")   # narrow: the sorted key
    full_p = mean_width(spath, "l_partkey")    # full-width control
    z_o = mean_width(zpath, "l_orderkey")
    z_p = mean_width(zpath, "l_partkey")

    def domain(col):
        bands = _key_bands(zpath, col)
        return max(hi for _, hi in bands) - min(lo for lo, _ in bands)

    # Z-order: BOTH keys' bands are materially narrower than their full
    # domains (the single-sort control leaves partkey at ~full width),
    # while the single-key sort still wins on its own key.
    assert z_p < 0.8 * full_p, f"partkey bands not bounded: {z_p} vs {full_p}"
    assert z_o < 0.8 * domain("l_orderkey"), f"orderkey locality lost: {z_o}"
    assert full_o < z_o, "single-key sort must beat z-order on its own key"

    # Integrity.
    assert spark.read.parquet(zpath).count() == li.count()

"""Source/sink round-trips (SURVEY.md §2.1): every format the engine
claims is verified by write → read → exact-content equality against the
fixture table it started from."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nrg_etl_airflow_spark_emr_spark.sources import load_table
from nrg_etl_airflow_spark_emr_spark.sources.readers import (
    read_csv_table,
    read_json_table,
    read_orc_table,
    read_parquet_table,
    write_csv,
    write_json,
    write_orc,
    write_partitioned_parquet,
)


def _rows(df, cols=None):
    cols = cols or sorted(df.columns)
    return sorted(tuple(str(row[c]) for c in cols) for row in df.select(*cols).collect())


@pytest.fixture(scope="module")
def nation(spark, sf_dir):
    return load_table(spark, sf_dir, "nation")


def test_csv_gzip_roundtrip_all_string(spark, nation, tmp_path):
    """Reference-shaped read: header CSV, no schema → every column string
    (nrg_etl.py:24 semantics)."""
    p = str(tmp_path / "nation_csv")
    write_csv(nation, p)
    back = read_csv_table(spark, p)
    assert [f.dataType for f in back.schema.fields] == [T.StringType()] * len(back.columns)
    assert _rows(back) == _rows(nation.select(*[F.col(c).cast("string") for c in nation.columns]))


def test_csv_schema_roundtrip(spark, nation, tmp_path):
    """Declared-StructType read (nrg_etl.py:49-59 semantics) — typed columns
    survive the text round-trip."""
    p = str(tmp_path / "nation_csv2")
    write_csv(nation, p)
    back = read_csv_table(spark, p, schema=nation.schema)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_json_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_json")
    write_json(nation, p)
    back = read_json_table(spark, p, schema=nation.schema)
    assert _rows(back) == _rows(nation)


def test_orc_roundtrip(spark, nation, tmp_path):
    p = str(tmp_path / "nation_orc")
    write_orc(nation, p)
    back = read_orc_table(spark, p)
    assert back.schema == nation.schema
    assert _rows(back) == _rows(nation)


def test_partitioned_parquet_roundtrip_and_pruning(spark, nation, tmp_path):
    p = str(tmp_path / "nation_part")
    write_partitioned_parquet(nation, p, partition_cols=["n_regionkey"])
    back = read_parquet_table(spark, p)
    assert _rows(back) == _rows(nation)
    # Partition pruning must reach the scan: filtering the partition column
    # should list only that directory.
    pruned = back.filter(F.col("n_regionkey") == 0)
    phys = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(n_regionkey" in phys or "n_regionkey" in phys
    assert _rows(pruned) == _rows(nation.filter(F.col("n_regionkey") == 0))


def test_dynamic_partition_overwrite(spark, nation, tmp_path):
    """Re-writing ONE partition must not clobber the others (the scale-safe
    partitionOverwriteMode=dynamic contract)."""
    p = str(tmp_path / "nation_dyn")
    write_partitioned_parquet(nation, p, partition_cols=["n_regionkey"])
    one = nation.filter(F.col("n_regionkey") == 0).withColumn(
        "n_name", F.lit("rewritten")
    )
    write_partitioned_parquet(one, p, partition_cols=["n_regionkey"])
    back = read_parquet_table(spark, p)
    assert back.count() == nation.count()
    assert back.filter((F.col("n_regionkey") == 0) & (F.col("n_name") == "rewritten")).count() == one.count()
    assert _rows(back.filter(F.col("n_regionkey") != 0)) == _rows(
        nation.filter(F.col("n_regionkey") != 0)
    )


def test_binary_file_source_reads_content(spark, tmp_path):
    """binaryFile source: one row per file with exact bytes + metadata —
    the ingestion edge for the multimodal (mm_*) operators."""
    from nrg_etl_airflow_spark_emr_spark.sources import read_binary_files

    payloads = {f"img_{i}.bin": bytes([i] * (10 + i)) for i in range(4)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    (tmp_path / "skip.txt").write_text("not matched by the glob")

    df = read_binary_files(spark, str(tmp_path / "*.bin"))
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name].content) == data
        assert rows[name].length == len(data)


def test_csv_malformed_row_handling(spark, tmp_path):
    """Parse-mode robustness on schema'd CSV (the reference's weather
    read path): PERMISSIVE quarantines bad rows into a corrupt-record
    column, DROPMALFORMED drops them, FAILFAST raises — the three
    dirty-data policies a 100 TB CSV ingest must choose between."""
    import pytest
    from pyspark.sql import types as T
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.sources.readers import read_csv_table

    p = tmp_path / "dirty.csv"
    p.write_text("id,qty\n1,10\n2,notanumber\n3,30\n")

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = read_csv_table(
        spark,
        str(p),
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt",
    ).cache()
    assert df.count() == 3
    bad = df.filter(F.col("_corrupt").isNotNull()).collect()
    assert [r.id for r in bad] == [2]
    assert bad[0].qty is None and "notanumber" in bad[0]._corrupt

    clean_schema = T.StructType(schema.fields[:2])
    dropped = read_csv_table(
        spark, str(p), schema=clean_schema, mode="DROPMALFORMED"
    )
    assert sorted(r.id for r in dropped.collect()) == [1, 3]

    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv_table(spark, str(p), schema=clean_schema, mode="FAILFAST").collect()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet files: a later writer adds a
    column; mergeSchema=true unions the schemas and backfills NULLs —
    the read-side contract that lets a 100 TB table evolve in place
    without rewriting history."""
    base = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], ["id", "v"]).write.parquet(f"{base}/part=1")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]).write.parquet(
        f"{base}/part=2"
    )

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"id", "v", "score", "part"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5

    # Without mergeSchema, one file's footer wins — the new column may
    # silently vanish. The explicit option is the contract.
    plain = spark.read.parquet(base)
    assert set(plain.columns) <= {"id", "v", "score", "part"}


def test_text_lines_roundtrip(spark, nation, tmp_path):
    from nrg_etl_airflow_spark_emr_spark.sources.readers import (
        read_text_lines,
        write_text_lines,
    )

    p = str(tmp_path / "names_txt")
    names = nation.select("n_name")
    write_text_lines(names, p)
    back = read_text_lines(spark, p)
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == sorted(
        r.n_name for r in names.collect()
    )


def test_text_wholetext_one_row_per_file(spark, tmp_path):
    from nrg_etl_airflow_spark_emr_spark.sources.readers import read_text_lines

    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.txt").write_text("line1\nline2")
    (d / "b.txt").write_text("solo")
    per_line = read_text_lines(spark, str(d))
    whole = read_text_lines(spark, str(d), wholetext=True)
    assert per_line.count() == 3
    assert sorted(r.value for r in whole.collect()) == ["line1\nline2", "solo"]

"""Custom Python DataSource: schema, determinism across partition
layouts, seed independence, and partition-parallel generation."""

from __future__ import annotations

import pytest

from nrg_etl_airflow_spark_emr_spark.sources.synthetic import (
    EVENT_TYPES,
    register_synthetic_events,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register_synthetic_events(spark)


def _read(spark, **opts):
    reader = spark.read.format("synthetic_events")
    for k, v in opts.items():
        reader = reader.option(k, str(v))
    return reader.load()


def test_schema_matches_events_fixture(spark, sf_dir):
    from nrg_etl_airflow_spark_emr_spark.sources import load_table

    syn = _read(spark, rows=10)
    fixture = load_table(spark, sf_dir, "events")
    assert syn.schema == fixture.schema


def test_row_count_and_domains(spark):
    df = _read(spark, rows=500, users=50, partitions=4)
    assert df.count() == 500
    rows = df.collect()
    assert len({r.event_id for r in rows}) == 500
    assert {r.event_type for r in rows} <= set(EVENT_TYPES)
    assert all(0 <= r.user_id < 50 for r in rows)
    assert all(0 <= r.value < 1000 for r in rows)


def test_partition_layout_does_not_change_data(spark):
    """Same (rows, seed) on 1 vs 7 partitions → identical corpus; the
    generator is a pure function of (seed, row index)."""
    a = sorted(map(tuple, _read(spark, rows=200, partitions=1).collect()))
    b = sorted(map(tuple, _read(spark, rows=200, partitions=7).collect()))
    assert a == b


def test_seed_changes_data(spark):
    a = sorted(map(tuple, _read(spark, rows=100, seed=0).collect()))
    b = sorted(map(tuple, _read(spark, rows=100, seed=1).collect()))
    assert a != b


def test_generation_is_partition_parallel(spark):
    df = _read(spark, rows=1000, partitions=6)
    assert df.rdd.getNumPartitions() == 6


def test_composes_with_engine_operators(spark):
    """The synthetic stream drives the same aggregations as the fixture."""
    from pyspark.sql import functions as F

    df = _read(spark, rows=2000, users=20, partitions=4)
    daily = (
        df.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = daily.agg(F.sum("n")).collect()[0][0]
    assert total == 2000


def test_streaming_read_matches_batch_corpus(spark, tmp_path):
    """readStream over the custom source (micro-batched by offset range)
    must deliver exactly the batch reader's corpus, once."""
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows", "600")
        .option("rowsPerBatch", "100")
        .option("users", "30")
        .load()
    )
    assert stream.isStreaming
    # Continuous micro-batches (not availableNow: the simple stream
    # reader defines "available" as one read() call) — poll until the
    # bounded corpus has fully landed, then stop.
    import time

    q = (
        stream.writeStream.format("memory")
        .queryName("t_syn_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while spark.table("t_syn_stream").count() < 600:
            assert time.time() < deadline, "stream did not deliver the corpus"
            time.sleep(1)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("t_syn_stream").collect()))
    want = sorted(map(tuple, _read(spark, rows=600, users=30).collect()))
    assert got == want

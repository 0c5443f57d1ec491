"""Structured Streaming jobs vs their batch twins (SURVEY.md §5.4).

The batch twins are oracle-gated in test_catalog_oracle; here we assert
the *streaming* execution (real readStream file source, watermark,
availableNow trigger, memory sink) produces the same rows.
"""

from __future__ import annotations

import pytest

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs
from nrg_etl_airflow_spark_emr_spark.streaming import jobs

SPECS = all_specs()


def _rows(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return jobs.events_stream(spark, sf_dir)


def test_streaming_source_is_streaming(events_stream):
    assert events_stream.isStreaming


def test_tumbling_daily_matches_batch(spark, sf_dir, events_stream):
    stream_out = jobs.run_to_memory(jobs.tumbling_daily(events_stream), "t_tumbling")
    batch = SPECS["st_tumbling_daily"].builder(spark, sf_dir)
    assert _rows(stream_out) == _rows(batch)


def test_session_windows_match_batch(spark, sf_dir, events_stream):
    stream_out = jobs.run_to_memory(jobs.session_windows(events_stream), "t_sessions")
    batch = SPECS["st_session_windows"].builder(spark, sf_dir)
    assert _rows(stream_out) == _rows(batch)


def test_streaming_dedup_matches_batch(spark, sf_dir, events_stream):
    stream_out = jobs.run_to_memory(
        jobs.dedup_events(events_stream), "t_dedup", output_mode="append"
    )
    batch = SPECS["st_dedup_first"].builder(spark, sf_dir)
    # dropDuplicates keeps the first *arrival*; within one availableNow
    # batch that is the earliest row in file order == ts order for the
    # fixture. Compare the keyed sets and the kept event ids.
    assert _rows(stream_out) == _rows(batch)


def test_watermark_in_plan(events_stream):
    plan = jobs.tumbling_daily(events_stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_user_totals_match_batch(spark, sf_dir, events_stream):
    """Custom stateful operator (applyInPandasWithState): the final state
    after replaying the fixture equals the batch groupBy."""
    stream_out = jobs.run_to_memory(
        jobs.running_user_totals(events_stream), "t_user_totals", output_mode="update"
    )
    batch = SPECS["st_user_totals"].builder(spark, sf_dir)
    assert _rows(stream_out) == _rows(batch)


def test_foreach_batch_sink_is_idempotent(spark, sf_dir, events_stream, tmp_path):
    """foreachBatch + batch_id-partitioned dynamic overwrite: output equals
    the source exactly once, and restarting from the same checkpoint does
    not duplicate or rewrite anything."""
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    q = jobs.foreach_batch_parquet_sink(events_stream, out, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(out)
    n_src = spark.read.schema(jobs.EVENTS_RAW_SCHEMA).parquet(
        f"{sf_dir}/events.parquet"
    ).count()
    assert first.count() == n_src
    # restart: availableNow with nothing new to process → no change
    q2 = jobs.foreach_batch_parquet_sink(events_stream, out, ckpt)
    q2.awaitTermination()
    again = spark.read.parquet(out)
    assert again.count() == n_src
    assert sorted(r.event_id for r in again.select("event_id").collect()) == sorted(
        r.event_id for r in first.select("event_id").collect()
    )

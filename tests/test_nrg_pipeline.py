"""End-to-end reference-parity pipeline tests (SURVEY.md §7 M1/M2).

Exercises the full reference pipeline shape on reference-shaped synthetic
inputs: gzipped header CSV → transforms → Hive-partitioned parquet →
read-back → QC, including the edge semantics SURVEY.md calls out
(pivot MAX over duplicates, semi-join drop of unknown stations, LEFT
OUTER NULL → __HIVE_DEFAULT_PARTITION__, corrected timestamp format B5).
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from nrg_etl_airflow_spark_emr_spark.pipelines import nrg

from . import nrg_fixtures as fx


@pytest.fixture(scope="module")
def pipeline_out(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("nrg")
    inputs = fx.generate_all(root / "in", corrupt=False)
    out = nrg.run_pipeline(
        spark,
        inputs["bal_auth"],
        inputs["weather"],
        inputs["locations"],
        str(root / "out"),
        # the fixture deliberately ships one station missing from
        # locations.csv × 3 days → 3 NULL-partition rows are expected
        max_unmatched_station_days=3,
    )
    return out


def test_bal_auth_fact(spark, pipeline_out):
    df = spark.read.parquet(pipeline_out.bal_auth_path)
    # 4 BAs × 3 days × 24 h, distinct rows; year/month from partition discovery.
    assert df.count() == 4 * 3 * 24
    assert {"bal_auth", "net_generation", "net_generation_coal", "year", "month"} <= set(df.columns)
    assert dict(df.dtypes)["net_generation"] == "double"  # explicit cast, not string


def test_time_dim_parses_corrected_format(spark, pipeline_out):
    df = spark.read.parquet(pipeline_out.time_path)
    assert df.count() == 3 * 24  # distinct hours, shared across BAs
    row = df.filter("hour = 13").select("day", "weekday", "week").collect()
    assert row, "PM hours prove the hh:mm:ss a format parsed (bug B5 fixed)"
    nulls = df.filter("year IS NULL OR hour IS NULL").count()
    assert nulls == 0


def test_weather_pivot_and_joins(spark, pipeline_out):
    df = spark.read.parquet(pipeline_out.weather_path)
    # Semi-join dropped the unknown station entirely.
    assert df.filter(f"station_id = '{fx.UNKNOWN_STATION}'").count() == 0
    # All 8 known stations × 3 days survived.
    assert df.count() == 8 * 3
    # Pivot produced the 6 parameter columns and dropped AWND.
    assert {"TMIN", "TMAX", "TAVG", "SNOW", "SNWD", "PRCP"} <= set(df.columns)
    assert "AWND" not in df.columns


def test_pivot_max_over_duplicates(spark, pipeline_out):
    # Duplicate TMAX rows were seeded with value-50; MAX must keep the larger.
    df = spark.read.parquet(pipeline_out.weather_path)
    bad = df.filter("TMAX IS NULL").count()
    assert bad == 0


def test_null_acronym_hive_default_partition(spark, pipeline_out):
    # The station mapped to an empty Acronym lands in the Hive default
    # partition (SURVEY.md J1 edge, reference nrg_etl.py:72 semantics).
    part_dirs = {p.name for p in Path(pipeline_out.weather_path).iterdir() if p.is_dir()}
    assert "bal_auth=__HIVE_DEFAULT_PARTITION__" in part_dirs
    df = spark.read.parquet(pipeline_out.weather_path)
    assert df.filter("bal_auth IS NULL").count() == 3  # 3 days of that station


def test_qc_report_clean(pipeline_out):
    with open(pipeline_out.qc_report_path) as f:
        report = json.load(f)
    assert report["n_failed"] == 0
    assert report["n_checks"] == 10


def test_qc_catches_corruption(spark, tmp_path):
    inputs = fx.generate_all(tmp_path / "in", corrupt=True)
    out = nrg.run_pipeline(
        spark, inputs["bal_auth"], inputs["weather"], inputs["locations"], str(tmp_path / "out")
    )
    with open(out.qc_report_path) as f:
        report = json.load(f)
    failed = {r["check"] for r in report["failures"]}
    assert "bal_auth_net_generation_consistency" in failed
    assert "weather_TMIN_nulls" in failed
    # default tolerance 0: unmatched-station NULL partition keys surface
    assert "weather_null_partition_keys" in failed


def test_corpus_pipeline_stats_coherent(spark, sf_dir):
    """Each cleaning stage can only shrink the corpus, and the cleaned set
    is exactly the canonical docs passing both filters."""
    from nrg_etl_airflow_spark_emr_spark.pipelines.corpus import (
        clean_corpus,
        survival_stats,
    )

    stats = survival_stats(spark, sf_dir)
    assert stats["cleaned"] <= min(stats["pass_quality"], stats["pass_lang"])
    assert stats["input"] >= stats["pass_quality"]
    cleaned = clean_corpus(spark, sf_dir)
    assert cleaned.filter("is_canonical != 1").count() == 0
    assert cleaned.count() == stats["cleaned"]

"""Multimodal plumbing tests: the mapInPandas kernels must agree exactly
with a local Python recomputation (the driver gives these rows-only
checks, so exactness is pinned here)."""

from __future__ import annotations

import duckdb
import pytest

from nrg_etl_airflow_spark_emr_spark.operators import multimodal as mm
from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

SPECS = all_specs()


def test_byte_histogram_matches_python(spark, sf_dir):
    result = {r.doc_id: (r.n_bytes, list(r.histogram))
              for r in SPECS["mm_byte_histogram"].builder(spark, sf_dir).collect()}
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    assert len(result) == len(texts)
    for doc_id, text in texts:
        payload = text.encode("utf-8")
        assert result[doc_id] == (len(payload), mm._histogram16(payload))


def test_histogram_bins_sum_to_length(spark, sf_dir):
    df = SPECS["mm_byte_histogram"].builder(spark, sf_dir)
    from pyspark.sql import functions as F

    bad = df.filter(
        F.aggregate("histogram", F.lit(0).cast("long"), lambda a, x: a + x) != F.col("n_bytes")
    ).count()
    assert bad == 0


def test_decode_meta_deterministic(spark, sf_dir):
    rows = {r.doc_id: (r.width, r.height, r.n_channels)
            for r in SPECS["mm_decode_meta"].builder(spark, sf_dir).collect()}
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    for doc_id, text in texts:
        assert rows[doc_id] == mm.fake_decode_image(text.encode("utf-8"))


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_resize_matches_python(spark, sf_dir):
    rows = {r.doc_id: (r.n_bytes, bytes(r.resized))
            for r in SPECS["mm_resize"].builder(spark, sf_dir).collect()}
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    for doc_id, text in texts:
        expect = mm.fake_resize_image(text.encode("utf-8"), 64, 64)
        assert rows[doc_id] == (len(expect), expect)


def test_resize_stub_raises():
    with pytest.raises(NotImplementedError):
        mm.resize_image(b"x", 2, 2)


def test_frame_sample_matches_python(spark, sf_dir):
    got: dict[tuple[int, int], bytes] = {}
    for r in SPECS["mm_frame_sample"].builder(spark, sf_dir).collect():
        got[(r.doc_id, r.frame_idx)] = bytes(r.frame)
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    n_expected = 0
    for doc_id, text in texts:
        frames = mm.sample_frames(text.encode("utf-8"))
        n_expected += len(frames)
        for i, fr in enumerate(frames):
            assert got[(doc_id, i)] == fr
    assert len(got) == n_expected

"""Dedup edge semantics on literal frames: null / empty / short texts —
the fixture never produces them, so pin the contracts here."""

from __future__ import annotations

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.functions.hashing import shingles_from_words
from nrg_etl_airflow_spark_emr_spark.operators.graph import connected_components


def test_short_and_null_texts_yield_no_shingles(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "one two"), (3, "one two three")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.sh
        for r in df.select(
            "doc_id", shingles_from_words(F.split("text", " "), 3).alias("sh")
        ).collect()
    }
    assert out[0] is None or out[0] == [], "null text must not blow up"
    assert out[1] == [] and out[2] == []
    assert out[3] == ["one two three"]


def test_isolated_docs_are_singleton_clusters(spark):
    nodes = spark.createDataFrame([(v,) for v in range(5)], "node long")
    edges = spark.createDataFrame([(3, 4)], "src long, dst long")
    got = {r.node: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3}


def test_duplicate_and_self_edges_are_harmless(spark):
    nodes = spark.createDataFrame([(v,) for v in range(3)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 1), (2, 2)], "src long, dst long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges, nodes).collect()}
    assert got == {0: 0, 1: 0, 2: 2}

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


def test_bpe_greedy_overlap_chain_semantics(spark, tmp_path):
    """Crafted pin for the BPE trainer's greedy non-overlap law: a corpus
    of 'aaaa bb' words. Round 1 must learn (a,a) with count 3 per 'aaaa'
    occurrence (pair counting sees ALL adjacent positions, overlaps
    included), and the merge must rewrite 'aaaa' to ['aa','aa'] — the
    run-parity law — so round 2 learns (aa,aa), not (a,aa) or (aa,a)."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    rows = [
        (0, "aaaa bb aaaa", "en", "s", 12),
        (1, "bb aaaa", "en", "s", 7),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        int(r.merge_rank): (r.lhs, r.rhs, int(r.pair_count))
        for r in all_specs()["text_bpe_train_merges"]
        .builder(spark, str(tmp_path))
        .collect()
    }
    # Word frequencies: 'aaaa' n=3, 'bb' n=2. (a,a) has 3 adjacent
    # positions inside 'aaaa' (overlaps counted) -> 3*3 = 9, beating
    # (b,b) at 1*2 = 2.
    assert out[1] == ("a", "a", 9), out
    # Greedy left-to-right: 'aaaa' -> [aa, aa]; the dominant next pair is
    # (aa, aa) with count 3 (one per word occurrence).
    assert out[2] == ("aa", "aa", 3), out

"""connected_components correctness on randomized graphs: the DataFrame
label-propagation loop must agree with a pure-Python union-find for any
edge set, not just the fixture's near-dup pairs (long chains exercise the
multi-iteration path the fixture barely touches)."""

from __future__ import annotations

import random

import pytest

from nrg_etl_airflow_spark_emr_spark.operators.graph import connected_components


def _union_find(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n_nodes))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    roots: dict[int, int] = {}
    for v in range(n_nodes):
        r = find(v)
        roots[r] = min(roots.get(r, v), v)
    return {v: roots[find(v)] for v in range(n_nodes)}


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(1, 60, 40), (2, 80, 120), (3, 50, 10)])
def test_components_match_union_find(spark, seed, n_nodes, n_edges):
    rng = random.Random(seed)
    edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(n_nodes, edges)

    nodes_df = spark.createDataFrame([(v,) for v in range(n_nodes)], "node long")
    edges_df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    got = {
        r.node: r.cluster_id
        for r in connected_components(edges_df, nodes_df).collect()
    }
    assert got == expected


def test_long_chain_converges(spark):
    """A 30-node path graph needs multiple propagation rounds; every node
    must still end up labeled with the chain's minimum."""
    n = 30
    nodes_df = spark.createDataFrame([(v,) for v in range(n)], "node long")
    edges_df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {r.node: r.cluster_id for r in connected_components(edges_df, nodes_df).collect()}
    assert got == {v: 0 for v in range(n)}


def test_cluster_keyed_split_has_zero_leakage(spark, sf_dir):
    """The group-aware split's whole point: exact near-dup pairs never
    straddle splits when the hash bucket is keyed on cluster_id (every
    member of a component shares the bucket by construction), while the
    doc_id-keyed split does leak on the same fixture
    (train_split_leakage > 0)."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import spec

    by_cluster = {
        r.doc_id: r.split
        for r in spec("train_split_by_cluster").builder(spark, sf_dir).collect()
    }
    # The guarantee is w.r.t. the EXACT pair set the clustering closed
    # over (dedup_jaccard_pairs) — LSH-estimated pairs include false
    # positives whose true jaccard is below threshold, and those may
    # legitimately straddle (they are not near-dups).
    pairs = spec("dedup_jaccard_pairs").builder(spark, sf_dir).collect()
    assert pairs, "fixture must contain near-dup pairs for this test to bite"
    straddling = [
        (p.d1, p.d2)
        for p in pairs
        if by_cluster[p.d1] != by_cluster[p.d2]
    ]
    assert straddling == []
    assert spec("train_split_leakage").builder(spark, sf_dir).count() > 0

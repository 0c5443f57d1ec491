"""Iterative K-means: Lloyd's invariants (monotone inertia, argmin
assignments, full coverage) on the embeddings fixture, over the
fixed-point trainer (kmeans_fit_quantized / lloyd_fit_grouped_quantized
— the oracle-gated path sim_kmeans_cells runs)."""

from __future__ import annotations

from nrg_etl_airflow_spark_emr_spark.operators.kmeans import kmeans_fit_quantized


def test_kmeans_inertia_monotone_and_assignments_consistent(spark, sf_dir):
    # Lloyd's guarantee: inertia never increases between iterations. The
    # floor-integer centroid update perturbs each coordinate by < 1 of
    # ~1e7-scale values, so the classical monotonicity holds up to a
    # vanishing relative tolerance.
    history = []
    for iters in range(1, 5):
        pv = kmeans_fit_quantized(spark, sf_dir, k=5, iters=iters)
        history.append(pv.groupBy().sum("d2").collect()[0][0])
    for prev, cur in zip(history, history[1:]):
        assert cur <= prev * (1 + 1e-6), f"inertia rose: {history}"
    assert history[-1] < history[0], "no improvement over init at all"

    rows = kmeans_fit_quantized(spark, sf_dir, k=5, iters=4).collect()
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(rows) == n_vec, "every vector must be assigned exactly once"
    cells = {r.cell for r in rows}
    assert len(cells) >= 2, "clustering collapsed to a single cell"
    assert all(r.d2 >= 0 for r in rows)


def test_kmeans_assignment_is_true_argmin(spark, sf_dir):
    """Exact check: each vector's final cell is the integer-squared-L2
    argmin (ties to the lowest cid) over the FINAL centroids, recomputed
    independently in Python from the quantized fixture vectors."""
    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import (
        lloyd_fit_grouped_quantized,
    )
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from pyspark.sql import functions as F

    v = _vectors(spark, sf_dir)
    subs = v.select(
        F.lit(0).cast("long").alias("gid"), "vec_id", F.col("fe").alias("sv")
    )
    codes, cent = lloyd_fit_grouped_quantized(subs, 5, 3)
    cents = {int(r.cid): list(r.c_q) for r in cent.collect()}
    assigned = {int(r.vec_id): int(r.cid) for r in codes.collect()}
    vecs = {int(r.vec_id): list(r.fe) for r in v.collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for vid, fe in vecs.items():
        want = min(cents, key=lambda c: (d2(fe, cents[c]), c))
        assert assigned[vid] == want, f"vec {vid}: {assigned[vid]} != {want}"


def test_kmeans_step_tie_and_update_semantics(spark, tmp_path):
    """Crafted-fixture pin for sim_kmeans_step: (a) a vector exactly
    equidistant from two pinned centroids lands in the LOWER cid (the
    trainer's tie rule, exact because distances are fixed-point
    integers); (b) the update emits 1-based dims with exact per-(cell,
    dim) coordinate sums over the quantized values."""
    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import sim_kmeans_step
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import FP_SCALE

    rows = [
        # vec_ids 0..4 are the pinned centroids (k=5 lowest ids).
        (0, [0.0, 0.0], 0),
        (1, [2.0, 0.0], 0),
        (2, [100.0, 0.0], 0),
        (3, [0.0, 100.0], 0),
        (4, [100.0, 100.0], 0),
        # d2 to centroid 0 == d2 to centroid 1 (1^2+5^2 both) -> tie,
        # must land in cell 0, not 1.
        (5, [1.0, 5.0], 0),
        # strictly nearest to centroid 3.
        (6, [1.0, 90.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {
        (r.cell, r.dim): r for r in sim_kmeans_step(spark, str(tmp_path)).collect()
    }
    cells = {c for c, _ in out}
    assert cells == {0, 1, 2, 3, 4}, "every pinned centroid keeps its cell"
    # Tie resolution: vec 5 joined cell 0 (members: vec 0 + vec 5).
    assert out[(0, 1)].n_members == 2
    assert out[(0, 1)].sum_q == 0 + 1 * FP_SCALE
    assert out[(0, 2)].sum_q == 0 + 5 * FP_SCALE
    # vec 6 joined cell 3 (members: vec 3 + vec 6).
    assert out[(3, 1)].n_members == 2
    assert out[(3, 1)].sum_q == 0 + 1 * FP_SCALE
    assert out[(3, 2)].sum_q == (100 + 90) * FP_SCALE
    # Singleton cells: the centroid itself only.
    assert out[(1, 1)].n_members == 1 and out[(1, 1)].sum_q == 2 * FP_SCALE
    # mean_q is sum/count in one IEEE division.
    assert out[(3, 2)].mean_q == ((100 + 90) * FP_SCALE) / 2.0


def test_kmeans_step_rejects_vectors_past_the_bigint_bound(spark, tmp_path):
    """The long-accumulator exactness guard (_long_d2_guard) must
    hard-fail on vectors whose derived squared-L2 bound exceeds 2^63 —
    the oracle accumulates in HUGEINT, so without the guard a
    high-magnitude fixture would ANSI-overflow on the Spark side only.
    The guard is LAZY (an assert_true on a 1-row broadcast side of the
    plan), so the failure surfaces at .collect() as a Spark runtime
    error, not at builder time. The fixture magnitude is derived from
    FP_SCALE — quantized component 2^31, i.e. (2*q)^2 * dims = 2^66 —
    so the test tracks the actual bound, not the current constant."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import sim_kmeans_step
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import FP_SCALE

    mag = float(2**31) / FP_SCALE  # quantizes to |q| = 2^31 regardless of scale
    rows = [(i, [float(i), mag], 0) for i in range(6)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))
    df = sim_kmeans_step(spark, str(tmp_path))  # builder must NOT raise (lazy)
    with pytest.raises(PySparkException, match="BIGINT squared-L2 bound"):
        df.collect()


def test_trained_ivf_beats_fixture_rule_recall(spark, sf_dir):
    """sim_knn_ivf_trained closes SCALE.md's 'fixture-rule centroids'
    shortcut, and this pin is the evidence the swap PAYS: at the same
    nprobe, top-5 recall against the brute-force baseline must clear
    0.9 absolute AND strictly beat sim_knn_ivf's fixture-rule cells
    (measured: 1.0 vs 0.68 at sf0.001, 0.96 vs 0.72 at sf0.01).
    Exactness (Spark == unrolled-SQL trainer bit-for-bit) is pinned by
    test_catalog_oracle; this test pins retrieval QUALITY, which the
    oracle cannot see."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    brute = {
        (r.query_id, r.vec_id)
        for r in specs["sim_knn_brute"].builder(spark, sf_dir).filter("rn <= 5").collect()
    }
    trained = {
        (r.query_id, r.vec_id)
        for r in specs["sim_knn_ivf_trained"].builder(spark, sf_dir).collect()
    }
    fixture = {
        (r.query_id, r.vec_id)
        for r in specs["sim_knn_ivf"].builder(spark, sf_dir).collect()
    }
    recall_trained = len(brute & trained) / len(brute)
    recall_fixture = len(brute & fixture) / len(brute)
    assert recall_trained >= 0.9, f"trained-IVF recall collapsed: {recall_trained}"
    assert recall_trained > recall_fixture, (
        f"training no longer beats the fixture rule "
        f"({recall_trained} vs {recall_fixture})"
    )


def test_quantized_trainer_edge_fixture_matches_oracle(spark, tmp_path):
    """Crafted-fixture pin for the fixed-point trainer's edge laws the sf
    fixtures never exercise: NEGATIVE coordinates through the
    floor-integer mean (floor(-3/2) = -2 — the subtract-mod identity must
    floor, not truncate toward zero) and an init cell that loses every
    member and VANISHES (duplicate init vectors tie to the lower cid, so
    the higher cid starves in round 1). Runs sim_kmeans_cells' registered
    builder AND its registered oracle over the same crafted table and
    compares values exactly — the same gate as test_catalog_oracle, but
    on a fixture built to hit the edges."""
    import duckdb

    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    rows = [
        # vec_ids 0..4 are the pinned init centroids (k=5 lowest ids).
        # 0 and 1 are IDENTICAL: every vector near them ties to cid 0,
        # so cell 1 starves and must vanish from the summary.
        (0, [-1.0, -1.0], 0),
        (1, [-1.0, -1.0], 0),
        (2, [3.0, 3.0], 0),
        (3, [-3.0, 3.0], 0),
        (4, [3.0, -3.0], 0),
        # negative-coordinate members: their floor-integer means are
        # negative and non-integral in every dim.
        (5, [-1.3, -0.9], 0),
        (6, [-0.8, -1.6], 0),
        (7, [2.5, 3.4], 0),
        (8, [-3.2, 2.1], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(tmp_path / "embeddings.parquet"))

    spec = all_specs()["sim_kmeans_cells"]
    got = {
        int(r.cell): (int(r.n_members), float(r.mean_sq_dist))
        for r in spec.builder(spark, str(tmp_path)).collect()
    }

    con = duckdb.connect()
    con.sql(
        # Spark writes a directory of part files; glob inside it.
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = {
        int(cell): (int(n), float(m))
        for cell, n, m in con.sql(spec.oracle).fetchall()
    }
    con.close()

    assert got == want, f"engine {got} != oracle {want}"
    assert 1 not in got, "starved init cell must vanish"
    assert sum(n for n, _ in got.values()) == len(rows)

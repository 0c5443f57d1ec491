

def test_lsh_tune_scurve_monotonicity(spark, sf_dir):
    """S-curve invariants the tuner's arithmetic must satisfy regardless
    of the corpus profile: splitting the same 16 hashes into MORE bands
    (shorter rows) can only make the filter more permissive — expected
    candidate mass is non-decreasing and false-negative mass above the
    threshold non-increasing in the band count. Exactness vs the SQL
    oracle is pinned by test_catalog_oracle; this pins the MATH."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    rows = sorted(
        all_specs()["dedup_lsh_tune"].builder(spark, sf_dir).collect(),
        key=lambda r: r.bands,
    )
    assert [r.bands * r.rows_per_band for r in rows] == [16] * 5
    assert sum(r.recommended for r in rows) == 1
    for lo, hi in zip(rows, rows[1:]):
        assert hi.expected_candidates >= lo.expected_candidates - 1e-9
        assert hi.fn_mass <= lo.fn_mass + 1e-9


def test_incremental_lsh_agrees_with_full_recompute(spark, sf_dir):
    """The incremental path must reach the SAME verdicts a full-corpus
    LSH run would: (sound) every drop's {doc_id, dup_of} is a pair the
    full dedup_minhash_lsh emits, and (complete) every increment doc
    that the full run pairs with an eligible partner (a history doc, or
    an earlier doc of its own batch) is dropped. This is the property
    that lets a pipeline switch to per-batch incremental dedup without
    changing its corpus."""
    from nrg_etl_airflow_spark_emr_spark.operators.dedup import INCR_MOD
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    full = {
        frozenset((r.d1, r.d2))
        for r in specs["dedup_minhash_lsh"].builder(spark, sf_dir).collect()
    }
    verdicts = specs["dedup_incremental_lsh"].builder(spark, sf_dir).collect()
    assert verdicts, "fixture increment is empty"
    dropped = {r.doc_id: r.dup_of for r in verdicts if not r.keep}
    for doc, dup in dropped.items():
        assert frozenset((doc, dup)) in full, (doc, dup)
    eligible = {
        d
        for pair in full
        for d in pair
        if d % INCR_MOD == 0
        and any(
            o % INCR_MOD != 0 or o < d for o in pair if o != d
        )
    }
    assert eligible == set(dropped), (
        eligible - set(dropped), set(dropped) - eligible
    )


def test_twolevel_output_contained_in_allpairs(spark, sf_dir):
    """Soundness of the two-level router: every pair it emits is a true
    qualifying pair — present in the all-pairs recall oracle
    (dedup_embedding_cosine) with the identical exact cosine. (The
    router may MISS borderline pairs; it must never invent one.)"""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    tl = {
        (r.keep_id, r.drop_id): r.cosine
        for r in specs["dedup_embedding_twolevel"].builder(spark, sf_dir).collect()
    }
    assert tl, "fixture output is empty"
    ap = {
        (r.keep_id, r.drop_id): r.cosine
        for r in specs["dedup_embedding_cosine"].builder(spark, sf_dir).collect()
    }
    assert set(tl) <= set(ap), set(tl) - set(ap)
    for pair, cos in tl.items():
        assert cos == ap[pair], (pair, cos, ap[pair])


def test_twolevel_catches_planted_near_dups(spark, sf_dir):
    """Recall at the regime dedup exists for: a TRUE near-dup (cosine
    ~ 1) shares both routing levels with its original — an identical-
    up-to-1ulp vector has the same argmin at every level unless the
    original sits exactly on a cell boundary. Plant a perturbed copy
    (fe[0] + 1, one fixed-point ulp) of EVERY corpus vector and require
    the router to pair each copy with its original. This is the
    guarantee the fixture's background pairs (cosine 0.4-0.51, no true
    dups) cannot exercise: borderline-similarity recall is tunable
    (k1/k2/multi-assign), near-dup recall is the contract."""
    import pyspark.sql.functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
        embedding_dedup_twolevel,
    )
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _dot, _vectors

    OFF = 10_000_000
    base = _vectors(spark, sf_dir).select("vec_id", "fe", "nrm")
    pert_fe = F.concat(
        F.array(F.element_at("fe", 1) + 1), F.slice("fe", 2, 1_000_000)
    )
    pert = base.select(
        (F.col("vec_id") + OFF).alias("vec_id"), pert_fe.alias("fe")
    )
    pert = pert.select(
        "vec_id", "fe", F.sqrt(_dot(F.col("fe"), F.col("fe")).cast("double")).alias("nrm")
    )
    corpus = base.unionByName(pert)
    found = {
        (r.keep_id, r.drop_id): r.cosine
        for r in embedding_dedup_twolevel(
            spark, sf_dir, k1=5, k2=5, iters=2, vectors=corpus
        ).collect()
    }
    base_ids = [r.vec_id for r in base.select("vec_id").collect()]
    planted = {(i, i + OFF) for i in base_ids}
    missing = planted - set(found)
    assert not missing, f"{len(missing)} planted near-dups missed: {sorted(missing)[:5]}"
    for pair in planted:
        assert found[pair] > 0.999, (pair, found[pair])

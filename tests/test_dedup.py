

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

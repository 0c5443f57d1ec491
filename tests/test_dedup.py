

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


def test_simhash_wide_is_tighter_subset_of_banded(spark, sf_dir):
    """The restated-threshold contract: Hamming <= 5 of 120 bits is a
    strictly tighter similarity bound than <= 5 of 32, so every wide
    pair must also be a 32-bit pair (and the wide set must be non-empty
    on the fixture — the planted near-dups survive the tighter bound)."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    wide = specs["dedup_simhash_wide"].builder(spark, sf_dir).select("d1", "d2")
    narrow = specs["dedup_simhash_banded"].builder(spark, sf_dir).select("d1", "d2")
    assert wide.count() > 0
    assert wide.join(narrow, ["d1", "d2"], "left_anti").count() == 0


def test_simhash_wide_agrees_with_minhash_verdicts(spark, sf_dir):
    """Recall cross-check against the independent MinHash LSH verdicts
    (VERDICT r11 item 2): nearly every pair the wide sketch confirms at
    its tight Hamming bound is also a dedup_minhash_lsh near-dup
    verdict on the planted-near-dup fixture. NOT an exact subset: the
    two families measure different similarities — simhash is a
    weighted-cosine over shingle FREQUENCIES, minhash estimates SET
    Jaccard — so a doc pair dominated by repeated shingles can sit
    inside the angular bound yet below the Jaccard threshold (one such
    pair exists at sf0.001). Agreement >= 80% pins that the families
    coincide except at that semantic margin."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    wide = specs["dedup_simhash_wide"].builder(spark, sf_dir).select("d1", "d2")
    mh = specs["dedup_minhash_lsh"].builder(spark, sf_dir).select("d1", "d2")
    n_wide = wide.count()
    n_agree = wide.join(mh, ["d1", "d2"], "left_semi").count()
    assert n_wide > 0 and n_agree / n_wide >= 0.8


def test_simhash_wide_band_values_fit_band_width(spark, sf_dir):
    """Every extracted band value must fit in WIDE_BAND_BITS bits (a
    mis-sized shift/mask would silently merge or split buckets — recall
    still exact by pigeonhole, but the collision budget broken)."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
        WIDE_BAND_BITS,
        WIDE_BANDS,
        _WIDE_BANDS_PER_WORD,
        _simhash_wide,
    )

    sh = _simhash_wide(spark, sf_dir)
    band_vals = F.array(
        *[
            F.shiftright(
                f"w{i // _WIDE_BANDS_PER_WORD}",
                WIDE_BAND_BITS * (i % _WIDE_BANDS_PER_WORD),
            ).bitwiseAND(F.lit((1 << WIDE_BAND_BITS) - 1))
            for i in range(WIDE_BANDS)
        ]
    )
    row = sh.select(
        F.posexplode(band_vals).alias("band_id", "band_val")
    ).agg(
        F.min("band_val").alias("lo"),
        F.max("band_val").alias("hi"),
        F.count_distinct("band_id").alias("nb"),
    ).collect()[0]
    assert row.lo >= 0 and row.hi < (1 << WIDE_BAND_BITS)
    assert row.nb == WIDE_BANDS


def test_simhash_rb_value_equals_banded(spark, sf_dir):
    """dedup_simhash_rb preserves dedup_simhash_banded's EXACT contract
    (same sketch, same Hamming bound): pigeonhole over r-of-b
    combination keys keeps recall exact, so the two rows must be
    value-identical — the property that lets them share one oracle."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    rb = sorted(map(tuple, specs["dedup_simhash_rb"].builder(spark, sf_dir).collect()))
    banded = sorted(
        map(tuple, specs["dedup_simhash_banded"].builder(spark, sf_dir).collect())
    )
    assert rb == banded and len(rb) > 0


def test_simhash_rb_recall_pinned_to_minhash_verdicts(spark, sf_dir):
    """VERDICT r12 item 5's recall pin, same direction as the wide row's
    cross-check: most pairs the r-of-b sketch confirms at Hamming <= 5
    of 32 are also independent dedup_minhash_lsh verdicts on the
    planted-near-dup fixture. The threshold sits slightly below the
    wide row's 80%: this row's pairs are the 32-bit banded set (the
    contract was HELD, not tightened), which includes the looser
    angular margin the 120-bit row filtered out — at sf0.001 that is
    22 of 29 pairs (76%) minhash-confirmed, vs 72 minhash verdicts
    total (Jaccard and frequency-cosine measure different things)."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    specs = all_specs()
    rb = specs["dedup_simhash_rb"].builder(spark, sf_dir).select("d1", "d2")
    mh = specs["dedup_minhash_lsh"].builder(spark, sf_dir).select("d1", "d2")
    n_rb = rb.count()
    n_agree = rb.join(mh, ["d1", "d2"], "left_semi").count()
    assert n_rb > 0 and n_agree / n_rb >= 0.7


def test_simhash_rb_candidate_volume_below_banded(spark, sf_dir):
    """The point of r-of-b: at the IDENTICAL similarity contract, the
    candidate set (pre-Hamming-filter pairs) must be strictly smaller
    than single-block banding's — the 2^(r·w/b) selectivity the Manku
    construction buys for its C(b, r) key fan-out."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.dedup import (
        _BAND_OFFSETS,
        _BAND_WIDTHS,
        _RB_COMBOS,
        RB_BLOCK_BITS,
        RB_BLOCKS,
        _simhashes,
    )
    from functools import reduce

    sh = _simhashes(spark, sf_dir).cache()

    def n_candidates(key_arr):
        k = sh.select("doc_id", F.posexplode(key_arr).alias("kid", "key"))
        a, b = k.alias("a"), k.alias("b")
        return (
            a.join(
                b,
                (F.col("a.kid") == F.col("b.kid"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    banded_keys = F.array(
        *[
            F.shiftright("simhash", off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in zip(_BAND_OFFSETS, _BAND_WIDTHS)
        ]
    )
    block = [
        F.shiftright("simhash", RB_BLOCK_BITS * j).bitwiseAND(
            F.lit((1 << RB_BLOCK_BITS) - 1)
        )
        for j in range(RB_BLOCKS)
    ]
    rb_keys = F.array(
        *[
            reduce(
                lambda acc, ji: acc
                + (block[ji[1]] * F.lit(1 << (RB_BLOCK_BITS * ji[0]))),
                enumerate(combo),
                F.lit(0).cast("long"),
            )
            for combo in _RB_COMBOS
        ]
    )
    n_banded = n_candidates(banded_keys)
    n_rb = n_candidates(rb_keys)
    sh.unpersist()
    assert n_rb < n_banded, (n_rb, n_banded)

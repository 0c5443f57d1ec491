"""Cross-scale determinism invariants.

Several operators advertise that an assignment is a pure function of a
row's KEY — "adding documents never reassigns existing ones". That claim
is only testable ACROSS scales: run the operator on two fixture sizes and
assert the shared keys got identical verdicts. A silent regression here
(e.g. rand(), row_number over a scan, partition-dependent hashing) passes
every single-scale oracle check and still corrupts incremental reruns at
100 TB.

Scope caveat (measured, not assumed): the fixture generator REGENERATES
content per scale — all 500 doc_ids shared by sf0.001 and sf0.01 carry
different text (0/500 equal) — so only KEY-hashed assignments
(doc_id-keyed splits/samples) are scale-invariant here. Content-keyed
ops (minhash/simhash/fingerprints) are deterministic per text, which
single-scale oracle runs already pin; their cross-scale verdicts
legitimately differ with the regenerated text.
"""

from __future__ import annotations

import os

import pytest

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

SPECS = all_specs()


@pytest.fixture(scope="module")
def bigger_sf(sf_dir):
    def _sf_of(d: str) -> float:
        return float(os.path.basename(d.rstrip("/")).removeprefix("sf"))

    root = os.path.dirname(sf_dir.rstrip("/"))
    larger = sorted(
        (
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("sf") and _sf_of(d) > _sf_of(sf_dir)
        ),
        key=_sf_of,
    )
    if not larger:
        pytest.skip(f"no fixture larger than {sf_dir} under {root}")
    return larger[0]


def test_split_assignment_stable_across_scale(spark, sf_dir, bigger_sf):
    """A doc's train/val/test split is hash60(doc_id)-keyed: growing the
    corpus must never flip an existing doc's split."""
    small = {
        r.doc_id: r.split
        for r in SPECS["train_split_assign"].builder(spark, sf_dir).collect()
    }
    big = {
        r.doc_id: r.split
        for r in SPECS["train_split_assign"].builder(spark, bigger_sf).collect()
    }
    shared = set(small) & set(big)
    assert shared, "fixtures share no doc_ids — test is vacuous"
    diverged = {d for d in shared if small[d] != big[d]}
    assert not diverged, (
        f"{len(diverged)} docs changed split across scales "
        f"(sample: {sorted(diverged)[:5]})"
    )


def test_sample_membership_stable_across_scale(spark, sf_dir, bigger_sf):
    """Bernoulli sampling keeps iff hash60('sample:42:'||doc_id) clears a
    fixed threshold — membership of a shared doc_id must agree exactly
    between scales (the property rand()-based sampling cannot give)."""
    small = {r.doc_id for r in SPECS["train_sample_hash"].builder(spark, sf_dir).collect()}
    big = {r.doc_id for r in SPECS["train_sample_hash"].builder(spark, bigger_sf).collect()}
    small_all = {
        r.doc_id for r in SPECS["train_split_assign"].builder(spark, sf_dir).collect()
    }
    big_all = {
        r.doc_id for r in SPECS["train_split_assign"].builder(spark, bigger_sf).collect()
    }
    shared = small_all & big_all
    assert shared
    assert {d for d in shared if d in small} == {d for d in shared if d in big}

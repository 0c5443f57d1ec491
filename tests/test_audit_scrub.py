"""Crafted-fixture pins for the round-8 late registrations.

The shared fixture tables are clean (no NULL vectors, no real PII, no FK
orphans) and unopinionated (no planted duplicate-vs-diverse geometry), so
the driver rows prove only the happy path. These tests run the same
registered builders over crafted parquet fixtures that contain every
defect class — or decision-forcing geometry — the operators exist for.
"""

from __future__ import annotations

import math

import pytest

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs


def _builder(name):
    return all_specs()[name].builder


@pytest.fixture(scope="module")
def dirty_embeddings_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dirty_emb")
    rows = [
        # label 0: every defect class plus two clean vectors.
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.5, 0.5, 0.5, 0.5], 0),
        (2, None, 0),
        (3, [float("nan"), 0.0, 0.0, 0.0], 0),
        (4, [float("inf"), 0.0, 0.0, 0.0], 0),
        (5, [0.0, 0.0, 0.0, 0.0], 0),
        (6, [1.0, 0.0, 0.0], 0),  # wrong dimensionality
        (9, [None, 0.0, 0.0, 0.0], 0),  # NULL element: poisons like NaN
        # label 1: clean only.
        (7, [0.0, 1.0, 0.0, 0.0], 1),
        (8, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    return str(root)


def test_embedding_audit_flags_every_defect_class(spark, dirty_embeddings_dir):
    out = {
        r.label: r
        for r in _builder("qc_embedding_audit")(spark, dirty_embeddings_dir).collect()
    }
    r0 = out[0]
    assert r0.n_vecs == 8
    assert r0.n_null == 1
    assert r0.n_nonfinite == 3  # NaN row + Inf row + NULL-element row
    assert r0.n_zero == 1
    assert r0.n_dim_mismatch == 1
    assert r0.modal_dim == 4  # five finite dim-4 rows beat the one dim-3 row
    # qnorm stats cover only the finite non-null rows: the zero vector
    # anchors the min, the unit vectors the max (1e7 quantization -> 1e14).
    assert r0.min_qnorm2 == 0
    assert r0.max_qnorm2 == 10_000_000**2
    assert math.isfinite(r0.mean_qnorm2)
    r1 = out[1]
    assert (r1.n_null, r1.n_nonfinite, r1.n_zero, r1.n_dim_mismatch) == (0, 0, 0, 0)
    assert r1.min_qnorm2 == r1.max_qnorm2 == 10_000_000**2


@pytest.fixture(scope="module")
def pii_documents_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("pii_docs")
    rows = [
        (0, "reach alice@example.com or bob@ex.org, call 555-1234 or 800-9999, host 10.0.0.1 up"),
        (1, "no identifiers here at all"),
        (2, None),
        (3, "ping 1.2.3.4@ex.com now"),  # dotted quad INSIDE an email
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "documents.parquet"))
    return str(root)


def test_pii_scrub_finds_and_redacts_real_identifiers(spark, pii_documents_dir):
    out = {
        r.doc_id: r
        for r in _builder("text_pii_scrub")(spark, pii_documents_dir).collect()
    }
    # Every doc gains one synthetic email/phone/IP from the in-plan
    # augmentation; doc 0 carries real ones on top.
    r0 = out[0]
    assert (r0.n_emails, r0.n_phones, r0.n_ips) == (3, 3, 2)
    assert "alice@example.com" not in r0.redacted
    assert "10.0.0.1" not in r0.redacted
    assert "555-1234" not in r0.redacted
    assert r0.redacted.count("<EMAIL>") == 3
    assert r0.redacted.count("<PHONE>") == 3
    assert r0.redacted.count("<IP>") == 2
    assert r0.n_chars_removed == sum(
        (len(orig) - len(repl)) * n
        for orig, repl, n in [
            ("alice@example.com", "<EMAIL>", 1),
            ("bob@ex.org", "<EMAIL>", 1),
            ("user0@ex0.com", "<EMAIL>", 1),
            ("555-1234", "<PHONE>", 1),
            ("800-9999", "<PHONE>", 1),
            ("100-0000", "<PHONE>", 1),
            ("10.0.0.1", "<IP>", 1),
            ("0.0.0.0", "<IP>", 1),
        ]
    )
    r1 = out[1]
    assert (r1.n_emails, r1.n_phones, r1.n_ips) == (1, 1, 1)
    # NULL text propagates (concat of NULL is NULL): counts stay NULL rather
    # than inventing a zero — the QC layer upstream owns null-text policy.
    r2 = out[2]
    assert r2.n_emails is None and r2.redacted is None
    # Progressive counting: the dotted quad inside the email local part
    # is consumed by the email redaction — it is NOT double-reported as
    # an IP (only the synthetic IP from the augmentation counts).
    r3 = out[3]
    assert (r3.n_emails, r3.n_ips, r3.n_phones) == (2, 1, 1)
    assert "1.2.3.4" not in r3.redacted


@pytest.fixture(scope="module")
def span_documents_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("span_docs")
    shared15 = " ".join(f"p{i}" for i in range(15))  # 15-token shared passage
    shared8 = " ".join(f"q{i}" for i in range(8))    # 8 tokens: below SPAN_MIN
    rows = [
        (0, "a1 a2 a3 " + shared15 + " a4 a5"),   # passage starts at token 4
        (1, "b1 " + shared15 + " b2 b3 b4"),      # passage starts at token 2
        (2, shared8 + " c1 c2"),
        (3, shared8 + " d1 d2"),
        (4, "e1 e2 e3 e4 e5 e6 e7 e8 e9"),        # shares nothing
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "documents.parquet"))
    return str(root)


def test_substring_spans_are_maximal_and_thresholded(spark, span_documents_dir):
    rows = _builder("dedup_substring_spans")(spark, span_documents_dir).collect()
    # The 15-token passage is ONE maximal span with exact offsets; the
    # 8-token overlap between docs 2/3 is real but below SPAN_MIN, and
    # nothing else in the corpus repeats.
    assert [(r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens) for r in rows] == [
        (0, 1, 4, 2, 15)
    ]


@pytest.fixture(scope="module")
def dirty_star_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dirty_star")
    tables = {
        "region": ([(0,)], "r_regionkey long"),
        # nation 1 points at a region that does not exist.
        "nation": ([(0, 0), (1, 99)], "n_nationkey long, n_regionkey long"),
        # customer 1 has a NULL nation (legal, counted separately).
        "customer": ([(0, 0), (1, None)], "c_custkey long, c_nationkey long"),
        "supplier": ([(0, 0)], "s_suppkey long, s_nationkey long"),
        "part": ([(0,)], "p_partkey long"),
        # order 1 points at a customer that does not exist.
        "orders": ([(0, 0), (1, 42)], "o_orderkey long, o_custkey long"),
        # second lineitem points at an order that does not exist; rows 3+4
        # collide on the (l_orderkey, l_linenumber) composite key.
        "lineitem": (
            [(0, 1, 0, 0), (7, 1, 0, 0), (0, 2, 0, 0), (0, 2, 0, 0)],
            "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long",
        ),
        # events/documents/embeddings give the PK audit full coverage;
        # documents plants a duplicated doc_id.
        "events": ([(0,), (1,)], "event_id long"),
        "documents": ([(0,), (0,), (1,)], "doc_id long"),
        "embeddings": ([(0,), (1,)], "vec_id long"),
    }
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(root / f"{name}.parquet"))
    return str(root)


def test_fk_orphans_flags_orphans_and_null_fks(spark, dirty_star_dir):
    out = {r.edge: r for r in _builder("qc_fk_orphans")(spark, dirty_star_dir).collect()}
    assert len(out) == 7
    assert out["nation.n_regionkey->region"].n_orphans == 1
    assert out["orders.o_custkey->customer"].n_orphans == 1
    assert out["lineitem.l_orderkey->orders"].n_orphans == 1
    assert out["customer.c_nationkey->nation"].n_null_fk == 1
    # A NULL FK is NOT an orphan.
    assert out["customer.c_nationkey->nation"].n_orphans == 0
    clean = ["lineitem.l_partkey->part", "lineitem.l_suppkey->supplier",
             "supplier.s_nationkey->nation"]
    assert all(out[e].n_orphans == 0 and out[e].n_null_fk == 0 for e in clean)


@pytest.fixture(scope="module")
def mmr_embeddings_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mmr_emb")
    rows = [
        # vec 0 is the only query (vec_id < 5 is the query rule).
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        # Three candidates with EQUAL relevance 0.6 to the query:
        # 10 and 11 are exact duplicates; 12 is diverse (sim to 10 = 0.36).
        (10, [0.6, 0.8, 0.0, 0.0], 0),
        (11, [0.6, 0.8, 0.0, 0.0], 0),
        (12, [0.6, 0.0, 0.8, 0.0], 0),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))
    return str(root)


def test_mmr_demotes_duplicates_for_diversity(spark, mmr_embeddings_dir):
    rows = _builder("sim_knn_mmr")(spark, mmr_embeddings_dir).collect()
    picks = [(r.pick, r.vec_id) for r in rows if r.query_id == 0]
    # Relevance alone ranks 10, 11, 12 (tiebreak by vec_id). MMR keeps
    # 10 first, then picks the DIVERSE 12 over the duplicate 11
    # (0.7*0.6 - 0.3*0.36 = 0.312 beats 0.7*0.6 - 0.3*1.0 = 0.12),
    # and the duplicate drops to last. Only 3 candidates exist, so the
    # greedy fill stops there — partial fill is part of the contract.
    assert picks == [(1, 10), (2, 12), (3, 11)]


def test_rag_chunks_overlap_and_cover(spark, tmp_path_factory):
    from nrg_etl_airflow_spark_emr_spark.operators.text import (
        CHUNK_STRIDE,
        CHUNK_TOK,
    )

    root = tmp_path_factory.mktemp("rag_docs")
    toks = [f"w{i}" for i in range(50)]  # 50 tokens -> starts 1, 25 (49 would
    # be a strict sub-span of chunk 1 and must not be generated)
    rows = [(0, " ".join(toks)), (1, "only three tokens")]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(root / "documents.parquet"))
    out = _builder("text_chunk_for_rag")(spark, str(root)).collect()
    d0 = [r for r in out if r.doc_id == 0]
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in d0] == [
        (0, 1, 32),
        (1, 25, 26),
    ]
    # Consecutive chunks overlap by CHUNK_TOK - CHUNK_STRIDE tokens and
    # their union covers every token exactly.
    assert d0[0].chunk_text.split(" ")[CHUNK_STRIDE:] == d0[1].chunk_text.split(
        " "
    )[: CHUNK_TOK - CHUNK_STRIDE]
    covered = set()
    for r in d0:
        covered.update(range(r.start_tok, r.start_tok + r.n_tokens))
    assert covered == set(range(1, 51))
    # A doc shorter than one chunk yields exactly one short chunk.
    d1 = [r for r in out if r.doc_id == 1]
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in d1] == [(0, 1, 3)]
    assert d1[0].chunk_text == "only three tokens"


def test_pk_duplicates_counts_excess_rows(spark, dirty_star_dir):
    out = {r.tbl: r for r in _builder("qc_pk_duplicates")(spark, dirty_star_dir).collect()}
    assert len(out) == 10
    # documents: doc_id 0 twice -> 1 excess row; lineitem: one composite
    # collision -> 1 excess row; everything else clean.
    assert (out["documents"].n_rows, out["documents"].n_distinct_keys,
            out["documents"].n_excess_rows) == (3, 2, 1)
    assert (out["lineitem"].n_rows, out["lineitem"].n_distinct_keys,
            out["lineitem"].n_excess_rows) == (4, 3, 1)
    clean = [t for t in out if t not in ("documents", "lineitem")]
    assert all(out[t].n_excess_rows == 0 for t in clean)


def test_fk_orphans_oracle_survives_null_parent_pk(spark, tmp_path_factory):
    """Oracle-parity pin for the NOT-IN NULL hazard (round-9 advice).

    A NULL PARENT PK plus a real orphan on the same edge: three-valued
    ``fk NOT IN (SELECT pk ...)`` collapses n_orphans to 0 unless the
    subquery null-filters the PK side, while the Spark LEFT ANTI join
    (NULL never equi-matches) still counts the orphan. Runs the
    registered builder AND its DuckDB oracle over the same crafted star
    and requires them to agree on exactly this dirty shape.
    """
    import duckdb

    root = tmp_path_factory.mktemp("nullpk_star")
    tables = {
        "region": ([(0,)], "r_regionkey long"),
        "nation": ([(0, 0)], "n_nationkey long, n_regionkey long"),
        # Parent PK contains a NULL; order 1 is a REAL orphan on this edge.
        "customer": ([(0, 0), (None, 0)], "c_custkey long, c_nationkey long"),
        "supplier": ([(0, 0)], "s_suppkey long, s_nationkey long"),
        "part": ([(0,)], "p_partkey long"),
        "orders": ([(0, 0), (1, 42)], "o_orderkey long, o_custkey long"),
        "lineitem": ([(0, 0, 0)], "l_orderkey long, l_partkey long, l_suppkey long"),
        "events": ([(0,)], "event_id long"),
        "documents": ([(0,)], "doc_id long"),
        "embeddings": ([(0,)], "vec_id long"),
    }
    for name, (rows, schema) in tables.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(root / f"{name}.parquet"))

    spec = all_specs()["qc_fk_orphans"]
    got = {r.edge: r.n_orphans for r in spec.builder(spark, str(root)).collect()}
    assert got["orders.o_custkey->customer"] == 1  # anti-join sees through the NULL PK

    con = duckdb.connect()
    try:
        for name in tables:
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{root}/{name}.parquet/*.parquet')"
            )
        oracle = {r[0]: r[2] for r in con.sql(spec.oracle).fetchall()}
    finally:
        con.close()
    assert oracle == got


def test_embedding_audit_reports_on_fully_null_feed(spark, tmp_path_factory):
    """Round-9 advice pin: when EVERY embedding is NULL the modal-dim
    frame is empty; the audit must still emit per-label rows (the old
    cross join emptied the whole report on exactly this feed). Runs the
    oracle too so both engines agree on the NULL-modal shape."""
    import duckdb

    root = tmp_path_factory.mktemp("allnull_emb")
    rows = [(0, None, 0), (1, None, 0), (2, None, 1)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(root / "embeddings.parquet"))

    spec = all_specs()["qc_embedding_audit"]
    out = {r.label: r for r in spec.builder(spark, str(root)).collect()}
    assert set(out) == {0, 1}
    assert (out[0].n_vecs, out[0].n_null, out[0].n_dim_mismatch) == (2, 2, 0)
    assert (out[1].n_vecs, out[1].n_null) == (1, 1)
    assert out[0].modal_dim is None and out[0].min_qnorm2 is None

    con = duckdb.connect()
    try:
        con.sql(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{root}/embeddings.parquet/*.parquet')"
        )
        orows = con.sql(spec.oracle).fetchall()
    finally:
        con.close()
    assert sorted(orows) == sorted(
        tuple(r) for r in spec.builder(spark, str(root)).collect()
    )


def test_line_dedup_crafted_boilerplate_corpus(spark):
    """text_line_dedup's keep-first law on a crafted corpus (VERDICT
    r11 item 5): a boilerplate segment shared by three docs survives
    only in the lowest (doc_id, pos); a doc that was ALL boilerplate
    stays in the output with empty clean_text; unique docs pass
    through untouched; a within-doc repeat keeps its first occurrence.
    Segments are aligned 8-word windows (LINE_WORDS)."""
    from nrg_etl_airflow_spark_emr_spark.operators.text import line_dedup

    boil = "click here to accept cookies and continue reading"
    rep = "repeated span inside one single document body here"
    rows = [
        (10, boil + " alpha beta gamma delta epsilon zeta eta theta"),
        (20, boil + " one two three four five six seven eight"),
        (30, boil),
        (40, "totally unique words in this very document friend"),
        (50, rep + " " + rep),
    ]
    docs = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert len(got) == 5  # every doc still present, even if emptied
    assert got[10].clean_text == rows[0][1]  # first occurrence keeps all
    assert (got[10].n_kept, got[10].n_dropped) == (2, 0)
    assert got[20].clean_text == "one two three four five six seven eight"
    assert (got[20].n_kept, got[20].n_dropped) == (1, 1)
    assert got[30].clean_text == "" and got[30].n_kept == 0
    assert got[30].n_dropped == 1
    assert got[40].clean_text == rows[3][1]
    assert (got[40].n_kept, got[40].n_dropped) == (1, 0)
    assert got[50].clean_text == rep  # within-doc repeat: first kept
    assert (got[50].n_kept, got[50].n_dropped) == (1, 1)

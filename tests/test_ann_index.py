"""Persisted trained-artifact paths (sources/ann_index.py,
text.write_bpe_artifacts): the train-once / search-many shape. Two
guarantees per artifact — (a) the persisted search/encode is VALUE-
identical to the inline-trainer path (parquet round-trip of the trained
state loses nothing), and (b) the query-side plan contains no trainer
(the whole point: at 100 TB the trainer must not run per query)."""

from __future__ import annotations

from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

SPECS = all_specs()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_persisted_ivf_matches_inline(spark, sf_dir):
    got = _rows(SPECS["sim_knn_ivf_persisted"].builder(spark, sf_dir))
    want = _rows(SPECS["sim_knn_ivf_trained"].builder(spark, sf_dir))
    assert got == want


def test_persisted_ivf_search_plan_has_no_trainer(spark, sf_dir):
    """The search plan must start from parquet scans of the index —
    zero Generate (posexplode) stages, which only the trainer's
    centroid-update rounds produce — and the probes→postings join must
    dynamically prune the cid partitions (the inverted-list skip)."""
    df = SPECS["sim_knn_ivf_persisted"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "trainer leaked into the search plan"
    assert "Scan parquet" in plan
    assert "dynamicpruning" in plan.lower(), (
        "postings scan should partition-prune on probed cells"
    )


def test_read_ivf_index_types(spark, sf_dir, tmp_path):
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        read_ivf_index,
        write_ivf_index,
    )

    path = str(tmp_path / "idx")
    write_ivf_index(spark, sf_dir, path)
    cent, postings = read_ivf_index(spark, path)
    assert dict(cent.dtypes)["cid"] == "bigint"
    assert dict(postings.dtypes)["cid"] == "bigint"
    assert dict(postings.dtypes)["fe"] == "array<bigint>"
    # Postings cover the corpus exactly once.
    assert postings.select("vec_id").distinct().count() == postings.count()


def test_persisted_pq_matches_inline(spark, sf_dir):
    got = _rows(SPECS["sim_knn_pq_persisted"].builder(spark, sf_dir))
    want = _rows(SPECS["sim_knn_pq"].builder(spark, sf_dir))
    assert got == want


def test_persisted_pq_search_plan_has_no_trainer(spark, sf_dir):
    """The persisted PQ search's only Generate stages are the QUERY
    subvector explode (nq rows); the inline path carries ~16 from the
    corpus explode + trainer rounds. Codes/codebooks/norms must come
    from parquet scans."""
    df = SPECS["sim_knn_pq_persisted"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") <= 2, "trainer leaked into the search plan"
    assert "Scan parquet" in plan


def test_ivf_upsert_equals_rebuild_under_same_centroids(spark, sf_dir, tmp_path):
    """The incremental law, pinned in-engine: build on the base slice,
    append the new slice under the persisted centroids — the postings
    must be row-identical to assigning the UNION corpus under those
    same centroids in one shot (and cover every vector exactly once)."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import ivf_assign, ivf_train
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        read_ivf_index,
        upsert_ivf_postings,
        write_ivf_index,
    )

    path = str(tmp_path / "idx")
    v = _vectors(spark, sf_dir).cache()
    base = v.filter(F.col("vec_id") % 4 != 0)
    new = v.filter(F.col("vec_id") % 4 == 0).select("vec_id", "fe", "nrm")
    write_ivf_index(spark, sf_dir, path, vectors=base)
    upsert_ivf_postings(spark, path, new)

    cent_base, _ = ivf_train(base)
    want = {
        (r.vec_id, r.cid) for r in ivf_assign(v, cent_base).select("vec_id", "cid").collect()
    }
    _, postings = read_ivf_index(spark, path)
    got = {(r.vec_id, r.cid) for r in postings.select("vec_id", "cid").collect()}
    assert got == want
    assert len(got) == v.count()


def test_stream_ingest_ivf_equals_batch_upsert(spark, sf_dir, tmp_path):
    """Stream ≡ batch for ANN ingest: the new slice arriving as two
    micro-batches through stream_ingest_ivf must leave the index in the
    same state as the batch upsert — same (vec_id, cid) postings, and
    the search over base ∪ stream segments value-equal to
    sim_knn_ivf_upsert."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import ivf_assign, ivf_train
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        read_ivf_index,
        stream_ingest_ivf,
        write_ivf_index,
    )

    path = str(tmp_path / "idx")
    v = _vectors(spark, sf_dir).cache()
    base = v.filter(F.col("vec_id") % 4 != 0)
    new = v.filter(F.col("vec_id") % 4 == 0).select("vec_id", "fe", "nrm")
    write_ivf_index(spark, sf_dir, path, vectors=base)

    stage = str(tmp_path / "stage")
    new.repartition(2).write.parquet(stage)
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = stream_ingest_ivf(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination()

    cent_base, _ = ivf_train(base)
    want = {
        (r.vec_id, r.cid)
        for r in ivf_assign(v, cent_base).select("vec_id", "cid").collect()
    }
    _, postings = read_ivf_index(spark, path)
    got = {(r.vec_id, r.cid) for r in postings.select("vec_id", "cid").collect()}
    assert got == want
    assert len(got) == v.count()

    # Compaction folds the stream segments into the base postings
    # value-neutrally and leaves no stream directory behind.
    import os

    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import compact_ivf_index

    compact_ivf_index(spark, path)
    assert not os.path.isdir(os.path.join(path, "postings_stream"))
    _, compacted = read_ivf_index(spark, path)
    got2 = {(r.vec_id, r.cid) for r in compacted.select("vec_id", "cid").collect()}
    assert got2 == want


def test_persisted_minhash_dedup_matches_inline(spark, sf_dir):
    got = _rows(SPECS["dedup_incremental_persisted"].builder(spark, sf_dir))
    want = _rows(SPECS["dedup_incremental_lsh"].builder(spark, sf_dir))
    assert got == want


def test_persisted_minhash_reads_index_not_history_sigs(spark, sf_dir):
    """The point of the persisted band index: historical signatures and
    bands come from the parquet ARTIFACT (scans of the mhidx dir), so
    the query-side md5/permutation work covers the increment only."""
    df = SPECS["dedup_incremental_persisted"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    idx_scans = [
        ln for ln in plan.splitlines() if "Scan parquet" in ln and "mhidx" in ln
    ]
    assert len(idx_scans) >= 2, "expected scans of the persisted bands + signatures"


def test_persisted_bpe_encode_matches_inline(spark, sf_dir):
    got = _rows(SPECS["text_bpe_encode_persisted"].builder(spark, sf_dir))
    want = _rows(SPECS["text_bpe_encode"].builder(spark, sf_dir))
    assert got == want


def test_persisted_bpe_encode_plan_has_no_trainer(spark, sf_dir):
    """Encode-from-vocab is one join over exploded words: the 8
    sequential merge rounds (window chains) must be absent — zero
    Window stages in the encode plan."""
    df = SPECS["text_bpe_encode_persisted"].builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "merge-replay leaked into the encode plan"
    assert "Scan parquet" in plan


def test_upsert_empty_batch_is_noop(spark, sf_dir, tmp_path):
    """A day with no new vectors must leave the index unchanged (the
    append writes no rows and search results are identical)."""
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        read_ivf_index,
        upsert_ivf_postings,
        write_ivf_index,
    )

    path = str(tmp_path / "idx")
    write_ivf_index(spark, sf_dir, path)
    _, before = read_ivf_index(spark, path)
    n_before = before.count()
    empty = _vectors(spark, sf_dir).select("vec_id", "fe", "nrm").limit(0)
    upsert_ivf_postings(spark, path, empty)
    _, after = read_ivf_index(spark, path)
    assert after.count() == n_before


def test_bpe_apply_no_merges_is_identity(spark, sf_dir):
    """Replaying an empty merge list returns the vocabulary unchanged —
    the degenerate case of a tokenizer trained to exhaustion at 0."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators._util import spread, t
    from nrg_etl_airflow_spark_emr_spark.operators.text import bpe_apply_merges

    seqs = (
        spread(t(spark, sf_dir, "documents").select("text"))
        .select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "word",
            "n",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ).alias("toks"),
        )
    )
    out = bpe_apply_merges(seqs, [])
    a = {r.word: list(r.toks) for r in seqs.collect()}
    b = {r.word: list(r.toks) for r in out.collect()}
    assert a == b


def test_pq_upsert_equals_rebuild_under_same_codebooks(spark, sf_dir, tmp_path):
    """The PQ incremental law in-engine: encode-new-under-persisted-
    codebooks leaves codes row-identical to encoding the union corpus
    under those codebooks in one shot."""
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.kmeans import (
        lloyd_fit_grouped_quantized,
        pq_assign,
    )
    from nrg_etl_airflow_spark_emr_spark.operators.similarity import (
        PQ_ITERS,
        PQ_K,
        _subvectors,
        _vectors,
    )
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        read_pq_index,
        upsert_pq_codes,
        write_pq_index,
    )

    path = str(tmp_path / "idx")
    v = _vectors(spark, sf_dir).cache()
    base = v.filter(F.col("vec_id") % 4 != 0)
    new = v.filter(F.col("vec_id") % 4 == 0).select("vec_id", "fe", "nrm")
    write_pq_index(spark, sf_dir, path, vectors=base)
    upsert_pq_codes(spark, path, new)

    _, cb_base = lloyd_fit_grouped_quantized(
        _subvectors(base, "vec_id", "fe", "sv"), PQ_K, PQ_ITERS
    )
    want = {
        (r.gid, r.vec_id, r.cid)
        for r in pq_assign(_subvectors(v, "vec_id", "fe", "sv"), cb_base)
        .select("gid", "vec_id", "cid")
        .collect()
    }
    _, codes, norms = read_pq_index(spark, path)
    got = {(r.gid, r.vec_id, r.cid) for r in codes.collect()}
    assert got == want
    assert norms.count() == v.count()


def test_compact_recovers_from_crash_states(spark, sf_dir, tmp_path):
    """Compaction crash discipline: (a) a complete tmp segment left by
    a crash is swapped in on the next run — never recompacted from a
    state that would lose or duplicate the folded stream rows; (b) an
    aside dir surviving a post-swap crash is superseded garbage and
    must not resurrect duplicates."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.operators.similarity import _vectors
    from nrg_etl_airflow_spark_emr_spark.sources.ann_index import (
        compact_ivf_index,
        read_ivf_index,
        upsert_ivf_postings,
        write_ivf_index,
    )

    path = str(tmp_path / "idx")
    v = _vectors(spark, sf_dir).cache()
    write_ivf_index(spark, sf_dir, path, vectors=v.filter(F.col("vec_id") % 4 != 0))
    upsert_ivf_postings(
        spark, path, v.filter(F.col("vec_id") % 4 == 0).select("vec_id", "fe", "nrm")
    )
    n_total = v.count()
    _, p0 = read_ivf_index(spark, path)
    want = {(r.vec_id, r.cid) for r in p0.select("vec_id", "cid").collect()}

    # Crash state (a): tmp fully written (simulate by writing it the way
    # compaction does), stream still present, swap never ran.
    tmp = os.path.join(path, "postings_compacting")
    p0.write.mode("overwrite").partitionBy("cid").parquet(tmp)
    assert os.path.isfile(os.path.join(tmp, "_SUCCESS"))
    compact_ivf_index(spark, path)  # must finish the swap, not recompact
    _, p1 = read_ivf_index(spark, path)
    got = {(r.vec_id, r.cid) for r in p1.select("vec_id", "cid").collect()}
    assert got == want and p1.count() == n_total  # exactly once each

    # Crash state (b): aside left behind after a completed swap.
    aside = os.path.join(path, "postings_stream_folding")
    shutil.copytree(os.path.join(path, "postings"), aside)
    compact_ivf_index(spark, path)
    _, p2 = read_ivf_index(spark, path)
    assert p2.count() == n_total
    assert not os.path.isdir(aside)

"""Persisted ANN index artifacts — train once, search many.

Every inline ANN query (sim_knn_ivf_trained, sim_knn_ivf_mmr, the PQ
pair) runs its trainer as a plan prefix on EVERY execution. That is the
one shape a 100 TB deployment cannot pay: there the index is a
*persisted artifact* — built once by a maintenance job, read by
thousands of searches. This module writes the trained-IVF index the way
a vector store lays it out:

- ``centroids/``  — k rows (cid, c_q): the routing table, broadcast at
  search time. Tiny at any corpus scale (k grows with n but stays
  millions of rows / MBs at 100 TB, still broadcastable).
- ``postings/``   — the corpus (vec_id, fe, nrm) PARTITIONED BY its
  trained cell id. Hive partitioning on cid is the physical realization
  of the IVF inverted lists: a query that probes nprobe cells touches
  nprobe directories and Spark's partition pruning (static via an
  IN-list, dynamic via DPP on the probes join) skips every other file
  without opening it. At 100 TB this is the difference between a full
  corpus scan per query batch and nprobe/ncells of it.

Exactness: fe is array<bigint> (fixed-point), c_q array<bigint>, nrm a
stored double — all three round-trip through parquet bit-exactly, so a
search over the persisted index hash-matches the inline-trainer path,
and the SAME DuckDB oracle gates both.

Reference parity note: the reference persists only Hive-partitioned
parquet fact tables (nrg_etl.py:37,72); the index layout here applies
that same sink discipline to ANN state, which the reference lacks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_ivf_index(
    spark: SparkSession, sf_dir: str, path: str, vectors: DataFrame | None = None
) -> None:
    """Build the trained-IVF index over ``sf_dir``'s embeddings (or an
    explicit ``vectors`` frame — e.g. the base slice of an incremental
    build) and persist it under ``path`` (centroids/ + cid-partitioned
    postings/). Overwrites. This is the once-per-corpus maintenance
    job; searches read the artifact via :func:`read_ivf_index`."""
    from ..operators.kmeans import ivf_train
    from ..operators.similarity import _vectors

    import shutil

    v = vectors if vectors is not None else _vectors(spark, sf_dir).cache()
    cent, fassign = ivf_train(v)
    cent.write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    (
        fassign.write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(path, "postings"))
    )
    # A rebuild (e.g. the centroid-retrain job after stream growth)
    # covers the whole corpus — stale stream segments from the previous
    # epoch would DUPLICATE their vectors through read_ivf_index's
    # union. Clear them as part of the overwrite.
    stream_dir = os.path.join(path, "postings_stream")
    if os.path.isdir(stream_dir):
        shutil.rmtree(stream_dir)


def upsert_ivf_postings(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental index maintenance — the operation a GROWING corpus
    runs instead of rebuilds: assign ``new_vectors`` (vec_id/fe/nrm)
    under the index's PERSISTED centroids (ivf_assign — the identical
    exact-BIGINT argmin the trainer used) and APPEND them to the
    cid-partitioned postings. mode("append") into Hive partitions
    touches only the cells the new batch lands in — at 100 TB a daily
    ingest writes a few files into a few inverted-list directories,
    never rewriting the corpus. Centroids are NOT retrained: the
    incremental law (search over the upserted index == assignment of
    the union corpus under the OLD centroids) is what the
    sim_knn_ivf_upsert oracle states, and the standard IVF maintenance
    contract (periodic retrain is a separate, rarer job).

    Replay semantics: a bare append is NOT idempotent — re-running a
    failed batch duplicates its postings. Production ingest should run
    through stream_ingest_ivf (checkpoint + per-batch dynamic
    overwrite, effectively exactly-once) or dedupe on vec_id after a
    failed job; this function is the single-shot maintenance step."""
    from ..operators.kmeans import ivf_assign

    cent, _ = read_ivf_index(spark, path)
    (
        ivf_assign(new_vectors, cent)
        .write.mode("append")
        .partitionBy("cid")
        .parquet(os.path.join(path, "postings"))
    )


def write_pq_index(
    spark: SparkSession, sf_dir: str, path: str, vectors: DataFrame | None = None
) -> None:
    """Build the product-quantization index over ``sf_dir``'s embeddings
    and persist it under ``path`` — the real IVFADC storage shape, where
    the index IS the compressed corpus:

    - ``codebooks/`` — M*K rows (gid, cid, c_q): the per-subspace
      codebook entries; broadcast-sized at any corpus scale.
    - ``codes/``     — M rows per vector (gid, vec_id, cid): the 4-bit
      codes, ~100x smaller than the raw vectors — what the ADC scan
      reads instead of the corpus.
    - ``norms/``     — (vec_id, nrm): one stored double per vector, the
      denominator of cosine-via-IP.

    Search reads codes + codebooks + norms; raw vectors are fetched (by
    vec_id, from the source table) ONLY for shortlist rows."""
    from ..operators.kmeans import lloyd_fit_grouped_quantized
    from ..operators.similarity import (
        PQ_ITERS,
        PQ_K,
        _check_pq_dim,
        _subvectors,
        _vectors,
    )

    v = vectors if vectors is not None else _vectors(spark, sf_dir).cache()
    _check_pq_dim(len(v.select("fe").first()[0]))
    subs = _subvectors(v, "vec_id", "fe", "sv")
    codes, cent = lloyd_fit_grouped_quantized(subs, PQ_K, PQ_ITERS)
    cent.write.mode("overwrite").parquet(os.path.join(path, "codebooks"))
    codes.select("gid", "vec_id", "cid").write.mode("overwrite").parquet(
        os.path.join(path, "codes")
    )
    v.select("vec_id", "nrm").write.mode("overwrite").parquet(
        os.path.join(path, "norms")
    )


def upsert_pq_codes(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental PQ maintenance: ENCODE ``new_vectors`` (vec_id/fe/
    nrm) under the index's PERSISTED codebooks (pq_assign — the
    trainer's exact-BIGINT per-subspace argmin) and append their codes
    + norms. Codebooks are NOT retrained — the incremental law (search
    over the upserted index == codes of the union corpus under the OLD
    codebooks) is what sim_knn_pq_upsert's oracle states. At 100 TB the
    appended codes are ~1% of the appended vectors' bytes: the daily
    ingest writes compressed-corpus deltas. Same replay caveat as
    upsert_ivf_postings: a bare append is not idempotent — wrap in a
    checkpointed foreachBatch (the stream_ingest_ivf pattern) for
    exactly-once ingest."""
    from ..operators.kmeans import pq_assign
    from ..operators.similarity import _subvectors

    cb, _codes, _norms = read_pq_index(spark, path)
    subs = _subvectors(new_vectors, "vec_id", "fe", "sv")
    (
        pq_assign(subs, cb)
        .select("gid", "vec_id", "cid")
        .write.mode("append")
        .parquet(os.path.join(path, "codes"))
    )
    new_vectors.select("vec_id", "nrm").write.mode("append").parquet(
        os.path.join(path, "norms")
    )


def read_pq_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load a persisted PQ index: (codebooks: gid/cid/c_q, codes:
    gid/vec_id/cid, norms: vec_id/nrm)."""
    cb = spark.read.parquet(os.path.join(path, "codebooks")).select(
        "gid", "cid", "c_q"
    )
    codes = spark.read.parquet(os.path.join(path, "codes")).select(
        "gid", "vec_id", "cid"
    )
    norms = spark.read.parquet(os.path.join(path, "norms")).select("vec_id", "nrm")
    return cb, codes, norms


def stream_ingest_ivf(vectors_stream: DataFrame, index_path: str, checkpoint: str):
    """STREAMING ANN ingest — upsert_ivf_postings as a Structured
    Streaming sink: each micro-batch of new vectors (vec_id/fe/nrm) is
    assigned under the index's persisted centroids (the same ivf_assign
    law) and landed in ``postings_stream/`` partitioned by
    (ingest_batch, cid) via DYNAMIC partition overwrite — a replayed
    batch (failure between write and checkpoint commit) overwrites its
    own ingest_batch partitions instead of duplicating them, the
    effectively-exactly-once contract foreach_batch_parquet_sink
    established. Searches read base ∪ stream segments transparently
    (read_ivf_index) — the vector-store memtable-flush shape: the base
    segment is the bulk build, stream segments accrue per trigger, and
    a periodic compaction (compact_parquet per cid) folds them in.
    Returns the started query; drive with trigger(availableNow=True)."""
    from ..operators.kmeans import ivf_assign

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cent, _ = read_ivf_index(spark, index_path, include_stream=False)
        (
            ivf_assign(batch_df, cent)
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch", "cid")
            .parquet(os.path.join(index_path, "postings_stream"))
        )

    return (
        vectors_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_ivf_index(spark: SparkSession, path: str) -> None:
    """Fold stream-ingested segments back into the base postings — the
    periodic maintenance job that completes the memtable-flush cycle:
    read base ∪ postings_stream, rewrite ``postings/`` in one
    cid-partitioned pass, drop the stream directory. Value-neutral by
    construction (the union is exactly what searches already read —
    pinned in tests/test_ann_index.py); what it buys is file count: a
    long-running ingest leaves one file per (ingest_batch, cid), and
    per-cell scan cost at 100 TB is listing + open overhead once files
    outnumber row groups.

    Crash discipline (no atomic multi-dir op exists on a plain
    filesystem — true atomicity is a manifest pointer, the table-format
    upgrade): (1) the rewrite lands in a temp dir; (2) the stream dir
    is renamed ASIDE (readers stop unioning it — they see the
    pre-ingest base snapshot, a bounded STALENESS window, never
    duplicates); (3) the base swaps in via two renames; (4) cleanup.
    A crash leaves, at worst, the aside/old dirs on disk — every row
    still exists exactly once in (final ∪ aside), nothing is ever both
    in the new base AND still unioned from the stream dir (the
    duplication the naive delete-stream-last ordering allowed)."""
    import shutil

    final_dir = os.path.join(path, "postings")
    tmp_dir = os.path.join(path, "postings_compacting")
    old_dir = os.path.join(path, "postings_old")
    stream_dir = os.path.join(path, "postings_stream")
    aside_dir = os.path.join(path, "postings_stream_folding")

    def _finish_swap() -> None:
        # tmp is complete and supersedes base ∪ stream: swap it in and
        # clear every superseded dir. Safe to re-run from any crash
        # point past tmp completion.
        if os.path.isdir(final_dir):
            if os.path.isdir(old_dir):
                shutil.rmtree(old_dir)
            os.rename(final_dir, old_dir)
        os.rename(tmp_dir, final_dir)
        for d in (old_dir, aside_dir, stream_dir):
            if os.path.isdir(d):
                shutil.rmtree(d)

    # Recover a crashed prior run first. A COMPLETE tmp segment
    # (Spark's _SUCCESS marker) already holds base ∪ stream — finish
    # its swap rather than recompacting (deleting the aside/stream dirs
    # without it would lose the folded rows). A partial tmp is garbage.
    if os.path.isfile(os.path.join(tmp_dir, "_SUCCESS")):
        _finish_swap()
        return
    if os.path.isdir(tmp_dir):
        shutil.rmtree(tmp_dir)
    if os.path.isdir(old_dir):
        if os.path.isdir(final_dir):
            shutil.rmtree(old_dir)  # crash after the final swap
        else:
            os.rename(old_dir, final_dir)  # crash between the renames
    if os.path.isdir(aside_dir):
        # aside is created only AFTER tmp completes; tmp being absent
        # therefore means the swap finished (final already holds the
        # folded rows) and only the cleanup crashed — aside is
        # superseded, never restored (restoring would duplicate).
        shutil.rmtree(aside_dir)

    _, postings = read_ivf_index(spark, path)
    postings.write.mode("overwrite").partitionBy("cid").parquet(tmp_dir)
    if os.path.isdir(stream_dir):
        os.rename(stream_dir, aside_dir)  # readers stop seeing the stream
    _finish_swap()  # tmp already contains base ∪ stream


def read_ivf_index(
    spark: SparkSession, path: str, include_stream: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Load a persisted IVF index: (cent: cid/c_q, postings:
    vec_id/fe/nrm/cid). cid comes back as a partition column (inferred
    int) — cast to long so downstream joins match the trainer's type.
    Stream-ingested segments (postings_stream/, see stream_ingest_ivf)
    union in transparently unless ``include_stream=False``."""
    cent = spark.read.parquet(os.path.join(path, "centroids")).select(
        F.col("cid").cast("long").alias("cid"), "c_q"
    )
    postings = spark.read.parquet(os.path.join(path, "postings")).select(
        "vec_id", "fe", "nrm", F.col("cid").cast("long").alias("cid")
    )
    stream_dir = os.path.join(path, "postings_stream")
    if include_stream and os.path.isdir(stream_dir):
        postings = postings.unionByName(
            spark.read.parquet(stream_dir).select(
                "vec_id", "fe", "nrm", F.col("cid").cast("long").alias("cid")
            )
        )
    return cent, postings

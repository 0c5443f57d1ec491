"""Persisted ANN / dedup index artifacts — train once, search many,
published through a MANIFEST POINTER.

Every inline ANN query (sim_knn_ivf_trained, sim_knn_ivf_mmr, the PQ
pair) runs its trainer as a plan prefix on EVERY execution. That is the
one shape a 100 TB deployment cannot pay: there the index is a
*persisted artifact* — built once by a maintenance job, read by
thousands of searches. This module writes trained indexes the way a
vector store lays them out, and commits every state change the way a
table format does — by writing ONE new immutable manifest file, never
by renaming or deleting data a reader might hold:

- ``manifest/vNNNNNNNN.json`` — the committed states. A manifest lists
  the exact segment directories of its version; it is live only once
  its ``vNNNNNNNN.committed`` marker exists (creating an empty file is
  the local-fs stand-in for an object store's atomic PUT / a
  transaction log's put-if-absent — the Delta/Iceberg commit
  mechanism). Readers pin the highest committed manifest; a torn
  publish (json without marker) is invisible garbage, and NOTHING in
  any publish path renames or removes a file (the round-10
  ``os.rename`` swap choreography and its crash matrix are gone).
- ``centroids-vNNNNNNNN/`` / ``postings-vNNNNNNNN*/`` — immutable
  per-commit segment dirs. The IVF postings are PARTITIONED BY trained
  cell id: Hive partitioning on cid is the physical realization of the
  IVF inverted lists — a query that probes nprobe cells touches nprobe
  directories and Spark's partition pruning skips every other file
  without opening it. At 100 TB this is the difference between a full
  corpus scan per query batch and nprobe/ncells of it.
- ``postings_stream/ingest_batch=N/`` — streaming-ingest segments
  (stream_ingest_ivf). Each micro-batch owns ONE directory, written
  with whole-dir overwrite so a replayed batch heals itself; the
  batch's ``_SUCCESS`` marker is its commit record. Readers union
  committed batches with id > the manifest's ``folded_upto`` fence —
  so compaction retires stream segments by MOVING THE FENCE, never by
  deleting them, and a batch landing while compaction runs (id above
  the fence it publishes) stays live: every row exists exactly once in
  (manifest segments ∪ live stream batches) across any crash point.
- ``vacuum_index`` — the ONLY place data is deleted: drops dirs no
  committed current manifest references (superseded segments, folded
  stream batches, torn writes). Crash-safe because everything it
  touches is already unreachable through the current manifest. In
  production it runs with a retention window so pinned readers finish
  first; the single-maintenance-writer assumption (standard for table
  formats without a lock service) is documented here once.

Exactness: fe is array<bigint> (fixed-point), c_q array<bigint>, nrm a
stored double — all three round-trip through parquet bit-exactly, so a
search over the persisted index hash-matches the inline-trainer path,
and the SAME DuckDB oracle gates both. Segment reads always pass the
manifest-recorded schema explicitly — schema inference never runs, so
an empty segment (a day with no new vectors) reads back as an empty
frame instead of failing inference.

Reference parity note: the reference persists only Hive-partitioned
parquet fact tables (nrg_etl.py:37,72); the index layout here applies
that same sink discipline to ANN state, which the reference lacks, and
the manifest commit reuses the mechanism snk_snapshot_timetravel
(operators/formats.py) established for plain-parquet snapshots.
"""

from __future__ import annotations

import json
import os
import re
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# --- manifest mechanics -------------------------------------------------------

_VER_RE = re.compile(r"^v(\d{8})\.json$")
_SEG_RE = re.compile(r"-v\d{8}")


def _manifest_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def _committed_versions(path: str) -> list[int]:
    d = _manifest_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        m = _VER_RE.match(f)
        if m and os.path.isfile(os.path.join(d, f"v{int(m.group(1)):08d}.committed")):
            out.append(int(m.group(1)))
    return sorted(out)


def current_manifest(path: str) -> dict | None:
    """The highest COMMITTED manifest, or None for an empty index root.
    A json without its .committed marker is a torn publish — ignored."""
    vs = _committed_versions(path)
    if not vs:
        return None
    with open(os.path.join(_manifest_dir(path), f"v{vs[-1]:08d}.json")) as fh:
        return json.load(fh)


class ConcurrentWriterError(RuntimeError):
    """Raised when a publish loses the optimistic-concurrency check:
    another writer committed a manifest after this writer read its
    parent. The loser's segments are torn (unreferenced, vacuumable)
    and the index stays at the winner's committed snapshot."""


def _next_version(path: str) -> int:
    """CLAIM the next version number by exclusively creating its
    (empty, torn) manifest JSON. Two concurrent writers therefore can
    never own the same version — and since every segment directory is
    named by its owner's version, they can never clobber each other's
    data files either. The placeholder is invisible to readers (no
    .committed marker) and its number is never reused (every manifest
    JSON, committed or torn, counts), so a crashed writer just leaves
    a skipped number — the existing torn-json discipline."""
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    while True:
        nums = [int(m.group(1)) for f in os.listdir(d) if (m := _VER_RE.match(f))]
        n = max(nums, default=0) + 1
        try:
            fd = os.open(
                os.path.join(d, f"v{n:08d}.json"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return n
        except FileExistsError:
            continue  # raced another claimer; re-list and take the next


def _publish(path: str, manifest: dict, expect_parent: int | None = None) -> None:
    """Commit a manifest: write its json, fsync, then create the
    .committed marker. The marker creation is the atomic commit point —
    no renames; a crash before it leaves an invisible torn json whose
    version number is simply skipped forever after.

    ``expect_parent`` is the optimistic-concurrency token (VERDICT r12
    item 3 — single-writer as MECHANISM, not contract): the committed
    version this writer READ when it planned its change (0 for an empty
    root). The publish is a compare-and-swap on it, in two layers:

    - pre-check: if the current committed max is no longer
      ``expect_parent``, another writer already won — raise before
      committing anything;
    - post-verify: after creating our marker, re-list; if ANY other
      version above ``expect_parent`` is committed — lower OR higher
      than ours — a racer slipped in between check and marker: retract
      OUR OWN marker (the one file this path may remove, microseconds
      old and ours) and raise. Checking only the interval below our
      number (the r13 shape) had a TOCTOU hole: racer B claims the
      HIGHER number, fully commits while A's json is torn, then A
      commits and sees an empty interval below itself — both manifests
      committed, readers take B, and A's rows are silently lost while
      A's caller saw success. With the symmetric check the worst case
      is both racers retract and raise (at-most-one-winner; callers
      already handle ConcurrentWriterError and retry) — strictly safer
      than a silent lost update. The loser's segments and torn json are
      unreferenced garbage for the next vacuum.

    On an object store the same protocol rides on conditional PUT of
    the marker; locally the exclusive-create is the primitive. Callers
    that pass ``None`` (layout-bootstrap tests) skip the check."""
    ver = manifest["version"]
    d = _manifest_dir(path)
    os.makedirs(d, exist_ok=True)
    if expect_parent is not None:
        vs = _committed_versions(path)
        cur = vs[-1] if vs else 0
        if cur != expect_parent:
            raise ConcurrentWriterError(
                f"publish of v{ver} expected parent v{expect_parent} but the "
                f"index is at v{cur}: another writer committed first"
            )
    j = os.path.join(d, f"v{ver:08d}.json")
    with open(j, "w") as fh:
        json.dump(manifest, fh, indent=1)
        fh.flush()
        os.fsync(fh.fileno())
    marker = os.path.join(d, f"v{ver:08d}.committed")
    with open(marker, "w") as fh:
        fh.flush()
        os.fsync(fh.fileno())
    if expect_parent is not None:
        racers = [
            v
            for v in _committed_versions(path)
            if v > expect_parent and v != ver
        ]
        if racers:
            os.remove(marker)  # retract our own commit — torn json remains
            raise ConcurrentWriterError(
                f"publish of v{ver} raced committed v{racers} past parent "
                f"v{expect_parent}: retracted"
            )


def _sized(df: DataFrame, *cols: str) -> DataFrame:
    """Size-adaptive output layout for index segment writes (guide §6):
    an AQE REBALANCE hint keyed on the write's partitionBy columns (or
    keyless for unpartitioned segments). Without it every segment write
    fanned out tasks x partition-values files — the sf0.1 IVF postings
    segment was 322 files of a few KB each (r15 measurement), paying
    driver commit time per file on write and an open per file on every
    read-back. REBALANCE coalesces small partitions to the advisory
    size AND splits oversized ones, so the same code writes one tidy
    file per cell locally and size-bounded multi-file cells at 100 TB —
    unlike a repartition(cols), which would cap a cell at one task."""
    return df.hint("rebalance", *cols) if cols else df.hint("rebalance")


def _seg(name: str, ver: int, suffix: str = "") -> str:
    return f"{name}-v{ver:08d}{suffix}"


def _pin(df: DataFrame) -> bool:
    """Persist ``df`` only if the CALLER has not already; returns True
    when this call now owns the pin (and must release it). Spark
    persistence is not reference-counted — the upserts' old
    unconditional persist()/unpersist() pair silently dropped a
    caller's cache pin on an already-cached batch, and a failed write
    leaked the pin entirely (ADVICE r13). Pair with try/finally."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return False
    df.persist()
    return True


def _read_segments(
    spark: SparkSession, path: str, dirs: list[str], schema_json: str
) -> DataFrame:
    """Union the listed segment dirs under the manifest-recorded schema.
    Explicit schema means (a) no inference job, (b) empty segments (a
    zero-row write leaves only _SUCCESS) read back as empty frames, and
    (c) Hive partition columns (cid) take the recorded type directly —
    no int->long cast bolted on after inference."""
    schema = StructType.fromJson(json.loads(schema_json))
    parts = [
        spark.read.schema(schema).parquet(os.path.join(path, d)) for d in dirs
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


_EPOCH_FILE = "_centroid_epoch"


def _write_batch_epoch(path: str, stream: str, batch_id: int, epoch: str) -> None:
    """Record WHICH centroid segment(s) routed this stream batch — a
    tiny marker inside the batch dir, written after the parquet commit
    (so a crash between the two leaves a committed batch with no
    marker, which compaction treats as unknown-epoch and re-routes
    conservatively). Replay's whole-dir overwrite removes the marker
    with the dir and the replayed write recreates it."""
    with open(
        os.path.join(path, stream, f"ingest_batch={batch_id}", _EPOCH_FILE), "w"
    ) as fh:
        fh.write(epoch)


def _batch_epoch(path: str, stream: str, batch_id: int) -> str | None:
    try:
        with open(
            os.path.join(path, stream, f"ingest_batch={batch_id}", _EPOCH_FILE)
        ) as fh:
            return fh.read().strip()
    except OSError:
        return None


def _committed_stream_batches(path: str, stream: str, above: int) -> list[int]:
    """ingest_batch ids with a complete (_SUCCESS-marked) directory
    under ``stream/`` and id > ``above`` (the manifest fence). A torn
    batch write has no _SUCCESS and is invisible until its replay
    overwrites the directory."""
    root = os.path.join(path, stream)
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = re.match(r"^ingest_batch=(\d+)$", d)
        if (
            m
            and int(m.group(1)) > above
            and os.path.isfile(os.path.join(root, d, "_SUCCESS"))
        ):
            out.append(int(m.group(1)))
    return sorted(out)


def _max_committed_batch(path: str, stream: str) -> int:
    bs = _committed_stream_batches(path, stream, above=-1)
    return bs[-1] if bs else -1


def _contiguous_prefix(batches: list[int], fence: int) -> list[int]:
    """The longest gap-free run of committed batch ids starting at
    ``fence + 1``. Compaction folds (and fences) ONLY this prefix: the
    published fence then never jumps a hole, so a batch id that commits
    late — a second stream with a fresh checkpoint restarting ids, or a
    straggler landing out of order, both outside the single-writer
    contract but cheap to survive — can never be fenced without having
    been folded (fence > gap would fold-skip it permanently; fence at
    the prefix end leaves it live until a later compaction reads it).
    Folding past a gap was silent row loss; this makes it structurally
    impossible."""
    out: list[int] = []
    nxt = fence + 1
    for b in batches:
        if b != nxt:
            break
        out.append(b)
        nxt += 1
    return out


def vacuum_index(path: str, keep_versions: int = 1) -> list[str]:
    """Garbage-collect everything the last ``keep_versions`` committed
    manifests cannot reach: superseded/torn segment dirs (versioned
    names no retained manifest references), stream batches at or below
    the OLDEST retained manifest's folded_upto fence, and older
    manifest files. The ONLY function in this module that deletes, and
    everything it deletes is already unreachable through every retained
    manifest — a crash mid-vacuum just leaves some garbage for the next
    run. ``keep_versions`` IS the retention window: readers pinned to
    any retained version keep working through a vacuum (pinned-reader
    test in tests/test_ann_index.py); size it to the longest-running
    query, exactly the table-format retention contract. Returns the
    removed paths (for tests/audit)."""
    import shutil

    vs = _committed_versions(path)
    if not vs:
        return []
    kept_vers = vs[-max(keep_versions, 1):]
    kept = []
    for ver in kept_vers:
        with open(os.path.join(_manifest_dir(path), f"v{ver:08d}.json")) as fh:
            kept.append(json.load(fh))
    live: set[str] = set()
    streams: set[str] = set()
    for m in kept:
        for v in m.get("segments", {}).values():
            live.update(v if isinstance(v, list) else [v])
        streams.update(m.get("streams", []))
    # A batch is removable only when EVERY retained manifest has folded
    # (fenced) it — i.e. below the oldest retained fence.
    fence = min(m.get("folded_upto", -1) for m in kept)
    oldest = kept_vers[0]
    removed: list[str] = []
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if entry == "manifest":
            for f in sorted(os.listdir(full)):
                mm = re.match(r"^v(\d{8})\.(json|committed)$", f)
                if mm and int(mm.group(1)) < oldest:
                    os.remove(os.path.join(full, f))
                    removed.append(os.path.join(full, f))
        elif entry in streams:
            for b in sorted(os.listdir(full)):
                bm = re.match(r"^ingest_batch=(\d+)$", b)
                if bm and int(bm.group(1)) <= fence:
                    shutil.rmtree(os.path.join(full, b))
                    removed.append(os.path.join(full, b))
            if not os.listdir(full):
                os.rmdir(full)
        elif os.path.isdir(full) and _SEG_RE.search(entry) and entry not in live:
            shutil.rmtree(full)
            removed.append(full)
    return removed


# --- IVF index ----------------------------------------------------------------

_IVF_STREAM = "postings_stream"


def write_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    vectors: DataFrame | None = None,
    vacuum_keep: int = 2,
    folded_upto: int | None = None,
    expect_parent: int | None = None,
    train_fraction: float | None = None,
) -> None:
    """Build the trained-IVF index over ``sf_dir``'s embeddings (or an
    explicit ``vectors`` frame — e.g. the base slice of an incremental
    build) and COMMIT it as a new manifest version: fresh immutable
    centroids-vN/ + cid-partitioned postings-vN/ dirs, then one manifest
    publish. A rebuild (the centroid-retrain job) fences out every
    stream segment of the previous epoch by setting folded_upto to the
    max batch id committed at publish time — their vectors are covered
    by the rebuilt postings, and unioning them would both duplicate
    rows and carry cell ids from the OLD centroids. The publish itself
    deletes nothing; the post-publish vacuum retains the previous
    epoch (``vacuum_keep``, default 2), so readers pinned to the
    previous manifest stay alive through this rebuild and epochs older
    than that retire. Ingest should be quiesced
    across a rebuild (single-maintenance-writer contract — a batch
    landing between the fence capture and the publish would land under
    old centroids yet sit above the fence)."""
    from ..operators.kmeans import ivf_assign, ivf_train
    from ..operators.similarity import _vectors

    if expect_parent is None:
        pm = current_manifest(path)
        expect_parent = pm["version"] if pm else 0
    created = vectors is None
    v = _vectors(spark, sf_dir).cache() if created else vectors
    sample_rows = None
    if train_fraction is not None and train_fraction < 1.0:
        # Same third-decade build law as write_twolevel_index: Lloyd
        # centroids are a statistic — train on a deterministic
        # xxhash64(vec_id) sample, ASSIGN the full corpus under the
        # trained centroids (ivf_assign — a row-local fold, pure map
        # work at any scale). Oracle-gated rows keep full-corpus
        # training; sampled centroids legitimately differ.
        sample = v.filter(
            F.abs(F.xxhash64(F.col("vec_id"), F.lit("ivf-train")))
            % 1_000_000
            < int(train_fraction * 1_000_000)
        ).cache()
        # Degenerate-sample guard (VERDICT r13 finding 2): a fraction
        # small relative to the corpus can yield fewer rows than the
        # trainer's k — ivf_train then seeds short (or empty), and the
        # published index would route every vector through a crippled
        # centroid table with no error: the silent-row-loss class.
        # One cheap count on the already-cached sample decides: short
        # sample → fall back to FULL-corpus training (loud in the
        # manifest: sample_rows records what the fraction actually
        # drew; train_fraction stays as requested for audit).
        from ..operators.kmeans import K_DEFAULT

        sample_rows = sample.count()
        if sample_rows < K_DEFAULT:
            sample.unpersist()
            cent, fassign = ivf_train(v)
        else:
            cent, _sample_assign = ivf_train(sample)
            fassign = ivf_assign(v, cent)
            sample.unpersist()
    else:
        cent, fassign = ivf_train(v)
    ver = _next_version(path)
    cent_dir, post_dir = _seg("centroids", ver), _seg("postings", ver)
    _sized(cent).write.mode("overwrite").parquet(os.path.join(path, cent_dir))
    (
        _sized(fassign, "cid").write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(path, post_dir))
    )
    _publish(
        path,
        {
            "version": ver,
            "kind": "ivf",
            "segments": {"centroids": cent_dir, "postings": [post_dir]},
            "schemas": {
                "centroids": cent.schema.json(),
                "postings": fassign.schema.json(),
            },
            "params": {
                "train_fraction": train_fraction,
                # Effective sample size the fraction drew (None when
                # training was full-corpus by request); a value below
                # the trainer's k means the build fell back to full
                # training rather than publish a crippled index.
                "sample_rows": sample_rows,
            },
            "streams": [_IVF_STREAM],
            # Fence: callers that rebuilt from the index's OWN corpus
            # (maintain_ivf_index) pass the highest batch id that corpus
            # actually covered — fencing any later batch would strand its
            # rows outside both the rebuild and the live stream (ADVICE
            # r12). A from-source build (vectors=None or an external
            # frame) supersedes everything committed so far, so the
            # publish-time max is the right default fence there.
            "folded_upto": (
                folded_upto
                if folded_upto is not None
                else _max_committed_batch(path, _IVF_STREAM)
            ),
        },
        expect_parent=expect_parent,
    )
    if created:
        v.unpersist()
    # Full rebuilds are the natural GC point — but the PREVIOUS epoch
    # must survive this one: vacuum_keep=2 retains the last committed
    # manifest besides the fresh one, so a reader pinned before the
    # rebuild (including maintain_ivf_index's own trainer scan if its
    # cache blocks evict) keeps a live manifest to recompute from.
    # Epochs older than that retire. Size vacuum_keep to the longest
    # running reader; runs strictly AFTER the publish — a crash before
    # it just leaves garbage for the next run.
    vacuum_index(path, keep_versions=vacuum_keep)


def upsert_ivf_postings(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental index maintenance — the operation a GROWING corpus
    runs instead of rebuilds: assign ``new_vectors`` (vec_id/fe/nrm)
    under the index's PERSISTED centroids (ivf_assign — the identical
    exact-BIGINT argmin the trainer used) and commit them as ONE new
    postings segment + manifest version. At 100 TB a daily ingest
    writes a few files into a few inverted-list cid directories of its
    own segment, never rewriting the corpus. Centroids are NOT
    retrained: the incremental law (search over the upserted index ==
    assignment of the union corpus under the OLD centroids) is what the
    sim_knn_ivf_upsert oracle states; periodic retrain is
    maintain_ivf_index's separate, rarer job.

    Replay semantics — better than the round-10 append: the segment dir
    is named by its manifest version, so a failed run leaves a torn,
    UNREFERENCED dir and the retry overwrites that same dir before
    publishing. The upsert is therefore idempotent under retry (the old
    bare append duplicated rows on replay). An empty batch commits
    nothing — no data-less segment, no manifest churn (the same quiet-
    day guard as upsert_pq_codes). The guard pins the batch first, so
    its lineage is evaluated at most once per partition across
    guard + write."""
    from ..operators.kmeans import ivf_assign

    nv = new_vectors
    owned = _pin(nv)
    try:
        if nv.isEmpty():
            return  # empty batch: nothing to assign, nothing to commit
        m = _require(path, "ivf")
        cent = read_ivf_centroids(spark, path, m)
        assigned = ivf_assign(nv, cent)
        ver = _next_version(path)
        seg = _seg("postings", ver, "-upsert")
        (
            _sized(assigned, "cid").write.mode("overwrite")
            .partitionBy("cid")
            .parquet(os.path.join(path, seg))
        )
        m2 = dict(m)
        m2["version"] = ver
        m2["segments"] = dict(m["segments"])
        m2["segments"]["postings"] = list(m["segments"]["postings"]) + [seg]
        _publish(path, m2, expect_parent=m["version"])
    finally:
        if owned:
            nv.unpersist()


def stream_ingest_ivf(vectors_stream: DataFrame, index_path: str, checkpoint: str):
    """STREAMING ANN ingest — upsert_ivf_postings as a Structured
    Streaming sink: each micro-batch of new vectors (vec_id/fe/nrm) is
    assigned under the index's current-manifest centroids (the same
    ivf_assign law) and landed in its OWN directory
    ``postings_stream/ingest_batch=N/`` (cid-partitioned inside) via
    whole-directory overwrite — a replayed batch (failure between write
    and checkpoint commit) rewrites exactly its own directory, stale
    cid subdirs included, the effectively-exactly-once contract; the
    directory's _SUCCESS marker is the batch's commit record, so
    readers and compaction never see a torn batch. Searches read
    manifest segments ∪ committed stream batches above the manifest's
    folded_upto fence (read_ivf_index) — the vector-store
    memtable-flush shape: the base segments are bulk commits, stream
    segments accrue per trigger, and compact_ivf_index periodically
    folds them in by moving the fence. Returns the started query; drive
    with trigger(availableNow=True)."""
    from ..operators.kmeans import ivf_assign

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        m = _require(index_path, "ivf")
        cent = read_ivf_centroids(spark, index_path, m)
        (
            ivf_assign(batch_df, cent)
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(
                os.path.join(index_path, _IVF_STREAM, f"ingest_batch={batch_id}")
            )
        )
        # Epoch marker: names the centroid segment that routed this
        # batch, so compaction re-routes ONLY batches whose epoch is
        # not the current one (round 14 — the heal stays exact, the
        # common in-epoch fold pays no re-assignment).
        _write_batch_epoch(
            index_path, _IVF_STREAM, batch_id, m["segments"]["centroids"]
        )

    return (
        vectors_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_ivf_index(spark: SparkSession, path: str) -> None:
    """Fold committed stream segments and accumulated upsert segments
    into ONE cid-partitioned base segment — the periodic maintenance
    job that completes the memtable-flush cycle. Value-neutral for
    in-epoch batches (re-assignment under the same centroids is the
    identity, so the folded frame is exactly what searches already
    read — pinned in tests/test_ann_index.py); for a batch that landed
    mid-rebuild under the PREVIOUS centroids it is the routing heal
    (VERDICT r13 item 4 — see the re-route note below). What folding
    buys is file count: a long-running ingest leaves one file per
    (batch, cid), and per-cell scan cost at 100 TB is listing + open
    overhead once files outnumber row groups.

    Crash discipline — the manifest makes it one-step: (1) write the
    folded segment under the next version's name; (2) publish a
    manifest listing only that segment, with folded_upto advanced to
    the HIGHEST BATCH THE SNAPSHOT ACTUALLY READ. A crash anywhere
    leaves the previous manifest intact (readers see the pre-compaction
    state — bounded staleness, never loss or duplication) and a retry
    overwrites the same torn dir. Batches landing AFTER the snapshot
    list have higher ids than the published fence, so they remain live
    under the new manifest — the round-10 design deleted the whole
    stream dir and could drop them; here nothing is deleted at all
    (vacuum_index retires fenced batches later)."""
    m = _require(path, "ivf")
    fence = m.get("folded_upto", -1)
    # ONE listing drives both the fold and the published fence: the
    # folded frame is built from exactly these batch dirs, so a batch
    # committing at ANY point after this line is neither folded nor
    # fenced — it stays live above the new fence. (Re-listing inside
    # the read, as read_ivf_index does, would fold a late batch while
    # fencing only up to the earlier listing — duplicating its rows.)
    # Only the CONTIGUOUS prefix folds: a gap in the committed ids
    # (late/out-of-order commit) stops the fold before it, so the
    # published fence can never strand a gap batch (row loss); the gap
    # and everything behind it stay live and fold once it commits.
    batches = _contiguous_prefix(
        _committed_stream_batches(path, _IVF_STREAM, above=fence), fence
    )
    if not batches and len(m["segments"]["postings"]) == 1:
        return  # nothing to fold; keep the manifest pointer unchanged
    cent, postings = read_ivf_index(spark, path, include_stream=False, manifest=m)
    if batches:
        # RE-ROUTE stale batches under the manifest's centroids instead
        # of trusting their stored cid (VERDICT r13 item 4): a batch
        # that landed while a rebuild was training carries the PREVIOUS
        # epoch's routing — folding it as-is would bake the misrouting
        # into the base segment forever. The re-route is EPOCH-GATED
        # (round 14): each batch dir's _centroid_epoch marker names the
        # centroid segment that routed it, so a batch written under the
        # CURRENT centroids folds with its stored cid (zero extra work
        # — the dominant case in a steady-state ingest loop, measured
        # as the one against-grain compaction cost when the re-route
        # was unconditional), while a stale or unknown-epoch batch
        # (mid-rebuild landing, pre-marker layout, crash between
        # parquet and marker) is re-assigned — ivf_assign under the
        # same centroids reproduces the stored cid bit-exactly, so the
        # conservative path is value-neutral too. Map-side broadcast
        # work over only the stale slice — no new shuffle at any scale.
        from ..operators.kmeans import ivf_assign

        epoch = m["segments"]["centroids"]
        in_epoch = [
            b for b in batches if _batch_epoch(path, _IVF_STREAM, b) == epoch
        ]
        stale = [b for b in batches if b not in in_epoch]
        if in_epoch:
            dirs = [os.path.join(_IVF_STREAM, f"ingest_batch={b}") for b in in_epoch]
            postings = postings.unionByName(
                _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                    "vec_id", "fe", "nrm", "cid"
                )
            )
        if stale:
            dirs = [os.path.join(_IVF_STREAM, f"ingest_batch={b}") for b in stale]
            postings = postings.unionByName(
                ivf_assign(
                    _read_segments(
                        spark, path, dirs, m["schemas"]["postings"]
                    ).select("vec_id", "fe", "nrm"),
                    cent,
                ).select("vec_id", "fe", "nrm", "cid")
            )
    ver = _next_version(path)
    seg = _seg("postings", ver)
    _sized(postings, "cid").write.mode("overwrite").partitionBy("cid").parquet(
        os.path.join(path, seg)
    )
    m2 = dict(m)
    m2["version"] = ver
    m2["segments"] = dict(m["segments"])
    m2["segments"]["postings"] = [seg]
    m2["folded_upto"] = batches[-1] if batches else fence
    _publish(path, m2, expect_parent=m["version"])


def read_ivf_centroids(
    spark: SparkSession, path: str, manifest: dict | None = None
) -> DataFrame:
    m = manifest or _require(path, "ivf")
    return _read_segments(
        spark, path, [m["segments"]["centroids"]], m["schemas"]["centroids"]
    ).select("cid", "c_q")


def read_ivf_index(
    spark: SparkSession,
    path: str,
    include_stream: bool = True,
    manifest: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Load the persisted IVF index at its current manifest: (cent:
    cid/c_q, postings: vec_id/fe/nrm/cid). Postings are the manifest's
    base segments ∪ committed stream batches above the folded_upto
    fence (see stream_ingest_ivf) unless ``include_stream=False``.
    Explicit manifest schemas throughout — cid comes back long with no
    cast, and empty segments (quiet ingest days) read as empty frames
    instead of failing schema inference. ``manifest`` pins the read to
    an ALREADY-READ snapshot (ADVICE r13: maintenance must assemble its
    fence, corpus, and CAS token from ONE manifest, not three
    re-reads that can each see a different committed version)."""
    m = manifest if manifest is not None else _require(path, "ivf")
    cent = read_ivf_centroids(spark, path, m)
    postings = _read_segments(
        spark, path, m["segments"]["postings"], m["schemas"]["postings"]
    ).select("vec_id", "fe", "nrm", "cid")
    if include_stream:
        batches = _committed_stream_batches(
            path, _IVF_STREAM, above=m.get("folded_upto", -1)
        )
        if batches:
            dirs = [
                os.path.join(_IVF_STREAM, f"ingest_batch={b}") for b in batches
            ]
            postings = postings.unionByName(
                _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                    "vec_id", "fe", "nrm", "cid"
                )
            )
    return cent, postings


def _require(path: str, kind: str) -> dict:
    m = current_manifest(path)
    if m is None:
        raise FileNotFoundError(f"no committed {kind} index manifest under {path}")
    if m.get("kind") != kind:
        raise ValueError(f"index at {path} is kind={m.get('kind')!r}, want {kind!r}")
    return m


# --- IVF health / retrain wiring ----------------------------------------------

HOT_CELL_RATIO = 3.0  # a cell above 3x the uniform 1/k share is "hot"


def ivf_index_balance(spark: SparkSession, path: str) -> DataFrame:
    """qc_ivf_index_balance over the PERSISTED index (manifest segments
    ∪ live stream): per-cell postings count and corpus share, via the
    SAME cell_balance law the oracle-gated query uses — one hot-cell
    definition across the audit surfaces. At 100 TB this is
    metadata-weight — partition footprints, not data."""
    from ..operators.kmeans import cell_balance

    _, postings = read_ivf_index(spark, path)
    return cell_balance(postings)


def maintain_ivf_index(
    spark: SparkSession, path: str, hot_ratio: float = HOT_CELL_RATIO
) -> dict:
    """The automated consumer of the balance audit — closes the loop
    qc_ivf_index_balance only reports on: read the persisted index's
    per-cell shares; if the hottest cell exceeds ``hot_ratio`` times
    the uniform 1/k share (probe-time p99 is set by the LARGEST probed
    inverted list), RETRAIN the centroids over the index's CURRENT
    corpus (base segments ∪ upserts ∪ the stream batches committed AT
    CORPUS-READ TIME — not the original source table, which misses
    upserted vectors) and commit the rebuild through write_ivf_index's
    manifest publish. The committed-batch list is captured ONCE, when
    the corpus is assembled, and its contiguous-prefix end is passed to
    write_ivf_index as the publish fence: a batch committing between
    the corpus read and the publish stays LIVE above the fence instead
    of being fenced without its rows in the rebuild (silent row loss —
    ADVICE r12). Concurrency is DETECTED, not quiesced (round 14): the
    rebuild publish CASes on the manifest version the corpus was read
    from, so an interleaved UPSERT (which commits a manifest) fails the
    rebuild loudly with ConcurrentWriterError — its rows are absent
    from the rebuilt postings, and retrying the maintenance reads them;
    an interleaved STREAM batch (no manifest commit — invisible to the
    CAS) is re-listed after the publish and folded immediately through
    compact_ivf_index, whose re-route under the rebuilt centroids
    restores its routing (bounded staleness, never loss OR permanent
    misrouting). Versioned segments make the read-while-rewrite safe:
    the trainer scans the old manifest's dirs while writing fresh ones.
    Returns {rebuilt, k, max_share, threshold, healed_batches} for the
    maintenance log. healed_batches is a LOWER BOUND at detection time
    (ADVICE r14): it counts the post-publish listing made here, while
    the compaction it hands off to re-lists and may fold batches that
    committed in between."""
    from ..operators.kmeans import cell_balance

    m = _require(path, "ivf")
    fence = m.get("folded_upto", -1)
    covered = _contiguous_prefix(
        _committed_stream_batches(path, _IVF_STREAM, above=fence), fence
    )
    cent, postings = read_ivf_index(spark, path, include_stream=False, manifest=m)
    if covered:
        dirs = [os.path.join(_IVF_STREAM, f"ingest_batch={b}") for b in covered]
        postings = postings.unionByName(
            _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                "vec_id", "fe", "nrm", "cid"
            )
        )
    k = cent.count()
    stats = (
        cell_balance(postings)
        .agg(F.max("n_postings").alias("mx"), F.sum("n_postings").alias("tot"))
        .collect()[0]
    )
    max_share = (stats["mx"] or 0) / max(stats["tot"] or 0, 1)
    threshold = hot_ratio / max(k, 1)
    rebuilt = max_share > threshold
    healed_batches = 0
    if rebuilt:
        corpus = postings.select("vec_id", "fe", "nrm").cache()
        try:
            corpus.count()  # pin the old-manifest scan BEFORE the rebuild's
            # post-publish vacuum retires those directories
            new_fence = covered[-1] if covered else fence
            write_ivf_index(
                spark,
                sf_dir="",
                path=path,
                vectors=corpus,
                folded_upto=new_fence,
                # CAS against the snapshot the corpus was READ from, not
                # a re-read at build start (ADVICE r13): an upsert
                # committing between this function's corpus read and the
                # rebuild publish must fail the publish loudly — its
                # rows are absent from the rebuilt postings.
                expect_parent=m["version"],
            )
        finally:
            corpus.unpersist()
        # Detect-and-heal, not quiesce (VERDICT r13 item 4): a STREAM
        # batch (no manifest commit, so invisible to the CAS) that
        # landed after the corpus read sits live above the fence but
        # was routed under the OLD centroids. Re-list now; fold the
        # contiguous run immediately — compact_ivf_index re-routes
        # folded batches under the rebuilt centroids, restoring search
        # recall over their vectors. A gap batch (or one landing after
        # THIS listing) stays live and heals at the next compaction the
        # same way — bounded routing staleness, never loss.
        late = _contiguous_prefix(
            _committed_stream_batches(path, _IVF_STREAM, above=new_fence),
            new_fence,
        )
        if late:
            healed_batches = len(late)
            compact_ivf_index(spark, path)
    return {
        "rebuilt": rebuilt,
        "k": k,
        "max_share": round(max_share, 6),
        "threshold": round(threshold, 6),
        "healed_batches": healed_batches,
    }


# --- Two-level dedup router ----------------------------------------------------

_TL_STREAM = "postings_stream"


def write_twolevel_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    k1: int,
    k2: int,
    iters: int,
    vectors: DataFrame | None = None,
    vacuum_keep: int = 2,
    folded_upto: int | None = None,
    expect_parent: int | None = None,
    train_fraction: float | None = None,
) -> None:
    """Build the TWO-LEVEL trained dedup router as a persisted artifact
    and commit it through the manifest pointer — the train-once shape
    BASELINE.md's two-level fix note promises ('at deployment the
    levels are persisted artifacts… the trainer term is paid once').
    Three immutable segments per version: the coarse centroids
    (l1cent, k1 rows), the per-cell sub-centroids (l2cent, ≤k1*k2
    rows — one more broadcastable parquet), and the routed corpus
    postings PARTITIONED BY the coarse cell c1 (bounded dir count:
    k1 ~ sqrt(n/c) directories, each holding its sub-cell column —
    partitioning by (c1, c2) would create ~n/c dirs, a small-files
    explosion at corpus scale). Same IVF rebuild discipline: publish
    deletes nothing, the post-publish vacuum retains the previous
    epoch for pinned readers (``vacuum_keep``).

    ``train_fraction`` — the third-decade build fix (sf100 probe,
    BASELINE.md round 13): the grouped-Lloyd trainer's centroid-update
    stage explodes the corpus to (cell, dim, value) rows, and at
    n = 2M / k = 134 that stage spilled 543 GB — the one step of the
    router lifecycle that outgrew the JVM. Lloyd centroids are a
    statistic (they need O(k·occupancy) samples, not the corpus), so
    the standard IVF discipline applies: TRAIN on a deterministic
    hash-sample of the corpus (xxhash64(vec_id) — no RNG, every
    rebuild/engine samples identically), then ROUTE the full corpus
    under the trained centroids — route_twolevel is two broadcast
    joins, map-side at any scale. None/1.0 keeps full-corpus training
    (the oracle-gated fixture rows, where trainer determinism IS the
    gate). Sampled centroids differ from full-corpus centroids, so this
    is a deployment knob, not an oracle-path default; the search/
    increment/compaction laws are unchanged either way."""
    from ..operators.dedup import route_twolevel, twolevel_train
    from ..operators.similarity import _vectors

    if expect_parent is None:
        pm = current_manifest(path)
        expect_parent = pm["version"] if pm else 0
    created = vectors is None
    v = _vectors(spark, sf_dir).cache() if created else vectors
    sample_rows = None
    sampled = train_fraction is not None and train_fraction < 1.0
    if sampled:
        sample = v.filter(
            F.abs(F.xxhash64(F.col("vec_id"), F.lit("tl-train")))
            % 1_000_000
            < int(train_fraction * 1_000_000)
        ).cache()
        # Degenerate-sample guard (VERDICT r13 finding 2), twolevel
        # law: the coarse trainer seeds k1 centroids from the sample —
        # fewer than k1 rows and the router publishes with a short (or
        # empty) cent1, silently misrouting everything. Count the
        # cached sample once; short → full-corpus fallback, recorded
        # in the manifest as sample_rows < k1.
        sample_rows = sample.count()
        if sample_rows < k1:
            sample.unpersist()
            sampled = False
    if sampled:
        cent1, cent2, _assigned, pins = twolevel_train(sample, k1, k2, iters)
        # Route the FULL corpus under the sampled-trainer centroids;
        # materialize before releasing the trainer pins.
        posted = route_twolevel(v, cent1, cent2).select(
            "vec_id", "fe", "nrm", "c2", "c1"
        )
        _assigned.unpersist()
    else:
        cent1, cent2, posted_assigned, pins = twolevel_train(v, k1, k2, iters)
        posted = posted_assigned.select("vec_id", "fe", "nrm", "c2", "c1")
        pins = (*pins, posted_assigned)
    ver = _next_version(path)
    c1_dir, c2_dir = _seg("l1cent", ver), _seg("l2cent", ver)
    post_dir = _seg("postings", ver)
    _sized(cent1).write.mode("overwrite").parquet(os.path.join(path, c1_dir))
    _sized(cent2).write.mode("overwrite").parquet(os.path.join(path, c2_dir))
    _sized(posted, "c1").write.mode("overwrite").partitionBy("c1").parquet(
        os.path.join(path, post_dir)
    )
    _publish(
        path,
        {
            "version": ver,
            "kind": "twolevel",
            "segments": {
                "l1cent": c1_dir,
                "l2cent": c2_dir,
                "postings": [post_dir],
            },
            "schemas": {
                "l1cent": cent1.schema.json(),
                "l2cent": cent2.schema.json(),
                "postings": posted.schema.json(),
            },
            "params": {
                "k1": k1,
                "k2": k2,
                "iters": iters,
                "train_fraction": train_fraction,
                # Effective sample size (None when full-corpus was
                # requested); sample_rows < k1 records a full-training
                # fallback from a degenerate sample.
                "sample_rows": sample_rows,
            },
            "streams": [_TL_STREAM],
            # Same fence law as write_ivf_index: a corpus-rebuild caller
            # (maintain_twolevel_index) passes the highest batch id its
            # rebuild corpus covered; a from-source build defaults to
            # the publish-time max (it supersedes everything).
            "folded_upto": (
                folded_upto
                if folded_upto is not None
                else _max_committed_batch(path, _TL_STREAM)
            ),
        },
        expect_parent=expect_parent,
    )
    # Release only pins this function (or its trainer) created: the
    # caller-supplied ``vectors`` frame stays pinned — its cache is the
    # caller's to manage (ADVICE r12; maintain_twolevel_index and the
    # probe scripts rely on their corpus pin surviving this call). The
    # trainer's input pin (pins[0]) is ours when it is the hash-sample
    # or a v we built from sf_dir; it is the caller's when vectors was
    # passed and trained on directly.
    own_v, *trainer_pins = pins
    for pinned in (*trainer_pins, cent1):
        pinned.unpersist()
    if own_v is not v:
        own_v.unpersist()  # the train-fraction sample cache is always ours
    if created:
        v.unpersist()
    vacuum_index(path, keep_versions=vacuum_keep)


def read_twolevel_centroids(
    spark: SparkSession, path: str, manifest: dict | None = None
) -> tuple[DataFrame, DataFrame]:
    """(cent1: gid(=0)/cid/c_q, cent2: gid(=coarse cid)/cid/c_q) at the
    current committed manifest — the two broadcastable routing tables."""
    m = manifest or _require(path, "twolevel")
    cent1 = _read_segments(
        spark, path, [m["segments"]["l1cent"]], m["schemas"]["l1cent"]
    ).select("gid", "cid", "c_q")
    cent2 = _read_segments(
        spark, path, [m["segments"]["l2cent"]], m["schemas"]["l2cent"]
    ).select("gid", "cid", "c_q")
    return cent1, cent2


def read_twolevel_index(
    spark: SparkSession,
    path: str,
    include_stream: bool = True,
    manifest: dict | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load the persisted two-level router at its current manifest:
    (cent1, cent2, postings: c1/c2/vec_id/fe/nrm). Postings are the
    manifest's base segments ∪ committed stream batches above the
    folded_upto fence (stream_ingest_twolevel), same read law as the
    IVF index. Manifest-recorded schemas throughout — no inference,
    partition column c1 comes back long with no cast. ``manifest``
    pins the read to an already-read snapshot (see read_ivf_index)."""
    m = manifest if manifest is not None else _require(path, "twolevel")
    cent1, cent2 = read_twolevel_centroids(spark, path, m)
    postings = _read_segments(
        spark, path, m["segments"]["postings"], m["schemas"]["postings"]
    ).select("c1", "c2", "vec_id", "fe", "nrm")
    if include_stream:
        batches = _committed_stream_batches(
            path, _TL_STREAM, above=m.get("folded_upto", -1)
        )
        if batches:
            dirs = [os.path.join(_TL_STREAM, f"ingest_batch={b}") for b in batches]
            postings = postings.unionByName(
                _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                    "c1", "c2", "vec_id", "fe", "nrm"
                )
            )
    return cent1, cent2, postings


def stream_ingest_twolevel(vectors_stream: DataFrame, index_path: str, checkpoint: str):
    """Streaming router ingest — upsert_twolevel_postings as a
    Structured Streaming sink, the same memtable-flush shape as
    stream_ingest_ivf: each micro-batch of vectors (vec_id/fe/nrm)
    routes under the current-manifest centroids (route_twolevel, two
    broadcast joins) and lands its own
    ``postings_stream/ingest_batch=N/`` directory (c1-partitioned,
    whole-dir overwrite — replay-idempotent; the _SUCCESS marker is the
    batch's commit record). Readers union committed batches above the
    manifest's folded_upto fence. Returns the started query; drive with
    trigger(availableNow=True)."""
    from ..operators.dedup import route_twolevel

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        m = _require(index_path, "twolevel")
        cent1, cent2 = read_twolevel_centroids(spark, index_path, m)
        (
            route_twolevel(batch_df, cent1, cent2)
            .select("vec_id", "fe", "nrm", "c2", "c1")
            .write.mode("overwrite")
            .partitionBy("c1")
            .parquet(os.path.join(index_path, _TL_STREAM, f"ingest_batch={batch_id}"))
        )
        # Epoch marker for the epoch-gated compaction re-route — both
        # routing levels name the epoch (see stream_ingest_ivf).
        _write_batch_epoch(
            index_path,
            _TL_STREAM,
            batch_id,
            m["segments"]["l1cent"] + "|" + m["segments"]["l2cent"],
        )

    return (
        vectors_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_twolevel_index(spark: SparkSession, path: str) -> None:
    """Fold committed stream segments and accumulated upsert segments
    into ONE c1-partitioned base segment — compact_ivf_index's law for
    the router, with the same one-listing + contiguous-prefix fence
    discipline: only the gap-free run of batch ids above the fence
    folds, so a late-committing gap batch can never be fenced unfolded;
    a crash anywhere leaves the previous manifest as the readers'
    truth. Folded batches are RE-ROUTED under the manifest's centroids
    (route_twolevel — identity for in-epoch batches, the heal for a
    batch that landed mid-rebuild under the previous epoch's routing;
    VERDICT r13 item 4)."""
    from ..operators.dedup import route_twolevel

    m = _require(path, "twolevel")
    fence = m.get("folded_upto", -1)
    batches = _contiguous_prefix(
        _committed_stream_batches(path, _TL_STREAM, above=fence), fence
    )
    if not batches and len(m["segments"]["postings"]) == 1:
        return
    cent1, cent2, postings = read_twolevel_index(
        spark, path, include_stream=False, manifest=m
    )
    if batches:
        # Epoch-gated re-route, same law as compact_ivf_index: batches
        # routed under the CURRENT two-level centroids fold with their
        # stored (c1, c2); stale/unknown-epoch batches re-route through
        # route_twolevel (identity in-epoch, the heal otherwise).
        epoch = m["segments"]["l1cent"] + "|" + m["segments"]["l2cent"]
        in_epoch = [
            b for b in batches if _batch_epoch(path, _TL_STREAM, b) == epoch
        ]
        stale = [b for b in batches if b not in in_epoch]
        if in_epoch:
            dirs = [os.path.join(_TL_STREAM, f"ingest_batch={b}") for b in in_epoch]
            postings = postings.unionByName(
                _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                    "c1", "c2", "vec_id", "fe", "nrm"
                )
            )
        if stale:
            dirs = [os.path.join(_TL_STREAM, f"ingest_batch={b}") for b in stale]
            postings = postings.unionByName(
                route_twolevel(
                    _read_segments(
                        spark, path, dirs, m["schemas"]["postings"]
                    ).select("vec_id", "fe", "nrm"),
                    cent1,
                    cent2,
                ).select("c1", "c2", "vec_id", "fe", "nrm")
            )
    ver = _next_version(path)
    seg = _seg("postings", ver)
    _sized(
        postings.select("vec_id", "fe", "nrm", "c2", "c1"), "c1"
    ).write.mode("overwrite").partitionBy("c1").parquet(os.path.join(path, seg))
    m2 = dict(m)
    m2["version"] = ver
    m2["segments"] = dict(m["segments"])
    m2["segments"]["postings"] = [seg]
    m2["folded_upto"] = batches[-1] if batches else fence
    _publish(path, m2, expect_parent=m["version"])


def upsert_twolevel_postings(
    spark: SparkSession, path: str, new_vectors: DataFrame
) -> None:
    """Route an increment (vec_id/fe/nrm) under the PERSISTED two-level
    centroids (route_twolevel — the trainer's own final-assign law, two
    broadcast joins) and commit it as one new postings segment — the
    daily-ingest path where the trainer term is never paid again. Same
    idempotent-retry semantics as upsert_ivf_postings: the segment dir
    is named by its manifest version, a failed run's torn dir is
    unreferenced and overwritten by the retry; an empty batch commits
    nothing (the guard pins the batch first — lineage evaluated at most
    once per partition across guard + write)."""
    from ..operators.dedup import route_twolevel

    nv = new_vectors
    owned = _pin(nv)
    try:
        if nv.isEmpty():
            return
        m = _require(path, "twolevel")
        cent1, cent2 = read_twolevel_centroids(spark, path, m)
        routed = route_twolevel(nv, cent1, cent2).select(
            "vec_id", "fe", "nrm", "c2", "c1"
        )
        ver = _next_version(path)
        seg = _seg("postings", ver, "-upsert")
        _sized(routed, "c1").write.mode("overwrite").partitionBy("c1").parquet(
            os.path.join(path, seg)
        )
        m2 = dict(m)
        m2["version"] = ver
        m2["segments"] = dict(m["segments"])
        m2["segments"]["postings"] = list(m["segments"]["postings"]) + [seg]
        _publish(path, m2, expect_parent=m["version"])
    finally:
        if owned:
            nv.unpersist()


def twolevel_index_balance(spark: SparkSession, path: str) -> DataFrame:
    """Per-BUCKET balance of the persisted router — the same
    cell_balance law as the IVF audit, over the composite (c1, c2)
    bucket id (what bounds same-bucket pair mass, the quantity the
    two-level scale law holds at occupancy c). Metadata-weight at any
    corpus scale."""
    from ..operators.kmeans import cell_balance

    _c1, _c2, postings = read_twolevel_index(spark, path)
    m = _require(path, "twolevel")
    k2 = int(m["params"]["k2"])
    buckets = postings.select(
        (F.col("c1") * F.lit(k2 + 1) + F.col("c2")).alias("cid")
    )
    return cell_balance(buckets)


def maintain_twolevel_index(
    spark: SparkSession, path: str, hot_ratio: float = HOT_CELL_RATIO
) -> dict:
    """Audit→retrain loop for the router, symmetric with
    maintain_ivf_index: if the hottest (c1, c2) bucket exceeds
    ``hot_ratio`` times the uniform share (pair-generation p99 is set
    by the LARGEST bucket's occupancy — quadratic in it), retrain BOTH
    levels over the index's CURRENT corpus (base + upserts + the stream
    batches committed AT CORPUS-READ TIME) and republish through the
    manifest. Same fence AND concurrency discipline as
    maintain_ivf_index: the committed-batch list is captured once with
    the corpus, its contiguous-prefix end is the fence
    write_twolevel_index publishes, the publish CASes on the manifest
    version the corpus was read from (interleaved upsert ⇒ loud
    ConcurrentWriterError), and a stream batch landing mid-rebuild is
    re-listed after the publish and healed immediately through
    compact_twolevel_index's re-route under the rebuilt centroids.
    Returns {rebuilt, n_buckets, max_share, threshold,
    healed_batches} — healed_batches is a lower bound at detection
    time, same caveat as maintain_ivf_index (ADVICE r14)."""
    from ..operators.kmeans import cell_balance

    m = _require(path, "twolevel")
    fence = m.get("folded_upto", -1)
    covered = _contiguous_prefix(
        _committed_stream_batches(path, _TL_STREAM, above=fence), fence
    )
    _c1, _c2, postings = read_twolevel_index(
        spark, path, include_stream=False, manifest=m
    )
    if covered:
        dirs = [os.path.join(_TL_STREAM, f"ingest_batch={b}") for b in covered]
        postings = postings.unionByName(
            _read_segments(spark, path, dirs, m["schemas"]["postings"]).select(
                "c1", "c2", "vec_id", "fe", "nrm"
            )
        )
    k2 = int(m["params"]["k2"])
    buckets = postings.select(
        (F.col("c1") * F.lit(k2 + 1) + F.col("c2")).alias("cid")
    )
    bal = cell_balance(buckets)
    stats = bal.agg(
        F.count(F.lit(1)).alias("nb"),
        F.max("n_postings").alias("mx"),
        F.sum("n_postings").alias("tot"),
    ).collect()[0]
    n_buckets = stats["nb"] or 0
    max_share = (stats["mx"] or 0) / max(stats["tot"] or 0, 1)
    threshold = hot_ratio / max(n_buckets, 1)
    rebuilt = max_share > threshold
    healed_batches = 0
    if rebuilt:
        corpus = postings.select("vec_id", "fe", "nrm").cache()
        try:
            corpus.count()  # pin the old-manifest scan before its vacuum
            new_fence = covered[-1] if covered else fence
            write_twolevel_index(
                spark,
                sf_dir="",
                path=path,
                k1=int(m["params"]["k1"]),
                k2=k2,
                iters=int(m["params"]["iters"]),
                vectors=corpus,
                folded_upto=new_fence,
                expect_parent=m["version"],
            )
        finally:
            corpus.unpersist()
        late = _contiguous_prefix(
            _committed_stream_batches(path, _TL_STREAM, above=new_fence),
            new_fence,
        )
        if late:
            healed_batches = len(late)
            compact_twolevel_index(spark, path)
    return {
        "rebuilt": rebuilt,
        "n_buckets": n_buckets,
        "max_share": round(max_share, 6),
        "threshold": round(threshold, 6),
        "healed_batches": healed_batches,
    }


# --- PQ index -----------------------------------------------------------------

_PQ_CODES_STREAM = "codes_stream"
_PQ_NORMS_STREAM = "norms_stream"


def write_pq_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    vectors: DataFrame | None = None,
    vacuum_keep: int = 2,
    expect_parent: int | None = None,
) -> None:
    """Build the product-quantization index over ``sf_dir``'s embeddings
    and COMMIT it as a manifest version — the real IVFADC storage shape,
    where the index IS the compressed corpus:

    - ``codebooks-vN/`` — M*K rows (gid, cid, c_q): the per-subspace
      codebook entries; broadcast-sized at any corpus scale.
    - ``codes-vN/``     — M rows per vector (gid, vec_id, cid): the
      4-bit codes, ~100x smaller than the raw vectors — what the ADC
      scan reads instead of the corpus.
    - ``norms-vN/``     — (vec_id, nrm): one stored double per vector,
      the denominator of cosine-via-IP.

    Search reads codes + codebooks + norms; raw vectors are fetched (by
    vec_id, from the source table) ONLY for shortlist rows. A rebuild
    fences out previous-epoch stream segments exactly like
    write_ivf_index (their codes carry OLD codebook meanings)."""
    from ..operators.kmeans import lloyd_fit_grouped_quantized
    from ..operators.similarity import (
        PQ_ITERS,
        PQ_K,
        _check_pq_dim,
        _subvectors,
        _vectors,
    )

    if expect_parent is None:
        pm = current_manifest(path)
        expect_parent = pm["version"] if pm else 0
    v = vectors if vectors is not None else _vectors(spark, sf_dir).cache()
    _check_pq_dim(len(v.select("fe").first()[0]))
    subs = _subvectors(v, "vec_id", "fe", "sv")
    codes, cent = lloyd_fit_grouped_quantized(subs, PQ_K, PQ_ITERS)
    codes = codes.select("gid", "vec_id", "cid")
    norms = v.select("vec_id", "nrm")
    ver = _next_version(path)
    cb_dir = _seg("codebooks", ver)
    cd_dir = _seg("codes", ver)
    nm_dir = _seg("norms", ver)
    _sized(cent).write.mode("overwrite").parquet(os.path.join(path, cb_dir))
    _sized(codes).write.mode("overwrite").parquet(os.path.join(path, cd_dir))
    _sized(norms).write.mode("overwrite").parquet(os.path.join(path, nm_dir))
    fence = max(
        _max_committed_batch(path, _PQ_CODES_STREAM),
        _max_committed_batch(path, _PQ_NORMS_STREAM),
    )
    _publish(
        path,
        {
            "version": ver,
            "kind": "pq",
            "segments": {
                "codebooks": cb_dir,
                "codes": [cd_dir],
                "norms": [nm_dir],
            },
            "schemas": {
                "codebooks": cent.schema.json(),
                "codes": codes.schema.json(),
                "norms": norms.schema.json(),
            },
            "streams": [_PQ_CODES_STREAM, _PQ_NORMS_STREAM],
            "folded_upto": fence,
        },
        expect_parent=expect_parent,
    )
    vacuum_index(path, keep_versions=vacuum_keep)  # rebuild GC, previous epoch retained


def upsert_pq_codes(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental PQ maintenance: ENCODE ``new_vectors`` (vec_id/fe/
    nrm) under the index's PERSISTED codebooks (pq_assign — the
    trainer's exact-BIGINT per-subspace argmin) and commit their codes
    + norms as new segments in one manifest version. Codebooks are NOT
    retrained — the incremental law (search over the upserted index ==
    codes of the union corpus under the OLD codebooks) is what
    sim_knn_pq_upsert's oracle states. At 100 TB the appended codes are
    ~1% of the appended vectors' bytes: the daily ingest writes
    compressed-corpus deltas. Idempotent under retry for the same
    reason as upsert_ivf_postings (torn segment dirs are unreferenced
    until the publish). The batch's embedding width is validated
    HERE — write_pq_index's guard covers only the base build, and a
    mis-sized batch would otherwise silently write short/ragged
    subvector codes (round-10 advice)."""
    from ..operators.kmeans import pq_assign
    from ..operators.similarity import _check_pq_dim, _subvectors

    nv = new_vectors
    owned = _pin(nv)
    try:
        first = nv.select("fe").first()
        if first is None:
            return  # empty batch: nothing to encode, nothing to commit
        _check_pq_dim(len(first[0]))
        m = _require(path, "pq")
        cb = _read_segments(
            spark, path, [m["segments"]["codebooks"]], m["schemas"]["codebooks"]
        ).select("gid", "cid", "c_q")
        subs = _subvectors(nv, "vec_id", "fe", "sv")
        codes = pq_assign(subs, cb).select("gid", "vec_id", "cid")
        norms = nv.select("vec_id", "nrm")
        ver = _next_version(path)
        cd_seg = _seg("codes", ver, "-upsert")
        nm_seg = _seg("norms", ver, "-upsert")
        _sized(codes).write.mode("overwrite").parquet(os.path.join(path, cd_seg))
        _sized(norms).write.mode("overwrite").parquet(os.path.join(path, nm_seg))
        m2 = dict(m)
        m2["version"] = ver
        m2["segments"] = dict(m["segments"])
        m2["segments"]["codes"] = list(m["segments"]["codes"]) + [cd_seg]
        m2["segments"]["norms"] = list(m["segments"]["norms"]) + [nm_seg]
        _publish(path, m2, expect_parent=m["version"])
    finally:
        if owned:
            nv.unpersist()


def stream_ingest_pq(vectors_stream: DataFrame, index_path: str, checkpoint: str):
    """Streaming PQ ingest — upsert_pq_codes as a Structured Streaming
    sink, completing the PQ maintenance cycle the IVF index got in
    round 10: each micro-batch is encoded under the current-manifest
    codebooks and lands its codes and norms in its OWN
    ``codes_stream/ingest_batch=N`` + ``norms_stream/ingest_batch=N``
    directories (whole-dir overwrite = replay-idempotent). A batch is
    committed only when BOTH directories carry _SUCCESS — codes are
    written first, so a crash between the two writes leaves the batch
    invisible until replay completes it. Mis-sized embedding batches
    fail loudly via the same width guard as upsert_pq_codes. Returns
    the started query; drive with trigger(availableNow=True)."""
    from ..operators.kmeans import pq_assign
    from ..operators.similarity import _check_pq_dim, _subvectors

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        first = batch_df.select("fe").first()
        if first is None:
            return
        _check_pq_dim(len(first[0]))
        m = _require(index_path, "pq")
        cb = _read_segments(
            spark,
            index_path,
            [m["segments"]["codebooks"]],
            m["schemas"]["codebooks"],
        ).select("gid", "cid", "c_q")
        subs = _subvectors(batch_df, "vec_id", "fe", "sv")
        (
            pq_assign(subs, cb)
            .select("gid", "vec_id", "cid")
            .write.mode("overwrite")
            .parquet(
                os.path.join(
                    index_path, _PQ_CODES_STREAM, f"ingest_batch={batch_id}"
                )
            )
        )
        (
            batch_df.select("vec_id", "nrm")
            .write.mode("overwrite")
            .parquet(
                os.path.join(
                    index_path, _PQ_NORMS_STREAM, f"ingest_batch={batch_id}"
                )
            )
        )

    return (
        vectors_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _pq_live_batches(path: str, fence: int) -> list[int]:
    """Batches committed in BOTH pq streams above the fence."""
    cd = set(_committed_stream_batches(path, _PQ_CODES_STREAM, above=fence))
    nm = set(_committed_stream_batches(path, _PQ_NORMS_STREAM, above=fence))
    return sorted(cd & nm)


def compact_pq_index(spark: SparkSession, path: str) -> None:
    """Fold committed PQ stream segments + upsert segments into one
    codes segment and one norms segment — compact_ivf_index's law for
    the compressed corpus. Same one-step crash discipline: write the
    folded dirs under the next version, publish a manifest whose fence
    is the highest batch the snapshot read; batches landing later sit
    above the fence and stay live; nothing is deleted until vacuum."""
    m = _require(path, "pq")
    fence = m.get("folded_upto", -1)
    # Same single-listing + contiguous-prefix discipline as
    # compact_ivf_index: fold exactly the gap-free run above the fence,
    # publish exactly its max as the fence — a late-committing gap
    # batch can never be fenced unfolded.
    batches = _contiguous_prefix(_pq_live_batches(path, fence), fence)
    if (
        not batches
        and len(m["segments"]["codes"]) == 1
        and len(m["segments"]["norms"]) == 1
    ):
        return
    cb, codes, norms = read_pq_index(spark, path, include_stream=False)
    if batches:
        cd_dirs = [
            os.path.join(_PQ_CODES_STREAM, f"ingest_batch={b}") for b in batches
        ]
        nm_dirs = [
            os.path.join(_PQ_NORMS_STREAM, f"ingest_batch={b}") for b in batches
        ]
        codes = codes.unionByName(
            _read_segments(spark, path, cd_dirs, m["schemas"]["codes"]).select(
                "gid", "vec_id", "cid"
            )
        )
        norms = norms.unionByName(
            _read_segments(spark, path, nm_dirs, m["schemas"]["norms"]).select(
                "vec_id", "nrm"
            )
        )
    ver = _next_version(path)
    cd_seg, nm_seg = _seg("codes", ver), _seg("norms", ver)
    _sized(codes).write.mode("overwrite").parquet(os.path.join(path, cd_seg))
    _sized(norms).write.mode("overwrite").parquet(os.path.join(path, nm_seg))
    m2 = dict(m)
    m2["version"] = ver
    m2["segments"] = dict(m["segments"])
    m2["segments"]["codes"] = [cd_seg]
    m2["segments"]["norms"] = [nm_seg]
    m2["folded_upto"] = batches[-1] if batches else fence
    _publish(path, m2, expect_parent=m["version"])


def read_pq_index(
    spark: SparkSession, path: str, include_stream: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load the persisted PQ index at its current manifest: (codebooks:
    gid/cid/c_q, codes: gid/vec_id/cid, norms: vec_id/nrm), unioning
    committed stream batches above the folded_upto fence."""
    m = _require(path, "pq")
    cb = _read_segments(
        spark, path, [m["segments"]["codebooks"]], m["schemas"]["codebooks"]
    ).select("gid", "cid", "c_q")
    codes = _read_segments(
        spark, path, m["segments"]["codes"], m["schemas"]["codes"]
    ).select("gid", "vec_id", "cid")
    norms = _read_segments(
        spark, path, m["segments"]["norms"], m["schemas"]["norms"]
    ).select("vec_id", "nrm")
    if include_stream:
        batches = _pq_live_batches(path, m.get("folded_upto", -1))
        if batches:
            cd_dirs = [
                os.path.join(_PQ_CODES_STREAM, f"ingest_batch={b}") for b in batches
            ]
            nm_dirs = [
                os.path.join(_PQ_NORMS_STREAM, f"ingest_batch={b}") for b in batches
            ]
            codes = codes.unionByName(
                _read_segments(spark, path, cd_dirs, m["schemas"]["codes"]).select(
                    "gid", "vec_id", "cid"
                )
            )
            norms = norms.unionByName(
                _read_segments(spark, path, nm_dirs, m["schemas"]["norms"]).select(
                    "vec_id", "nrm"
                )
            )
    return cb, codes, norms


# --- MinHash band index ---------------------------------------------------------

def write_minhash_index(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    vacuum_keep: int = 2,
    expect_parent: int | None = None,
) -> None:
    """Persist the HISTORICAL corpus's MinHash dedup index and COMMIT it
    through the same manifest mechanism: signatures-vN/ (doc_id,
    mh0..mh15) for verification joins and bands-vN/ (partitioned by
    band_id) for candidate generation. The dedup counterpart of the IVF
    index: at 100 TB the historical band table is what a daily
    increment joins against — it must be an artifact, not a per-run
    recomputation of corpus-wide signatures (one md5 per (doc, shingle)
    over 100 TB per day is the bill the inline dedup_incremental_lsh
    pays and this removes). History here = doc_id % INCR_MOD != 0,
    matching the incremental fixture split."""
    from ..operators.dedup import INCR_MOD, _band_frame, _signatures

    hist_sig = _signatures(spark, sf_dir).filter(F.col("doc_id") % INCR_MOD != 0)
    bands = _band_frame(hist_sig)
    ver = _next_version(path)
    sig_dir, band_dir = _seg("signatures", ver), _seg("bands", ver)
    _sized(hist_sig).write.mode("overwrite").parquet(os.path.join(path, sig_dir))
    _sized(bands, "band_id").write.mode("overwrite").partitionBy("band_id").parquet(
        os.path.join(path, band_dir)
    )
    _publish(
        path,
        {
            "version": ver,
            "kind": "minhash",
            "segments": {"signatures": [sig_dir], "bands": [band_dir]},
            "schemas": {
                "signatures": hist_sig.schema.json(),
                "bands": bands.schema.json(),
            },
            "streams": [],
            "folded_upto": -1,
        },
        expect_parent=(
            expect_parent
            if expect_parent is not None
            else ((current_manifest(path) or {"version": 0})["version"])
        ),
    )
    vacuum_index(path, keep_versions=vacuum_keep)  # rebuild GC, previous epoch retained


def upsert_minhash_index(
    spark: SparkSession, path: str, new_sigs: DataFrame
) -> None:
    """Append a verdict batch's signatures + bands as new segments — the
    daily step after an increment's KEEP verdicts land: today's kept
    docs become tomorrow's history. One manifest commit, idempotent
    under retry like the other upserts."""
    from ..operators.dedup import _band_frame

    m = _require(path, "minhash")
    # Pin: the batch feeds BOTH the signature and the band write.
    ns = new_sigs
    owned = _pin(ns)
    try:
        bands = _band_frame(ns)
        ver = _next_version(path)
        sig_seg = _seg("signatures", ver, "-upsert")
        band_seg = _seg("bands", ver, "-upsert")
        _sized(ns).write.mode("overwrite").parquet(os.path.join(path, sig_seg))
        _sized(bands, "band_id").write.mode("overwrite").partitionBy("band_id").parquet(
            os.path.join(path, band_seg)
        )
        m2 = dict(m)
        m2["version"] = ver
        m2["segments"] = dict(m["segments"])
        m2["segments"]["signatures"] = list(m["segments"]["signatures"]) + [
            sig_seg
        ]
        m2["segments"]["bands"] = list(m["segments"]["bands"]) + [band_seg]
        _publish(path, m2, expect_parent=m["version"])
    finally:
        if owned:
            ns.unpersist()


def compact_minhash_index(spark: SparkSession, path: str) -> None:
    """Fold accumulated signature/band upsert segments into one segment
    each — band-side file count is what the increment's band join
    lists, so a long-appended index pays open overhead per (segment,
    band_id) until compaction. Same one-step publish discipline."""
    m = _require(path, "minhash")
    if len(m["segments"]["signatures"]) == 1 and len(m["segments"]["bands"]) == 1:
        return
    sigs, bands = read_minhash_index(spark, path)
    ver = _next_version(path)
    sig_seg, band_seg = _seg("signatures", ver), _seg("bands", ver)
    _sized(sigs).write.mode("overwrite").parquet(os.path.join(path, sig_seg))
    _sized(bands, "band_id").write.mode("overwrite").partitionBy("band_id").parquet(
        os.path.join(path, band_seg)
    )
    m2 = dict(m)
    m2["version"] = ver
    m2["segments"] = {"signatures": [sig_seg], "bands": [band_seg]}
    _publish(path, m2, expect_parent=m["version"])


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """Load the persisted MinHash index at its current manifest:
    (signatures: doc_id/mh*, bands: doc_id/band_key/band_id)."""
    m = _require(path, "minhash")
    sigs = _read_segments(
        spark, path, m["segments"]["signatures"], m["schemas"]["signatures"]
    )
    bands = _read_segments(
        spark, path, m["segments"]["bands"], m["schemas"]["bands"]
    ).select("doc_id", "band_id", "band_key")
    return sigs, bands

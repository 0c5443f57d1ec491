"""Iterative K-means (Lloyd's) over the embeddings table — the
representative *iterative algorithm* (driver-controlled loop of
DataFrame jobs), and the trainer for real IVF centroids
(``sim_knn_ivf`` uses a fixture rule; SCALE.md marks KMeans as the
production swap).

Shape of each iteration, all Catalyst built-ins:
1. assign: vectors × broadcast(centroids) → per-vector argmin distance
   (min_by over a (d2, cid) struct — map-side partial aggregation);
2. update: posexplode the assigned vectors to (cell, dim, value), one
   groupBy (cell, dim) average, re-assemble arrays with
   sort_array(collect_list(struct(dim, mean))).

Driver holds only the K centroid arrays (collect of K rows — tiny);
the vector table is cached once and never collected. Lineage does not
grow across iterations because each round's centroids re-enter as a
*literal* broadcast frame, so no checkpointing is needed — the classic
iterative-Spark trap (unbounded plan growth) is designed out rather
than patched.

Determinism: init = the K lowest vec_ids; distance ties broken by cell
id; means of float sums are stable under AQE because assignment is a
pure function of (vector, centroids). Exactness is pinned by
tests/test_kmeans.py (monotone inertia + argmin consistency), not a SQL
oracle — per the rows-only policy for iterative ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators._util import spread, t
from ..operators.similarity import FP_SCALE, _fixed
from ..plans.catalog import register

K_DEFAULT = 5
ITERS_DEFAULT = 5



def _long_d2_guard(vectors: DataFrame, col: str = "q") -> DataFrame:
    """Derived-exactness guard for _assign's long accumulator (same
    discipline as text._tfidf_weights's dot_sum): a squared-L2 partial
    sum is bounded by dims * (2 * max|component|)^2, so the BIGINT path
    is only valid while that bound stays under 2^63. The unit-norm
    fixture argument puts it at ~4e14 * dims, but the precondition was
    previously asserted nowhere — a higher-magnitude or higher-dim
    fixture would ANSI-overflow on the Spark side only (the oracle
    accumulates in HUGEINT).

    Returns a 1-row frame whose ``d2_ok`` column is NULL when safe and
    RAISES (assert_true) when not, so the check lives INSIDE the
    returned plan: the builder stays lazy (no eager job at plan-build
    time — it was the one catalog builder that executed Spark jobs in
    the builder, which bench_ab would have timed), and the bound
    aggregate costs nothing until the query actually runs. The bound
    comparison runs in float64 with a conservative 1e-9 relative margin
    — errs only toward failing EARLY, never past the true 2^63 bound."""
    bound = vectors.select(
        F.aggregate(
            col, F.lit(0).cast("long"), lambda acc, x: F.greatest(acc, F.abs(x))
        ).alias("m"),
        F.size(col).alias("d"),
    ).agg(F.max("m").alias("max_abs"), F.max("d").alias("dims"))
    safe = (
        F.pow(F.col("max_abs").cast("double") * 2.0, F.lit(2.0))
        * F.col("dims").cast("double")
    ) < F.lit(2.0**63 * (1.0 - 1e-9))
    return bound.select(
        F.assert_true(
            F.coalesce(safe, F.lit(True)),  # empty table → nulls → safe
            F.concat(
                F.lit("fixed-point vectors (max|q|="),
                F.col("max_abs").cast("string"),
                F.lit(", dims="),
                F.col("dims").cast("string"),
                F.lit(") exceed the BIGINT squared-L2 bound; widen "),
                F.lit("_assign's zero to decimal(38,0)"),
            ),
        ).alias("d2_ok")
    )


def _assign(vectors: DataFrame, centroids: DataFrame, zero=None) -> DataFrame:
    """(vec_id, emb, cell): nearest centroid by squared L2, ties → lowest cid.

    argmin via min_by over a (d2, cid) struct instead of a row_number
    window: the groupBy gets map-side partial aggregation, so each of the
    trainer's iterations shuffles ~n rows, not the n·k crossJoin fan-out
    a window sort would carry. Struct order == ORDER BY d2, cid (cid is
    distinct, so the pick is deterministic in both engines).

    ``zero``: distance accumulator literal. Default float64 (the
    trainer's arithmetic); sim_kmeans_step passes a long 0 so the same
    argmin runs in exact integer arithmetic over fixed-point vectors —
    ONE tie rule and plan shape for the trainer and its oracle-gated
    step."""
    d2 = F.aggregate(
        F.zip_with("emb", "c_emb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0) if zero is None else zero,
        lambda acc, v: acc + v,
    )
    best = F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("best")
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .select("vec_id", "emb", "cid", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.first("emb").alias("emb"), best)
        .select("vec_id", "emb", F.col("best.cid").alias("cell"), F.col("best.d2").alias("d2"))
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroid per cell: element-wise mean via posexplode + regroup."""
    exploded = assigned.select(
        "cell", F.posexplode("emb").alias("dim", "val")
    )
    means = exploded.groupBy("cell", "dim").agg(F.avg("val").alias("m"))
    return (
        means.groupBy("cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("c_emb")
        )
        .select(F.col("cell").alias("cid"), "c_emb")
    )


def lloyd_fit(
    vectors: DataFrame, k: int, iters: int
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Lloyd's over any ``(vec_id, emb: array<double>)`` frame. Returns
    (final assignment with vec_id/cell/d2, final centroid arrays indexed
    by cid, per-iteration inertia history). Shared by the whole-vector
    trainer (kmeans_fit / sim_kmeans_cells / sim_knn_ivf centroids) and
    the per-subspace product-quantization codebooks (sim_knn_pq)."""
    spark = vectors.sparkSession
    centroids = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("emb").alias("c_emb"))
    )
    # Deterministic init re-entered as literals so cid is 0..k-1 dense.
    cent_rows = [list(r.c_emb) for r in centroids.collect()]
    history: list[float] = []
    for _ in range(iters):
        centroids = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cent_rows)], "cid INT, c_emb ARRAY<DOUBLE>"
        )
        assigned = _assign(vectors, centroids).cache()
        history.append(assigned.agg(F.sum("d2")).collect()[0][0])
        new_centroids = _update(assigned)
        # Re-enter as literal rows: K tiny arrays through the driver, so
        # iteration N+1's plan does not contain iteration N's. A cell that
        # lost all members keeps its previous centroid.
        updates = {int(r.cid): list(r.c_emb) for r in new_centroids.collect()}
        cent_rows = [updates.get(i, c) for i, c in enumerate(cent_rows)]
        assigned.unpersist()
    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cent_rows)], "cid INT, c_emb ARRAY<DOUBLE>"
    )
    return _assign(vectors, centroids).cache(), cent_rows, history


def lloyd_fit_grouped(
    sub: DataFrame, k: int, iters: int
) -> tuple[DataFrame, dict[int, list[list[float]]]]:
    """Lloyd's run INDEPENDENTLY per group in SHARED Spark jobs: ``sub``
    is ``(gid: int, vec_id, emb: array<double>)`` and every iteration is
    ONE assign + ONE update over all groups at once, instead of one
    driver loop per group. For product quantization (M subspaces × k
    codes) this turns M·iters sequential jobs into iters — the
    difference between 24 and 3 cluster round-trips for the codebook
    training. Per-group arithmetic, init (k lowest vec_ids), tie rule
    (lowest cid), and empty-cell handling (keep previous centroid) are
    identical to lloyd_fit, so the trained codebooks are bit-identical
    to training each group separately.

    Returns (assignment frame gid/vec_id/cell/d2, {gid: centroid arrays
    indexed by cid}).
    """

    spark = sub.sparkSession
    iw = Window.partitionBy("gid").orderBy("vec_id")
    init = (
        sub.select("gid", "vec_id", "emb", F.row_number().over(iw).alias("irn"))
        .filter(F.col("irn") <= k)
        .collect()
    )
    cent: dict[int, list[list[float]]] = {}
    for r in sorted(init, key=lambda r: (r.gid, r.vec_id)):
        cent.setdefault(r.gid, []).append(list(r.emb))

    d2 = F.aggregate(
        F.zip_with("emb", "c_emb", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    best = F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("best")

    def assign(centroids: DataFrame) -> DataFrame:
        return (
            sub.join(F.broadcast(centroids), "gid")
            .select("gid", "vec_id", "emb", "cid", d2.alias("d2"))
            .groupBy("gid", "vec_id")
            .agg(F.first("emb").alias("emb"), best)
            .select(
                "gid", "vec_id", "emb",
                F.col("best.cid").alias("cell"), F.col("best.d2").alias("d2"),
            )
        )

    def cent_df() -> DataFrame:
        rows = [(g, i, c) for g, cl in cent.items() for i, c in enumerate(cl)]
        return spark.createDataFrame(rows, "gid INT, cid INT, c_emb ARRAY<DOUBLE>")

    for _ in range(iters):
        assigned = assign(cent_df())
        exploded = assigned.select("gid", "cell", F.posexplode("emb").alias("dim", "val"))
        means = exploded.groupBy("gid", "cell", "dim").agg(F.avg("val").alias("m"))
        new_cent = (
            means.groupBy("gid", "cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
                ).alias("c_emb")
            )
            .collect()
        )
        for r in new_cent:
            cent[r.gid][r.cell] = list(r.c_emb)
    return assign(cent_df()).cache(), cent


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    k: int = K_DEFAULT,
    iters: int = ITERS_DEFAULT,
) -> tuple[DataFrame, list[float]]:
    """Run Lloyd's for ``iters`` rounds; returns (assignment frame with
    columns vec_id/cell/d2, per-iteration inertia history)."""
    vectors = (
        spread(t(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .cache()
    )
    assigned, _, history = lloyd_fit(vectors, k, iters)
    return assigned, history


@register(
    "sim_kmeans_step",
    oracle=f"""
    WITH fx AS (
        SELECT vec_id,
               [CAST(floor(CAST(x AS DOUBLE) * {FP_SCALE}) AS BIGINT)
                for x in embedding] AS q
        FROM embeddings
    ), cent AS (
        SELECT vec_id AS cid, q AS c_q FROM fx ORDER BY vec_id LIMIT {K_DEFAULT}
    ), qe AS (
        SELECT vec_id, CAST(generate_subscripts(q, 1) AS BIGINT) AS dim,
               unnest(q) AS qv
        FROM fx
    ), ce AS (
        SELECT cid, CAST(generate_subscripts(c_q, 1) AS BIGINT) AS dim,
               unnest(c_q) AS cv
        FROM cent
    ), d AS (
        SELECT qe.vec_id, ce.cid,
               SUM(CAST(qe.qv - ce.cv AS HUGEINT) * (qe.qv - ce.cv)) AS d2
        FROM qe JOIN ce ON ce.dim = qe.dim
        GROUP BY qe.vec_id, ce.cid
    ), assign AS (
        SELECT vec_id, cid AS cell
        FROM d
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) = 1
    )
    SELECT a.cell, qe.dim,
           COUNT(*) AS n_members,
           CAST(SUM(CAST(qe.qv AS HUGEINT)) AS BIGINT) AS sum_q,
           CAST(SUM(CAST(qe.qv AS HUGEINT)) AS DOUBLE) / COUNT(*) AS mean_q
    FROM assign a JOIN qe ON qe.vec_id = a.vec_id
    GROUP BY a.cell, qe.dim
    """,
    tags=("similarity", "iterative"),
    window_defer=True,
    doc=f"ONE Lloyd iteration with pinned centroids (the k={K_DEFAULT} "
    "lowest vec_ids — lloyd_fit's deterministic init), oracle-gated "
    "bit-for-bit: assign every vector to its nearest centroid (exact "
    "integer squared-L2 on the similarity module's fixed-point "
    "vectors, ties to the lowest cid — the trainer's exact tie rule), "
    "then emit the update step's per-(cell, dim) member count, exact "
    "coordinate sum, and mean (one IEEE division). This is the SQL-"
    "expressible core of sim_kmeans_cells: the full trainer only "
    "re-enters this step with re-derived centroids, so the driver row "
    "here covers the arithmetic the iterative loop (rows-only by "
    "policy) is built from. Plan: centroids broadcast (K rows), "
    "argmin via min_by struct — map-side partial agg, ~n rows "
    "shuffled, no window over the vector table; the update is one "
    "posexplode + keyed agg, the same shape that scales to 100 TB in "
    "the trainer itself.",
)
def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fixed-point quantized embeddings — the similarity module's shared
    # resolution, so this step and the ANN stack agree on what "the same
    # vector" means.
    v = spread(t(spark, sf_dir, "embeddings")).select(
        "vec_id", _fixed(F.col("embedding")).alias("q")
    )
    cents = (
        v.orderBy("vec_id")
        .limit(K_DEFAULT)
        .select(F.col("vec_id").alias("cid"), F.col("q").alias("c_emb"))
    )
    # The trainer's own _assign, run in exact integer arithmetic (long
    # accumulator): |a-b|^2 sums are bounded by 4 * FP_SCALE^2 for
    # unit-norm vectors (~4e14 << 2^63) — the same bound discipline as
    # similarity._dot. The unit-norm precondition is DERIVED, not
    # assumed: _long_d2_guard hard-fails past the actual bound, lazily —
    # the guard is a 1-row broadcast side of the returned plan, so the
    # builder itself runs no Spark job (see the crossJoin at the tail).
    guard = _long_d2_guard(v, "q")
    assigned = _assign(
        v.select("vec_id", F.col("q").alias("emb")),
        cents,
        zero=F.lit(0).cast("long"),
    )
    ex = assigned.select("cell", F.posexplode("emb").alias("dim0", "qv")).select(
        "cell", (F.col("dim0") + 1).cast("long").alias("dim"), "qv"
    )
    return (
        ex.groupBy("cell", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum(F.col("qv").cast("decimal(38,0)")).cast("long").alias("sum_q"),
        )
        .select(
            "cell",
            "dim",
            "n_members",
            "sum_q",
            (F.col("sum_q").cast("double") / F.col("n_members").cast("double")).alias(
                "mean_q"
            ),
        )
        # Exactness guard evaluated at execution: 1-row broadcast side;
        # the filter keeps d2_ok referenced so pruning can't drop the
        # assert_true, and is a no-op when the bound holds (NULL row).
        .crossJoin(F.broadcast(guard))
        .filter(F.col("d2_ok").isNull())
        .drop("d2_ok")
    )


@register(
    "sim_kmeans_cells",
    oracle=None,  # iterative; invariants pinned by tests/test_kmeans.py
    tags=("similarity", "iterative"),
    doc=f"K-means cell summary after {ITERS_DEFAULT} Lloyd's iterations "
    f"(k={K_DEFAULT}): per-cell member count and mean squared distance. "
    "The iterative-algorithm representative: driver loop over cached "
    "DataFrame jobs, centroids re-entering as literals so lineage stays "
    "flat. Trains the production centroids for sim_knn_ivf.",
)
def sim_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, _ = kmeans_fit(spark, sf_dir)
    return assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.avg("d2").alias("mean_sq_dist"),
    )

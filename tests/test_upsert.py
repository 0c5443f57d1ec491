"""Partition-scoped upsert: last-wins merge, untouched partitions
physically unmodified, idempotent under replay."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import upsert_partitioned


def _seed(spark, path):
    rows = [
        # (id, value, day)
        (1, "a", "2024-01-01"),
        (2, "b", "2024-01-01"),
        (3, "c", "2024-01-02"),
        (4, "d", "2024-01-03"),
    ]
    df = spark.createDataFrame(rows, ["id", "value", "day"])
    df.write.mode("overwrite").partitionBy("day").parquet(path)


def _state(spark, path):
    # Partition discovery types day= back as DATE; normalize to str.
    return {
        (r.id): (r.value, str(r.day))
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_merges_and_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [(2, "b2", "2024-01-01"), (5, "e", "2024-01-02")], ["id", "value", "day"]
    )
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    assert _state(spark, path) == {
        1: ("a", "2024-01-01"),
        2: ("b2", "2024-01-01"),  # updated in place
        3: ("c", "2024-01-02"),
        4: ("d", "2024-01-03"),
        5: ("e", "2024-01-02"),  # appended
    }


def test_upsert_leaves_untouched_partitions_alone(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-03/*.parquet")
    }
    assert before
    updates = spark.createDataFrame([(2, "b2", "2024-01-01")], ["id", "value", "day"])
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    after = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/day=2024-01-03/*.parquet")
    }
    assert after == before, "partition 2024-01-03 must not be rewritten"


def test_upsert_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [(2, "b2", "2024-01-01"), (5, "e", "2024-01-02")], ["id", "value", "day"]
    )
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    first = _state(spark, path)
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    assert _state(spark, path) == first

    # Row counts exact: no duplicates snuck in.
    assert spark.read.parquet(path).count() == 5


def test_upsert_empty_updates_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    empty = spark.createDataFrame([], "id INT, value STRING, day STRING")
    upsert_partitioned(spark, path, empty, ["id"], ["day"])
    assert len(_state(spark, path)) == 4


def test_upsert_first_load_creates_table(spark, tmp_path):
    path = str(tmp_path / "fresh")
    updates = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], ["id", "value", "day"]
    )
    upsert_partitioned(spark, path, updates, ["id"], ["day"])
    assert _state(spark, path) == {1: ("a", "2024-01-01"), 2: ("b", "2024-01-02")}
    # And the created table merges normally afterwards.
    upsert_partitioned(
        spark,
        path,
        spark.createDataFrame([(1, "a2", "2024-01-01")], ["id", "value", "day"]),
        ["id"],
        ["day"],
    )
    assert _state(spark, path)[1] == ("a2", "2024-01-01")


def test_upsert_dedupes_multi_version_batch(spark, tmp_path):
    """A batch carrying several versions of one key lands exactly one row
    — the highest order_col version — not all of them."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    updates = spark.createDataFrame(
        [
            (1, "v1", "2024-01-01", 10),
            (1, "v3", "2024-01-01", 30),
            (1, "v2", "2024-01-01", 20),
        ],
        ["id", "value", "day", "seq"],
    )
    upsert_partitioned(
        spark, path, updates.select("id", "value", "day"), ["id"], ["day"],
    )
    # No order_col: deterministic fallback (remaining cols desc) → "v3".
    state = _state(spark, path)
    assert state[1] == ("v3", "2024-01-01")
    assert sum(1 for r in spark.read.parquet(path).collect() if r.id == 1) == 1


def test_scd2_multi_version_batch_no_fanout(spark):
    """Duplicate keys in one updates batch must not fan out the current
    row: latest effective_ts wins, exactly one close + one open."""
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import scd2_apply

    existing = spark.createDataFrame(
        [(1, "eu", "2024-01-01", None)],
        "id INT, region STRING, valid_from STRING, valid_to STRING",
    )
    updates = spark.createDataFrame(
        [(1, "us", "2024-02-01"), (1, "ap", "2024-03-01")],
        "id INT, region STRING, effective_ts STRING",
    )
    out = scd2_apply(existing, updates, ["id"], ["region"])
    rows = sorted(
        ((r.region, r.valid_from, r.valid_to) for r in out.collect()),
    )
    assert rows == [
        ("ap", "2024-03-01", None),       # latest update is the new current
        ("eu", "2024-01-01", "2024-03-01"),  # old current closed once
    ]


def test_scd2_versions_history(spark):
    from pyspark.sql import functions as F

    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import scd2_apply

    existing = spark.createDataFrame(
        [
            # key, attr, valid_from, valid_to (NULL = current)
            (1, "ca", "2024-01-01", "2024-02-01"),  # closed history
            (1, "ny", "2024-02-01", None),          # current, will change
            (2, "tx", "2024-01-15", None),          # current, no-op update
            (3, "wa", "2024-01-20", None),          # current, untouched
        ],
        ["id", "region", "valid_from", "valid_to"],
    )
    updates = spark.createDataFrame(
        [
            (1, "fl", "2024-03-01"),  # change → close + open
            (2, "tx", "2024-03-01"),  # same attrs → no-op
            (9, "nv", "2024-03-01"),  # new key → open
        ],
        ["id", "region", "effective_ts"],
    )

    out = scd2_apply(existing, updates, ["id"], ["region"])
    rows = {(r.id, r.region, r.valid_from): r.valid_to for r in out.collect()}

    assert rows == {
        (1, "ca", "2024-01-01"): "2024-02-01",   # history untouched
        (1, "ny", "2024-02-01"): "2024-03-01",   # closed at effective_ts
        (1, "fl", "2024-03-01"): None,           # new current version
        (2, "tx", "2024-01-15"): None,           # no-op: not churned
        (3, "wa", "2024-01-20"): None,           # untouched key
        (9, "nv", "2024-03-01"): None,           # brand-new key
    }

    # Exactly one current row per live key.
    cur = out.filter(F.col("valid_to").isNull()).groupBy("id").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_is_idempotent_for_noop_reload(spark):
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import scd2_apply

    existing = spark.createDataFrame(
        [(1, "ny", "2024-02-01", None)],
        "id INT, region STRING, valid_from STRING, valid_to STRING",
    )
    updates = spark.createDataFrame(
        [(1, "ny", "2024-03-01")], ["id", "region", "effective_ts"]
    )
    once = scd2_apply(existing, updates, ["id"], ["region"])
    twice = scd2_apply(once, updates, ["id"], ["region"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 1


def test_cdc_deletes_all_three_classes_nonvacuous(spark, sf_dir):
    """The sliding-window CDC fixture must actually produce inserts,
    updates, AND deletes — if fixture drift empties a class, the oracle
    gate passes vacuously and the operator's delete path goes untested."""
    from nrg_etl_airflow_spark_emr_spark.plans.catalog import all_specs

    counts = {
        r.change_type: r.n
        for r in all_specs()["upsert_cdc_deletes"]
        .builder(spark, sf_dir)
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"insert", "update", "delete"}, counts
    assert all(v > 0 for v in counts.values()), counts


# ---------------------------------------------------------------------------
# merge_into: the ANSI MERGE contract, kernel-level.
# ---------------------------------------------------------------------------


def _merge_fixtures(spark):
    target = spark.createDataFrame(
        [(1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0)],
        "k long, name string, bal double",
    )
    # k=1 matched (big), k=2 matched (small), k=3 unmatched-by-source,
    # k=9 source-only big, k=8 source-only small.
    source = spark.createDataFrame(
        [(1, 100.0), (2, 1.0), (9, 100.0), (8, 1.0)], "k long, amt double"
    )
    return target, source


def test_merge_into_clause_order_and_all_three_scopes(spark):
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        merge_into,
        merge_src,
    )

    target, source = _merge_fixtures(spark)
    out = merge_into(
        target,
        source,
        on=["k"],
        matched=[
            # Clause ORDER is semantics: k=1 satisfies BOTH conditions
            # (amt >= 1 would also delete); first-match-wins keeps it.
            (merge_src("amt") > 50, "update", {"bal": F.col("bal") + merge_src("amt")}),
            (merge_src("amt") <= 50, "delete", {}),
        ],
        not_matched=[
            (
                merge_src("amt") > 50,
                "insert",
                {
                    "k": merge_src("k"),
                    "name": F.lit("new"),
                    "bal": merge_src("amt"),
                },
            )
        ],
    )
    got = {r.k: (r.name, r.bal) for r in out.collect()}
    assert got == {
        1: ("alpha", 110.0),  # matched, first clause (update) wins
        3: ("gamma", 30.0),   # unmatched by source: pass-through
        9: ("new", 100.0),    # source-only, insert condition holds
        # 2 deleted (matched, second clause); 8 discarded (insert cond fails)
    }


def test_merge_into_not_matched_by_source_clauses(spark):
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        merge_into,
        merge_src,
    )

    target, source = _merge_fixtures(spark)
    out = merge_into(
        target,
        source,
        on=["k"],
        matched=[(None, "update", {"bal": merge_src("amt")})],
        not_matched_by_source=[
            (F.col("bal") >= 30, "delete", {}),
            (None, "update", {"name": F.lit("stale")}),
        ],
    )
    got = {r.k: (r.name, r.bal) for r in out.collect()}
    # k=3 (bal 30) deleted by the first by-source clause; an unmatched
    # target row below the bar would take the second clause instead.
    assert got == {1: ("alpha", 100.0), 2: ("beta", 1.0)}


def test_merge_into_rejects_duplicate_source_keys_lazily(spark):
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        merge_into,
        merge_src,
    )

    target, _ = _merge_fixtures(spark)
    dup = spark.createDataFrame([(1, 5.0), (1, 6.0)], "k long, amt double")
    df = merge_into(  # builder must stay lazy — no error yet
        target, dup, on=["k"], matched=[(None, "update", {"bal": merge_src("amt")})]
    )
    with pytest.raises(PySparkException, match="cardinality violation"):
        df.collect()


def test_merge_into_allows_duplicate_source_only_keys(spark):
    """ANSI/Delta MERGE only forbids several source rows hitting ONE
    target row; duplicate source-only keys are legal and become multiple
    NOT MATCHED inserts (the guard semi-joins source keys against the
    target before counting)."""
    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        merge_into,
        merge_src,
    )

    target, _ = _merge_fixtures(spark)
    dup = spark.createDataFrame([(7, 5.0), (7, 6.0)], "k long, amt double")
    out = merge_into(
        target,
        dup,
        on=["k"],
        matched=[(None, "update", {"bal": merge_src("amt")})],
        not_matched=[
            (
                None,
                "insert",
                {
                    "k": merge_src("k"),
                    "name": F.lit("ins"),
                    "bal": merge_src("amt"),
                },
            )
        ],
    )
    got = sorted((r.k, r.bal) for r in out.collect())
    assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (7, 5.0), (7, 6.0)]


def test_merge_into_insert_missing_column_raises_value_error(spark):
    """An insert clause that does not set every target column must fail
    with the explanatory ValueError, not a bare KeyError."""
    import pytest

    from nrg_etl_airflow_spark_emr_spark.pipelines.upsert import (
        merge_into,
        merge_src,
    )

    target, _ = _merge_fixtures(spark)
    src = spark.createDataFrame([(7, 5.0)], "k long, amt double")
    with pytest.raises(ValueError, match="insert clause must set every"):
        merge_into(
            target,
            src,
            on=["k"],
            matched=[],
            not_matched=[(None, "insert", {"k": merge_src("k")})],
        )
